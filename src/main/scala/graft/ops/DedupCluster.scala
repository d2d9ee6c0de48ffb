package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components over a candidate-pair edge list — the
  * clustering step a near-dup dedup pipeline runs after LSH: confirmed
  * near-dup pairs become edges, every document's cluster id is the minimum
  * doc id reachable through the pair graph, and one canonical document (the
  * min) is kept per cluster.
  *
  * Algorithm: alternating neighbor-min label propagation and pointer jumping
  * (`lbl(v) <- lbl(lbl(v))`), the DataFrame lift of classic pointer-doubling
  * CC. The jump step halves label-chain depth every round, so labels reach
  * the component minimum in O(log n) rounds even on path-shaped graphs —
  * the property that makes this viable as a sequence of Spark jobs at
  * 10^12-doc scale, where O(diameter) propagation would not terminate in
  * bounded rounds (cf. Kiveris et al., "Connected Components in MapReduce
  * and Beyond", SoCC '14 — large-star/small-star has the same round bound).
  * Each round is two hash-shuffles on the node id plus one count action for
  * the fixpoint check; lineage is truncated with a local checkpoint every
  * few rounds so the plan does not grow unboundedly.
  *
  * Reference capability analog: none in krep (a scan engine has no dedup) —
  * this is a north-rule training-pipeline extra alongside MinHash-LSH.
  */
object DedupCluster {

  /** Connected-component labels for `nodes` (column `id`) under the edge
    * set `edges` (columns `id_a`, `id_b`; direction irrelevant). Returns
    * one row per node: (id, cluster_id) with cluster_id = min id in the
    * node's component; isolated nodes label themselves.
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      maxRounds: Int = 64): DataFrame = {
    val s: SparkSession = nodes.sparkSession
    import s.implicits._

    val sym = edges.select($"id_a".as("u"), $"id_b".as("v"))
      .union(edges.select($"id_b".as("u"), $"id_a".as("v")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var lbl = nodes.select($"id", $"id".as("lbl"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var round = 0
    var changed = 1L
    while (changed > 0 && round < maxRounds) {
      // neighbor min: best label visible from any neighbor
      val nbrMin = sym.join(lbl.withColumnRenamed("id", "v"), "v")
        .groupBy($"u".as("id")).agg(min($"lbl").as("nlbl"))
      val afterNbr = lbl.join(nbrMin, Seq("id"), "left")
        .select($"id", least($"lbl", coalesce($"nlbl", $"lbl")).as("lbl"))
      // pointer jump: follow the label one hop (labels only ever decrease,
      // so lbl(lbl(v)) <= lbl(v); every label is itself a node id, so the
      // self-join always finds a row — left join only as belt-and-braces)
      val next = afterNbr.as("a")
        .join(afterNbr.select($"id".as("lbl"), $"lbl".as("lbl2")).as("b"),
          Seq("lbl"), "left")
        .select($"id", coalesce($"lbl2", $"lbl").as("lbl"))
      val nextP =
        if (round % 4 == 3) next.localCheckpoint(true)
        else { val p = next.persist(StorageLevel.MEMORY_AND_DISK); p.count(); p }
      changed = nextP.as("n").join(lbl.as("o"), "id")
        .filter($"n.lbl" =!= $"o.lbl").count()
      lbl.unpersist()
      lbl = nextP
      round += 1
    }
    sym.unpersist()
    lbl.select($"id", $"lbl".as("cluster_id"))
  }
}
