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
    *
    * Two physical strategies, one semantics (the same small/large split the
    * query engine uses): an edge set that fits comfortably on the driver
    * (`<= driverEdgeLimit`, default 2M pairs = ~32 MB) is solved by one
    * collect + union-find and a broadcast join back — 2 Spark jobs instead
    * of ~5 per pointer-doubling round. Larger edge sets take the fully
    * distributed O(log n)-round path. `strategy` = auto | driver |
    * distributed forces a path for testing.
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      maxRounds: Int = 64, driverEdgeLimit: Long = 2000000L,
      strategy: String = "auto"): DataFrame = {
    val s: SparkSession = nodes.sparkSession
    import s.implicits._

    val pairCols = edges.select(col(edges.columns(0)).as("id_a"),
      col(edges.columns(1)).as("id_b"))
    strategy match {
      case "driver" =>
        driverUnionFind(nodes,
          pairCols.collect().map(r => (r.getLong(0), r.getLong(1))))
      case "distributed" =>
        connectedComponentsDistributed(nodes, pairCols, maxRounds)
      case _ =>
        // probe and collect in ONE pass: pull at most limit+1 edges; if
        // they all fit, they are already the full edge set — no second
        // evaluation of the (possibly expensive) pair pipeline
        val probe = pairCols.limit((driverEdgeLimit + 1).toInt).collect()
        if (probe.length <= driverEdgeLimit)
          driverUnionFind(nodes,
            probe.map(r => (r.getLong(0), r.getLong(1))))
        else connectedComponentsDistributed(nodes, pairCols, maxRounds)
    }
  }

  /** Driver-side union-find over a collected edge list, labels broadcast
    * back onto the (arbitrarily large) node table. Only nodes that appear
    * in an edge travel to the driver.
    */
  private def driverUnionFind(nodes: DataFrame,
      pairs: Array[(Long, Long)]): DataFrame = {
    val s: SparkSession = nodes.sparkSession
    import s.implicits._
    val parent = new scala.collection.mutable.HashMap[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // roots always merged toward the min, so find() IS the component min
    val labels = parent.keysIterator.map(k => (k, find(k))).toSeq
    if (labels.isEmpty)
      return nodes.select($"id", $"id".as("cluster_id"))
    val lblDf = labels.toDF("id", "lbl")
    nodes.join(broadcast(lblDf), Seq("id"), "left")
      .select($"id", coalesce($"lbl", $"id").as("cluster_id"))
  }

  private def connectedComponentsDistributed(nodes: DataFrame,
      edges: DataFrame, maxRounds: Int): DataFrame = {
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
