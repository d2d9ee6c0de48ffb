package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components over a candidate-pair edge list — the
  * clustering step a near-dup dedup pipeline runs after LSH: confirmed
  * near-dup pairs become edges, every document's cluster id is the minimum
  * doc id reachable through the pair graph, and one canonical document (the
  * min) is kept per cluster.
  *
  * Algorithm: alternating large-star / small-star edge rewriting (Kiveris et
  * al., "Connected Components in MapReduce and Beyond", SoCC '14). Each
  * round rewrites the edge set toward per-component stars centered at the
  * component minimum; the potential argument in the paper bounds the round
  * count logarithmically in practice (O(log² n) worst case), and — the
  * property the earlier label-propagation formulation here lacked — NO step
  * ever keys a shuffle on a component label. A web-scale giant component
  * (they always exist) therefore never concentrates on one reducer key:
  *  - neighborhood minima come from `groupBy(u).agg(min(v))` — partial
  *    aggregation combines map-side, so the reduce side of a hot node sees
  *    one partial per map partition, not its degree;
  *  - the relink joins (attach each edge to its endpoint's neighborhood
  *    min) are explicitly SALTED: the one-row-per-node min table is
  *    replicated `salt` ways and each edge picks a deterministic salt from
  *    its other endpoint, so a node of degree d costs d/salt rows per task,
  *    bounded regardless of component shape.
  * Edge multisets stay deduplicated every round, so per-round shuffle volume
  * is ∝ the current edge count ≤ the input edge count.
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
    * of ~6 per star round. Larger edge sets take the fully distributed
    * star-alternation path. `strategy` = auto | driver | distributed forces
    * a path for testing.
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      maxRounds: Int = 64, driverEdgeLimit: Long = 2000000L,
      strategy: String = "auto", salt: Int = 8): DataFrame = {
    val s: SparkSession = nodes.sparkSession
    import s.implicits._

    val pairCols = edges.select(col(edges.columns(0)).as("id_a"),
      col(edges.columns(1)).as("id_b"))
    strategy match {
      case "driver" =>
        driverUnionFind(nodes,
          pairCols.collect().map(r => (r.getLong(0), r.getLong(1))))
      case "distributed" =>
        connectedComponentsDistributed(nodes, pairCols, maxRounds, salt)
      case _ =>
        // probe and collect in ONE pass: pull at most limit+1 edges; if
        // they all fit, they are already the full edge set — no second
        // evaluation of the (possibly expensive) pair pipeline. The +1 is
        // clamped so a caller passing Long.MaxValue cannot overflow limit()
        // into a negative argument.
        val probeN = math.min(driverEdgeLimit, Int.MaxValue.toLong - 1).toInt + 1
        val probe = pairCols.limit(probeN).collect()
        if (probe.length <= driverEdgeLimit)
          driverUnionFind(nodes,
            probe.map(r => (r.getLong(0), r.getLong(1))))
        else connectedComponentsDistributed(nodes, pairCols, maxRounds, salt)
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

  /** Salted equi-join of `probe` (u, v, …) against the one-row-per-key min
    * table `mins` (u, m): mins is replicated `salt` ways and each probe row
    * picks a deterministic salt from its v column, so a key of degree d
    * lands as d/salt rows per (u, salt) shuffle key — the giant-component
    * guard. Left semantics: probe keys absent from mins keep m = null.
    *
    * The trade, stated: replication shuffles `salt` extra copies of the
    * ≤-one-row-per-node min table, ~salt×n/m relative overhead on the join
    * (≈40% at web-typical average degree 20 and the default salt 8) — paid
    * deliberately for a DETERMINISTIC per-task ceiling of max-degree/salt
    * with no driver-side heavy-hitter census and no reliance on AQE
    * runtime skew splitting.
    */
  private def saltedMinJoin(probe: DataFrame, mins: DataFrame,
      salt: Int): DataFrame = {
    val s = probe.sparkSession
    import s.implicits._
    val saltsCol = array((0 until salt).map(lit): _*)
    val minsExp = mins.withColumn("s", explode(saltsCol))
    probe.withColumn("s", pmod(hash($"v"), lit(salt)))
      .join(minsExp, Seq("u", "s"), "left")
      .drop("s")
  }

  /** Large-star: every edge (u, v) with v > u relinks v to
    * m(u) = min(Γ(u) ∪ {u}). Neighborhood minima by partial-aggregated
    * groupBy; identity groups (m == u, e.g. every fully-formed star center)
    * are filtered from the build side and handled by the coalesce.
    */
  private def largeStar(e: DataFrame, salt: Int): DataFrame = {
    val s = e.sparkSession
    import s.implicits._
    val sym = e.select($"u", $"v")
      .union(e.select($"v".as("u"), $"u".as("v")))
    val mins = sym.groupBy($"u").agg(min($"v").as("mv"))
      .select($"u", least($"mv", $"u").as("m"))
      .filter($"m" < $"u")
    saltedMinJoin(sym.filter($"v" > $"u"), mins, salt)
      .select($"v".as("u"), coalesce($"m", $"u").as("v"))
      .distinct()
  }

  /** Small-star: for each node u over its SMALLER neighbors Γ⁻(u) (the
    * canonical big→small edge list groups them for free), relink u and all
    * of Γ⁻(u) to m = min(Γ⁻(u)). Every u in the edge list has a smaller
    * neighbor, so the salted join is effectively inner.
    */
  private def smallStar(e: DataFrame, salt: Int): DataFrame = {
    val s = e.sparkSession
    import s.implicits._
    val mins = e.groupBy($"u").agg(min($"v").as("m"))
    val relinked = saltedMinJoin(e, mins, salt)
      .filter($"v" =!= $"m")
      .select($"v".as("u"), $"m".as("v"))
    relinked.union(mins.select($"u", $"m".as("v"))).distinct()
  }

  private def connectedComponentsDistributed(nodes: DataFrame,
      edges: DataFrame, maxRounds: Int, salt: Int): DataFrame = {
    val s: SparkSession = nodes.sparkSession
    import s.implicits._

    // canonical big→small edges, self-loops out, deduplicated; checkpointed
    // so round 0's six references re-read a materialized leaf, not the
    // (possibly expensive) upstream candidate-pair pipeline
    var cur = edges
      .select(greatest($"id_a", $"id_b").as("u"), least($"id_a", $"id_b").as("v"))
      .filter($"u" =!= $"v").distinct()
      .localCheckpoint(true)
    var curCount = cur.count()
    var round = 0
    var converged = curCount == 0L
    while (!converged && round < maxRounds) {
      val nextRaw = smallStar(largeStar(cur, salt), salt)
      // truncate lineage EVERY round: one star round references the prior
      // edge set ~6 times (sym twice in large-star, the relink join and min
      // table in each stage), so the logical plan multiplies ~8x per round —
      // without an eager local checkpoint the nested tree itself (explain
      // strings, AQE plan updates) overwhelms the driver within 3 rounds
      val next = nextRaw.localCheckpoint(true)
      val nextCount = next.count()
      // stars are fixed points of both stages, and the paper's potential
      // argument rules out cycles, so pair-output == pair-input IS the
      // fixpoint; the cheap count gate skips the except scan on most rounds
      converged = nextCount == curCount &&
        next.exceptAll(cur).limit(1).isEmpty
      cur.unpersist()
      cur = next
      curCount = nextCount
      round += 1
    }
    // fixpoint edges are per-component stars (member, componentMin): a
    // member appears exactly once as u; centers and isolated nodes appear
    // only as v (or not at all) and label themselves via the coalesce
    val labels = cur.select($"u".as("id"), $"v".as("lbl"))
    nodes.join(labels, Seq("id"), "left")
      .select($"id", coalesce($"lbl", $"id").as("cluster_id"))
  }
}
