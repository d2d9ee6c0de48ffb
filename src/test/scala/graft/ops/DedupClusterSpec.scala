package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class DedupClusterSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  /** Driver-side union-find ground truth. */
  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n.toLong.toInt)(i => i)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // root compression so every node maps to its component MINIMUM: roots
    // were always merged toward the min, so find() is the min already
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  private def sparkCC(n: Int, edges: Seq[(Long, Long)],
      strategy: String = "auto"): Map[Long, Long] = {
    import spark.implicits._
    val nodes = (0L until n.toLong).toDF("id")
    val e =
      if (edges.isEmpty) Seq.empty[(Long, Long)].toDF("id_a", "id_b")
      else edges.toDF("id_a", "id_b")
    DedupCluster.connectedComponents(nodes, e, strategy = strategy)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("empty edge set: every node is its own singleton cluster") {
    assert(sparkCC(12, Nil) == (0L until 12L).map(i => i -> i).toMap)
  }

  test("path graph converges to the chain minimum in O(log n) rounds") {
    val n = 128
    val chain = (0L until (n - 1).toLong).map(i => (i, i + 1))
    // maxRounds 16 << n: only pointer doubling can close a 128-long chain;
    // force the distributed path (auto would route 127 edges to the driver)
    import spark.implicits._
    val got = DedupCluster.connectedComponents(
      (0L until n.toLong).toDF("id"), chain.toDF("id_a", "id_b"),
      maxRounds = 16, strategy = "distributed")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L until n.toLong).map(i => i -> 0L).toMap)
  }

  test("random graphs: BOTH strategies match driver-side union-find (3 seeds)") {
    for (seed <- Seq(11, 42, 1234)) {
      val rnd = new scala.util.Random(seed)
      val n = 200
      val edges = Seq.fill(120)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      val expect = unionFind(n, edges)
      assert(sparkCC(n, edges, "distributed") == expect, s"seed=$seed distributed")
      assert(sparkCC(n, edges, "driver") == expect, s"seed=$seed driver")
    }
  }

  test("two cliques joined by one bridge collapse to one cluster") {
    val cliqueA = for (i <- 0L until 5L; j <- (i + 1) until 5L) yield (i, j)
    val cliqueB = for (i <- 10L until 15L; j <- (i + 1) until 15L) yield (i, j)
    val bridge = Seq((4L, 10L))
    val got = sparkCC(16, cliqueA ++ cliqueB ++ bridge)
    assert((0L until 5L).forall(got(_) == 0L))
    assert((10L until 15L).forall(got(_) == 0L))
    assert(got(15L) == 15L) // untouched singleton
  }
}
