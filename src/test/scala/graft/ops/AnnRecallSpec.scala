package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Quality evidence for the ANN scale path: SRP-LSH must recover planted
  * near-duplicates (the recall property that makes the bucketed join a valid
  * substitute for the O(n²) scan at 100 TB), and the brute-force path must
  * rank a near-duplicate's source first.
  */
class AnnRecallSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def u(seed: Long): Float = // uniform [-1, 1)
    ((mix64(seed) >>> 11) * 1.1102230246251565e-16 * 2 - 1).toFloat

  private val dim = 32
  private val nBase = 400
  private val nDup = 60

  private lazy val vectors: Seq[(Long, Array[Float])] = {
    val base = (0 until nBase).map { i =>
      (i.toLong, Array.tabulate(dim)(d => u(i.toLong * 1000 + d)))
    }
    val dups = (0 until nDup).map { j =>
      val src = base(j)._2
      ((nBase + j).toLong,
        Array.tabulate(dim)(d => src(d) + 0.05f * u(7777L + j * 100 + d)))
    }
    base ++ dups
  }

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < dim) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    dot / math.sqrt(na * nb)
  }

  test("SRP-LSH recovers >= 85% of planted near-duplicate pairs") {
    import spark.implicits._
    // sanity: the planted pairs really are near-dups, unplanted pairs are not
    val sims = (0 until nDup).map(j => cos(vectors(j)._2, vectors(nBase + j)._2))
    assert(sims.forall(_ > 0.97), s"perturbation too large: min ${sims.min}")

    val df = vectors.toDF("vec_id", "embedding")
    val pairs = AnnOps.lshCandidatePairs(df, "vec_id", "embedding",
      nPlanes = 10, nTables = 3)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val planted = (0 until nDup)
      .map(j => (j.toLong, (nBase + j).toLong)).toSet
    val recovered = planted.count(pairs.contains)
    assert(recovered >= (0.85 * nDup).toInt,
      s"LSH recall too low: $recovered/$nDup planted pairs found")

    // exact rescoring: every reported pair's sim matches the local cosine
    val byId = vectors.toMap
    val rescored = AnnOps.lshCandidatePairs(df, "vec_id", "embedding",
      nPlanes = 10, nTables = 3)
      .as[(Long, Long, Double)].collect()
    rescored.foreach { case (a, b, s) =>
      assert(math.abs(s - cos(byId(a), byId(b))) < 1e-12)
    }
  }

  test("brute-force top-k ranks a near-duplicate's source first") {
    import spark.implicits._
    val df = vectors.toDF("vec_id", "embedding")
    (0 until 5).foreach { j =>
      val q = vectors(nBase + j)._2
      val top = AnnOps.bruteForceTopK(df, "vec_id", "embedding", q, 2)
        .as[(Long, Double)].collect()
      // rank 1 is the dup itself (sim 1.0), rank 2 its source
      assert(top(0)._1 == nBase + j)
      assert(top(1)._1 == j.toLong, s"dup $j nearest is ${top(1)._1}")
    }
  }
}
