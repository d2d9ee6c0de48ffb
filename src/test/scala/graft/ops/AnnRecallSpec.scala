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

  test("pair dedup operates on bare (id_a, id_b) — no vector payloads") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Deduplicate, LogicalPlan}
    import spark.implicits._
    val df = vectors.toDF("vec_id", "embedding")
    val plan = AnnOps.lshCandidatePairs(df, "vec_id", "embedding",
      nPlanes = 10, nTables = 3, dim = dim).queryExecution.optimizedPlan
    // the optimizer rewrites dropDuplicates' Deduplicate into a group-by
    val dedups: Seq[LogicalPlan] = plan.collect {
      case d: Deduplicate => d
      case a: Aggregate if a.groupingExpressions.nonEmpty &&
        a.groupingExpressions.flatMap(_.references.map(_.name)).toSet ==
          Set("id_a", "id_b") => a
    }
    assert(dedups.nonEmpty)
    // the dedup (and therefore its exchange) keys AND carries only the pair;
    // nothing below it references the rescore payload aliases
    dedups.foreach { d =>
      assert(d.output.map(_.name).toSet == Set("id_a", "id_b"),
        s"pair dedup carries extra columns: ${d.output.map(_.name).mkString(",")}")
      val below = d.collect { case n => n.output.map(_.name) }.flatten.toSet
      assert(!below.contains("v_a") && !below.contains("v_b"),
        "vector payloads present below the pair dedup")
    }
  }

  test("typed inputs: double arrays cast, length mismatch is NULL not garbage") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // double-array inputs resolve via implicit cast to array<float> — the
    // old ArrayData.getFloat byte-reinterpretation would return garbage
    val d = Seq((Seq(1.0, 0.0), Seq(1.0, 0.0))).toDF("a", "b")
    val sim = d.select(AnnOps.cosine($"a", $"b")).head().getDouble(0)
    assert(math.abs(sim - 1.0) < 1e-12)
    // length mismatch → NULL (explicit), not a truncated fold
    val m = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    assert(m.select(AnnOps.cosine($"a", $"b")).head().isNullAt(0))
    // SRP bucket of a wrong-dimension vector is NULL → dropped by equi-joins
    val w = Seq(Tuple1(Seq(1.0f, 2.0f, 3.0f))).toDF("v")
    assert(w.select(AnnOps.srpBucket($"v", nPlanes = 4, dim = 8))
      .head().isNullAt(0))
  }

  test("IVF: full probe equals brute force; partial probe keeps near-dups") {
    import spark.implicits._
    val df = vectors.toDF("vec_id", "embedding")
    val q = vectors(nBase + 3)._2
    // probing every cell degenerates to the exact scan — rank-identical
    val full = AnnOps.ivfTopK(df, "vec_id", "embedding", q, 10,
      nCells = 8, nProbe = 8).as[(Long, Double)].collect().toSeq
    val brute = AnnOps.bruteForceTopK(df, "vec_id", "embedding", q, 10)
      .as[(Long, Double)].collect().toSeq
    assert(full == brute)
    // partial probe (2 of 8 cells): the dup itself and its source share the
    // query's cell (cos > 0.97 → same argmax with overwhelming margin)
    val part = AnnOps.ivfTopK(df, "vec_id", "embedding", q, 10,
      nCells = 8, nProbe = 2).as[(Long, Double)].collect().toSeq
    assert(part.head._1 == (nBase + 3).toLong)
    assert(part.map(_._1).contains(3L))
    // partial-probe results are a subset of the corpus ranked exactly —
    // every reported sim matches the local cosine
    val byId = vectors.toMap
    part.foreach { case (id, s) =>
      assert(math.abs(s - cos(byId(id), q)) < 1e-12)
    }
    // recall@10 of 2/8 probes vs brute force stays useful
    val recall = brute.map(_._1).count(part.map(_._1).contains(_)) / 10.0
    assert(recall >= 0.5, s"IVF recall@10 too low: $recall")
  }

  test("IVF cell assignment: kernel == driver-side centroids; wrong dim NULL") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val cents = new IvfCentroids(8, dim, 7L)
    // the expression's per-row argmax must agree with probeCells' top-1
    // (same centroids, same double fold)
    val df = vectors.toDF("vec_id", "embedding")
    val cells = df.select($"vec_id",
      AnnOps.ivfCell($"embedding", nCells = 8, dim = dim).as("cell"))
      .as[(Long, Int)].collect().toMap
    vectors.foreach { case (id, v) =>
      assert(cells(id) == cents.probeCells(v, 1).head, s"vec $id")
    }
    // every cell id is in range and the population spreads across cells
    assert(cells.values.forall(c => c >= 0 && c < 8))
    assert(cells.values.toSet.size >= 4, "degenerate cell assignment")
    // wrong-dimension vector → NULL cell (excluded from every probe)
    val w = Seq(Tuple1(Seq(1.0f, 2.0f, 3.0f))).toDF("v")
    assert(w.select(AnnOps.ivfCell($"v", nCells = 8, dim = dim))
      .head().isNullAt(0))
  }

  test("assignCells + partitionBy: a probe reads only the probed cell partitions") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = vectors.toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-part-").toString
    try {
      // the 100 TB build step: write the corpus partitioned by coarse cell
      AnnOps.assignCells(df, "embedding", nCells = 8, dim = dim)
        .write.partitionBy("ivf_cell").mode("overwrite").parquet(dir)
      val table = spark.read.parquet(dir)
      val q = vectors(nBase + 3)._2
      val cents = new IvfCentroids(8, dim, 7L)
      val probed = cents.probeCells(q, 2).toSeq
      val pruned = table.filter($"ivf_cell".isin(probed.map(Int.box): _*))
      pruned.collect()
      val scan = pruned.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec => f
      }.head
      // the filter must land in PartitionFilters (source pruning), and the
      // scan must touch strictly fewer files than the table has
      assert(scan.partitionFilters.nonEmpty,
        "ivf_cell filter did not reach PartitionFilters")
      val filesRead = scan.metrics("numFiles").value
      assert(filesRead < table.inputFiles.length,
        s"no pruning: read $filesRead of ${table.inputFiles.length} files")
      // and the pruned scan answers the probe identically to the on-the-fly
      // cell computation (AnnOps.ivfTopK at the same probe set)
      val viaPartitioned = pruned
        .select($"vec_id", AnnOps.cosine($"embedding",
          typedLit(q.toSeq)).as("sim"))
        .orderBy(desc("sim"), $"vec_id").limit(10)
        .as[(Long, Double)].collect().toSeq
      val onTheFly = AnnOps.ivfTopK(df, "vec_id", "embedding", q, 10,
        nCells = 8, nProbe = 2).as[(Long, Double)].collect().toSeq
      assert(viaPartitioned == onTheFly)
    } finally graft.Bench.deleteRec(dir)
  }

  test("trained IVF centroids: recall@10 >= deterministic matrix on clustered data") {
    import spark.implicits._
    // clustered fixture: 600 points scattered tightly (cos ~0.99) around 8
    // near-orthogonal random directions — the data shape where k-means
    // refinement should beat the data-blind sign matrix
    val nClusters = 8
    val centers = (0 until nClusters).map(c =>
      Array.tabulate(dim)(d => u(900000L + c * 7700 + d)))
    val pts = (0 until 600).map { i =>
      val c = centers(i % nClusters)
      (i.toLong, Array.tabulate(dim)(d => c(d) + 0.15f * u(31337L + i * 100 + d)))
    }
    val df = pts.toDF("vec_id", "embedding")
    val trained = AnnOps.trainIvfCentroids(df, "vec_id", "embedding",
      nCells = nClusters, dim = dim)
    // training must be deterministic (fixed sample order, init, fold)
    val again = AnnOps.trainIvfCentroids(df, "vec_id", "embedding",
      nCells = nClusters, dim = dim)
    assert(trained.centroids.flatten.toSeq == again.centroids.flatten.toSeq)
    val queries = Seq(5, 42, 137, 300, 571)
    val recalls = queries.map { qi =>
      val q = pts(qi)._2
      val brute = AnnOps.bruteForceTopK(df, "vec_id", "embedding", q, 10)
        .as[(Long, Double)].collect().map(_._1).toSeq
      def recall(r: Seq[Long]) = brute.count(r.contains) / 10.0
      val det = AnnOps.ivfTopK(df, "vec_id", "embedding", q, 10,
        nCells = nClusters, nProbe = 2).as[(Long, Double)].collect().map(_._1).toSeq
      val tr = AnnOps.ivfTopKWith(df, "vec_id", "embedding", q, 10,
        trained, nProbe = 2).as[(Long, Double)].collect().map(_._1).toSeq
      (recall(tr), recall(det))
    }
    val (trMean, detMean) =
      (recalls.map(_._1).sum / recalls.size, recalls.map(_._2).sum / recalls.size)
    assert(trMean >= detMean,
      s"trained recall $trMean below deterministic $detMean")
    assert(trMean >= 0.8, s"trained recall too low: $trMean (per-query $recalls)")
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
