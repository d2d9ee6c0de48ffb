package graft.query

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.corpus.SynthWebText
import graft.index.{IndexBuilder, IndexConfig}

/** Index-vs-scan differential (SURVEY.md §5 item 3): block-max WAND top-k
  * over the compressed segmented index must be rank-identical — docIds AND
  * bit-identical scores — to the brute-force DataFrame BM25 on the same
  * corpus, for a reference query set spanning hot/cold/multi-term/planted/
  * absent shapes.
  */
class IndexQuerySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val nDocs = 2000L
  private lazy val pages = SynthWebText.pages(spark, nDocs, numPartitions = 4).cache()

  private lazy val indexRoot: String = {
    val dir = Files.createTempDirectory("graft-index-").toString
    val builder = new IndexBuilder(spark, dir,
      IndexConfig(blockSize = 64, docsPerSegment = 512, partitions = 4))
    val ran = builder.build(pages)
    assert(ran == Seq("corpus", "docs", "stats", "tfrows", "dict", "postings"))
    dir
  }

  private def t(r: Int) = SynthWebText.term(r)

  /** The reference query set: 10 single terms (hot→cold), 10 conjunctions,
    * 5 planted marker phrases.
    */
  private lazy val referenceQueries: Seq[String] =
    Seq(t(0), t(1), t(5), t(20), t(100), t(500), t(2000), t(10000), t(25000), t(49999)) ++
    Seq(s"${t(0)} ${t(1)}", s"${t(0)} ${t(100)}", s"${t(3)} ${t(7)} ${t(11)}",
      s"${t(2)} ${t(2000)}", s"${t(50)} ${t(51)} ${t(52)} ${t(53)}",
      s"${t(10)} ${t(10)}", s"${t(1)} ${t(49999)}", s"${t(4)} ${t(9)} ${t(400)}",
      s"${t(6)} ${t(8)} ${t(12)} ${t(30)}", s"${t(15)} ${t(1500)}") ++
    SynthWebText.Markers

  test("index build is complete and resumable (no-op rerun)") {
    val builder = new IndexBuilder(spark, indexRoot)
    val rerun = builder.build(pages)
    assert(rerun.isEmpty, s"rerun should skip all steps, ran: $rerun")
  }

  test("WAND top-10 rank-identical (docIds + bit-identical scores) vs brute force") {
    val engine = new QueryEngine(spark, indexRoot)
    referenceQueries.foreach { q =>
      val got = engine.search(q, 10)
      val want = NaiveSearch.topK(spark, pages, q, 10, partitions = 4)
      assert(got.length == want.length, s"k mismatch for '$q'")
      got.zip(want).zipWithIndex.foreach { case ((g, w), r) =>
        assert(g.docId == w.docId,
          s"query '$q' rank $r: docId ${g.docId} != ${w.docId} " +
            s"(scores ${g.score} vs ${w.score})")
        assert(g.score == w.score,
          s"query '$q' rank $r doc ${g.docId}: score ${g.score} != ${w.score}")
      }
    }
  }

  test("all three physical strategies return identical results") {
    // force each strategy via the thresholds; same index, same queries
    val serving = new QueryEngine(spark, indexRoot)
    val pruned = new QueryEngine(spark, indexRoot,
      driverCacheBlocksThreshold = 0L) // collect-pruned-blocks path
    val distributed = new QueryEngine(spark, indexRoot,
      localPostingsThreshold = 0L, driverCacheBlocksThreshold = 0L)
    Seq(t(0), s"${t(0)} ${t(1)}", s"${t(3)} ${t(7)} ${t(11)}",
      SynthWebText.Markers(2)).foreach { q =>
      val a = serving.search(q, 10).map(s => (s.docId, s.score)).toSeq
      val b = pruned.search(q, 10).map(s => (s.docId, s.score)).toSeq
      val c = distributed.search(q, 10).map(s => (s.docId, s.score)).toSeq
      assert(a == b, s"pruned-scan strategy diverges on '$q'")
      assert(a == c, s"distributed strategy diverges on '$q'")
    }
  }

  test("absent term returns empty; unknown+known mix equals known alone") {
    val engine = new QueryEngine(spark, indexRoot)
    assert(engine.search("zzzqqqxxxnotaword", 10).isEmpty)
    val mixed = engine.search(s"zzzqqqxxxnotaword ${t(5)}", 10)
    val alone = engine.search(t(5), 10)
    assert(mixed.map(_.docId).toSeq == alone.map(_.docId).toSeq)
  }

  test("planted marker query hits exactly the planted docs") {
    val engine = new QueryEngine(spark, indexRoot)
    // marker 0 is planted on docSeq ≡ 0 (mod 97*5) → docSeqs 0, 485, ...
    val hits = engine.search(SynthWebText.Markers(0), 100)
    val expectedSeqs = (0L until nDocs).filter(i =>
      i % 97 == 0 && (i / 97) % SynthWebText.Markers.length == 0)
    assert(hits.length == expectedSeqs.size)
  }

  test("kill-and-rerun resume: crash after tfrows, rerun completes identically") {
    val cleanRoot = Files.createTempDirectory("graft-clean-").toString
    val resumeRoot = Files.createTempDirectory("graft-resume-").toString
    val small = SynthWebText.pages(spark, 300L, numPartitions = 2).cache()
    val cfg = graft.index.IndexConfig(blockSize = 32, docsPerSegment = 128,
      partitions = 2)

    new IndexBuilder(spark, cleanRoot, cfg).build(small)

    val crashed = intercept[RuntimeException] {
      new IndexBuilder(spark, resumeRoot, cfg)
        .build(small, failAfter = Some("tfrows"))
    }
    assert(crashed.getMessage.contains("injected failure"))
    val committed = new graft.index.IceTable(resumeRoot,
      spark.sparkContext.hadoopConfiguration).completedSteps.keySet
    assert(committed == Set("corpus", "docs", "stats", "tfrows"))

    val resumed = new IndexBuilder(spark, resumeRoot, cfg).build(small)
    assert(resumed == Seq("dict", "postings"),
      s"resume should run only the missing steps, ran: $resumed")

    // resumed index answers queries identically to the uninterrupted build
    val a = new QueryEngine(spark, cleanRoot)
    val b = new QueryEngine(spark, resumeRoot)
    Seq(t(0), s"${t(1)} ${t(5)}", SynthWebText.Markers(1)).foreach { q =>
      val ra = a.search(q, 10).map(s => (s.docId, s.score)).toSeq
      val rb = b.search(q, 10).map(s => (s.docId, s.score)).toSeq
      assert(ra == rb, s"resumed index diverges on '$q'")
    }
    small.unpersist()
  }

  test("phrase search: index candidates + krep re-check == literal-filter oracle") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val engine = new QueryEngine(spark, indexRoot)
    // independent oracle: docId rank + literal contains + full BM25 ranking
    val ranked = graft.index.Ranker.denseIdsByKey(
      pages.select($"url", $"text"), "url", "docId", 4)

    Seq(SynthWebText.Markers(0), s"${t(0)} ${t(1)}", s"${t(2)} ${t(5)}")
      .foreach { phrase =>
        val phraseDocs = ranked.filter($"text".contains(phrase))
          .select($"docId").as[Long].collect().toSet
        val allScores = NaiveSearch.topK(spark, pages, phrase, nDocs.toInt, 4)
        val want = allScores.filter(s => phraseDocs.contains(s.docId)).take(10)
        val got = engine.searchPhrase(phrase, 10)
        assert(got.map(s => (s.docId, s.score)).toSeq ==
          want.map(s => (s.docId, s.score)).toSeq,
          s"phrase '$phrase' diverges")
      }

    // the re-check must actually prune: conjunctive candidates ⊃ phrase hits
    val conj = engine.search(s"${t(0)} ${t(1)}", 2000)
    val phr = engine.searchPhrase(s"${t(0)} ${t(1)}", 2000)
    assert(phr.length < conj.length,
      "expected adjacency re-check to prune conjunctive candidates")
    assert(phr.nonEmpty, "expected some true phrase hits at this corpus size")
  }

  test("multi-pattern and regex index modes == brute-force BM25 of the expansion") {
    val engine = new QueryEngine(spark, indexRoot)

    // literal multi-pattern: dict terms CONTAINING any pattern
    val pats = Seq("plantedmarker", "graftphrase")
    val expanded = engine.expandPatterns(
      graft.krep.KrepParams(pats), maxExpand = 1024)
    assert(expanded.length == 10, // 5 markers x 2 words
      s"expected the 10 planted terms, got ${expanded.toSeq}")
    val got = engine.searchMultiPattern(pats, 10)
    val want = NaiveSearch.topK(spark, pages, expanded.mkString(" "), 10, 4)
    assert(got.map(s => (s.docId, s.score)).toSeq ==
      want.map(s => (s.docId, s.score)).toSeq, "multi-pattern mode diverges")

    // regex mode: krep regex over dict terms
    val gotRe = engine.searchRegex("plantedmarker[0-2]", 10)
    val expRe = engine.expandPatterns(
      graft.krep.KrepParams(Seq("plantedmarker[0-2]"), regex = true,
        overlapping = false), 1024)
    assert(expRe.toSeq == Seq("plantedmarker0", "plantedmarker1", "plantedmarker2"))
    val wantRe = NaiveSearch.topK(spark, pages, expRe.mkString(" "), 10, 4)
    assert(gotRe.map(s => (s.docId, s.score)).toSeq ==
      wantRe.map(s => (s.docId, s.score)).toSeq, "regex mode diverges")

    // expansion cap keeps the hottest terms (df-descending)
    val capped = engine.expandPatterns(graft.krep.KrepParams(Seq("a")), 5)
    assert(capped.length == 5)
    val unCapped = engine.expandPatterns(graft.krep.KrepParams(Seq("a")), 1024)
    assert(unCapped.length > 5)
    // absent pattern expands to nothing and searches empty
    assert(engine.searchMultiPattern(Seq("zzzqqqxxxnotaword"), 10).isEmpty)
  }

  test("conjunctive mode == brute-force all-terms BM25, all three strategies") {
    val engine = new QueryEngine(spark, indexRoot)
    val queries = Seq(
      s"${t(0)} ${t(1)}", s"${t(3)} ${t(7)} ${t(11)}", s"${t(2)} ${t(2000)}",
      s"${t(50)} ${t(51)} ${t(52)} ${t(53)}", t(100), SynthWebText.Markers(0))
    queries.foreach { q =>
      val got = engine.searchConjunctive(q, 10)
      val want = NaiveSearch.topK(spark, pages, q, 10, 4, conjunctive = true)
      assert(got.map(s => (s.docId, s.score)).toSeq ==
        want.map(s => (s.docId, s.score)).toSeq,
        s"conjunctive mode diverges on '$q'")
      // conjunctive results = disjunctive scores restricted to the AND set
      val dis = engine.search(q, 2000).map(s => s.docId -> s.score).toMap
      got.foreach(s => assert(dis.get(s.docId).contains(s.score),
        s"conjunctive score for doc ${s.docId} not in disjunctive set ('$q')"))
    }
    // absent term empties the conjunction even when other terms are hot
    assert(engine.searchConjunctive(s"${t(0)} zzzqqqxxxnotaword", 10).isEmpty)
    // the other physical strategies agree
    val pruned = new QueryEngine(spark, indexRoot,
      driverCacheBlocksThreshold = 0L)
    val distributed = new QueryEngine(spark, indexRoot,
      localPostingsThreshold = 0L, driverCacheBlocksThreshold = 0L)
    val q = s"${t(3)} ${t(7)} ${t(11)}"
    val a = new QueryEngine(spark, indexRoot).searchConjunctive(q, 10)
    assert(pruned.searchConjunctive(q, 10).toSeq == a.toSeq,
      "pruned-scan conjunctive strategy diverges")
    assert(distributed.searchConjunctive(q, 10).toSeq == a.toSeq,
      "distributed conjunctive strategy diverges")
  }

  test("exclusion (NOT) mode == brute-force AND-NOT BM25, all three strategies") {
    val engine = new QueryEngine(spark, indexRoot)
    // (positives, excluded): hot NOT hot, multi NOT cold, marker NOT hot
    val cases = Seq(
      (s"${t(0)} ${t(1)}", t(2)),
      (s"${t(3)} ${t(7)}", t(2000)),
      (t(100), t(0)),
      (SynthWebText.Markers(0), t(5)))
    cases.foreach { case (q, ex) =>
      val got = engine.searchConjunctive(q, 10, exclude = ex)
      val want = NaiveSearch.topK(spark, pages, q, 10, 4,
        conjunctive = true, exclude = ex)
      assert(got.map(s => (s.docId, s.score)).toSeq ==
        want.map(s => (s.docId, s.score)).toSeq,
        s"exclusion mode diverges on '$q' NOT '$ex'")
      // exclusion really excludes: no surviving doc carries the excluded term
      val exDocs = engine.search(ex, Int.MaxValue / 2).map(_.docId).toSet
      got.foreach(s => assert(!exDocs.contains(s.docId),
        s"doc ${s.docId} carries excluded term '$ex' ('$q')"))
      // and is a pure filter of the conjunction (same scores, subset docs)
      val conj = engine.searchConjunctive(q, 2000).map(s => s.docId -> s.score).toMap
      got.foreach(s => assert(conj.get(s.docId).contains(s.score),
        s"excluded-mode score for doc ${s.docId} not a conjunctive score ('$q')"))
    }
    // an excluded term absent from the dict is a no-op
    val q0 = s"${t(0)} ${t(1)}"
    assert(engine.searchConjunctive(q0, 10, exclude = "zzzqqqxxxnotaword").toSeq ==
      engine.searchConjunctive(q0, 10).toSeq)
    // excluding a required term empties the result
    assert(engine.searchConjunctive(q0, 10, exclude = t(0)).isEmpty)
    // the other physical strategies agree
    val pruned = new QueryEngine(spark, indexRoot,
      driverCacheBlocksThreshold = 0L)
    val distributed = new QueryEngine(spark, indexRoot,
      localPostingsThreshold = 0L, driverCacheBlocksThreshold = 0L)
    val (q, ex) = cases(1)
    val a = engine.searchConjunctive(q, 10, exclude = ex)
    assert(pruned.searchConjunctive(q, 10, exclude = ex).toSeq == a.toSeq,
      "pruned-scan exclusion strategy diverges")
    assert(distributed.searchConjunctive(q, 10, exclude = ex).toSeq == a.toSeq,
      "distributed exclusion strategy diverges")
  }

  test("searchDf resolves urls and preserves rank order") {
    val engine = new QueryEngine(spark, indexRoot)
    val df = engine.searchDf(t(100), 5).collect()
    assert(df.length == 5)
    assert(df.map(_.getInt(0)).toSeq == (1 to 5))
    assert(df.forall(_.getString(2).startsWith("https://")))
  }
}
