package graft.query

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.corpus.SynthWebText
import graft.index.{BlockCodec, IndexBuilder, IndexConfig, PosPostingBlock}

class PhraseSearchSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  // --- codec ---------------------------------------------------------------

  test("position-list codec roundtrip (jagged, empty, cross-byte deltas)") {
    val lists = Array(Array(0), Array(3, 4, 200, 5000), Array[Int](),
      Array(7, 8, 9), Array(1000000))
    val tfs = lists.map(_.length)
    val enc = BlockCodec.encodePosLists(lists)
    val dec = BlockCodec.decodePosLists(enc, tfs)
    assert(dec.map(_.toSeq).toSeq == lists.map(_.toSeq).toSeq)
  }

  // --- adjacency predicate ---------------------------------------------------

  test("positionsMatch: simple bigram adjacency") {
    // phrase "a b": slot 0 = a at offset 0, slot 1 = b at offset 1
    val offs = Array(Array(0), Array(1))
    assert(PhraseSearch.positionsMatch(Array(Array(4, 9), Array(5)), offs))
    assert(!PhraseSearch.positionsMatch(Array(Array(4, 9), Array(6)), offs))
    // b just before a is NOT a match for "a b"
    assert(!PhraseSearch.positionsMatch(Array(Array(4), Array(3)), offs))
  }

  test("positionsMatch: repeated token phrase 'x x' needs consecutive pair") {
    val offs = Array(Array(0, 1)) // one slot, two offsets
    assert(PhraseSearch.positionsMatch(Array(Array(2, 3, 7)), offs))
    assert(!PhraseSearch.positionsMatch(Array(Array(2, 4, 7)), offs))
  }

  test("positionsMatch: trigram with middle term hot") {
    // phrase "a b c"
    val offs = Array(Array(0), Array(1), Array(2))
    val ok = Array(Array(10), Array(1, 5, 11, 30), Array(12))
    val no = Array(Array(10), Array(1, 5, 11, 30), Array(13))
    assert(PhraseSearch.positionsMatch(ok, offs))
    assert(!PhraseSearch.positionsMatch(no, offs))
  }

  // --- segment kernel --------------------------------------------------------

  /** Hand-build one term's blocks (blockSize chosen to force block splits). */
  private def mkBlocks(termId: Long, segId: Long,
      postings: Seq[(Long, Int, Array[Int])], blockSize: Int)
      : Array[PosPostingBlock] =
    postings.grouped(blockSize).map { grp =>
      val docs = grp.map(_._1).toArray
      val tfs = grp.map(_._2).toArray
      val dls = grp.map(_._3.length * 10 + 80).toArray // arbitrary dl
      PosPostingBlock(termId, segId, docs.head, docs.last, grp.size,
        tfs.max, dls.min,
        BlockCodec.encodeDeltaLongs(docs), BlockCodec.encodeInts(tfs),
        BlockCodec.encodeInts(dls),
        BlockCodec.encodePosLists(grp.map(_._3).toArray))
    }.toArray

  test("segmentMatches: zipper intersection + adjacency across block splits") {
    // term A in docs 1,2,3,5,8; term B in docs 2,3,8,9. Adjacent only in 2, 8.
    val a = mkBlocks(100L, 0L, Seq(
      (1L, 1, Array(0)), (2L, 2, Array(4, 20)), (3L, 1, Array(7)),
      (5L, 1, Array(2)), (8L, 1, Array(0))), blockSize = 2)
    val b = mkBlocks(200L, 0L, Seq(
      (2L, 1, Array(5)), (3L, 1, Array(9)), (8L, 2, Array(1, 6)),
      (9L, 1, Array(0))), blockSize = 2)
    assert(a.length == 3 && b.length == 2, "expected multi-block inputs")
    val got = PhraseSearch.segmentMatches(
      Array(a, b), Array(Array(0), Array(1)),
      idfs = Array(1.5, 2.5), avgdl = 100.0).toArray
    assert(got.map(_._1).toSeq == Seq(2L, 8L))
    // score = sum of slot addends, ascending slot order
    val want2 = Bm25.addend(1.5, 2, 100, 100.0) + Bm25.addend(2.5, 1, 90, 100.0)
    assert(got(0)._2 == want2)
  }

  test("segmentMatches: empty slot means empty result") {
    val a = mkBlocks(100L, 0L, Seq((1L, 1, Array(0))), 4)
    val got = PhraseSearch.segmentMatches(
      Array(a, Array.empty[PosPostingBlock]),
      Array(Array(0), Array(1)), Array(1.0, 1.0), 100.0)
    assert(got.isEmpty)
  }

  // --- scale shape: hot-term phrase without a posting-sized shuffle ----------

  test("hot-term phrase on 20k docs: distributed path shuffles blocks, not postings") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val nDocs = 20000L
    val pages = SynthWebText.pages(spark, nDocs, numPartitions = 4).cache()
    val root = Files.createTempDirectory("graft-phrase-").toString
    new IndexBuilder(spark, root,
      IndexConfig(blockSize = 64, docsPerSegment = 2048, partitions = 4))
      .build(pages)

    // force the distributed strategy (the 10^12-doc route)
    val engine = new QueryEngine(spark, root,
      localPostingsThreshold = 0L, driverCacheBlocksThreshold = 0L)
    val t0 = SynthWebText.term(0) // in nearly every doc (Zipf head)
    val tCold = SynthWebText.term(2000)
    val phrase = s"$t0 $tCold"

    val shuffleRecords = new AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null)
          shuffleRecords.addAndGet(m.shuffleWriteMetrics.recordsWritten)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val got = try {
      val r = engine.searchPhrase(phrase, 10)
      Thread.sleep(1500) // listener bus is async; let task-end events drain
      r
    } finally spark.sparkContext.removeSparkListener(listener)

    // oracle: literal contains + full BM25 ranking (same as IndexQuerySpec)
    val ranked = graft.index.Ranker.denseIdsByKey(
      pages.select($"url", $"text"), "url", "docId", 4)
    val phraseDocs = ranked.filter($"text".contains(phrase))
      .select($"docId").as[Long].collect().toSet
    val allScores = NaiveSearch.topK(spark, pages, phrase, nDocs.toInt, 4)
    val want = allScores.filter(s => phraseDocs.contains(s.docId)).take(10)
    assert(got.map(s => (s.docId, s.score)).toSeq ==
      want.map(s => (s.docId, s.score)).toSeq, s"phrase '$phrase' diverges")
    assert(got.nonEmpty, "expected at least one true phrase hit at 20k docs")

    // the hot term's postings (≈ df(t0) ≈ nDocs rows) must NOT be shuffled:
    // only compressed blocks (≈ df/blockSize) + the tiny recheck move
    val hotDf = nDocs // upper bound on df(t0)
    assert(shuffleRecords.get() < hotDf / 4,
      s"phrase query shuffled ${shuffleRecords.get()} records — " +
        "posting-sized exchange detected")
    pages.unpersist()
  }
}
