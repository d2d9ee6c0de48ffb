package graft.query

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.index.{IndexBuilder, IndexConfig}
import graft.krep.{KrepParams, functions => K}

/** Multibyte UTF-8 text through the FULL pipeline — build, BM25 search,
  * phrase (positional + byte-exact recheck), and the krep expressions over
  * the engine corpus. The engine is byte-oriented like the reference
  * (krep.h:49-53): UTF-8 continuation bytes are non-word bytes, so
  * multibyte runes act as token separators and all reported positions are
  * byte offsets. This spec pins that behavior end-to-end, including the one
  * subtle case: a phrase whose terms are positionally adjacent (the CJK run
  * between them contributes no token) but NOT byte-adjacent in the text —
  * the positional intersection admits it, the byte-exact literal recheck
  * must reject it.
  */
class MultibyteCorpusSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private val texts = Seq(
    "plain ascii words here aurora borealis",           // doc 0
    "café naïve résumé aurora 中文文本 borealis", // doc 1
    "emoji 😀 mixed aurora borealis töken grüße", // doc 2
    "aurora borealis plain tail")                       // doc 3

  private lazy val engine: QueryEngine = {
    import spark.implicits._
    val pages = texts.zipWithIndex.map { case (t, i) =>
      graft.corpus.Page(s"https://x/p/$i",
        new java.sql.Timestamp(1704067200000L + i), t.getBytes("UTF-8"), t, "en")
    }.toDS()
    val root = Files.createTempDirectory("graft-mb-").toString
    new IndexBuilder(spark, root,
      IndexConfig(blockSize = 16, docsPerSegment = 2, partitions = 2))
      .build(pages)
    new QueryEngine(spark, root)
  }

  test("term search spans multibyte docs; accented token splits at the rune") {
    assert(engine.search("aurora", 10).map(_.docId).sorted.toSeq == Seq(0L, 1L, 2L, 3L))
    // 'café' byte-tokenizes to 'caf' + separator ON BOTH SIDES — the query
    // goes through the same analyzer as the documents, so the accented query
    // finds the accented doc via its ASCII stem (same-analyzer discipline)
    assert(engine.search("caf", 10).map(_.docId).toSeq == Seq(1L))
    assert(engine.search("café", 10).map(_.docId).toSeq == Seq(1L))
  }

  test("phrase recheck is byte-exact: positionally-adjacent but CJK-separated doc rejected") {
    // doc 1 has no token between 'aurora' and 'borealis' (the CJK run is
    // all non-word bytes), so positions are adjacent — only the byte-exact
    // recheck can reject it; docs 0/2/3 contain the literal byte sequence
    assert(engine.searchPhrase("aurora borealis", 10).map(_.docId).sorted.toSeq ==
      Seq(0L, 2L, 3L))
  }

  test("krep positions report byte offsets on multibyte text") {
    import spark.implicits._
    val rows = engine.corpusDf
      .select($"docId", K.krep_contains($"text", "café").as("c"),
        K.krep_positions($"text", KrepParams(Seq("aurora"))).as("p"))
      .orderBy($"docId").collect()
    assert(rows.map(_.getBoolean(1)).toSeq == Seq(false, true, false, false))
    val starts = rows.map(
      _.getSeq[org.apache.spark.sql.Row](2).head.getInt(0).toLong)
    // doc0: 'aurora' at byte 23; doc1: after "café naïve résumé " = 22 bytes
    // (3 two-byte chars); doc2: after "emoji 😀 mixed " = 17 bytes (4-byte
    // emoji); doc3: offset 0
    assert(starts.toSeq == Seq(23L, 22L, 17L, 0L))
  }
}
