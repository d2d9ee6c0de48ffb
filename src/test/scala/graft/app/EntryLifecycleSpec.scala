package graft.app

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.query.Bm25Df

/** The two lifecycle driver rows (compaction_topk / timetravel_topk) against
  * an independent code path: the scan-path DataFrame BM25. The driver's
  * DuckDB oracle proves the same equalities at sf0.01; this spec pins them
  * at sf0.001 in sbt so a lifecycle regression fails before the driver runs.
  */
class EntryLifecycleSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def ranks(df: org.apache.spark.sql.DataFrame): Seq[(Int, Long)] = {
    import org.apache.spark.sql.functions.col
    df.select(col("rnk").cast("int"), col("doc_id").cast("long"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
  }
  private def scanRanks(df: org.apache.spark.sql.DataFrame): Seq[(Int, Long)] =
    df.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq

  test("compaction_topk: 2 appends + full compaction == scan-path BM25") {
    val got = ranks(EntryQueries.queries("compaction_topk")(spark, sfDir))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val want = scanRanks(
      Bm25Df.topK(docs, "doc_id", "text", "spark window the", 15))
    assert(got == want)
  }

  test("timetravel_topk: first-append snapshot == scan-path BM25 over the first half") {
    import org.apache.spark.sql.functions.{col, max}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val cut = docs.agg(max(col("doc_id"))).head.getLong(0) / 2
    val firstHalf = docs.filter(col("doc_id") < cut)
    // the pinned snapshot must be a REAL subset (time travel, not head)
    assert(firstHalf.count() < docs.count())
    val got = ranks(EntryQueries.queries("timetravel_topk")(spark, sfDir))
    val want = scanRanks(
      Bm25Df.topK(firstHalf, "doc_id", "text", "spark window the", 10))
    assert(got == want)
  }
}
