package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.corpus.SynthWebText
import graft.index.{IceTable, IndexConfig}

/** The nastiest append edge: a crash during the FIRST append after an empty
  * bootstrap. The committed tables are empty, so any reader falling back to
  * a live directory listing would see the crashed batch's orphan files and
  * the retry's url anti-join would drop the whole batch (silent data loss).
  */
class FirstAppendCrashSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val cfg = IndexConfig(blockSize = 32, docsPerSegment = 128,
    partitions = 2)

  test("crash during the FIRST append: retry ingests the full batch") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-first-").toString
    val ix = new StreamingIndexer(spark, root, cfg)
    ix.ensureInitialized()
    val ice = new IceTable(root, spark.sparkContext.hadoopConfiguration)

    // the empty bootstrap must still commit schema-bearing manifests —
    // the committed file list is what shields readers from orphans
    assert(ice.completedSteps.keySet ==
      Set("corpus", "docs", "stats", "tfrows", "dict", "postings"))

    def batch = spark.range(0L, 200L, 1, 2).map(i => SynthWebText.page(i))
    val e = intercept[RuntimeException] {
      ix.appendBatch(batch, crashBefore = Some("commit"))
    }
    assert(e.getMessage.contains("injected crash"))

    // committed docs still empty, despite orphan files in the directory
    assert(ice.readTable(spark, "docs").count() == 0L)

    // retry must ingest all 200 urls (a dir-listing fallback would see the
    // orphans and anti-join everything away)
    ix.appendBatch(batch)
    assert(ice.completedSteps("docs").rowCount == 200L)
    assert(ice.readTable(spark, "docs").select($"url").distinct().count() == 200L)
    val hits = new graft.query.QueryEngine(spark, root)
      .search(SynthWebText.Markers(0), 10)
    assert(hits.nonEmpty)
  }
}
