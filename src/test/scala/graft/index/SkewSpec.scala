package graft.index

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.corpus.SynthWebText

/** SURVEY.md §7.2 step 4: measured (not argued) evidence that the postings
  * exchange bounds hot-term skew. The (termId, docId-segment) hash
  * partitioning must (a) split the Zipf-head term across many partitions and
  * (b) keep the max partition within a small factor of the median — the
  * property that makes the build plan survive "the" at 10^12 docs.
  */
class SkewSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("hot term splits across partitions; partition row sizes bounded (max <= 3x median)") {
    import spark.implicits._
    val nDocs = 12000L
    val parts = 16
    val root = Files.createTempDirectory("graft-skew-").toString
    val pages = SynthWebText.pages(spark, nDocs, numPartitions = 4)
    new IndexBuilder(spark, root,
      IndexConfig(blockSize = 64, docsPerSegment = 256, partitions = parts))
      .build(pages)

    // one written file per exchange partition → per-file posting-row sums
    // ARE the partition-size histogram
    val post = spark.read.parquet(s"$root/data/postings")
    val sizes = post.groupBy(input_file_name().as("f"))
      .agg(sum($"n").as("rows"))
      .select($"rows").as[Long].collect().sorted
    assert(sizes.length == parts, s"expected $parts partition files, got ${sizes.length}")
    val median = sizes(sizes.length / 2)
    assert(sizes.last <= 3 * median,
      s"skewed postings partitions: max=${sizes.last} median=$median " +
        s"(histogram: ${sizes.mkString(",")})")

    // the Zipf-head term (df ~ nDocs) must NOT sit in one partition: its
    // segments hash across the exchange
    val hotId = spark.read.parquet(s"$root/data/dict")
      .filter($"term" === SynthWebText.term(0))
      .select($"termId").as[Long].head()
    val spread = post.filter($"termId" === hotId)
      .select(input_file_name()).distinct().count()
    assert(spread >= parts / 2,
      s"hot term confined to $spread of $parts partitions")
  }
}
