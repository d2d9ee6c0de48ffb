package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.{IndexCompactor, IndexConfig}
import graft.streaming.StreamingIndexer

/** Phase decomposition of the lifecycle (append+append+compact) index build
  * behind compaction_topk / timetravel_topk — the bench's biggest single
  * line item after round 6's build work.
  *
  * Usage: runMain graft.bench.LifecycleProfile [sfDir]
  */
object LifecycleProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("graft-lifecycle-profile").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[lcprofile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // warmup pass — same shape, throwaway root
    def once(label: String): Unit = {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val cut = docs.agg(max($"doc_id")).head.getLong(0) / 2
      def pages(d: DataFrame) = d.select(
        format_string("doc%08d", $"doc_id").as("url"),
        lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).as("warc_ts"),
        encode($"text", "UTF-8").as("html"),
        $"text", $"lang").as[graft.corpus.Page]
      val root = graft.Bench.benchTmpDir(s"graft-lcp-$label-")
      val cfg = IndexConfig(blockSize = 64, docsPerSegment = 512,
        partitions = 8)
      val indexer = new StreamingIndexer(spark, root, cfg)
      timed(s"$label ensureInitialized")(indexer.ensureInitialized())
      timed(s"$label append 1")(
        indexer.appendBatch(pages(docs.filter($"doc_id" < cut))))
      timed(s"$label append 2")(
        indexer.appendBatch(pages(docs.filter($"doc_id" >= cut))))
      timed(s"$label blocks count")(
        indexer.ice.readTable(spark, "postings").count())
      timed(s"$label compactPostings")(
        new IndexCompactor(spark, root, cfg).compactPostings())
      timed(s"$label engines")(
        (new graft.query.QueryEngine(spark, root)).stats)
      graft.Bench.deleteRec(root)
    }
    once("warm")
    once("run1")
    once("run2")
    spark.stop()
  }
}
