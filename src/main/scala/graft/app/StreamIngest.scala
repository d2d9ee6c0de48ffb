package graft.app

import org.apache.spark.sql.SparkSession

import graft.index.IndexConfig
import graft.streaming.StreamingIndexer

/** Continuous index maintenance entry point (spark-submit-able).
  *
  * {{{
  *   spark-submit --class graft.app.StreamIngest ... \
  *     <indexRoot> <pagesInputDir> <checkpointDir> [--watermark "1 hour"] [--once]
  * }}}
  *
  * Watches `pagesInputDir` for new Page parquet files, deduplicates by url
  * within the watermark, and appends each micro-batch to the index under an
  * atomic snapshot. `--once` processes everything currently available and
  * exits (cron-style incremental refresh); without it the query runs until
  * terminated, resuming from the checkpoint + last snapshot after a crash.
  */
object StreamIngest {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: StreamIngest <indexRoot> <pagesInputDir> <checkpointDir> [--watermark W] [--once]")
    val Array(root, inputDir, checkpointDir) = args.take(3)
    val watermark = args.sliding(2).collectFirst {
      case Array("--watermark", w) => w
    }.getOrElse("1 hour")
    val once = args.contains("--once")

    val spark = withDefaultMaster(SparkSession.builder()
      .appName("graft-stream-ingest"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val indexer = new StreamingIndexer(spark, root, IndexConfig())
    val query = indexer.start(inputDir, checkpointDir, watermark)
    if (once) {
      query.processAllAvailable()
      query.stop()
      println(s"[stream-ingest] processed available input; snapshot=" +
        indexer.ice.currentSnapshotId.getOrElse(-1L))
    } else {
      println(s"[stream-ingest] running; checkpoint=$checkpointDir")
      query.awaitTermination()
    }
    spark.stop()
  }
}
