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
  *
  * Late-row caveat (standard event-time semantics, stated because it is
  * silent): the url dedup keys its state on the `warc_ts` watermark, so
  * rows older than (max event time seen − watermark) are dropped as LATE
  * before they reach the index. Incremental batches must carry fresh crawl
  * timestamps; for a backfill of old-timestamped pages, widen
  * `--watermark` to cover the backfill's age (state grows with the window)
  * or batch-append via [[graft.streaming.StreamingIndexer.appendBatch]]
  * directly. The `--once` summary prints docs before → after so a
  * silently-dropped batch is visible in the log.
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
    def docCount: Long =
      if (indexer.ice.currentSnapshotId.isEmpty) 0L
      else indexer.ice.completedSteps.get("docs").map(_.rowCount).getOrElse(0L)
    val before = docCount
    val query = indexer.start(inputDir, checkpointDir, watermark)
    if (once) {
      query.processAllAvailable()
      query.stop()
      val after = docCount
      println(s"[stream-ingest] processed available input; snapshot=" +
        indexer.ice.currentSnapshotId.getOrElse(-1L) +
        s" docs=$before->$after (+${after - before};" +
        " rows older than the stored watermark are dropped as late, see scaladoc)")
    } else {
      println(s"[stream-ingest] running; checkpoint=$checkpointDir")
      query.awaitTermination()
    }
    spark.stop()
  }
}
