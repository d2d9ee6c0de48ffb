package graft.app

import org.apache.spark.sql.SparkSession

import graft.index.{IceTable, IndexCompactor, IndexConfig}

/** Index maintenance entry point (spark-submit-able) — completes the CLI
  * lifecycle alongside [[IndexBuild]], [[StreamIngest]] and [[QuerySearch]].
  *
  * {{{
  *   spark-submit --class graft.app.IndexMaintain ... <indexRoot> \
  *     [--compact | --compact-selective minSplitFrac] \
  *     [--expire keepLastN] [--vacuum] [--blockSize B]
  * }}}
  *
  * Operations run in lifecycle order — compact, then expire, then vacuum —
  * because that is the order that reclaims space: compaction rewrites the
  * postings under a NEW snapshot, expiry drops the old snapshot-log entries,
  * and only then does vacuum see the pre-compaction files as unreferenced.
  * Each is safe with concurrent readers (they resolve committed snapshots);
  * vacuum must not run concurrently with an IN-FLIGHT append (its files are
  * unreferenced until commit) — schedule it between ingest batches, like
  * Iceberg's remove-orphan-files.
  */
object IndexMaintain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: IndexMaintain <indexRoot> [--compact | --compact-selective F]" +
        " [--expire keepN] [--vacuum] [--blockSize B]")
    val root = args(0)
    val rest = args.drop(1)
    def flagArg(flag: String): Option[String] =
      rest.sliding(2).collectFirst { case Array(`flag`, v) => v }
    val blockSize = flagArg("--blockSize").map(_.toInt).getOrElse(128)

    // conflicting compaction modes are a usage error, not a silent pick
    require(!(rest.contains("--compact") &&
        flagArg("--compact-selective").nonEmpty),
      "pass either --compact or --compact-selective, not both")

    val spark = withDefaultMaster(SparkSession.builder()
      .appName("graft-index-maintain"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ice = new IceTable(root, spark.sparkContext.hadoopConfiguration)
    val cfg = IndexConfig(blockSize = blockSize)

    // an uninitialized root must fail with a usage-level message, not a
    // bare NoSuchElementException out of the step map
    if (ice.currentSnapshotId.isEmpty || !ice.completedSteps.contains("postings")) {
      System.err.println(
        s"[maintain] no committed index found under $root — nothing to maintain")
      spark.stop()
      sys.exit(2)
    }

    if (rest.contains("--compact")) {
      val before = ice.completedSteps("postings").rowCount
      val snap = new IndexCompactor(spark, root, cfg).compactPostings()
      val after = ice.completedSteps("postings").rowCount
      println(s"[maintain] compact: blocks $before -> $after snapshot=$snap")
    } else flagArg("--compact-selective").foreach { f =>
      val before = ice.completedSteps("postings").rowCount
      val snap = new IndexCompactor(spark, root, cfg)
        .compactPostingsSelective(minSplitFrac = f.toDouble)
      val after = ice.completedSteps("postings").rowCount
      println(s"[maintain] compact-selective($f): blocks $before -> $after snapshot=$snap")
    }

    flagArg("--expire").foreach { keep =>
      val expired = ice.expireSnapshots(keepLast = keep.toInt)
      println(s"[maintain] expire(keepLast=$keep): removed ${expired.size} " +
        s"snapshots ${expired.mkString("[", ",", "]")}")
    }

    if (rest.contains("--vacuum")) {
      val tables = ice.completedSteps.keys.toSeq
      val deleted = tables.flatMap(t => ice.vacuum(t).map(p => s"$t:$p"))
      println(s"[maintain] vacuum: deleted ${deleted.size} orphan files" +
        (if (deleted.isEmpty) "" else deleted.mkString(" (", ", ", ")")))
    }
    spark.stop()
  }
}
