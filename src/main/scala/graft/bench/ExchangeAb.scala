package graft.bench

import org.apache.spark.sql.SparkSession

import graft.Bench
import graft.index.{IndexBuilder, IndexConfig}

/** Controlled A/B of the slim postings exchange (round 5: tf/dl dropped from
  * the build's widest shuffle) against the dl-carrying fat exchange — both
  * modes alternated in ONE warmed JVM over the same materialized corpus, so
  * host weather hits both sides roughly equally and JVM/page-cache state is
  * shared. Prints one JSON line with each build's wall and the per-mode
  * medians. Run pinned:
  *
  *   taskset -c 0-7 sbt "runMain graft.bench.ExchangeAb 300000 8 3"
  */
object ExchangeAb {
  def main(args: Array[String]): Unit = {
    val nDocs = args.lift(0).map(_.toLong).getOrElse(300000L)
    val cpus = args.lift(1).map(_.toInt).getOrElse(8)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)

    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-exchange-ab-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-spark-local"
        else System.getProperty("java.io.tmpdir"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = if (new java.io.File("/dev/shm").isDirectory) "/dev/shm" else "/tmp"
    val pagesPath = s"$base/graft-bench-pages-$nDocs/pages.parquet"
    if (!new java.io.File(pagesPath).exists())
      graft.corpus.SynthWebText.pages(spark, nDocs, numPartitions = 32)
        .write.mode("overwrite").parquet(pagesPath)

    Bench.engineBench(spark, 2000L, cpus, repeats = 1) // JIT/classloader warmup
    spark.read.parquet(pagesPath).selectExpr("sum(octet_length(html))").collect()
    val pages = spark.read.parquet(pagesPath).as[graft.corpus.Page]

    def build(slim: Boolean): Double = {
      val root = Bench.benchTmpDir("graft-ab-")
      System.gc()
      val t0 = System.nanoTime()
      new IndexBuilder(spark, root, IndexConfig(partitions = cpus,
        dlBroadcastMaxDocs = if (slim) Long.MaxValue else 0L)).build(pages)
      val sec = (System.nanoTime() - t0) / 1e9
      Bench.deleteRec(root)
      sec
    }

    build(slim = true) // one untimed warm build (shuffle dirs, codegen)
    val steal0 = Bench.stealTicks()
    val wall0 = System.nanoTime()
    // fat first in each rep: if weather drifts monotonically it penalizes
    // the MODES symmetrically across the alternation
    val walls = (0 until reps).flatMap { _ =>
      Seq("fat" -> build(slim = false), "slim" -> build(slim = true))
    }
    val stealRate = {
      val s1 = Bench.stealTicks()
      if (steal0 < 0 || s1 < 0) -1.0
      else (s1 - steal0) / ((System.nanoTime() - wall0) / 1e9)
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; s(s.length / 2)
    }
    val fat = walls.collect { case ("fat", w) => w }
    val slim = walls.collect { case ("slim", w) => w }
    val seq = walls.map { case (m, w) => f"""["$m",$w%.2f]""" }.mkString(",")
    println(f"""{"nDocs":$nDocs,"level":$cpus,"walls":[$seq],""" +
      f""""fat_median_sec":${median(fat)}%.2f,"slim_median_sec":${median(slim)}%.2f,""" +
      f""""slim_over_fat":${median(slim) / median(fat)}%.3f,""" +
      f""""steal_ticks_per_sec":$stealRate%.1f}""")
    spark.stop()
  }
}
