package graft.bench

import org.apache.spark.sql.SparkSession

import graft.Bench
import graft.index.{IceTable, IndexBuilder, IndexConfig}

/** Diagnostic: per-step index-build wall times at one parallelism level —
  * which stage stops scaling decides where to cut memory traffic. Run pinned:
  *
  *   taskset -c 0-31 sbt "runMain graft.bench.StepScaling 300000 32"
  *   taskset -c 0-7  sbt "runMain graft.bench.StepScaling 300000 8"
  *
  * Prints one JSON line with each committed step's elapsedSec (read back from
  * the IceTable snapshot metrics — the same lineage the resume path uses).
  */
object StepScaling {
  def main(args: Array[String]): Unit = {
    val nDocs = args.lift(0).map(_.toLong).getOrElse(300000L)
    val cpus = args.lift(1).map(_.toInt).getOrElse(32)

    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-steps-$cpus")
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

    // warmup (JIT, classloading, page cache)
    Bench.engineBench(spark, 2000L, cpus, repeats = 1)
    spark.read.parquet(pagesPath).selectExpr("sum(octet_length(html))").collect()

    val steal0 = Bench.stealTicks()
    val wall0 = System.nanoTime()
    val root = Bench.benchTmpDir("graft-steps-")
    val pages = spark.read.parquet(pagesPath).as[graft.corpus.Page]
    val t0 = System.nanoTime()
    new IndexBuilder(spark, root, IndexConfig(partitions = cpus)).build(pages)
    val buildSec = (System.nanoTime() - t0) / 1e9
    val ice = new IceTable(root, spark.sparkContext.hadoopConfiguration)
    val steps = ice.completedSteps.toSeq.map { case (name, info) =>
      s""""$name":${info.metrics.getOrElse("elapsedSec", "-1")}"""
    }.mkString(",")
    val steal1 = Bench.stealTicks()
    val stealRate = if (steal0 < 0 || steal1 < 0) -1.0
      else (steal1 - steal0) / ((System.nanoTime() - wall0) / 1e9)
    Bench.deleteRec(root)
    println(f"""{"level":$cpus,"nDocs":$nDocs,"build_sec":$buildSec%.3f,""" +
      f""""steal_ticks_per_sec":$stealRate%.1f,"steps":{$steps}}""")
    spark.stop()
  }
}
