package graft.bench

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dump `.explain("formatted")` for every SparkEntry query to
  * `<outDir>/<query>_<tag>.txt` — the optimization round's before/after plan
  * evidence. Structure-only: nothing is executed beyond what a query's own
  * construction runs (index-mode queries build their shared index once).
  *
  * Usage: runMain graft.bench.PlanDump <outDir> <tag> [sfDir] [query...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r06")
    val tag = args.lift(1).getOrElse("before")
    val dir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val only = args.drop(3).toSet
    val spark = SparkSession.builder()
      .appName("graft-plan-dump").master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.isEmpty || only(name)) {
        val text =
          try {
            val df = fn(spark, dir)
            df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
          } catch { case e: Throwable => s"ERROR: ${e.getMessage}" }
        Files.write(Paths.get(outDir, s"${name}_$tag.txt"),
          text.getBytes("UTF-8"),
          StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
        println(s"[plandump] $name -> $outDir/${name}_$tag.txt")
      }
    }
    spark.stop()
  }
}
