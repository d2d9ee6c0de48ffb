package graft.bench

import org.apache.spark.sql.SparkSession

import graft.Bench

/** Two-cluster-size scaling evidence (north rule: ≥0.8 efficiency from N to
  * 4N executors). No real cluster exists in this sandbox, so the same job —
  * identical input, identical config — runs at local[8] and local[32]; the
  * report is throughput at both plus efficiency = T(32) / (4 · T(8)).
  *
  * Usage: runMain graft.bench.ScalingBench [nDocs] [low] [high]
  */
object ScalingBench {

  private def session(cpus: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-scaling-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val nDocs = args.lift(0).map(_.toLong).getOrElse(100000L)
    val low = args.lift(1).map(_.toInt).getOrElse(8)
    val high = args.lift(2).map(_.toInt).getOrElse(32)

    // JVM/classloader warmup + shared input corpus (identical for both runs)
    val w = session(low)
    Bench.engineBench(w, 2000L, low, repeats = 1)
    val pagesPath = Bench.materializeCorpus(w, nDocs, 32)
    w.stop()

    // high level first: the low level then runs on the warmer page cache,
    // biasing the measured efficiency DOWN (conservative)
    val results = Seq(high, low).map { cpus =>
      val s = session(cpus)
      val r = Bench.engineBench(s, nDocs, cpus, repeats = 2, pagesPath = pagesPath)
      s.stop()
      val m = r.metrics
      println(f"[scaling] local[$cpus]: build=${m("index_build_sec")}%.1fs " +
        f"docs/s=${m("docs_per_sec")}%.0f qps=${m("queries_per_sec")}%.2f " +
        f"p50=${m("query_p50_ms")}%.0fms p95=${m("query_p95_ms")}%.0fms " +
        s"checksum=${r.resultsChecksum}")
      cpus -> r
    }.toMap
    val metrics = results.map { case (c, r) => c -> r.metrics }
    val invariant = results(low).resultsChecksum == results(high).resultsChecksum
    println(s"[scaling] parallelism-invariance (identical top-k docIds+scores " +
      s"at local[$low] vs local[$high]): " + (if (invariant) "OK" else "VIOLATED"))

    val effBuild = metrics(high)("docs_per_sec") /
      ((high.toDouble / low) * metrics(low)("docs_per_sec"))
    val effQuery = metrics(high)("queries_per_sec") /
      ((high.toDouble / low) * metrics(low)("queries_per_sec"))
    println(f"[scaling] nDocs=$nDocs build-efficiency($low→$high)=$effBuild%.3f " +
      f"query-efficiency=$effQuery%.3f")
    println(
      s"""{"nDocs":$nDocs,"low":$low,"high":$high,""" +
        s""""docs_per_sec_low":${metrics(low)("docs_per_sec")},""" +
        s""""docs_per_sec_high":${metrics(high)("docs_per_sec")},""" +
        s""""qps_low":${metrics(low)("queries_per_sec")},""" +
        s""""qps_high":${metrics(high)("queries_per_sec")},""" +
        s""""p95_ms_high":${metrics(high)("query_p95_ms")},""" +
        s""""build_efficiency":$effBuild,"query_efficiency":$effQuery,""" +
        s""""parallelism_invariant":$invariant}""")
  }
}
