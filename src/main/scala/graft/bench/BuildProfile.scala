package graft.bench

import org.apache.spark.sql.SparkSession

import graft.corpus.SynthWebText
import graft.index.{IceTable, IndexBuilder, IndexConfig}

/** Per-step wall-time decomposition of the three index builds the driver
  * bench times (engine build at GRAFT_BENCH_DOCS docs, the shared EntryQueries
  * index, the lifecycle append+append+compact index) — the bench's three
  * biggest line items. Step timings come from the elapsedSec metric each
  * IceTable step commit records.
  *
  * Usage: runMain graft.bench.BuildProfile [nDocs] [sfDir]
  */
object BuildProfile {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(50000L)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("graft-build-profile").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[buildprofile] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // warmup: tiny build exercises codegen/classloading so the profiled
    // build measures steady state, same as the bench's untimed first action
    val warmRoot = graft.Bench.benchTmpDir("graft-bp-warm-")
    new IndexBuilder(spark, s"$warmRoot/idx", IndexConfig(partitions = 4))
      .build(SynthWebText.pages(spark, 500, numPartitions = 4))
    graft.Bench.deleteRec(warmRoot)

    // the engine-bench build: materialized corpus parquet, then build
    val pagesPath = timed("materialize corpus parquet") {
      graft.Bench.materializeCorpus(spark, nDocs, cpus.toInt)
    }
    val root = graft.Bench.benchTmpDir("graft-bp-")
    try {
      val pages = spark.read.parquet(pagesPath).as[graft.corpus.Page]
      timed(s"engine build total ($nDocs docs)") {
        new IndexBuilder(spark, root, IndexConfig(partitions = cpus.toInt))
          .build(pages)
      }
      val ice = new IceTable(root, spark.sparkContext.hadoopConfiguration)
      ice.completedSteps.foreach { case (name, info) =>
        println(f"[buildprofile]   step $name%-12s ${info.metrics.getOrElse("elapsedSec", "?")}%8s s  (${info.rowCount} rows, ${info.files.size} files)")
      }
    } finally {
      graft.Bench.deleteRec(root)
      graft.Bench.deleteRec(new java.io.File(pagesPath).getParent)
    }

    // the two EntryQueries prebuilds the bench reports as their own metrics
    val shared = timed("prebuildSharedIndex(sf)") {
      graft.app.EntryQueries.prebuildSharedIndex(spark, sfDir)
    }
    val lifecycle = timed("prebuildLifecycleIndex(sf)") {
      graft.app.EntryQueries.prebuildLifecycleIndex(spark, sfDir)
    }
    println(f"[buildprofile] shared=$shared%.2f s lifecycle=$lifecycle%.2f s")
    spark.stop()
  }
}
