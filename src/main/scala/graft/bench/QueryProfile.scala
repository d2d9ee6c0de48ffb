package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** Stage-by-stage wall-time decomposition of the ngram_jaccard / minhash
  * pipeline — the driver bench's slowest row. Each stage is forced with its
  * own count() so the timing attributes work to the stage that performs it
  * (persist barriers make the attribution exact).
  *
  * Usage: runMain graft.bench.QueryProfile /root/testdata/sf0.1
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-query-profile").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    timed("docs count (warm parquet)")(docs.count())

    val hashed = docs
      .select($"doc_id", TextOps.shingleHashesPoly($"text").as("hs")).persist()
    timed("shingle poly-hashes")(hashed.count())

    val d = hashed.select($"doc_id",
      TextOps.minhashPolyFromHashes($"hs", k = 32).as("sig")).persist()
    timed("minhash 32-slot sigs")(d.count())

    val sh = docs
      .select($"doc_id", TextOps.shingles($"text", 3).as("sh")).persist()
    timed("shingle string arrays")(sh.count())

    val banded = d.select($"doc_id",
      posexplode(array((0 until 8).map(b =>
        TextOps.bandHashPoly($"sig", b, 4)): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bhash")
    val pairs = banded.select($"band", $"bhash", $"doc_id".as("id_a"))
      .join(banded.select($"band", $"bhash", $"doc_id".as("id_b")),
        Seq("band", "bhash"))
      .filter($"id_a" < $"id_b")
      .select($"id_a", $"id_b")
      .dropDuplicates("id_a", "id_b").persist()
    val nPairs = timed("band join + pair dedup")(pairs.count())
    println(s"[profile] candidate pairs: $nPairs")

    val rescored = pairs
      .join(sh.select($"doc_id".as("id_a"), $"sh".as("sa")), "id_a")
      .join(sh.select($"doc_id".as("id_b"), $"sh".as("sb")), "id_b")
      .select($"id_a", $"id_b", TextOps.jaccardBps($"sa", $"sb").as("j_bps"))
      .orderBy($"id_a", $"id_b")
    timed("exact rescore + sort")(rescored.count())

    // second run of the full pipeline cold (no persisted inputs), the way
    // Bench times it when no earlier query warmed the cache
    spark.catalog.clearCache()
    timed("FULL pipeline cold") {
      val h2 = docs.select($"doc_id",
        TextOps.shingleHashesPoly($"text").as("hs")).persist()
      val d2 = h2.select($"doc_id",
        TextOps.minhashPolyFromHashes($"hs", k = 32).as("sig")).persist()
      val sh2 = docs.select($"doc_id", TextOps.shingles($"text", 3).as("sh")).persist()
      val banded2 = d2.select($"doc_id",
        posexplode(array((0 until 8).map(b =>
          TextOps.bandHashPoly($"sig", b, 4)): _*)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bhash")
      banded2.select($"band", $"bhash", $"doc_id".as("id_a"))
        .join(banded2.select($"band", $"bhash", $"doc_id".as("id_b")),
          Seq("band", "bhash"))
        .filter($"id_a" < $"id_b")
        .select($"id_a", $"id_b").dropDuplicates("id_a", "id_b")
        .join(sh2.select($"doc_id".as("id_a"), $"sh".as("sa")), "id_a")
        .join(sh2.select($"doc_id".as("id_b"), $"sh".as("sb")), "id_b")
        .select($"id_a", $"id_b", TextOps.jaccardBps($"sa", $"sb").as("j_bps"))
        .orderBy($"id_a", $"id_b").count()
    }
    spark.stop()
  }
}
