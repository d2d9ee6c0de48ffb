package graft.streaming

import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.corpus.Page
import graft.index.{IceTable, IndexBuilder, IndexConfig, PostingBlock, Ranker, StepInfo}
import graft.krep.{functions => K}

/** Incremental index maintenance (SURVEY.md §2.8): new pages append new
  * posting blocks; nothing already written is rewritten except the small
  * dict/stats tables.
  *
  * This works because posting blocks carry stats-independent bounds
  * (maxTf/minDl) instead of baked max-scores: BM25 idf/avgdl are resolved at
  * query time from the CURRENT snapshot, so appending documents only shifts
  * scores through the (N, df, avgdl) statistics — exactly as a batch rebuild
  * over the grown corpus would.
  *
  * Streaming surface: `start` wires readStream → watermark on warc_ts →
  * dropDuplicates(url) within the watermark → foreachBatch(appendBatch).
  * Each micro-batch commits one atomic snapshot; a crash between batches
  * resumes from the checkpoint + last snapshot (both idempotent).
  */
final class StreamingIndexer(spark: SparkSession, root: String,
    cfg: IndexConfig = IndexConfig()) {

  import spark.implicits._

  val ice = new IceTable(root, spark.sparkContext.hadoopConfiguration)

  /** Bootstrap an empty index layout if this root has no snapshot yet. */
  def ensureInitialized(): Unit = {
    if (ice.currentSnapshotId.isEmpty) {
      new IndexBuilder(spark, root, cfg)
        .build(spark.emptyDataset[Page])
    }
  }

  /** Append one batch of pages. Idempotent per batch content: urls already
    * in the index are dropped (exactly-once per url under redelivery).
    */
  def appendBatch(batch: Dataset[Page]): Unit = synchronized {
    ensureInitialized()
    val docsPath = ice.tablePath("docs")
    val existingDocs = spark.read.parquet(docsPath)
    val baseN = ice.completedSteps("docs").rowCount
    val maxTermId = ice.completedSteps("dict").rowCount // termIds are 0-based dense

    // dedupe within batch and against the index (left anti join on url)
    val fresh = batch.dropDuplicates("url")
      .join(existingDocs.select($"url"), Seq("url"), "left_anti")
      .select($"url", $"text")
    if (fresh.isEmpty) return

    // new docIds continue the dense sequence: baseN + rank(url within batch)
    val ranked = Ranker.denseIdsByKey(fresh, "url", "batchRank", cfg.partitions)
      .withColumn("docId", $"batchRank" + lit(baseN)).drop("batchRank")

    val corpusDelta = ranked.select($"docId", $"url",
      size(K.krep_tokenize($"text")).as("dl"), $"text")
    corpusDelta.write.mode(SaveMode.Append).parquet(ice.tablePath("corpus"))
    corpusDelta.select($"docId", $"url", $"dl")
      .write.mode(SaveMode.Append).parquet(docsPath)

    val tfDelta = corpusDelta
      .select($"docId", $"dl", explode(K.krep_term_positions($"text")).as("t"))
      .select($"docId", $"t.term".as("term"),
        size($"t.pos").as("tf"), $"dl", $"t.pos".as("pos"))
    tfDelta.write.mode(SaveMode.Append).parquet(ice.tablePath("tfrows"))

    // dict: merge delta df/cf into existing entries; brand-new terms extend
    // the dense termId range (rank over new terms). dict is tiny relative to
    // the corpus — the only table rewritten per batch.
    val dictPath = ice.tablePath("dict")
    val oldDict = spark.read.parquet(dictPath)
      .select($"termId", $"term", $"df", $"cf").cache()
    val deltaAgg = tfDelta.groupBy($"term")
      .agg(count(lit(1)).as("ddf"), sum($"tf").as("dcf"))
    val merged = oldDict.join(deltaAgg, Seq("term"), "full_outer")
    val known = merged.filter($"termId".isNotNull)
      .select($"termId", $"term",
        ($"df" + coalesce($"ddf", lit(0L))).as("df"),
        ($"cf" + coalesce($"dcf", lit(0L))).as("cf"))
    val newTerms = Ranker.denseIdsByKey(
      merged.filter($"termId".isNull).select($"term", $"ddf", $"dcf"),
      "term", "newRank", cfg.partitions)
      .select(($"newRank" + lit(maxTermId)).as("termId"), $"term",
        $"ddf".as("df"), $"dcf".as("cf"))
    val newDict = known.unionByName(newTerms).cache()
    newDict.count() // materialize before overwriting the source
    newDict.write.mode(SaveMode.Overwrite).parquet(dictPath + ".tmp")
    spark.read.parquet(dictPath + ".tmp").write.mode(SaveMode.Overwrite)
      .parquet(dictPath)
    oldDict.unpersist(); newDict.unpersist()

    // postings delta: same shape as the batch build, appended
    val dictJ = broadcast(spark.read.parquet(dictPath).select($"termId", $"term"))
    val rows = tfDelta.join(dictJ, "term")
      .select($"termId", $"docId", $"tf".cast("int"), $"dl".cast("int"), $"pos")
      .as[(Long, Long, Int, Int, Array[Int])]
      .repartition(cfg.partitions, $"termId", floor($"docId" / cfg.docsPerSegment))
      .sortWithinPartitions($"termId", $"docId")
    IndexBuilder.encodeBlocks(rows, cfg.blockSize, cfg.docsPerSegment)
      .toDF().write.mode(SaveMode.Append).parquet(ice.tablePath("postings"))

    // stats + atomic snapshot commit (per-partition lineage rederived from
    // the committed files, so it stays correct across appends)
    val docsNow = spark.read.parquet(docsPath)
    docsNow.agg(count(lit(1)).as("n"), avg($"dl").as("avgdl"))
      .write.mode(SaveMode.Overwrite).parquet(ice.tablePath("stats") + ".tmp")
    spark.read.parquet(ice.tablePath("stats") + ".tmp")
      .write.mode(SaveMode.Overwrite).parquet(ice.tablePath("stats"))

    Seq("corpus", "docs", "tfrows", "dict", "postings", "stats").foreach { t =>
      val lineage = ice.parquetLineage(t)
      ice.commitStep(StepInfo(t, ice.tablePath(t),
        lineage.map(_._2).sum, lineage, Map("appended" -> "true")))
    }
  }

  /** Continuous ingestion from a parquet directory of Page rows. */
  def start(inputDir: String, checkpointDir: String,
      watermark: String = "1 hour"): StreamingQuery = {
    spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Page]].schema)
      .parquet(inputDir)
      .as[Page]
      .withWatermark("warc_ts", watermark)
      .dropDuplicates("url")
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Page], _: Long) => appendBatch(batch) }
      .start()
  }
}
