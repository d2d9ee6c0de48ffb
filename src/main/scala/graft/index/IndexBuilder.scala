package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.corpus.Page
import graft.krep.{functions => K}

/** One compressed posting block: ≤ blockSize postings of one term, never
  * spanning a docId segment boundary. docIds delta+varint; tf/dl varint.
  * maxTf/minDl give the block's BM25 upper bound at query time (block-max
  * WAND) without baking corpus stats into the stored index.
  */
final case class PostingBlock(
    termId: Long,
    segId: Long,
    firstDoc: Long,
    lastDoc: Long,
    n: Int,
    maxTf: Int,
    minDl: Int,
    docs: Array[Byte],
    tfs: Array[Byte],
    dls: Array[Byte])

/** The stored posting-block row: [[PostingBlock]] plus the positional payload
  * `poss` (per-posting token-ordinal lists, delta+varint — lengths are the tf
  * values). Parquet is columnar, so the WAND path projects the PostingBlock
  * columns only and never reads `poss`; the phrase path reads the full row.
  */
final case class PosPostingBlock(
    termId: Long,
    segId: Long,
    firstDoc: Long,
    lastDoc: Long,
    n: Int,
    maxTf: Int,
    minDl: Int,
    docs: Array[Byte],
    tfs: Array[Byte],
    dls: Array[Byte],
    poss: Array[Byte])

object PostingBlock {
  /** Column list of the positions-free WAND projection. */
  val wandColumns: Seq[String] = Seq("termId", "segId", "firstDoc", "lastDoc",
    "n", "maxTf", "minDl", "docs", "tfs", "dls")
}

final case class IndexConfig(
    blockSize: Int = 128,
    docsPerSegment: Long = 1L << 16,
    partitions: Int = 32,
    // dict rows under this → broadcast hash join into postings build
    dictBroadcastThreshold: Long = 2000000L,
    // docs under this → dl travels to the block encoders as one broadcast
    // Int per doc (16M docs = 64 MB) and the postings exchange drops its
    // tf AND dl columns; above it, dl rides the exchange as before
    dlBroadcastMaxDocs: Long = 16000000L)

final case class IndexStats(n: Long, avgdl: Double)

/** Resumable inverted-index build (north rule): pages → docs → tfrows → dict
  * → stats → postings, each step an immutable Parquet table committed to the
  * [[IceTable]] snapshot log with per-partition lineage + metrics. A rerun
  * skips every committed step (kill-and-rerun converges to the same index).
  *
  * Scale notes (designed for 10^12 docs / 1000 executors, tested at
  * local[32]):
  *  - tf is computed PER ROW by `krep_term_freqs` (one custom expression),
  *    so the only wide exchange moves one row per (doc, distinct term), not
  *    one per token.
  *  - hot-term skew ("the" at 10^12 docs) is defused by range-partitioning
  *    postings on (termId, docId): the range partitioner splits a hot term
  *    across many partitions at docId boundaries, each bounded, and blocks
  *    stay globally sorted runs — no salt bookkeeping, no merge pass.
  *  - the postings files are written sorted by (termId, docId), so a query
  *    for a handful of terms prunes row groups via parquet min/max on termId.
  */
final class IndexBuilder(spark: SparkSession, root: String,
    cfg: IndexConfig = IndexConfig()) {

  import spark.implicits._

  val ice = new IceTable(root, spark.sparkContext.hadoopConfiguration)

  private def write(df: DataFrame, table: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(ice.tablePath(table))

  /** Runs the build; skips steps already committed in the current snapshot.
    * Returns the names of the steps that actually executed this run.
    * `failAfter` injects a crash after committing the named step (resume
    * tests).
    */
  def build(pages: Dataset[Page], failAfter: Option[String] = None): Seq[String] = {
    val done = ice.completedSteps.keySet
    val ran = Seq.newBuilder[String]

    def step(name: String, metrics: => Map[String, String])(body: => Unit): Unit = {
      if (!done.contains(name)) {
        val t0 = System.nanoTime()
        body
        val secs = (System.nanoTime() - t0) / 1e9
        val lineage = ice.parquetLineage(name)
        ice.commitStep(StepInfo(name, ice.tablePath(name),
          lineage.map(_._2).sum, lineage,
          metrics + ("elapsedSec" -> f"$secs%.3f")))
        ran += name
        if (failAfter.contains(name))
          throw new RuntimeException(s"injected failure after step $name")
      }
    }

    // canonical snapshot of the input with dense docIds assigned — one
    // range-shuffle on url, read by every later step (no re-tokenize of the
    // raw input, no url joins downstream)
    step("corpus", Map("orderedBy" -> "url")) {
      val ranked = Ranker.denseIdsByKey(
        pages.select($"url", $"text"), "url", "docId", cfg.partitions)
      write(ranked.select($"docId", $"url",
        K.krep_token_count($"text").as("dl"), $"text"), "corpus")
    }

    step("docs", Map.empty) {
      write(ice.readTable(spark, "corpus")
        .select($"docId", $"url", $"dl"), "docs")
    }

    step("stats", {
      val s = loadStats()
      Map("n" -> s.n.toString, "avgdl" -> s.avgdl.toString)
    }) {
      val docs = ice.readTable(spark, "docs")
      write(docs.agg(count("*").as("n"),
        coalesce(avg("dl"), lit(0.0)).as("avgdl")), "stats")
    }

    step("tfrows", Map.empty) {
      val corpus = ice.readTable(spark, "corpus")
      // positions leave the tokenizer already delta-varint packed (posv
      // BINARY): the widest column of the widest table — and of the postings
      // exchange downstream — is a compact strip instead of an ARRAY<INT>,
      // and block encoding later concatenates strips without re-coding
      write(corpus
        .select($"docId", $"dl",
          explode(K.krep_term_positions_packed($"text")).as("t"))
        .select($"docId", $"t.term".as("term"),
          $"t.tf".as("tf"), $"dl", $"t.posv".as("posv")),
        "tfrows")
    }

    step("dict", Map("orderedBy" -> "term")) {
      val tfr = ice.readTable(spark, "tfrows")
      // persisted because the ranker's range partitioner SAMPLES its input
      // before shuffling it: without the persist the sample pass re-executes
      // the whole tfrows scan + aggregation a second time (measured ~40% of
      // the step at 50k docs)
      val grouped = tfr.groupBy($"term")
        .agg(count("*").as("df"), sum($"tf").as("cf"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try write(Ranker.denseIdsByKey(grouped, "term", "termId", cfg.partitions)
        .select($"termId", $"term", $"df", $"cf"), "dict")
      finally grouped.unpersist(false)
    }

    // beyond the dl-broadcast gate, dl reaches the block encoders through a
    // per-segment doc-values sidecar (seg-<id>.bin, one dense Int per doc)
    // written and committed as its own resumable step — so the slim postings
    // exchange applies at ANY corpus size instead of falling back to
    // carrying dl through the widest shuffle (the fat exchange the A/B
    // measured at ~9-11% of build wall)
    val nDocsForPostings = ice.completedSteps.get("docs").map(_.rowCount)
    if (nDocsForPostings.exists(_ > cfg.dlBroadcastMaxDocs) &&
        !done.contains("dlseg") && !done.contains("postings")) {
      val t0 = System.nanoTime()
      val files = IndexBuilder.writeDlSidecar(
        ice.readTable(spark, "docs").select($"docId", $"dl"),
        ice.tablePath("dlseg"), cfg.docsPerSegment, cfg.partitions)
      ice.commitStep(StepInfo("dlseg", ice.tablePath("dlseg"),
        files.map(_._2).sum, files,
        Map("docsPerSegment" -> cfg.docsPerSegment.toString,
          "elapsedSec" -> f"${(System.nanoTime() - t0) / 1e9}%.3f")))
      ran += "dlseg"
      if (failAfter.contains("dlseg"))
        throw new RuntimeException("injected failure after step dlseg")
    }

    step("postings", Map(
      "blockSize" -> cfg.blockSize.toString,
      "docsPerSegment" -> cfg.docsPerSegment.toString)) {
      val tfr = ice.readTable(spark, "tfrows")
      val dictDf = ice.readTable(spark, "dict")
        .select($"termId", $"term")
      // row count comes from the committed dict lineage — no extra job
      val dictRows = ice.completedSteps("dict").rowCount
      val dictJ =
        if (dictRows <= cfg.dictBroadcastThreshold) broadcast(dictDf) else dictDf

      // hash-partition on (termId, segment): skew-proof by construction — a
      // hot term's postings split across segments, each partition bounded by
      // (terms-per-segment × docsPerSegment); unlike repartitionByRange this
      // needs no sampling pass over the joined input. Blocks never span
      // segments, so per-term blocks stay globally mergeable sorted runs.
      val nDocs = ice.completedSteps("docs").rowCount
      // the exchange is ALWAYS slim — (termId, docId, posv), the minimum
      // that determines the blocks; tf re-derives from the posv varint
      // count, dl from a broadcast dense table below the gate or from the
      // per-segment sidecar above it
      val rows = tfr.join(dictJ, "term")
        .select($"termId", $"docId", $"posv")
        .as[(Long, Long, Array[Byte])]
        .repartition(cfg.partitions, $"termId",
          floor($"docId" / cfg.docsPerSegment))
        .sortWithinPartitions($"termId", $"docId")
      val blocks = if (nDocs <= cfg.dlBroadcastMaxDocs) {
        val dlArr = new Array[Int](nDocs.toInt)
        ice.readTable(spark, "docs")
          .select($"docId", $"dl".cast("int")).as[(Long, Int)]
          .collect().foreach { case (d, l) => dlArr(d.toInt) = l }
        val dlt = spark.sparkContext.broadcast(IndexBuilder.DlTable(0L, dlArr))
        IndexBuilder.encodeBlocksSlim(rows, dlt, cfg.blockSize,
          cfg.docsPerSegment)
      } else {
        IndexBuilder.encodeBlocksSlimSidecar(rows, ice.tablePath("dlseg"),
          cfg.blockSize, cfg.docsPerSegment)
      }
      write(blocks.toDF(), "postings")
    }

    ran.result()
  }

  def loadStats(): IndexStats = {
    // builder-internal: reads the stats table THIS build just wrote, before
    // its commit — a snapshot-isolated read would not see it yet
    val r = spark.read.parquet(ice.tablePath("stats")).head()
    IndexStats(r.getLong(0), r.getDouble(1))
  }
}

object IndexBuilder {
  /** Dense-docId → doc length lookup, broadcast to the block encoders so the
    * build's widest exchange does not have to carry a `dl` column at all.
    * docIds are dense from `base` (0 for the batch build; the committed doc
    * count for a streaming delta), so the table is one Int per doc — 4 MB
    * per million docs. [[IndexConfig.dlBroadcastMaxDocs]] gates the size; a
    * corpus beyond it reads dl from the committed per-segment doc-values
    * sidecar instead ([[writeDlSidecar]] / [[encodeBlocksSlimSidecar]]), so
    * the exchange stays slim at any corpus size.
    */
  final case class DlTable(base: Long, dls: Array[Int]) {
    def apply(docId: Long): Int = dls((docId - base).toInt)
  }

  /** Encode (termId, docId, tf, dl, packedPositions) rows — sorted by
    * (termId, docId) within partitions, blocks never spanning a docId
    * segment — into compressed posting blocks. Position strips arrive
    * already packed ([[BlockCodec.packPositions]]); a block's `poss` is
    * their concatenation, byte-identical to encoding the int lists. Shared
    * by the batch build and the streaming appender.
    */
  def encodeBlocks(
      rows: org.apache.spark.sql.Dataset[(Long, Long, Int, Int, Array[Byte])],
      blockSize: Int, docsPerSegment: Long)
      : org.apache.spark.sql.Dataset[PosPostingBlock] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions(it => blockIterator(it, blockSize, docsPerSegment))
  }

  /** Write the per-segment dl sidecar: one `seg-<segId>.bin` per docId
    * segment, 4-byte big-endian dl values indexed by (docId − seg·dps) —
    * docIds are dense, so every slot is written. Hash-partitioned by
    * segment so each task owns whole segments; returns (fileName, docs)
    * lineage for the step commit. Task retries rewrite the same
    * deterministic bytes (create-overwrite), so speculative execution is
    * safe.
    */
  def writeDlSidecar(docs: org.apache.spark.sql.DataFrame, dir: String,
      docsPerSegment: Long, partitions: Int): Seq[(String, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.floor
    docs.select($"docId", $"dl".cast("int"))
      .repartition(partitions, floor($"docId" / docsPerSegment))
      .as[(Long, Int)]
      .mapPartitions { it =>
        val bySeg = scala.collection.mutable.HashMap
          .empty[Long, scala.collection.mutable.ArrayBuffer[(Int, Int)]]
        it.foreach { case (docId, dl) =>
          val seg = docId / docsPerSegment
          bySeg.getOrElseUpdate(seg,
            scala.collection.mutable.ArrayBuffer.empty) +=
            (((docId - seg * docsPerSegment).toInt, dl))
        }
        val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
          new org.apache.hadoop.conf.Configuration())
        bySeg.iterator.map { case (seg, offs) =>
          val size = offs.iterator.map(_._1).max + 1
          val arr = new Array[Int](size)
          offs.foreach { case (off, dl) => arr(off) = dl }
          val bytes = java.nio.ByteBuffer.allocate(4 * size)
          arr.foreach(bytes.putInt)
          val name = s"seg-$seg.bin"
          val out = fs.create(
            new org.apache.hadoop.fs.Path(dir, name), true)
          try out.write(bytes.array()) finally out.close()
          (name, offs.length.toLong)
        }
      }
      .collect().toSeq.sortBy(_._1)
  }

  /** Per-task lazy reader of the dl sidecar: caches up to `cacheSegs`
    * decoded segments (rows within a partition are (termId, docId)-sorted,
    * so each term's walk revisits the partition's segments in order — a
    * small cache makes re-reads rare).
    */
  final class DlSegReader(dir: String, docsPerSegment: Long,
      cacheSegs: Int = 8) {
    private val cache = new java.util.LinkedHashMap[Long, Array[Int]](
      16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Long, Array[Int]]): Boolean =
        size() > cacheSegs
    }
    @transient private lazy val fs =
      new org.apache.hadoop.fs.Path(dir).getFileSystem(
        new org.apache.hadoop.conf.Configuration())
    def dl(docId: Long): Int = {
      val seg = docId / docsPerSegment
      var arr = cache.get(seg)
      if (arr == null) {
        val p = new org.apache.hadoop.fs.Path(dir, s"seg-$seg.bin")
        val len = fs.getFileStatus(p).getLen.toInt
        val bytes = new Array[Byte](len)
        val in = fs.open(p)
        try in.readFully(0L, bytes) finally in.close()
        val bb = java.nio.ByteBuffer.wrap(bytes)
        arr = new Array[Int](len / 4)
        var i = 0
        while (i < arr.length) { arr(i) = bb.getInt(); i += 1 }
        cache.put(seg, arr)
      }
      arr((docId - seg * docsPerSegment).toInt)
    }
  }

  /** Sidecar twin of [[encodeBlocksSlim]] for corpora past
    * [[IndexConfig.dlBroadcastMaxDocs]]: dl comes from the committed
    * per-segment sidecar read by the encoder's own partition — the slim
    * exchange at any corpus size. Byte-identical blocks to the broadcast
    * path (SlimExchangeSpec forces both).
    */
  def encodeBlocksSlimSidecar(
      rows: org.apache.spark.sql.Dataset[(Long, Long, Array[Byte])],
      sidecarDir: String, blockSize: Int, docsPerSegment: Long)
      : org.apache.spark.sql.Dataset[PosPostingBlock] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      val reader = new DlSegReader(sidecarDir, docsPerSegment)
      blockIterator(it.map { case (termId, docId, posv) =>
        (termId, docId, BlockCodec.countVarints(posv), reader.dl(docId), posv)
      }, blockSize, docsPerSegment)
    }
  }

  /** Slim-exchange twin of [[encodeBlocks]]: rows carry only
    * (termId, docId, packedPositions). tf is re-derived per row as the
    * strip's varint count (one varint per position by construction —
    * [[BlockCodec.packPositions]]) and dl comes from the broadcast
    * [[DlTable]], so the repartition+sort that dominates build DRAM traffic
    * moves two fewer 8-byte slots per (doc, term) row. Produces
    * byte-identical blocks to [[encodeBlocks]] over the same input.
    */
  def encodeBlocksSlim(
      rows: org.apache.spark.sql.Dataset[(Long, Long, Array[Byte])],
      dlt: org.apache.spark.broadcast.Broadcast[DlTable],
      blockSize: Int, docsPerSegment: Long)
      : org.apache.spark.sql.Dataset[PosPostingBlock] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      val dl = dlt.value
      blockIterator(it.map { case (termId, docId, posv) =>
        (termId, docId, BlockCodec.countVarints(posv), dl(docId), posv)
      }, blockSize, docsPerSegment)
    }
  }

  private def blockIterator(it: Iterator[(Long, Long, Int, Int, Array[Byte])],
      blockSize: Int, docsPerSegment: Long): Iterator[PosPostingBlock] = {
      new Iterator[PosPostingBlock] {
        private var pending: PosPostingBlock = _
        private val bufDoc = new Array[Long](blockSize)
        private val bufTf = new Array[Int](blockSize)
        private val bufDl = new Array[Int](blockSize)
        private val bufPos = new Array[Array[Byte]](blockSize)
        private var len = 0
        private var curTerm = -1L
        private var curSeg = -1L

        private def flush(): PosPostingBlock = {
          var maxTf = 0
          var minDl = Int.MaxValue
          var posBytes = 0
          var i = 0
          while (i < len) {
            if (bufTf(i) > maxTf) maxTf = bufTf(i)
            if (bufDl(i) < minDl) minDl = bufDl(i)
            posBytes += bufPos(i).length
            i += 1
          }
          val poss = new Array[Byte](posBytes)
          var off = 0
          i = 0
          while (i < len) {
            System.arraycopy(bufPos(i), 0, poss, off, bufPos(i).length)
            off += bufPos(i).length
            i += 1
          }
          val b = PosPostingBlock(curTerm, curSeg, bufDoc(0), bufDoc(len - 1),
            len, maxTf, minDl,
            BlockCodec.encodeDeltaLongs(java.util.Arrays.copyOf(bufDoc, len)),
            BlockCodec.encodeInts(java.util.Arrays.copyOf(bufTf, len)),
            BlockCodec.encodeInts(java.util.Arrays.copyOf(bufDl, len)),
            poss)
          len = 0
          b
        }

        private def fill(): Unit = {
          while (pending == null && it.hasNext) {
            val (termId, docId, tf, dl, pos) = it.next()
            val seg = docId / docsPerSegment
            if (len > 0 && (termId != curTerm || seg != curSeg || len == blockSize))
              pending = flush()
            curTerm = termId; curSeg = seg
            bufDoc(len) = docId; bufTf(len) = tf; bufDl(len) = dl
            bufPos(len) = pos
            len += 1
          }
          if (pending == null && len > 0) pending = flush()
        }

        override def hasNext: Boolean = { fill(); pending != null }
        override def next(): PosPostingBlock = {
          fill()
          val b = pending; pending = null; b
        }
      }
  }
}
