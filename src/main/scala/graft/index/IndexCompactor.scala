package graft.index

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Index maintenance: compaction of streaming-append debris.
  *
  * Every [[graft.streaming.StreamingIndexer]] batch commits its own immutable
  * posting files, so a term served by K appends is spread over K small blocks
  * in K files. Queries stay correct (per-term blocks are disjoint sorted runs
  * merged by firstDoc), but at 10^12 docs the per-block and per-file overhead
  * compounds: more rows to skip-scan, shorter runs for WAND to skip within.
  * Compaction decodes every committed block, regroups the postings at full
  * block size under the SAME (termId, docId-segment) partitioning as the
  * batch build, and commits the rewrite as one atomic snapshot — readers see
  * the old layout or the new, never a mix, and engines pinned to an older
  * snapshot keep reading the old files (standard expire-snapshots semantics
  * apply before vacuum).
  *
  * Position strips are NOT re-coded: per-posting strips are independent
  * (delta state resets per list — BlockCodec.packPositions), so compaction
  * slices the concatenated `poss` bytes at posting boundaries (walking the
  * tf varints) and the new blocks concatenate the same bytes in the new
  * grouping — byte-exact, no int materialization.
  */
final class IndexCompactor(spark: SparkSession, root: String,
    cfg: IndexConfig) {

  private val ice = new IceTable(root, spark.sparkContext.hadoopConfiguration)

  /** Rewrite the postings table at full block size; returns the new snapshot
    * id. Pure re-layout: the decoded (termId, docId, tf, dl, positions)
    * multiset is unchanged, so WAND / phrase / scan results are identical.
    *
    * The commit is optimistic (`IceTable.commitAtomically`): the new step
    * drops exactly the files this compaction DECODED from the current list
    * and keeps everything else — so an append that lands while the rewrite
    * is running keeps its files in the committed snapshot instead of being
    * silently dropped by a last-wins commit. `beforeCommit` is a test hook
    * for injecting exactly that interleaving.
    */
  def compactPostings(beforeCommit: () => Unit = () => ()): Long = {
    import spark.implicits._
    // ONE snapshot capture drives both the rewritten-file set and the read:
    // resolving completedSteps twice would let an append commit in between,
    // decoding its postings into the rewrite while commitRewrite also keeps
    // its original files — duplicating that batch
    val snap = ice.completedSteps
    val rewritten = snap("postings").files.map(_._1).toSet
    val blocks = ice.readSteps(spark, snap, "postings")
      .as[PosPostingBlock]
    val rows = blocks.flatMap { b =>
      val docs = BlockCodec.decodeDeltaLongs(b.docs, b.n)
      val tfs = BlockCodec.decodeInts(b.tfs, b.n)
      val dls = BlockCodec.decodeInts(b.dls, b.n)
      val strips = IndexCompactor.splitStrips(b.poss, tfs)
      Iterator.tabulate(b.n)(i => (b.termId, docs(i), tfs(i), dls(i), strips(i)))
    }.toDF("termId", "docId", "tf", "dl", "posv")
    val sorted = rows
      .repartition(cfg.partitions, $"termId",
        floor($"docId" / cfg.docsPerSegment))
      .sortWithinPartitions($"termId", $"docId")
      .as[(Long, Long, Int, Int, Array[Byte])]
    val tag = s"compact-${java.util.UUID.randomUUID().toString.take(8)}"
    IndexBuilder.encodeBlocks(sorted, cfg.blockSize, cfg.docsPerSegment)
      .toDF().write.parquet(s"${ice.tablePath("postings")}/$tag")
    val newFiles = ice.parquetLineageIn("postings", tag)
    beforeCommit()
    commitRewrite(tag, rewritten, newFiles, "true")
  }

  /** Commit a rewrite optimistically. The make closure re-verifies against
    * the CURRENT snapshot that every file this rewrite decoded is still
    * listed: a concurrent compaction that already replaced any of them makes
    * this rewrite a stale duplicate of the same postings — committing it
    * would double that content (the loser would keep the winner's rewrite
    * AND add its own copy). The stale loser aborts as a no-op: its output
    * files are deleted and the current snapshot id is returned unchanged.
    */
  private def commitRewrite(tag: String, rewritten: Set[String],
      newFiles: Seq[(String, Long)], mode: String): Long =
    try ice.commitAtomically { cur =>
      val curNames = cur("postings").files.map(_._1).toSet
      if (!rewritten.forall(curNames))
        throw IndexCompactor.StaleRewrite
      val kept = cur("postings").files.filterNot { case (name, _) =>
        rewritten(name)
      }
      val files = kept ++ newFiles
      Seq(StepInfo("postings", ice.tablePath("postings"),
        files.map(_._2).sum, files,
        Map("version" -> tag, "compacted" -> mode,
          "rewrittenFiles" -> rewritten.size.toString,
          "keptFiles" -> kept.size.toString)))
    } catch {
      case IndexCompactor.StaleRewrite =>
        val fs = new org.apache.hadoop.fs.Path(ice.tablePath("postings"))
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(
          s"${ice.tablePath("postings")}/$tag"), true)
        ice.currentSnapshotId.get
    }

  /** Selective compaction — the shape that survives 100 TB: only files
    * dominated by SPLIT posting runs are rewritten (the Iceberg
    * rewrite-data-files-with-filter discipline — compacting 1% of debris
    * must not rewrite the other 99%). The debris signature of this layout is
    * a (termId, segId) group whose blocks span several files: the batch
    * build and a full compaction place each group in exactly one partition
    * file, while every streaming append adds its own file per touched
    * segment. A file is rewritten when more than `minSplitFrac` of its
    * blocks belong to split groups — measured from the metadata columns
    * alone (termId, segId — columnar read, block payloads stay on disk).
    * Correctness is unaffected by partial rewrites: every doc is indexed
    * once, so blocks from rewritten and untouched files remain disjoint
    * sorted runs that the query-time merge orders by firstDoc.
    *
    * Returns the new snapshot id, or the current one unchanged when no file
    * crosses the threshold (no empty commits).
    */
  def compactPostingsSelective(minSplitFrac: Double = 0.3): Long = {
    import spark.implicits._
    val snap = ice.completedSteps // one capture: plan and read the same state
    val step = snap("postings")
    val committed = step.files.map { case (name, _) => name }
    val meta = ice.readSteps(spark, snap, "postings")
      .select(input_file_name().as("f"), $"termId", $"segId")
    val splitGroups = meta.groupBy($"termId", $"segId")
      .agg(countDistinct($"f").as("nf"))
    val byFile = meta.join(splitGroups, Seq("termId", "segId"))
      .groupBy($"f")
      .agg(avg(when($"nf" > 1, 1.0).otherwise(0.0)).as("splitFrac"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    def relOf(uri: String): String =
      committed.find(name => uri.endsWith(name)).getOrElse(
        sys.error(s"uncommitted postings file in snapshot read: $uri"))
    val fragmented = byFile
      .filter { case (_, frac) => frac > minSplitFrac }
      .map { case (uri, _) => relOf(uri) }.toSet
    if (fragmented.isEmpty) return ice.currentSnapshotId.get

    val fragPaths = fragmented.toSeq.sorted.map(n => s"${ice.tablePath("postings")}/$n")
    val rows = spark.read.parquet(fragPaths: _*).as[PosPostingBlock]
      .flatMap { b =>
        val docs = BlockCodec.decodeDeltaLongs(b.docs, b.n)
        val tfs = BlockCodec.decodeInts(b.tfs, b.n)
        val dls = BlockCodec.decodeInts(b.dls, b.n)
        val strips = IndexCompactor.splitStrips(b.poss, tfs)
        Iterator.tabulate(b.n)(i =>
          (b.termId, docs(i), tfs(i), dls(i), strips(i)))
      }.toDF("termId", "docId", "tf", "dl", "posv")
    val sorted = rows
      .repartition(cfg.partitions, $"termId",
        floor($"docId" / cfg.docsPerSegment))
      .sortWithinPartitions($"termId", $"docId")
      .as[(Long, Long, Int, Int, Array[Byte])]
    val tag = s"compact-${java.util.UUID.randomUUID().toString.take(8)}"
    IndexBuilder.encodeBlocks(sorted, cfg.blockSize, cfg.docsPerSegment)
      .toDF().write.parquet(s"${ice.tablePath("postings")}/$tag")
    commitRewrite(tag, fragmented, ice.parquetLineageIn("postings", tag),
      "selective")
  }

  /** Fold the dictionary's per-append delta files into one sorted base:
    * (termId, term) groups sum their partial df/cf and the result is
    * range-partitioned + sorted by term (restoring the `orderedBy term`
    * row-group pruning property of a fresh build). Readers are
    * merge-on-read, so folding is a pure re-layout — answers identical
    * before and after; same loser-aborts optimistic commit as the postings
    * rewrite.
    */
  def compactDictionary(): Long = {
    import spark.implicits._
    val snap = ice.completedSteps
    val rewritten = snap("dict").files.map(_._1).toSet
    val folded = ice.readSteps(spark, snap, "dict")
      .groupBy($"termId", $"term")
      .agg(sum($"df").as("df"), sum($"cf").as("cf"))
      .repartitionByRange(cfg.partitions, $"term")
      .sortWithinPartitions($"term")
      .select($"termId", $"term", $"df", $"cf")
    val tag = s"compact-${java.util.UUID.randomUUID().toString.take(8)}"
    folded.write.parquet(s"${ice.tablePath("dict")}/$tag")
    val newFiles = ice.parquetLineageIn("dict", tag)
    try ice.commitAtomically { cur =>
      val curNames = cur("dict").files.map(_._1).toSet
      if (!rewritten.forall(curNames))
        throw IndexCompactor.StaleRewrite
      val kept = cur("dict").files.filterNot { case (n, _) => rewritten(n) }
      val files = kept ++ newFiles
      Seq(StepInfo("dict", ice.tablePath("dict"),
        files.map(_._2).sum, files,
        Map("version" -> tag, "compacted" -> "dict-fold",
          "orderedBy" -> "term")))
    } catch {
      case IndexCompactor.StaleRewrite =>
        val fs = new org.apache.hadoop.fs.Path(ice.tablePath("dict"))
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(
          s"${ice.tablePath("dict")}/$tag"), true)
        ice.currentSnapshotId.get
    }
  }

  /** Small-file compaction for a row table (corpus/docs/tfrows): rewrite the
    * committed file set into `numFiles` files, committed as a new version.
    * Content-preserving (no ordering contract on these tables — every reader
    * sorts or joins by key).
    */
  def compactTable(name: String, numFiles: Int): Long = {
    val snap = ice.completedSteps // one capture: plan and read the same state
    val rewritten = snap(name).files.map(_._1).toSet
    val df = ice.readSteps(spark, snap, name).repartition(numFiles)
    val tag = s"compact-${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.parquet(s"${ice.tablePath(name)}/$tag")
    val newFiles = ice.parquetLineageIn(name, tag)
    try ice.commitAtomically { cur =>
      val curNames = cur(name).files.map(_._1).toSet
      if (!rewritten.forall(curNames))
        throw IndexCompactor.StaleRewrite // same loser-aborts rule as postings
      val kept = cur(name).files.filterNot { case (n, _) => rewritten(n) }
      val files = kept ++ newFiles
      Seq(StepInfo(name, ice.tablePath(name),
        files.map(_._2).sum, files,
        Map("version" -> tag, "compacted" -> "true")))
    } catch {
      case IndexCompactor.StaleRewrite =>
        val fs = new org.apache.hadoop.fs.Path(ice.tablePath(name))
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(
          s"${ice.tablePath(name)}/$tag"), true)
        ice.currentSnapshotId.get
    }
  }
}

object IndexCompactor {
  /** Control-flow sentinel: a rewrite lost a compaction-vs-compaction race
    * (its decoded source files are no longer all in the current snapshot).
    */
  private object StaleRewrite extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  /** Slice a block's concatenated position strips into per-posting strips:
    * posting i owns the next `tfs(i)` varints. Byte-exact — the slices
    * re-concatenate to the original buffer in any regrouping.
    */
  def splitStrips(poss: Array[Byte], tfs: Array[Int]): Array[Array[Byte]] = {
    val out = new Array[Array[Byte]](tfs.length)
    var pos = 0
    var i = 0
    while (i < tfs.length) {
      val start = pos
      var remaining = tfs(i)
      while (remaining > 0) {
        while ((poss(pos) & 0x80) != 0) pos += 1
        pos += 1 // terminal byte of this varint
        remaining -= 1
      }
      out(i) = java.util.Arrays.copyOfRange(poss, start, pos)
      i += 1
    }
    out
  }
}
