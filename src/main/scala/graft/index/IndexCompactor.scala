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
    */
  def compactPostings(): Long = {
    import spark.implicits._
    val blocks = ice.readTable(spark, "postings").as[PosPostingBlock]
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
    val files = ice.parquetLineageIn("postings", tag)
    ice.commitStep(StepInfo("postings", ice.tablePath("postings"),
      files.map(_._2).sum, files,
      Map("version" -> tag, "compacted" -> "true")))
  }

  /** Small-file compaction for a row table (corpus/docs/tfrows): rewrite the
    * committed file set into `numFiles` files, committed as a new version.
    * Content-preserving (no ordering contract on these tables — every reader
    * sorts or joins by key).
    */
  def compactTable(name: String, numFiles: Int): Long = {
    val df = ice.readTable(spark, name).repartition(numFiles)
    val tag = s"compact-${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.parquet(s"${ice.tablePath(name)}/$tag")
    val files = ice.parquetLineageIn(name, tag)
    ice.commitStep(StepInfo(name, ice.tablePath(name),
      files.map(_._2).sum, files,
      Map("version" -> tag, "compacted" -> "true")))
  }
}

object IndexCompactor {
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
