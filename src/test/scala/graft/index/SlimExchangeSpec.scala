package graft.index

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.corpus.SynthWebText

/** The slim postings exchange (tf re-derived from the posv strip's varint
  * count, dl from a broadcast dense-docId table) must be a pure physical
  * optimization: byte-identical posting blocks to the dl-carrying exchange
  * over the same corpus. The `dlBroadcastMaxDocs` gate forces each path.
  */
class SlimExchangeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def blockSig(root: String): Set[String] = {
    import spark.implicits._
    spark.read.parquet(s"$root/data/postings")
      .select(concat_ws("|", $"termId", $"segId", $"firstDoc", $"lastDoc",
        $"n", $"maxTf", $"minDl", hex(hash($"docs")), hex(hash($"tfs")),
        hex(hash($"dls")), hex(hash($"poss"))))
      .as[String].collect().toSet
  }

  test("slim exchange encodes byte-identical blocks to the dl-carrying exchange") {
    val nDocs = 3000L
    val pages = SynthWebText.pages(spark, nDocs, numPartitions = 4)

    val slimRoot = Files.createTempDirectory("graft-slim-").toString
    new IndexBuilder(spark, slimRoot, IndexConfig(blockSize = 64,
      docsPerSegment = 512, partitions = 8)).build(pages)

    val wideRoot = Files.createTempDirectory("graft-wide-").toString
    new IndexBuilder(spark, wideRoot, IndexConfig(blockSize = 64,
      docsPerSegment = 512, partitions = 8,
      dlBroadcastMaxDocs = 0L)).build(pages) // gate closed → fallback path

    val slim = blockSig(slimRoot)
    val wide = blockSig(wideRoot)
    assert(slim == wide,
      s"block sets differ: slim-only=${(slim diff wide).take(3)} " +
        s"wide-only=${(wide diff slim).take(3)}")
    assert(slim.nonEmpty)
  }

  test("countVarints recovers tf from every packed strip shape") {
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { _ =>
      val n = 1 + rnd.nextInt(40)
      // strictly increasing ordinals with occasional multi-byte deltas
      val xs = Iterator.iterate(rnd.nextInt(1000))(
        p => p + 1 + rnd.nextInt(300)).take(n).toArray
      assert(BlockCodec.countVarints(BlockCodec.packPositions(xs)) == n)
    }
    assert(BlockCodec.countVarints(Array.empty[Byte]) == 0)
  }
}
