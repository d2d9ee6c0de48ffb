package graft.index

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.corpus.SynthWebText
import graft.query.QueryEngine
import graft.streaming.StreamingIndexer

class CompactionSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val cfg = IndexConfig(blockSize = 32, docsPerSegment = 128,
    partitions = 2)
  private def t(r: Int) = SynthWebText.term(r)

  /** Decoded posting multiset: the logical content compaction must keep. */
  private def postings(root: String): Seq[(Long, Long, Int, Int, Seq[Int])] = {
    import spark.implicits._
    val ice = new IceTable(root, spark.sparkContext.hadoopConfiguration)
    ice.readTable(spark, "postings").as[PosPostingBlock].collect().toSeq
      .flatMap { b =>
        val docs = BlockCodec.decodeDeltaLongs(b.docs, b.n)
        val tfs = BlockCodec.decodeInts(b.tfs, b.n)
        val dls = BlockCodec.decodeInts(b.dls, b.n)
        val poss = BlockCodec.decodePosLists(b.poss, tfs)
        (0 until b.n).map(i =>
          (b.termId, docs(i), tfs(i), dls(i), poss(i).toSeq))
      }.sortBy(p => (p._1, p._2)) // (termId, docId) is unique per posting
  }

  private def blockCount(root: String): Long = {
    val ice = new IceTable(root, spark.sparkContext.hadoopConfiguration)
    ice.readTable(spark, "postings").count()
  }

  test("compactPostings: fewer blocks, identical posting multiset, identical queries") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-compact-").toString
    val indexer = new StreamingIndexer(spark, root, cfg)
    // 6 small appends => per-term postings fragmented across 6 commits
    (0 until 6).foreach { k =>
      indexer.appendBatch(
        spark.range(k * 150L, (k + 1) * 150L, 1, 2)
          .map(i => SynthWebText.page(i)))
    }
    val queries = Seq(t(0), t(100), s"${t(3)} ${t(7)}", SynthWebText.Markers(0))
    def answers(): Seq[Seq[(Long, Double)]] = {
      val eng = new QueryEngine(spark, root)
      queries.map(q => eng.searchDf(q, 15).collect()
        .map(r => (r.getLong(1), r.getDouble(3))).toSeq) :+
        eng.searchPhrase(SynthWebText.Markers(0), 10)
          .map(sd => (sd.docId, sd.score)).toSeq
    }
    val before = answers()
    val msBefore = postings(root)
    val blocksBefore = blockCount(root)
    val ice = new IceTable(root, spark.sparkContext.hadoopConfiguration)
    val snapBefore = ice.currentSnapshotId.get
    val filesBefore = ice.snapshotFiles("postings")

    new IndexCompactor(spark, root, cfg).compactPostings()

    assert(blockCount(root) < blocksBefore,
      s"compaction did not reduce blocks ($blocksBefore)")
    assert(postings(root) == msBefore,
      "compaction changed the decoded posting multiset")
    assert(answers() == before, "query answers changed after compaction")
    // snapshot isolation: the pre-compaction snapshot still lists the old
    // files, all still present on disk (vacuum is a separate, later step)
    assert(ice.currentSnapshotId.get == snapBefore + 1)
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(hconf)
    filesBefore.foreach(f =>
      assert(fs.exists(new org.apache.hadoop.fs.Path(f)),
        s"pre-compaction file $f deleted by compaction"))

    // full maintenance lifecycle: vacuum alone reclaims NOTHING (old
    // snapshots still reference the debris); expire-then-vacuum reclaims it
    assert(ice.vacuum("postings").isEmpty,
      "vacuum deleted files still referenced by an unexpired snapshot")
    val expired = ice.expireSnapshots(keepLast = 1)
    assert(expired.nonEmpty)
    val reclaimed = ice.vacuum("postings")
    assert(reclaimed.nonEmpty,
      "expire-then-vacuum should reclaim pre-compaction posting files")
    assert(postings(root) == msBefore,
      "reclamation changed the committed posting multiset")
    assert(answers() == before, "query answers changed after reclamation")
  }

  test("selective compaction rewrites only split-dominated files; no-op when packed") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-compact3-").toString
    val indexer = new StreamingIndexer(spark, root, cfg)
    (0 until 4).foreach { k =>
      indexer.appendBatch(
        spark.range(k * 64L, (k + 1) * 64L, 1, 2)
          .map(i => SynthWebText.page(i)))
    }
    val compactor = new IndexCompactor(spark, root, cfg)
    compactor.compactPostings()
    val ice = new IceTable(root, spark.sparkContext.hadoopConfiguration)
    val packedSnap = ice.currentSnapshotId.get
    val packedFiles = ice.completedSteps("postings").files.map(_._1).toSet

    // fully packed: every (termId, segId) group lives in one file -> no-op
    assert(compactor.compactPostingsSelective() == packedSnap,
      "selective compaction must be a no-op on a packed index")

    // fresh append debris on top: 3 small batches sharing segments
    (4 until 7).foreach { k =>
      indexer.appendBatch(
        spark.range(k * 64L, (k + 1) * 64L, 1, 2)
          .map(i => SynthWebText.page(i)))
    }
    val msBefore = postings(root)
    val blocksBefore = blockCount(root)
    val snap = compactor.compactPostingsSelective()
    assert(snap > packedSnap, "debris should trigger a selective rewrite")
    val after = ice.completedSteps("postings")
    val kept = after.files.map(_._1).filter(packedFiles)
    assert(kept.nonEmpty,
      "selective compaction rewrote the packed files it should have kept")
    assert(after.metrics("compacted") == "selective")
    assert(postings(root) == msBefore,
      "selective compaction changed the decoded posting multiset")
    assert(blockCount(root) <= blocksBefore)
  }

  test("append landing during compaction survives the optimistic commit") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-compact4-").toString
    val indexer = new StreamingIndexer(spark, root, cfg)
    (0 until 3).foreach { k =>
      indexer.appendBatch(
        spark.range(k * 100L, (k + 1) * 100L, 1, 2)
          .map(i => SynthWebText.page(i)))
    }
    val msBase = postings(root)
    // a batch commits BETWEEN the compactor's rewrite and its commit — the
    // lost-update shape a last-wins commit silently corrupts
    new IndexCompactor(spark, root, cfg).compactPostings(beforeCommit = () =>
      indexer.appendBatch(
        spark.range(300L, 400L, 1, 2).map(i => SynthWebText.page(i))))
    val ice = new IceTable(root, spark.sparkContext.hadoopConfiguration)
    // the racing batch's postings files are still listed
    assert(ice.completedSteps("postings").files.exists(_._1.startsWith("b")),
      "concurrent append's posting files were dropped by the compaction commit")
    // content = compacted base multiset ∪ the racing batch's postings
    val msAfter = postings(root)
    assert(msAfter.size > msBase.size)
    assert(msBase.toSet.subsetOf(msAfter.toSet),
      "compacted base postings lost in the race")
    // the racing batch's docs are queryable
    val eng = new QueryEngine(spark, root)
    val urls = eng.docsDf.select($"url").as[String].collect().toSet
    assert(urls.contains(SynthWebText.page(350L).url),
      "racing batch's documents missing from the committed index")
  }

  test("two racing compactions: loser aborts as a no-op, no duplicated postings") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-compact5-").toString
    val indexer = new StreamingIndexer(spark, root, cfg)
    (0 until 4).foreach { k =>
      indexer.appendBatch(
        spark.range(k * 100L, (k + 1) * 100L, 1, 2)
          .map(i => SynthWebText.page(i)))
    }
    val msBefore = postings(root)
    val ice = new IceTable(root, spark.sparkContext.hadoopConfiguration)
    // a SECOND full compaction commits inside the first one's write→commit
    // window: both decoded the same source files, so the slower committer's
    // rewrite is a byte-duplicate of content the winner already replaced —
    // committing it would double every posting (the pre-fix behavior)
    var winnerSnap = -1L
    val compactor = new IndexCompactor(spark, root, cfg)
    val loserSnap = compactor.compactPostings(beforeCommit = () => {
      winnerSnap = new IndexCompactor(spark, root, cfg).compactPostings()
    })
    assert(winnerSnap > 0)
    assert(loserSnap == winnerSnap,
      "stale compaction must no-op at the winner's snapshot, not commit")
    assert(ice.currentSnapshotId.contains(winnerSnap))
    assert(postings(root) == msBefore,
      "racing compactions duplicated or lost postings")
    // the loser's orphaned rewrite output was cleaned up eagerly
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(hconf)
    val live = ice.completedSteps("postings").files.map(_._1).toSet
    val onDiskCompactDirs = fs.listStatus(
      new org.apache.hadoop.fs.Path(ice.tablePath("postings")))
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("compact-")).toSet
    val liveCompactDirs = live.collect {
      case f if f.startsWith("compact-") => f.split("/")(0)
    }
    assert(onDiskCompactDirs == liveCompactDirs,
      s"stale rewrite left orphan dirs: ${onDiskCompactDirs diff liveCompactDirs}")
  }

  test("compactTable: docs content preserved in the requested file count") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-compact2-").toString
    val indexer = new StreamingIndexer(spark, root, cfg)
    (0 until 4).foreach { k =>
      indexer.appendBatch(
        spark.range(k * 50L, (k + 1) * 50L, 1, 2)
          .map(i => SynthWebText.page(i)))
    }
    val ice = new IceTable(root, spark.sparkContext.hadoopConfiguration)
    val before = ice.readTable(spark, "docs").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq.sorted
    new IndexCompactor(spark, root, cfg).compactTable("docs", 1)
    val after = ice.readTable(spark, "docs").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq.sorted
    assert(after == before)
    assert(ice.completedSteps("docs").files.size == 1)
  }
}
