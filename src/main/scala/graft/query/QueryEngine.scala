package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.{IceTable, IndexStats, PostingBlock}
import graft.krep.KrepTokenize
import org.apache.spark.unsafe.types.UTF8String

/** Distributed BM25 top-k over the segmented inverted index (SURVEY.md §3.4).
  *
  * Plan shape (scale-first):
  *  1. query terms → dict lookup: a parquet scan FILTERED on `term` — the
  *     dict is written sorted by term, so row-group min/max pruning reads a
  *     handful of pages; result is a ≤|query| row collect.
  *  2. posting blocks for those termIds only: parquet scan with an
  *     `termId IN (...)` pushdown over files sorted by (termId, docId) —
  *     row-group skipping makes this read proportional to the query's
  *     posting data, not the index size.
  *  3. per-segment block-max WAND (`flatMapGroups` on segId): each executor
  *     produces its segment's exact top-k; segments are the fan-out unit a
  *     1000-executor cluster parallelizes over.
  *  4. global top-k merge: k rows per segment → `ORDER BY score DESC, docId
  *     ASC LIMIT k` (tiny), then a broadcast join against docs for urls.
  */
final class QueryEngine(spark: SparkSession, root: String,
    localPostingsThreshold: Long = 5000000L,
    driverCacheBlocksThreshold: Long = 4000000L) {
  import spark.implicits._

  private val ice = new IceTable(root, spark.sparkContext.hadoopConfiguration)
  val stats: IndexStats = {
    val r = spark.read.parquet(ice.tablePath("stats")).head()
    IndexStats(r.getLong(0), r.getDouble(1))
  }

  /** Canonical query terms: krep tokenizer, distinct, sorted by term string.
    * Score addends are summed in this order everywhere (determinism).
    */
  def canonicalTerms(query: String): Array[String] =
    KrepTokenize.tokenize(UTF8String.fromString(query))
      .map(_.toString).distinct.sorted

  import QueryEngine.TermMeta

  /** Small dictionaries are cached on the driver after the first lookup (the
    * analog of a search node's in-memory term dictionary): term resolution
    * then costs zero Spark jobs. Above the threshold (10^12-doc scale) the
    * lookup is a parquet scan pruned on `term` — the dict is written sorted
    * by term, so row-group min/max skipping reads a handful of pages.
    */
  private val dictCacheThreshold = 500000L
  @volatile private var dictCache: Map[String, (Long, Long)] = _

  private def dictRowCount: Long = ice.completedSteps("dict").rowCount

  /** Postings relation, pinned in executor memory when the index is small
    * enough (a search tier keeps its segments hot; in-memory batch stats
    * still prune on termId). Above the threshold: plain pruned parquet
    * scans — at 10^12 docs the OS page cache and row-group skipping carry
    * the locality.
    */
  private val cacheBlocksThreshold = 20000000L // block rows
  @transient private lazy val postingsDs: org.apache.spark.sql.DataFrame = {
    val raw = spark.read.parquet(ice.tablePath("postings"))
    if (ice.completedSteps("postings").rowCount <= cacheBlocksThreshold) {
      val cached = raw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cached.count() // materialize once
      cached
    } else raw
  }

  /** For indexes that fit a single search node (blocks under the threshold),
    * the encoded blocks are also held term-keyed on the driver: a query then
    * runs zero Spark jobs — dict lookup and WAND are pure CPU, and query
    * throughput scales with driver cores. This is the "serving" tier shape:
    * brokers hold hot segments; the distributed path below remains the
    * 10^12-doc route.
    */
  @transient private lazy val driverBlocks: Map[Long, Array[PostingBlock]] = {
    spark.read.parquet(ice.tablePath("postings")).as[PostingBlock]
      .collect().groupBy(_.termId)
  }
  private def driverCacheable: Boolean =
    ice.completedSteps("postings").rowCount <= driverCacheBlocksThreshold

  private def lookupTerms(terms: Array[String]): Array[TermMeta] = {
    if (terms.isEmpty) return Array.empty
    val byTerm: String => Option[(Long, Long)] =
      if (dictRowCount <= dictCacheThreshold) {
        if (dictCache == null) synchronized {
          if (dictCache == null) {
            dictCache = spark.read.parquet(ice.tablePath("dict"))
              .select($"term", $"termId", $"df").collect()
              .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
          }
        }
        dictCache.get
      } else {
        val rows = spark.read.parquet(ice.tablePath("dict"))
          .filter($"term".isin(terms.toSeq: _*))
          .select($"term", $"termId", $"df")
          .collect()
        rows.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap.get
      }
    terms.zipWithIndex.flatMap { case (t, i) =>
      byTerm(t).map { case (id, df) =>
        TermMeta(i, id, df, Bm25.idf(stats.n, df))
      }
    }
  }

  /** Exact top-k (docId, score), ties docId ASC — rank-identical to the
    * brute-force oracle.
    *
    * Two physical strategies with identical semantics (the analog of the
    * reference's single-chunk inline fast path, krep.c:2886-2889): when the
    * query's total posting count (Σ df, known for free from the dict lookup)
    * is small, blocks are collected and WAND runs on the driver — one Spark
    * job instead of three. Big queries fan out per segment across executors.
    */
  def search(query: String, k: Int): Array[ScoredDoc] = {
    val metas = lookupTerms(canonicalTerms(query))
    if (metas.isEmpty) return Array.empty
    val ids = metas.map(_.termId)
    val idxOf = metas.map(m => m.termId -> m.termIdx).toMap
    val idfOf = metas.map(m => m.termIdx -> m.idf).toMap
    val nTerms = metas.map(_.termIdx).max + 1
    val avgdl = stats.avgdl
    val k0 = k

    // lazy: only the non-driver-cached strategies materialize this
    def blocks = postingsDs
      .filter($"termId".isin(ids.toSeq: _*))
      .as[PostingBlock]

    def wandOnSegment(segBlocks: Iterator[PostingBlock]): Iterator[ScoredDoc] = {
      val bySlot = Array.fill(nTerms)(Vector.empty[PostingBlock])
      segBlocks.foreach { b =>
        val slot = idxOf(b.termId)
        bySlot(slot) = bySlot(slot) :+ b
      }
      val termBlocks = bySlot.map(_.sortBy(_.firstDoc).toArray)
      val idfs = Array.tabulate(nTerms)(i => idfOf.getOrElse(i, 0.0))
      BlockMaxWand.topK(termBlocks, idfs, avgdl, k0).iterator
    }

    if (driverCacheable) {
      // serving-tier strategy: zero Spark jobs — blocks come from the
      // driver-resident term-keyed cache, WAND runs inline
      val all = metas.iterator
        .flatMap(m => driverBlocks.getOrElse(m.termId, Array.empty[PostingBlock]))
        .toArray
      all.groupBy(_.segId).iterator
        .flatMap { case (_, bs) => wandOnSegment(bs.iterator) }
        .toArray
        .sortBy(s => (-s.score, s.docId))
        .take(k)
    } else if (metas.map(_.df).sum <= localPostingsThreshold) {
      // driver-local strategy: one pruned-scan job, WAND per segment inline
      val all = blocks.collect()
      all.groupBy(_.segId).iterator
        .flatMap { case (_, bs) => wandOnSegment(bs.iterator) }
        .toArray
        .sortBy(s => (-s.score, s.docId))
        .take(k)
    } else {
      blocks
        .groupByKey(_.segId)
        .flatMapGroups((_, it) => wandOnSegment(it))
        .orderBy($"score".desc, $"docId".asc)
        .limit(k)
        .collect()
    }
  }

  /** Exact phrase search (SURVEY.md §3.4: index candidates + krep re-check):
    *
    *  1. conjunctive candidates from the index — decode only the phrase
    *     terms' posting blocks, keep docIds carrying ALL terms (posting-list
    *     intersection), scoring addends as we go;
    *  2. re-check the byte-exact phrase with the krep literal matcher
    *     against the corpus text of the candidates only (a pruned semi-join,
    *     never a corpus scan);
    *  3. BM25 order (score DESC, docId ASC), top-k.
    */
  def searchPhrase(phrase: String, k: Int): Array[ScoredDoc] = {
    import graft.krep.{KrepParams, functions => K}
    val metas = lookupTerms(canonicalTerms(phrase))
    val nTerms = canonicalTerms(phrase).length
    if (metas.length < nTerms) return Array.empty // some term absent → no doc has all
    val ids = metas.map(_.termId)
    val idfOf = metas.map(m => m.termId -> m.idf).toMap
    val avgdl = stats.avgdl
    val idxOfTerm = metas.map(m => m.termId -> m.termIdx).toMap

    // decode postings of the phrase terms into (docId, termIdx, addend)
    val addends = spark.read.parquet(ice.tablePath("postings"))
      .filter($"termId".isin(ids.toSeq: _*))
      .as[PostingBlock]
      .flatMap { b =>
        val docs = graft.index.BlockCodec.decodeDeltaLongs(b.docs, b.n)
        val tfs = graft.index.BlockCodec.decodeInts(b.tfs, b.n)
        val dls = graft.index.BlockCodec.decodeInts(b.dls, b.n)
        val idf = idfOf(b.termId)
        val ti = idxOfTerm(b.termId)
        (0 until b.n).iterator.map { i =>
          (docs(i), ti, Bm25.addend(idf, tfs(i), dls(i), avgdl))
        }
      }
      .toDF("docId", "ti", "addend")

    // conjunctive intersection + deterministic fixed-order score fold
    val candidates = addends
      .groupBy($"docId")
      .agg(count(lit(1)).as("nt"),
        sort_array(collect_list(struct($"ti", $"addend"))).as("parts"))
      .filter($"nt" === nTerms)
      .select($"docId",
        aggregate($"parts", lit(0.0), (acc, x) => acc + x.getField("addend"))
          .as("score"))

    // krep literal re-check on candidate text only (semi-join on docId)
    val corpus = spark.read.parquet(ice.tablePath("corpus"))
      .select($"docId", $"text")
    candidates.join(corpus, "docId")
      .filter(K.krep_contains($"text", KrepParams(Seq(phrase))))
      .select($"docId", $"score")
      .orderBy($"score".desc, $"docId".asc)
      .limit(k)
      .as[(Long, Double)]
      .collect()
      .map { case (d, s) => ScoredDoc(d, s) }
  }

  /** Top-k with urls resolved — the user-facing result relation. */
  def searchDf(query: String, k: Int): DataFrame = {
    val top = search(query, k)
    val topDf = spark.createDataFrame(
      top.toSeq.zipWithIndex.map { case (s, r) => (r + 1, s.docId, s.score) })
      .toDF("rank", "docId", "score")
    val docs = spark.read.parquet(ice.tablePath("docs"))
    docs.join(broadcast(topDf), "docId")
      .select($"rank", $"docId", $"url", $"score")
      .orderBy($"rank")
  }
}

object QueryEngine {
  final case class TermMeta(termIdx: Int, termId: Long, df: Long, idf: Double)
}
