package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.{IceTable, IndexStats, PosPostingBlock, PostingBlock}
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
final class QueryEngine(spark: SparkSession, val root: String,
    localPostingsThreshold: Long = 5000000L,
    driverCacheBlocksThreshold: Long = 4000000L,
    driverCorpusDocsThreshold: Long = 400000L,
    snapshotId: Option[Long] = None) {
  import spark.implicits._

  private val ice = new IceTable(root, spark.sparkContext.hadoopConfiguration)

  /** The engine is PINNED to one snapshot — the one current at construction,
    * or an explicit `snapshotId` (time travel over any unexpired entry):
    * every table read resolves this one manifest, so queries never mix
    * statistics from one snapshot with postings from another while a
    * streaming append commits concurrently. A new engine picks up the new
    * snapshot.
    */
  private val snapshot = snapshotId match {
    case Some(id) => ice.stepsAt(id)
    case None => ice.completedSteps
  }
  private def readPinned(name: String): DataFrame =
    ice.readSteps(spark, snapshot, name)

  val stats: IndexStats = {
    val r = readPinned("stats").head()
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

  private def dictRowCount: Long = snapshot("dict").rowCount

  /** Postings relation, pinned in executor memory when the index is small
    * enough (a search tier keeps its segments hot; in-memory batch stats
    * still prune on termId). Above the threshold: plain pruned parquet
    * scans — at 10^12 docs the OS page cache and row-group skipping carry
    * the locality.
    */
  private val cacheBlocksThreshold = 20000000L // block rows
  @transient private lazy val postingsDs: org.apache.spark.sql.DataFrame = {
    // project the WAND columns only: parquet is columnar, so the positional
    // payload (`poss`, roughly the size of the docId deltas) is never read
    // on the top-k path
    val raw = readPinned("postings")
      .select(PostingBlock.wandColumns.map(c => $"$c"): _*)
    if (snapshot("postings").rowCount <= cacheBlocksThreshold) {
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
    readPinned("postings")
      .select(PostingBlock.wandColumns.map(c => $"$c"): _*).as[PostingBlock]
      .collect().groupBy(_.termId)
  }
  /** Phrase-path twin of [[driverBlocks]]: full rows including positions.
    * Loaded lazily, only if a phrase query runs on a driver-cacheable index.
    * Deliberate trade-off: an engine serving BOTH term and phrase queries
    * holds the scoring columns twice (≤2x the cache threshold); keeping the
    * caches independent means term-only engines never pay for positions.
    */
  @transient private lazy val driverPosBlocks: Map[Long, Array[PosPostingBlock]] = {
    readPinned("postings").as[PosPostingBlock]
      .collect().groupBy(_.termId)
  }
  private def driverCacheable: Boolean =
    snapshot("postings").rowCount <= driverCacheBlocksThreshold

  /** Serving-tier corpus text cache, docId-sorted parallel arrays (binary
    * search, no per-doc Map boxing): loaded lazily on the FIRST phrase query
    * of a driver-cacheable engine, and only when the corpus itself is small
    * enough to pin (the threshold is docs, since text width dominates). With
    * it, the byte-exact literal recheck of a phrase is pure CPU — zero Spark
    * jobs — which is what takes a hot-pair phrase from seconds (hundreds of
    * serial 64-doc recheck jobs, the round-2 p95) to milliseconds.
    */
  @transient private lazy val driverCorpus: (Array[Long], Array[Array[Byte]]) = {
    // UTF-8 bytes, not String: half the heap of a String cache (so the
    // serving tier's GC stays calm) and the per-recheck
    // UTF8String.fromString re-encode disappears — fromBytes wraps the
    // array with zero copy
    val rows = readPinned("corpus")
      .select($"docId", encode($"text", "UTF-8"))
      .as[(Long, Array[Byte])].collect()
    java.util.Arrays.sort(rows, Ordering.by((r: (Long, Array[Byte])) => r._1))
    (rows.map(_._1), rows.map(_._2))
  }
  private def corpusCacheable: Boolean =
    driverCacheable && snapshot("corpus").rowCount <= driverCorpusDocsThreshold

  /** Sized executor for driver-side per-segment parallel work: bounded by the
    * session's advertised parallelism, shared across queries — the serving
    * tier stays predictable under concurrent phrase load instead of
    * oversubscribing cores through the unbounded global pool. Pools live in
    * the companion, keyed by size, so engine churn (a new engine per
    * snapshot refresh is the documented pattern) never accumulates threads.
    */
  @transient private lazy val segmentPool: java.util.concurrent.ExecutorService =
    QueryEngine.segmentPool(math.max(2, spark.sparkContext.defaultParallelism))

  /** Merge (term, termId, df) rows into term → (termId, dfTotal): the dict
    * is base + per-append DELTA files (partial df per file, one termId per
    * term), so totals resolve by summation — Lucene's per-segment
    * dictionary read, done on the driver for collected row sets.
    */
  private def mergeDictRows(
      rows: Array[org.apache.spark.sql.Row]): Map[String, (Long, Long)] = {
    val m = scala.collection.mutable.HashMap.empty[String, (Long, Long)]
    rows.foreach { r =>
      val t = r.getString(0)
      m.get(t) match {
        case Some((id, df)) => m(t) = (id, df + r.getLong(2))
        case None => m(t) = (r.getLong(1), r.getLong(2))
      }
    }
    m.toMap
  }

  private def ensureDictCache(): Map[String, (Long, Long)] = {
    if (dictCache == null) synchronized {
      if (dictCache == null) {
        dictCache = mergeDictRows(readPinned("dict")
          .select($"term", $"termId", $"df").collect())
      }
    }
    dictCache
  }

  private def lookupTerms(terms: Array[String]): Array[TermMeta] = {
    if (terms.isEmpty) return Array.empty
    val byTerm: String => Option[(Long, Long)] =
      if (dictRowCount <= dictCacheThreshold) {
        ensureDictCache().get
      } else {
        mergeDictRows(readPinned("dict")
          .filter($"term".isin(terms.toSeq: _*))
          .select($"term", $"termId", $"df")
          .collect()).get
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
  def search(query: String, k: Int): Array[ScoredDoc] =
    searchTerms(canonicalTerms(query), k)

  /** Multi-pattern query mode (SURVEY.md §3.4): each literal pattern expands
    * to every dictionary term CONTAINING it (krep substring semantics, one
    * multi-pattern scan of the dict via the same Aho-Corasick matcher the
    * text filters use), and the union of expansions runs as a disjunctive
    * block-max-WAND BM25 — the index-side analog of `krep -e p1 -e p2`.
    */
  def searchMultiPattern(patterns: Seq[String], k: Int,
      caseSensitive: Boolean = true, maxExpand: Int = 1024): Array[ScoredDoc] =
    searchTerms(expandPatterns(
      graft.krep.KrepParams(patterns, caseSensitive = caseSensitive),
      maxExpand), k)

  /** Regex query mode: dictionary terms matching the pattern (krep regex
    * semantics), ranked as a disjunction — the analog of `krep -E`.
    */
  def searchRegex(pattern: String, k: Int, maxExpand: Int = 1024): Array[ScoredDoc] =
    searchTerms(expandPatterns(
      graft.krep.KrepParams(Seq(pattern), regex = true, overlapping = false),
      maxExpand), k)

  /** Dict-side pattern expansion. The dict is the small relation (terms, not
    * docs): cached in memory below the threshold, otherwise one columnar scan
    * filtered by the krep matcher expression. Expansion is capped at
    * `maxExpand` terms by DESCENDING df (the reference caps patterns at 1024,
    * krep.c:3571; hottest terms dominate a disjunctive score).
    */
  def expandPatterns(params: graft.krep.KrepParams, maxExpand: Int)
      : Array[String] = {
    val matched: Array[(String, Long)] =
      if (dictRowCount <= dictCacheThreshold) {
        val m = new graft.krep.KrepMatcher(params)
        ensureDictCache().iterator.collect {
          case (t, (_, df)) if m.contains(UTF8String.fromString(t)) => (t, df)
        }.toArray
      } else {
        // the df-descending cap is applied INSIDE the scan (TakeOrdered):
        // a short pattern over a 10^9-term dict must not collect every
        // matching term to the driver. Per-append dict deltas are summed
        // BEFORE the cap so a term split across deltas ranks by its total.
        readPinned("dict")
          .filter(graft.krep.functions.krep_contains($"term", params))
          .groupBy($"term").agg(org.apache.spark.sql.functions.sum($"df").as("df"))
          .orderBy($"df".desc, $"term")
          .limit(maxExpand)
          .as[(String, Long)].collect()
      }
    matched.sortBy { case (t, df) => (-df, t) }.take(maxExpand)
      .map(_._1).distinct.sorted
  }

  /** Exact disjunctive top-k over an explicit canonical (distinct, sorted)
    * term set — the kernel behind [[search]]/[[searchMultiPattern]]/
    * [[searchRegex]].
    */
  def searchTerms(terms: Array[String], k: Int): Array[ScoredDoc] = {
    val metas = lookupTerms(terms)
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
      val bySlot = Array.fill(nTerms)(
        scala.collection.mutable.ArrayBuffer.empty[PostingBlock])
      segBlocks.foreach(b => bySlot(idxOf(b.termId)) += b)
      val termBlocks = bySlot.map(_.toArray.sortBy(_.firstDoc))
      val idfs = Array.tabulate(nTerms)(i => idfOf.getOrElse(i, 0.0))
      BlockMaxWand.topK(termBlocks, idfs, avgdl, k0).iterator
    }

    // driver strategies: one (segId, firstDoc) sort, then WAND per
    // contiguous segment run — no per-query hash-map grouping (allocation
    // churn under concurrent serving-tier queries)
    def wandBySegmentRuns(all: Array[PostingBlock]): Array[ScoredDoc] = {
      java.util.Arrays.sort(all, (a: PostingBlock, b: PostingBlock) => {
        val c = java.lang.Long.compare(a.segId, b.segId)
        if (c != 0) c else java.lang.Long.compare(a.firstDoc, b.firstDoc)
      })
      val out = scala.collection.mutable.ArrayBuffer.empty[ScoredDoc]
      var s = 0
      while (s < all.length) {
        var e = s
        while (e < all.length && all(e).segId == all(s).segId) e += 1
        out ++= wandOnSegment(all.iterator.slice(s, e))
        s = e
      }
      out.toArray.sortBy(d => (-d.score, d.docId)).take(k)
    }

    if (driverCacheable) {
      // serving-tier strategy: zero Spark jobs — blocks come from the
      // driver-resident term-keyed cache, WAND runs inline
      wandBySegmentRuns(metas.iterator
        .flatMap(m => driverBlocks.getOrElse(m.termId, Array.empty[PostingBlock]))
        .toArray)
    } else if (metas.map(_.df).sum <= localPostingsThreshold) {
      // driver-local strategy: one pruned-scan job, WAND per segment inline
      wandBySegmentRuns(blocks.collect())
    } else {
      blocks
        .groupByKey(_.segId)
        .flatMapGroups((_, it) => wandOnSegment(it))
        .orderBy($"score".desc, $"docId".asc)
        .limit(k)
        .collect()
    }
  }

  /** Conjunctive query mode with optional exclusion: exact BM25 top-k over
    * docs containing ALL query terms and NONE of the `exclude` terms — the
    * index lift of AND/NOT-composing krep scans (`krep p1 | krep p2`,
    * negation being the pipe stage a shell user writes as `grep -v`; the
    * reference's own multi-pattern mode is the disjunction). Same three
    * physical strategies as [[searchTerms]]; the per-segment kernel is the
    * positions-free leapfrog intersection ([[ConjunctiveSearch]]) with
    * exclusion cursors vetoing aligned docs. A query term absent from the
    * dictionary empties the result by definition; an ABSENT excluded term is
    * a no-op (nothing to veto), and a term that is both required and
    * excluded empties the result. Excluded terms never contribute score.
    *
    * Scale: an exclusion slot costs exactly one more positions-free merge
    * cursor over that term's pruned posting blocks — proportional to the
    * excluded term's posting size, never a corpus scan, and the parquet
    * `termId IN` pushdown covers positive and excluded ids in one scan.
    */
  def searchConjunctive(query: String, k: Int,
      exclude: String = ""): Array[ScoredDoc] = {
    val terms = canonicalTerms(query)
    if (terms.isEmpty) return Array.empty
    val exclTerms = canonicalTerms(exclude)
    if (exclTerms.exists(terms.contains)) return Array.empty // p AND NOT p
    val metas = lookupTerms(terms)
    if (metas.length < terms.length) return Array.empty // a term is absent
    val exclMetas = lookupTerms(exclTerms) // absent excluded terms drop out
    val ids = metas.map(_.termId) ++ exclMetas.map(_.termId)
    val idxOf = metas.map(m => m.termId -> m.termIdx).toMap
    val exIdxOf = exclMetas.zipWithIndex.map { case (m, i) => m.termId -> i }.toMap
    val nSlots = terms.length
    val nExcl = exclMetas.length
    val idfs = new Array[Double](nSlots)
    metas.foreach(m => idfs(m.termIdx) = m.idf)
    val avgdl = stats.avgdl
    val k0 = k

    def blocks = postingsDs
      .filter($"termId".isin(ids.toSeq: _*))
      .as[PostingBlock]

    // per-segment top-k: match count within one segment is bounded by the
    // segment's doc span, and only <= k rows leave the segment
    def conjOnSegment(segBlocks: Iterator[PostingBlock]): Iterator[ScoredDoc] = {
      val bySlot = Array.fill(nSlots)(
        scala.collection.mutable.ArrayBuffer.empty[PostingBlock])
      val byExcl = Array.fill(nExcl)(
        scala.collection.mutable.ArrayBuffer.empty[PostingBlock])
      segBlocks.foreach { b =>
        idxOf.get(b.termId) match {
          case Some(i) => bySlot(i) += b
          case None => byExcl(exIdxOf(b.termId)) += b
        }
      }
      ConjunctiveSearch.segmentMatches(
        bySlot.map(_.toArray.sortBy(_.firstDoc)), idfs, avgdl,
        byExcl.map(_.toArray.sortBy(_.firstDoc)))
        .toArray.sortBy(d => (-d.score, d.docId)).take(k0).iterator
    }

    def bySegmentRuns(all: Array[PostingBlock]): Array[ScoredDoc] = {
      java.util.Arrays.sort(all, (a: PostingBlock, b: PostingBlock) => {
        val c = java.lang.Long.compare(a.segId, b.segId)
        if (c != 0) c else java.lang.Long.compare(a.firstDoc, b.firstDoc)
      })
      val out = scala.collection.mutable.ArrayBuffer.empty[ScoredDoc]
      var s = 0
      while (s < all.length) {
        var e = s
        while (e < all.length && all(e).segId == all(s).segId) e += 1
        out ++= conjOnSegment(all.iterator.slice(s, e))
        s = e
      }
      out.toArray.sortBy(d => (-d.score, d.docId)).take(k)
    }

    if (driverCacheable) {
      bySegmentRuns(ids.iterator
        .flatMap(id => driverBlocks.getOrElse(id, Array.empty[PostingBlock]))
        .toArray)
    } else if ((metas.map(_.df).sum + exclMetas.map(_.df).sum)
        <= localPostingsThreshold) {
      bySegmentRuns(blocks.collect())
    } else {
      blocks
        .groupByKey(_.segId)
        .flatMapGroups((_, it) => conjOnSegment(it))
        .orderBy($"score".desc, $"docId".asc)
        .limit(k)
        .collect()
    }
  }

  /** Exact phrase search (SURVEY.md §3.4), positional-index path:
    *
    *  1. positional candidates from the index alone — per-segment zipper
    *     intersection over the phrase terms' posting cursors, keeping only
    *     docs where the tokens sit at consecutive token ordinals
    *     ([[PhraseSearch]]). No per-posting shuffle: the only exchange moves
    *     compressed blocks grouped by segment, and only on the distributed
    *     strategy.
    *  2. byte-exact literal re-check (reference memcmp semantics,
    *     krep.c:1312) against the corpus text of the POSITIONAL candidates
    *     only — point lookups via docId pushdown (the corpus is written in
    *     docId order), proportional to true phrase hits, never to a hot
    *     term's posting count. This catches case/separator mismatches that
    *     token adjacency admits (e.g. sentence-capitalized first words).
    *  3. BM25 order (score DESC, docId ASC), top-k.
    */
  def searchPhrase(phrase: String, k: Int): Array[ScoredDoc] = {
    import graft.krep.{KrepParams, functions => K}
    val phraseToks = KrepTokenize.tokenize(UTF8String.fromString(phrase))
      .map(_.toString)
    if (phraseToks.isEmpty) return Array.empty
    val terms = canonicalTerms(phrase)
    val metas = lookupTerms(terms)
    if (metas.length < terms.length) return Array.empty // a term is absent
    val ids = metas.map(_.termId)
    val slotOfTermId = metas.map(m => m.termId -> m.termIdx).toMap
    val nSlots = terms.length
    val slotOfTerm = terms.zipWithIndex.toMap
    val slotOffsets: Array[Array[Int]] = {
      val bufs = Array.fill(nSlots)(Vector.newBuilder[Int])
      phraseToks.zipWithIndex.foreach { case (t, i) => bufs(slotOfTerm(t)) += i }
      bufs.map(_.result().toArray)
    }
    val idfs = new Array[Double](nSlots)
    metas.foreach(m => idfs(m.termIdx) = m.idf)
    val avgdl = stats.avgdl

    def segMatches(segBlocks: Iterator[PosPostingBlock]): Iterator[(Long, Double)] = {
      val bySlot = Array.fill(nSlots)(Vector.empty[PosPostingBlock])
      segBlocks.foreach { b =>
        val s = slotOfTermId(b.termId)
        bySlot(s) = bySlot(s) :+ b
      }
      PhraseSearch.segmentMatches(bySlot.map(_.sortBy(_.firstDoc).toArray),
        slotOffsets, idfs, avgdl)
    }

    def posBlocksScan = readPinned("postings")
      .filter($"termId".isin(ids.toSeq: _*))
      .as[PosPostingBlock]

    // driver strategies intersect segments IN PARALLEL — segments are
    // independent by construction, so the serving tier uses all its cores
    // on one phrase instead of walking a hot term's blocks single-threaded;
    // results merge by a deterministic final sort
    def matchSegmentsParallel(all: Array[PosPostingBlock]): Array[(Long, Double)] = {
      java.util.Arrays.sort(all, (a: PosPostingBlock, b: PosPostingBlock) => {
        val c = java.lang.Long.compare(a.segId, b.segId)
        if (c != 0) c else java.lang.Long.compare(a.firstDoc, b.firstDoc)
      })
      val runs = Vector.newBuilder[(Int, Int)]
      var s = 0
      while (s < all.length) {
        var e = s
        while (e < all.length && all(e).segId == all(s).segId) e += 1
        runs += ((s, e))
        s = e
      }
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: ExecutionContext =
        ExecutionContext.fromExecutorService(segmentPool)
      val futs = runs.result().map { case (lo, hi) =>
        Future(segMatches(all.iterator.slice(lo, hi)).toArray)
      }
      Await.result(Future.sequence(futs), Duration.Inf).toArray.flatten
    }

    val corpus = readPinned("corpus").select($"docId", $"text")
    val literal = K.krep_contains($"text", KrepParams(Seq(phrase)))

    // distributed strategy (the 10^12-doc route): candidates NEVER collect
    // to the driver — the literal recheck is a distributed equi-join on
    // docId (work ∝ candidates, spread across executors), then only k rows
    // come back. The candidate set is persisted so its (min, max) docId
    // range — one tiny agg over the cached rows — prunes the corpus scan
    // BEFORE the join: the corpus is written in docId order, so the range
    // predicate pushes down to parquet row-group min/max and the recheck
    // never reads corpus row groups outside the candidate span.
    if (!driverCacheable && metas.map(_.df).sum > localPostingsThreshold) {
      val cand = posBlocksScan
        .groupByKey(_.segId)
        .flatMapGroups((_, it) => segMatches(it))
        .toDF("docId", "score")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val rng = cand.agg(min($"docId"), max($"docId")).head()
        if (rng.isNullAt(0)) return Array.empty
        return cand
          .join(corpus.filter($"docId".between(rng.getLong(0), rng.getLong(1))),
            "docId")
          .filter(literal)
          .select($"docId", $"score")
          .orderBy($"score".desc, $"docId".asc)
          .limit(k)
          .as[(Long, Double)]
          .collect()
          .map { case (d, s) => ScoredDoc(d, s) }
      } finally cand.unpersist()
    }

    // driver strategies: per-segment parallel intersection on the driver
    val candidates: Array[(Long, Double)] =
      if (driverCacheable) {
        matchSegmentsParallel(metas.iterator
          .flatMap(m => driverPosBlocks.getOrElse(m.termId,
            Array.empty[PosPostingBlock]))
          .toArray)
      } else {
        matchSegmentsParallel(posBlocksScan.collect())
      }
    if (candidates.isEmpty) return Array.empty

    // literal re-check in SCORE-DESCENDING order: the recheck only REMOVES
    // candidates (case/separator mismatches token adjacency admits), so the
    // first k survivors in score order ARE the exact top-k.
    val sorted = candidates.sortBy(c => (-c._2, c._1))

    if (corpusCacheable) {
      // serving-tier recheck: pure CPU against the pinned corpus — zero
      // Spark jobs, proportional to candidates actually visited before the
      // kth confirmation (reference memcmp semantics via the same matcher
      // the distributed filter compiles)
      val m = new graft.krep.KrepMatcher(KrepParams(Seq(phrase)))
      val (docIds, texts) = driverCorpus
      val out = Vector.newBuilder[ScoredDoc]
      var found = 0
      var i = 0
      while (found < k && i < sorted.length) {
        val (d, s) = sorted(i)
        val at = java.util.Arrays.binarySearch(docIds, d)
        if (at >= 0 && m.contains(UTF8String.fromBytes(texts(at)))) {
          out += ScoredDoc(d, s)
          found += 1
        }
        i += 1
      }
      return out.result().toArray
    }

    // batched point lookups, GEOMETRICALLY grown: a phrase whose candidates
    // mostly fail the recheck (sentence-capitalized first words are common)
    // must not pay hundreds of serial ~100 ms jobs — batch 1 confirms a
    // well-behaved top-k in one pruned lookup, and the exponent bounds the
    // worst case at O(log(candidates)) jobs (the corpus is written in docId
    // order, so docId IN (...) prunes row groups).
    val out = Vector.newBuilder[ScoredDoc]
    var batchSize = math.max(4 * k, 64)
    var taken = 0
    var found = 0
    while (found < k && taken < sorted.length) {
      val batch = sorted.slice(taken, taken + batchSize)
      taken += batch.length
      batchSize = math.min(batchSize * 4, 65536)
      val confirmed = corpus
        .filter($"docId".isin(batch.map(_._1).toSeq: _*))
        .filter(literal).select($"docId").as[Long].collect().toSet
      batch.iterator.filter(c => confirmed(c._1)).foreach { case (d, s) =>
        if (found < k) { out += ScoredDoc(d, s); found += 1 }
      }
    }
    out.result().toArray
  }

  /** The pinned docs relation (docId, url, dl) — lets callers resolve result
    * docIds back to their source keys without re-reading an unpinned table.
    */
  def docsDf: DataFrame = readPinned("docs")

  /** The pinned corpus relation (docId, url, dl, text) — the scan relation
    * [[IndexFilterRewrite]] accelerates when this engine's root is
    * registered.
    */
  def corpusDf: DataFrame = readPinned("corpus")

  /** Top-k with urls resolved — the user-facing result relation. */
  def searchDf(query: String, k: Int): DataFrame = {
    val top = search(query, k)
    val topDf = spark.createDataFrame(
      top.toSeq.zipWithIndex.map { case (s, r) => (r + 1, s.docId, s.score) })
      .toDF("rank", "docId", "score")
    val docs = readPinned("docs")
    docs.join(broadcast(topDf), "docId")
      .select($"rank", $"docId", $"url", $"score")
      .orderBy($"rank")
  }
}

object QueryEngine {
  final case class TermMeta(termIdx: Int, termId: Long, df: Long, idf: Double)

  /** JVM-wide per-size daemon pools for driver-side segment work — engines
    * come and go with snapshots, threads must not.
    */
  private val pools =
    new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.ExecutorService]
  private[query] def segmentPool(size: Int): java.util.concurrent.ExecutorService =
    pools.computeIfAbsent(size, n =>
      java.util.concurrent.Executors.newFixedThreadPool(n,
        new java.util.concurrent.ThreadFactory {
          private val c = new java.util.concurrent.atomic.AtomicInteger
          def newThread(r: Runnable): Thread = {
            val t = new Thread(r, s"graft-segments-$n-${c.incrementAndGet()}")
            t.setDaemon(true)
            t
          }
        }))
}
