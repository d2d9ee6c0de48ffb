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
final class QueryEngine(spark: SparkSession, root: String) {
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

  final case class TermMeta(termIdx: Int, termId: Long, idf: Double)

  private def lookupTerms(terms: Array[String]): Array[TermMeta] = {
    if (terms.isEmpty) return Array.empty
    val rows = spark.read.parquet(ice.tablePath("dict"))
      .filter($"term".isin(terms.toSeq: _*))
      .select($"term", $"termId", $"df")
      .collect()
    val byTerm = rows.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    terms.zipWithIndex.flatMap { case (t, i) =>
      byTerm.get(t).map { case (id, df) =>
        TermMeta(i, id, Bm25.idf(stats.n, df))
      }
    }
  }

  /** Exact top-k (docId, score), ties docId ASC — rank-identical to the
    * brute-force oracle.
    */
  def search(query: String, k: Int): Array[ScoredDoc] = {
    val metas = lookupTerms(canonicalTerms(query))
    if (metas.isEmpty) return Array.empty
    val ids = metas.map(_.termId)
    val idxOf = metas.map(m => m.termId -> m.termIdx).toMap
    val idfOf = metas.map(m => m.termIdx -> m.idf).toMap
    val nTerms = metas.map(_.termIdx).max + 1
    val avgdl = stats.avgdl

    val blocks = spark.read.parquet(ice.tablePath("postings"))
      .filter($"termId".isin(ids.toSeq: _*))
      .as[PostingBlock]

    val perSegment = blocks
      .groupByKey(_.segId)
      .flatMapGroups { (_, it) =>
        val bySlot = Array.fill(nTerms)(Vector.empty[PostingBlock])
        it.foreach { b =>
          val slot = idxOf(b.termId)
          bySlot(slot) = bySlot(slot) :+ b
        }
        val termBlocks = bySlot.map(_.sortBy(_.firstDoc).toArray)
        val idfs = Array.tabulate(nTerms)(i => idfOf.getOrElse(i, 0.0))
        BlockMaxWand.topK(termBlocks, idfs, avgdl, k).iterator
      }

    perSegment
      .orderBy($"score".desc, $"docId".asc)
      .limit(k)
      .collect()
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
