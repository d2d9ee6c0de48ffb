package graft.query

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.corpus.Page
import graft.index.Ranker
import graft.krep.{functions => K}

/** Brute-force BM25 oracle: plain declarative DataFrame plan straight off the
  * pages — no index, no custom operators beyond the tokenizer. This is the
  * semantics the real engine must match forever (SURVEY.md §7.2 step 1).
  *
  * Determinism: per-doc addends are collected with their canonical term
  * index, sorted, and folded left — the same fixed-order summation the WAND
  * scorer uses, so scores are bit-identical, not merely close.
  */
object NaiveSearch {

  def topK(spark: SparkSession, pages: Dataset[Page], query: String, k: Int,
      partitions: Int = 32, conjunctive: Boolean = false,
      exclude: String = ""): Array[ScoredDoc] = {
    import spark.implicits._
    val terms = new QueryEngineTerms().canonical(query)
    if (terms.isEmpty) return Array.empty
    val exclTerms = new QueryEngineTerms().canonical(exclude)
    if (exclTerms.exists(terms.contains)) return Array.empty

    val docs = Ranker.denseIdsByKey(
      pages.select($"url", size(K.krep_tokenize($"text")).as("dl")),
      "url", "docId", partitions)

    val tf = pages
      .select($"url", explode(K.krep_term_freqs($"text")).as("t"))
      .select($"url", $"t.term".as("term"), $"t.tf".as("tf"))

    val n = docs.count()
    val dfByTerm = tf.filter($"term".isin(terms.toSeq: _*))
      .groupBy($"term").agg(count("*").as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val termIdx = terms.zipWithIndex.toMap
    val idfs = terms.map(t => Bm25.idf(n, dfByTerm.getOrElse(t, 0L)))
    val avgdl = docs.agg(avg($"dl")).head().getDouble(0)

    val bIdx = spark.sparkContext.broadcast(termIdx)
    val bIdf = spark.sparkContext.broadcast(idfs)

    val addends = tf.filter($"term".isin(terms.toSeq: _*))
      .join(docs, "url")
      .select($"docId", $"term", $"tf", $"dl")
      .as[(Long, String, Int, Int)]
      .map { case (docId, term, tfv, dl) =>
        val i = bIdx.value(term)
        (docId, i, Bm25.addend(bIdf.value(i), tfv, dl, avgdl))
      }
      .toDF("docId", "termIdx", "addend")

    // NOT oracle: docs carrying any excluded term, dropped by anti-join
    val exclDocs =
      if (exclTerms.isEmpty) spark.emptyDataset[Long].toDF("docId")
      else tf.filter($"term".isin(exclTerms.toSeq: _*))
        .join(docs, "url").select($"docId").distinct()

    // deterministic fold: sort addends by term index, sum left-to-right;
    // conjunctive mode keeps only docs carrying every query term (one
    // addend per distinct query term present)
    addends
      .groupBy($"docId")
      .agg(sort_array(collect_list(struct($"termIdx", $"addend"))).as("parts"))
      .filter(!lit(conjunctive) || size($"parts") === terms.length)
      .join(exclDocs, Seq("docId"), "left_anti")
      .select($"docId",
        aggregate($"parts", lit(0.0), (acc, x) => acc + x("addend")).as("score"))
      .orderBy($"score".desc, $"docId".asc)
      .limit(k)
      .as[(Long, Double)]
      .collect()
      .map { case (d, s) => ScoredDoc(d, s) }
  }
}

/** Tokenization shared with [[QueryEngine]] without needing an index. */
private[query] final class QueryEngineTerms {
  def canonical(query: String): Array[String] =
    graft.krep.KrepTokenize
      .tokenize(org.apache.spark.unsafe.types.UTF8String.fromString(query))
      .map(_.toString).distinct.sorted
}
