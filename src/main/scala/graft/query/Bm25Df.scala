package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.krep.{functions => K}

/** Declarative BM25 over any (id, text) relation — the index-free scan path
  * (used for ad-hoc corpora; the WAND engine is differentially tested against
  * this shape). Deterministic: addends are sorted by canonical term index and
  * folded left, same as the WAND scorer; the per-addend float operation order
  * matches [[Bm25.addend]] exactly.
  */
object Bm25Df {

  /** Top-k (rank, id, score) for a free-text query. Two narrow passes over a
    * tokenized (id, toks, dl) projection — no per-token explode, no wide
    * shuffle: pass 1 computes corpus stats AND per-term document frequencies
    * in one aggregation (df via `array_contains`), pass 2 scores each doc
    * with a per-row codegen'd tf kernel ([[graft.ops.TokenOccurrences]]) and
    * takes the top-k with `ORDER BY ... LIMIT k` (per-partition heads +
    * driver merge). Scores are bit-identical to the explode/groupBy shape
    * this replaces: the per-addend arithmetic matches [[Bm25.addend]]'s op
    * order, addends fold in canonical term order from 0.0, and a term absent
    * from a doc contributes an exact 0.0 (x + 0.0 == x for these finite
    * non-negative doubles), while docs containing NO query term are filtered
    * out — the same row set the tf join produced.
    */
  def topK(docs: DataFrame, idCol: String, textCol: String, query: String,
      k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val terms = new QueryEngineTerms().canonical(query)
    require(terms.nonEmpty, "query has no tokens")

    val base = docs.select(col(idCol).cast("long").as("id"),
      K.krep_tokenize(col(textCol)).as("toks"))
      .select($"id", $"toks", size($"toks").cast("long").as("dl"))
      .cache()

    // one pass: n, avgdl and df_t (docs containing t) together
    val aggCols = Seq(count("*").as("n"), avg("dl").as("avgdl")) ++
      terms.zipWithIndex.map { case (t, i) =>
        count(when(array_contains($"toks", t), 1)).as(s"df_$i")
      }
    val stats = base.agg(aggCols.head, aggCols.tail: _*).head()
    val n = stats.getLong(0)
    val avgdl = stats.getDouble(1)
    val idfs = terms.indices.map(i => Bm25.idf(n, stats.getLong(2 + i)))

    // same op order as Bm25.addend: idf * (num / den); tf per term from the
    // codegen'd occurrence counter instead of explode + groupBy
    val denNorm = lit(Bm25.K1) *
      (lit(1.0 - Bm25.B) + lit(Bm25.B) * $"dl" / lit(avgdl))
    val score = terms.zipWithIndex.foldLeft(lit(0.0)) { case (acc, (t, i)) =>
      val tf = graft.ops.kernels.token_occurrences($"toks", t)
      acc + lit(idfs(i)) * ((tf * lit(Bm25.K1 + 1.0)) / (tf + denNorm))
    }
    val scored = base
      .filter(terms.map(t => array_contains($"toks", t)).reduce(_ || _))
      .select($"id", score.as("score"))
      .orderBy($"score".desc, $"id".asc)
      .limit(k)

    val rows = scored.collect()
    base.unpersist()
    spark.createDataFrame(rows.toSeq.zipWithIndex.map { case (r, i) =>
      (i + 1, r.getLong(0), r.getDouble(1))
    }).toDF("rank", "id", "score")
  }
}
