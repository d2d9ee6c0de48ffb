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

  /** Top-k (rank, id, score) for a free-text query. Narrow scans over a
    * pruned (id, text) projection; the top-k is `ORDER BY ... LIMIT k`
    * (per-partition heads + driver merge, no global sort materialization).
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

    val stats = base.agg(count("*").as("n"), avg("dl").as("avgdl")).head()
    val n = stats.getLong(0)
    val avgdl = stats.getDouble(1)

    val tf = base
      .select($"id", $"dl", explode($"toks").as("term"))
      .filter($"term".isin(terms.toSeq: _*))
      .groupBy($"id", $"dl", $"term").agg(count("*").cast("int").as("tf"))

    val dfByTerm = tf.groupBy($"term").agg(countDistinct($"id").as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val idfs = terms.map(t => Bm25.idf(n, dfByTerm.getOrElse(t, 0L)))

    // term → (index, idf) as when-chains: tiny, codegen'd, no UDF
    def chain(f: Int => Column): Column =
      terms.zipWithIndex.tail.foldLeft(when($"term" === terms.head, f(0))) {
        case (acc, (t, i)) => acc.when($"term" === t, f(i))
      }
    val tiCol = chain(i => lit(i))
    // addend with the same op order as Bm25.addend: idf * (num / den)
    val num = $"tf" * lit(Bm25.K1 + 1.0)
    val den = $"tf" + lit(Bm25.K1) *
      (lit(1.0 - Bm25.B) + lit(Bm25.B) * $"dl" / lit(avgdl))
    val addendCol = chain(i => lit(idfs(i))) * (num / den)

    val scored = tf
      .withColumn("ti", tiCol)
      .withColumn("addend", addendCol)
      .groupBy($"id")
      .agg(sort_array(collect_list(struct($"ti", $"addend"))).as("parts"))
      .select($"id",
        aggregate($"parts", lit(0.0), (acc, x) => acc + x.getField("addend")).as("score"))
      .orderBy($"score".desc, $"id".asc)
      .limit(k)

    val rows = scored.collect()
    base.unpersist()
    spark.createDataFrame(rows.toSeq.zipWithIndex.map { case (r, i) =>
      (i + 1, r.getLong(0), r.getDouble(1))
    }).toDF("rank", "id", "score")
  }
}
