package graft.query

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.krep.{functions => K}

/** Pins the rewritten scan-path BM25 (one-pass stats+df, per-row tf kernel,
  * no token explode) bit-exactly against the explode/groupBy formulation it
  * replaced — scores, row set and order must all be identical.
  */
class Bm25DfSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  /** The pre-rewrite shape, inlined as the oracle. */
  private def oldTopK(docs: org.apache.spark.sql.DataFrame, query: String,
      k: Int): Seq[(Int, Long, Double)] = {
    import spark.implicits._
    val terms = new QueryEngineTerms().canonical(query)
    val base = docs.select(col("doc_id").cast("long").as("id"),
      K.krep_tokenize(col("text")).as("toks"))
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
    def chain(f: Int => org.apache.spark.sql.Column) =
      terms.zipWithIndex.tail.foldLeft(when($"term" === terms.head, f(0))) {
        case (acc, (t, i)) => acc.when($"term" === t, f(i))
      }
    val num = $"tf" * lit(Bm25.K1 + 1.0)
    val den = $"tf" + lit(Bm25.K1) *
      (lit(1.0 - Bm25.B) + lit(Bm25.B) * $"dl" / lit(avgdl))
    val addendCol = chain(i => lit(idfs(i))) * (num / den)
    val scored = tf
      .withColumn("ti", chain(i => lit(i)))
      .withColumn("addend", addendCol)
      .groupBy($"id")
      .agg(sort_array(collect_list(struct($"ti", $"addend"))).as("parts"))
      .select($"id",
        aggregate($"parts", lit(0.0),
          (acc, x) => acc + x.getField("addend")).as("score"))
      .orderBy($"score".desc, $"id".asc)
      .limit(k)
    val rows = scored.collect()
    base.unpersist()
    rows.toSeq.zipWithIndex.map { case (r, i) =>
      (i + 1, r.getLong(0), r.getDouble(1))
    }
  }

  test("rewritten topK == explode/groupBy formulation, scores bit-exact") {
    import spark.implicits._
    val texts = Seq(
      "spark window the table merge",
      "the the the window",
      "spark spark window window window the",
      "nothing relevant here at all",
      "window", "the quick spark", "", "punct! only?? here..",
      "spark window the spark window the spark window the")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    for (q <- Seq("spark window the", "window", "the zzzmissing", "spark the")) {
      val expected = oldTopK(docs, q, 5)
      val got = Bm25Df.topK(docs, "doc_id", "text", q, 5)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(got == expected, s"query '$q'")
      // bit-exact, not just ==: compare raw long bits of every score
      assert(got.map(t => java.lang.Double.doubleToRawLongBits(t._3)) ==
        expected.map(t => java.lang.Double.doubleToRawLongBits(t._3)),
        s"score bits for '$q'")
    }
  }
}
