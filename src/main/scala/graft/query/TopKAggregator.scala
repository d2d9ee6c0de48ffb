package graft.query

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-heap top-k as a typed Aggregator (SURVEY.md §2.9 `topk_by_score`):
  * partial heaps per partition merge associatively — the distributed analog
  * of the reference's `-m` limiter merge (krep.c:329-357). Semantically equal
  * to `ORDER BY score DESC, docId ASC LIMIT k` (asserted in tests), but with
  * map-side reduction: each partition ships at most k rows to the merge.
  */
final class TopKAggregator(k: Int)
    extends Aggregator[ScoredDoc, Array[ScoredDoc], Array[ScoredDoc]] {

  private def worse(a: ScoredDoc, b: ScoredDoc): Boolean =
    a.score < b.score || (a.score == b.score && a.docId > b.docId)

  override def zero: Array[ScoredDoc] = Array.empty

  override def reduce(buf: Array[ScoredDoc], d: ScoredDoc): Array[ScoredDoc] =
    insert(buf, d)

  override def merge(a: Array[ScoredDoc], b: Array[ScoredDoc]): Array[ScoredDoc] =
    b.foldLeft(a)(insert)

  private def insert(buf: Array[ScoredDoc], d: ScoredDoc): Array[ScoredDoc] = {
    if (buf.length < k) {
      (buf :+ d).sortBy(s => (-s.score, s.docId))
    } else if (worse(buf.last, d)) {
      val out = buf.clone()
      out(k - 1) = d
      out.sortBy(s => (-s.score, s.docId))
    } else buf
  }

  override def finish(r: Array[ScoredDoc]): Array[ScoredDoc] = r
  override def bufferEncoder: Encoder[Array[ScoredDoc]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[ScoredDoc]]()
  override def outputEncoder: Encoder[Array[ScoredDoc]] = bufferEncoder
}
