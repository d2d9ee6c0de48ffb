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

  /** The buffer is kept best-first sorted; insertion is a binary search +
    * one arraycopy (O(log k) compare, O(k) move) instead of a full re-sort
    * per element — the difference between O(n log k) and O(n k log k) when
    * someone passes k in the thousands.
    */
  private def insert(buf: Array[ScoredDoc], d: ScoredDoc): Array[ScoredDoc] = {
    if (buf.length >= k && !worse(buf.last, d)) return buf
    var lo = 0
    var hi = buf.length
    while (lo < hi) {
      val m = (lo + hi) >>> 1
      if (worse(buf(m), d)) hi = m else lo = m + 1
    }
    val n = math.min(buf.length + 1, k)
    val out = new Array[ScoredDoc](n)
    System.arraycopy(buf, 0, out, 0, lo)
    out(lo) = d
    if (lo < n - 1) System.arraycopy(buf, lo, out, lo + 1, n - 1 - lo)
    out
  }

  override def finish(r: Array[ScoredDoc]): Array[ScoredDoc] = r
  override def bufferEncoder: Encoder[Array[ScoredDoc]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[ScoredDoc]]()
  override def outputEncoder: Encoder[Array[ScoredDoc]] = bufferEncoder
}
