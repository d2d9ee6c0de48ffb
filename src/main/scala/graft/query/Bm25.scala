package graft.query

/** BM25 (Lucene-style non-negative idf), k1 = 0.9, b = 0.4.
  *
  * Every addend is a pure function of stored ints (tf, dl) and corpus stats
  * (N, df, avgdl); documents are scored by summing addends in ascending
  * canonical term order — both here and in the brute-force oracle — so scores
  * are bit-identical across execution plans and parallelism levels
  * (rank-identical determinism, SURVEY.md §7.4).
  */
object Bm25 {
  val K1 = 0.9
  val B = 0.4

  def idf(n: Long, df: Long): Double =
    math.log(1.0 + (n - df + 0.5) / (df + 0.5))

  def tfComponent(tf: Int, dl: Int, avgdl: Double): Double =
    tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))

  def addend(idfV: Double, tf: Int, dl: Int, avgdl: Double): Double =
    idfV * tfComponent(tf, dl, avgdl)

  /** Upper bound of any addend in a block with the given maxTf/minDl —
    * tfComponent is increasing in tf and decreasing in dl.
    */
  def blockUpperBound(idfV: Double, maxTf: Int, minDl: Int, avgdl: Double): Double =
    addend(idfV, maxTf, minDl, avgdl)
}
