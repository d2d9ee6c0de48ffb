package graft.corpus

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

/** A Common-Crawl-style web page — the engine's external input schema
  * (BASELINE.json `input_hint`): url STRING, warc_ts TIMESTAMP, html BINARY,
  * text STRING, lang STRING.
  */
final case class Page(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Deterministic synthetic Common-Crawl-style corpus.
  *
  * Every field of every page is a pure function of (seed, docSeq): generation
  * distributes via `spark.range` with zero data movement, and any scale of the
  * corpus can be re-derived exactly — which is what makes the per-row
  * extraction invariant testable (text == extractText(html), byte-identical,
  * recomputed independently).
  *
  * The token stream is Zipf(1.1) over a 50k-term vocabulary, so a realistic
  * hot head exists ("t0" plays the role of "the") for skew tests; doc lengths
  * are 80..1200 tokens skewed short; ~1% of docs carry planted marker phrases
  * for known-answer queries.
  */
object SynthWebText {

  val VocabSize = 50000
  val ZipfS = 1.1

  // --- deterministic PRNG (SplitMix64): stateless, seedable per doc --------
  @inline private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private final class Rng(seed: Long) {
    private var s = seed
    def nextLong(): Long = { s += 0x9e3779b97f4a7c15L; mix64(s - 0x9e3779b97f4a7c15L) }
    def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
    def nextInt(bound: Int): Int = ((nextLong() >>> 1) % bound).toInt
  }

  // --- vocabulary -----------------------------------------------------------
  private val syllables = Array(
    "ba", "de", "ki", "lo", "mu", "na", "pe", "ra", "so", "tu",
    "ver", "min", "tal", "cor", "sun", "wel", "fin", "gra", "hol", "jet")

  /** term(rank): rank 0 is the hottest. Lowercase [a-z0-9] only, so the
    * krep tokenizer (word chars, ASCII fold) maps each token to itself.
    */
  def term(rank: Int): String = {
    val h = mix64(rank.toLong * 0x9e3779b97f4a7c15L + 0x1234abcd)
    val nSyl = 2 + (rank % 3) + (((h >>> 8) % 2).toInt)
    val sb = new StringBuilder
    var x = h
    var i = 0
    while (i < nSyl) {
      sb.append(syllables(((x >>> (i * 7)) & 0x7fffffff).toInt % syllables.length))
      i += 1
    }
    x = mix64(h)
    sb.append((x >>> 16 & 0x7fffffff).toInt % 100) // digit suffix → uniqueness
    sb.toString
  }

  /** Cumulative Zipf(1.1) distribution over ranks, built once per JVM. */
  private lazy val zipfCum: Array[Double] = {
    val w = new Array[Double](VocabSize)
    var i = 0
    var sum = 0.0
    while (i < VocabSize) { sum += 1.0 / math.pow(i + 1.0, ZipfS); w(i) = sum; i += 1 }
    i = 0
    while (i < VocabSize) { w(i) /= sum; i += 1 }
    w
  }

  private def sampleRank(u: Double): Int = {
    var lo = 0
    var hi = VocabSize - 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (zipfCum(mid) < u) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Marker phrases planted in ~1% of docs — known-answer queries. */
  val Markers: IndexedSeq[String] =
    (0 until 5).map(i => s"plantedmarker$i graftphrase$i")

  // --- page generation ------------------------------------------------------
  def page(docSeq: Long, seed: Long = 42L): Page = {
    val rng = new Rng(mix64(seed) ^ mix64(docSeq))
    val u = rng.nextDouble()
    val nTokens = 80 + (u * u * 1120).toInt // skewed short, 80..1200

    val sb = new StringBuilder(nTokens * 8)
    var i = 0
    var sentence = 0
    while (i < nTokens) {
      val t = term(sampleRank(rng.nextDouble()))
      val word =
        if (sentence == 0 && rng.nextInt(4) == 0) t.capitalize else t
      if (i > 0) sb.append(if (sentence >= 9 + rng.nextInt(8)) { sentence = -1; ".\n" } else " ")
      sb.append(word)
      sentence += 1
      i += 1
    }
    if (docSeq % 97 == 0) {
      sb.append(". ").append(Markers((docSeq / 97 % Markers.length).toInt))
    }
    sb.append('.')
    val text = sb.toString

    val host = (mix64(docSeq ^ seed) >>> 40) % 1000
    val url = s"https://site-$host.example.org/p/$docSeq"
    // deterministic timestamp inside 2024 (UTC)
    val ts = new Timestamp(1704067200000L + (mix64(docSeq + 7) >>> 32) % 31536000000L)
    val langs = Vector("de", "fr", "es", "it")
    val lang =
      if (rng.nextInt(100) < 95) "en" else langs(rng.nextInt(4))
    Page(url, ts, htmlOf(url, text), text, lang)
  }

  /** Deterministic html wrapper of the text — the "raw crawl" column. */
  def htmlOf(url: String, text: String): Array[Byte] = {
    val escaped = text
      .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    s"""<html><head><meta charset="utf-8"><link rel="canonical" href="$url"></head><body><article>$escaped</article></body></html>"""
      .getBytes("UTF-8")
  }

  /** Pure extraction html → text. The engine-side and "reference" extraction
    * are this same pure function; the per-row invariant test recomputes it
    * independently and byte-compares against the stored `text` column.
    */
  def extractText(html: Array[Byte]): String = {
    val s = new String(html, "UTF-8")
    val start = s.indexOf("<article>") + "<article>".length
    val end = s.indexOf("</article>")
    require(start >= "<article>".length && end >= start, "malformed synthetic html")
    s.substring(start, end)
      .replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")
  }

  /** Distributed corpus: `spark.range` partitions the id space; each row is
    * derived independently (no shuffle, no driver-side data).
    */
  def pages(spark: SparkSession, n: Long, seed: Long = 42L,
      numPartitions: Int = 32): Dataset[Page] = {
    import spark.implicits._
    spark.range(0L, n, 1L, numPartitions).map(i => page(i, seed))
  }
}
