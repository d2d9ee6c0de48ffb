package graft.krep

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Seeded random differential: krep match enumeration vs a naive
  * quadratic oracle over random ASCII strings (incl. '\n' and NUL bytes),
  * covering overlap modes, case folding, whole-word and multi-pattern
  * (FIXTURES.md §4).
  */
class KrepDifferentialSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(4242)
  private val alphabet = "aAbB_1 \n\u0000xyz".toCharArray

  private def randText(n: Int): String =
    new String(Array.fill(n)(alphabet(rnd.nextInt(alphabet.length))))

  private def randPattern(): String =
    new String(Array.fill(1 + rnd.nextInt(4))(
      alphabet(rnd.nextInt(alphabet.length - 3)))) // no \n/NUL/x in patterns

  /** O(n·m) oracle: all occurrences byte-wise, then flag/mode filters. */
  private def oracle(text: Array[Byte], pats: Seq[Array[Byte]], cs: Boolean,
      ww: Boolean, overlapping: Boolean): Seq[(Int, Int)] = {
    def fold(b: Byte) = if (cs) b else AsciiFold.fold(b)
    val all = for {
      (p, _) <- pats.zipWithIndex
      if p.nonEmpty && p.length <= text.length
      i <- 0 to (text.length - p.length)
      if p.indices.forall(j => fold(text(i + j)) == fold(p(j)))
      if !ww || ((i == 0 || !AsciiFold.isWordByte(text(i - 1))) &&
        (i + p.length >= text.length || !AsciiFold.isWordByte(text(i + p.length))))
    } yield (i, i + p.length)
    val sorted = all.sorted
    if (overlapping) sorted
    else {
      // leftmost-first, resume at match end (mirrors KrepMatcher semantics)
      var lastEnd = 0
      sorted.flatMap { case (s, e) =>
        if (s >= lastEnd) { lastEnd = e; Some((s, e)) } else None
      }
    }
  }

  test("1000 random cases: positions == quadratic oracle") {
    (0 until 1000).foreach { caseIdx =>
      val text = randText(rnd.nextInt(120))
      val ov = rnd.nextBoolean()
      // non-overlapping multi-pattern selection order is kernel-defined in
      // the reference (AC emission order) and whole-word interacts with the
      // non-overlap advance ambiguously — the reference pins neither; the
      // differential covers the combinations the reference does pin
      val nPats = if (ov) 1 + rnd.nextInt(3) else 1
      val pats = Seq.fill(nPats)(randPattern()).distinct
      val cs = rnd.nextBoolean()
      val ww = if (ov) rnd.nextBoolean() else false

      val m = new KrepMatcher(KrepParams(pats, caseSensitive = cs,
        wholeWord = ww, overlapping = ov))
      val s = UTF8String.fromString(text)
      val got = {
        val p = m.positions(s)
        (0 until p.numElements()).map { i =>
          val r = p.getStruct(i, 3); (r.getInt(0), r.getInt(1))
        }
      }
      val want = oracle(text.getBytes("UTF-8"),
        pats.map(_.getBytes("UTF-8")), cs, ww, ov)

      // overlapping mode: exact multiset incl. duplicates from several
      // patterns matching the same span; non-overlapping: exact sequence
      assert(got.sorted == want.sorted,
        s"case $caseIdx text=${text.replace("\n", "\\n").replace("\u0000", "\\0")} " +
          s"pats=$pats cs=$cs ww=$ww ov=$ov: got=$got want=$want")
    }
  }
}
