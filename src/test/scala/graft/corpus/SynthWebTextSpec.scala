package graft.corpus

import org.scalatest.funsuite.AnyFunSuite

class SynthWebTextSpec extends AnyFunSuite {

  test("generation is deterministic") {
    val a = SynthWebText.page(12345L)
    val b = SynthWebText.page(12345L)
    assert(a.url == b.url && a.text == b.text && a.lang == b.lang &&
      a.warc_ts == b.warc_ts && a.html.sameElements(b.html))
    val c = SynthWebText.page(12345L, seed = 43L)
    assert(a.text != c.text)
  }

  test("per-row invariant: text == extractText(html), byte-identical") {
    (0L until 500L).foreach { i =>
      val p = SynthWebText.page(i)
      val extracted = SynthWebText.extractText(p.html)
      assert(extracted.getBytes("UTF-8").sameElements(p.text.getBytes("UTF-8")),
        s"extraction mismatch at doc $i")
    }
  }

  test("urls are unique and lengths within 80..1201 tokens") {
    val pages = (0L until 1000L).map(SynthWebText.page(_))
    assert(pages.map(_.url).distinct.size == 1000)
    pages.foreach { p =>
      val n = p.text.split("[^A-Za-z0-9_]+").count(_.nonEmpty)
      assert(n >= 80 && n <= 1210, s"token count $n out of range")
    }
  }

  test("markers planted every 97th doc") {
    val p = SynthWebText.page(0L)
    assert(p.text.contains("plantedmarker0"))
    val q = SynthWebText.page(97L)
    assert(q.text.contains("plantedmarker1"))
    assert(!SynthWebText.page(1L).text.contains("plantedmarker"))
  }

  test("vocabulary has a hot Zipf head") {
    // term(0) should appear in virtually every doc
    val hot = SynthWebText.term(0)
    val hits = (0L until 100L).count(i => SynthWebText.page(i).text.contains(hot))
    assert(hits > 90, s"hot term '$hot' only in $hits/100 docs")
  }
}
