package graft.index

import org.scalatest.funsuite.AnyFunSuite

class BlockCodecSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)

  test("delta-varint roundtrip on strictly increasing longs (200 seeded cases)") {
    (0 until 200).foreach { _ =>
      val n = 1 + rnd.nextInt(300)
      val start = math.abs(rnd.nextLong()) % (1L << 50)
      val xs = new Array[Long](n)
      var cur = start
      var i = 0
      while (i < n) {
        xs(i) = cur
        cur += 1 + (math.abs(rnd.nextLong()) % (1L << 20))
        i += 1
      }
      val enc = BlockCodec.encodeDeltaLongs(xs)
      assert(BlockCodec.decodeDeltaLongs(enc, n).toSeq == xs.toSeq)
    }
  }

  test("int varint roundtrip incl. boundaries") {
    val cases = Seq(
      Array(0, 1, 127, 128, 16383, 16384, Int.MaxValue),
      Array.fill(500)(rnd.nextInt(Int.MaxValue)))
    cases.foreach { arr =>
      val enc = BlockCodec.encodeInts(arr)
      assert(BlockCodec.decodeInts(enc, arr.length).toSeq == arr.toSeq)
    }
  }

  test("delta encoding compresses dense runs") {
    val xs = Array.tabulate(128)(i => 1000000L + i * 2)
    val enc = BlockCodec.encodeDeltaLongs(xs)
    assert(enc.length < 128 * 8 / 4) // ≥4x smaller than raw longs
  }

  test("empty array and single element") {
    assert(BlockCodec.encodeDeltaLongs(Array.empty[Long]).isEmpty)
    val one = BlockCodec.encodeDeltaLongs(Array(42L))
    assert(BlockCodec.decodeDeltaLongs(one, 1).toSeq == Seq(42L))
  }

  test("non-increasing input is rejected") {
    intercept[IllegalArgumentException] {
      BlockCodec.encodeDeltaLongs(Array(5L, 5L))
    }
  }
}
