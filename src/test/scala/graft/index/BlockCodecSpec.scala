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

  test("packPositions strips concatenate byte-identically to encodePosLists") {
    (0 until 200).foreach { _ =>
      val lists = Array.fill(1 + rnd.nextInt(40)) {
        val n = 1 + rnd.nextInt(12)
        val xs = new Array[Int](n)
        var cur = rnd.nextInt(200)
        var i = 0
        while (i < n) { xs(i) = cur; cur += 1 + rnd.nextInt(500); i += 1 }
        xs
      }
      val whole = BlockCodec.encodePosLists(lists)
      val strips = lists.flatMap(BlockCodec.packPositions)
      assert(java.util.Arrays.equals(whole, strips))
      // and the concatenation decodes back to the original lists
      val dec = BlockCodec.decodePosLists(strips, lists.map(_.length))
      assert(dec.map(_.toSeq).toSeq == lists.map(_.toSeq).toSeq)
    }
  }

  test("packed term-positions expression == unpacked twin") {
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.catalyst.InternalRow
    val texts = Seq("", "one", "a b a b a", "The the THE tie",
      "x y z x  punct, y! z?", ("w1 w2 w3 " * 50).trim)
    texts.foreach { t =>
      val u = UTF8String.fromString(t)
      val un = graft.krep.KrepTermPositions.termPositions(u)
      val pk = graft.krep.KrepTermPositionsPacked.packed(u)
      assert(un.numElements() == pk.numElements(), s"'$t'")
      (0 until un.numElements()).foreach { i =>
        val ur = un.array(i).asInstanceOf[InternalRow]
        val pr = pk.array(i).asInstanceOf[InternalRow]
        assert(ur.getUTF8String(0) == pr.getUTF8String(0))
        val pos = ur.getArray(1).asInstanceOf[GenericArrayData]
          .array.map(_.asInstanceOf[Int])
        assert(pr.getInt(1) == pos.length)
        assert(java.util.Arrays.equals(pr.getBinary(2),
          BlockCodec.packPositions(pos)))
      }
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
