package graft.krep

import scala.collection.mutable

/** Immutable, serializable Aho-Corasick automaton over bytes.
  *
  * Semantics mirror the reference's multi-pattern kernel
  * (aho_corasick.c:111-271 build, :298-466 search): at every text position the
  * full fail/output chain is followed, so ALL matches are emitted — including
  * overlapping and nested ones (e.g. patterns {a,b,c,ab,bc,abc} over "abc"
  * yield 6 matches). Case-insensitive automata are built over ASCII-folded
  * pattern bytes and fold each text byte during the scan (the reference folds
  * through its global lower_table, aho_corasick.c:161).
  *
  * Built once on the driver per query and shipped to executors inside an
  * expression (small: <= 1024 patterns of <= 1024 bytes each, the reference's
  * own limits, krep.c:2297-2322).
  */
final class AhoCorasick private (
    // flattened trie: children(state * 256 + byte) = next state or -1
    private val children: Array[Int],
    private val fail: Array[Int],
    // outputs(state) = pattern indices ending at this state (after fail-chain
    // closure), empty array if none
    private val outputs: Array[Array[Int]],
    val patternLengths: Array[Int],
    val caseSensitive: Boolean)
    extends Serializable {

  @inline private def next(state: Int, byte: Byte): Int = {
    val b = if (caseSensitive) byte & 0xff else AsciiFold.table(byte & 0xff) & 0xff
    var s = state
    var n = children(s * 256 + b)
    while (n < 0 && s != 0) { s = fail(s); n = children(s * 256 + b) }
    if (n < 0) 0 else n
  }

  /** Visit every match as (startOffset, endOffsetExclusive, patternIdx).
    * Returns the number of matches visited; `onMatch` returning false stops
    * the scan early (max-count support, reference krep.c:1366).
    */
  def scan(bytes: Array[Byte], from: Int, until: Int)(
      onMatch: (Int, Int, Int) => Boolean): Long = {
    var count = 0L
    var state = 0
    var i = from
    while (i < until) {
      state = next(state, bytes(i))
      val outs = outputs(state)
      var j = 0
      while (j < outs.length) {
        val pat = outs(j)
        val end = i + 1
        val start = end - patternLengths(pat)
        count += 1
        if (!onMatch(start, end, pat)) return count
        j += 1
      }
      i += 1
    }
    count
  }
}

object AhoCorasick {
  def build(patterns: Seq[Array[Byte]], caseSensitive: Boolean): AhoCorasick = {
    require(patterns.nonEmpty, "AhoCorasick needs at least one pattern")
    val pats =
      if (caseSensitive) patterns.toArray
      else patterns.map(AsciiFold.foldBytes).toArray

    // growable trie during build
    val childBuf = mutable.ArrayBuffer(Array.fill(256)(-1))
    val outBuf = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Int])
    var states = 1

    pats.zipWithIndex.foreach { case (p, idx) =>
      var s = 0
      var i = 0
      while (i < p.length) {
        val b = p(i) & 0xff
        if (childBuf(s)(b) < 0) {
          childBuf(s)(b) = states
          childBuf += Array.fill(256)(-1)
          outBuf += mutable.ArrayBuffer.empty[Int]
          states += 1
        }
        s = childBuf(s)(b)
        i += 1
      }
      if (p.nonEmpty) outBuf(s) += idx
      // empty pattern matches nothing in the reference's literal kernels
      // (krep.c:2297-2310 rejects len 0); we mirror that by never emitting.
    }

    val fail = new Array[Int](states)
    val queue = mutable.Queue.empty[Int]
    var b = 0
    while (b < 256) {
      val c = childBuf(0)(b)
      if (c > 0) { fail(c) = 0; queue.enqueue(c) }
      b += 1
    }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      var b = 0
      while (b < 256) {
        val c = childBuf(s)(b)
        if (c > 0) {
          var f = fail(s)
          while (f != 0 && childBuf(f)(b) < 0) f = fail(f)
          val fc = childBuf(f)(b)
          fail(c) = if (fc > 0 && fc != c) fc else 0
          // output closure: inherit fail state's outputs so the scan need not
          // walk the fail chain per position (same effect as the reference's
          // fail-chain walk at aho_corasick.c:390-402)
          outBuf(c) ++= outBuf(fail(c))
          queue.enqueue(c)
        }
        b += 1
      }
    }

    val children = new Array[Int](states * 256)
    var s = 0
    while (s < states) {
      System.arraycopy(childBuf(s), 0, children, s * 256, 256)
      s += 1
    }
    new AhoCorasick(children, fail, outBuf.map(_.toArray.sorted).toArray,
      pats.map(_.length), caseSensitive)
  }
}
