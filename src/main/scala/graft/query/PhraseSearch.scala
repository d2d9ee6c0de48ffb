package graft.query

import graft.index.{BlockCodec, PosPostingBlock}

/** Per-segment positional phrase intersection — the shuffle-free phrase
  * kernel. For every docId carrying ALL phrase terms, checks that the phrase
  * tokens occur at consecutive token ordinals (positions are stored in the
  * posting blocks), and emits the doc with its exact BM25 score.
  *
  * This replaces the round-1 per-posting `flatMap → groupBy(docId)` shape:
  * nothing here shuffles — blocks arrive grouped by segment, cursors
  * zipper-merge them in place, and positions decode lazily only for docs that
  * survive the docId intersection. A hot term ("the"-class) costs a linear
  * cursor walk inside its segment, never an N-row exchange.
  *
  * Scoring contract: identical to [[BlockMaxWand]] / the brute-force oracle —
  * addends summed in ascending canonical-term order, bit-identical folds.
  */
object PhraseSearch {

  /** Decoding cursor over one term's blocks within a segment (sorted by
    * firstDoc). Unlike the WAND iterator it exposes per-posting positions;
    * position bytes decode lazily, once per visited block.
    */
  final class PosCursor(blocks: Array[PosPostingBlock]) {
    private var bi = 0
    private var docs: Array[Long] = _
    private var tfs: Array[Int] = _
    private var dls: Array[Int] = _
    private var posLists: Array[Array[Int]] = _ // decoded on first positions()
    private var pos = 0
    var exhausted: Boolean = blocks.isEmpty
    if (!exhausted) load()

    private def load(): Unit = {
      val b = blocks(bi)
      docs = BlockCodec.decodeDeltaLongs(b.docs, b.n)
      tfs = BlockCodec.decodeInts(b.tfs, b.n)
      dls = BlockCodec.decodeInts(b.dls, b.n)
      posLists = null
      pos = 0
    }

    def doc: Long = docs(pos)
    def tf: Int = tfs(pos)
    def dl: Int = dls(pos)

    def positions: Array[Int] = {
      if (posLists == null)
        posLists = BlockCodec.decodePosLists(blocks(bi).poss, tfs)
      posLists(pos)
    }

    /** First doc >= target; whole blocks skipped via lastDoc undecoded. */
    def advanceTo(target: Long): Unit = {
      if (exhausted || docs(pos) >= target) return
      if (blocks(bi).lastDoc < target) {
        do bi += 1 while (bi < blocks.length && blocks(bi).lastDoc < target)
        if (bi >= blocks.length) { exhausted = true; return }
        load()
      }
      var l = pos
      var h = docs.length - 1
      while (l < h) {
        val m = (l + h) >>> 1
        if (docs(m) < target) l = m + 1 else h = m
      }
      pos = l
    }

    def next(): Unit = {
      if (exhausted) return
      pos += 1
      if (pos >= docs.length) {
        bi += 1
        if (bi >= blocks.length) exhausted = true else load()
      }
    }
  }

  @inline private def containsPos(xs: Array[Int], v: Int): Boolean =
    v >= 0 && java.util.Arrays.binarySearch(xs, v) >= 0

  /** True iff some base ordinal places every phrase slot: for each slot s and
    * each offset o in `slotOffsets(s)`, (base + o) ∈ positions(s). Candidate
    * bases enumerate from the slot with the fewest occurrences.
    */
  def positionsMatch(slotPositions: Array[Array[Int]],
      slotOffsets: Array[Array[Int]]): Boolean = {
    var rare = 0
    var i = 1
    while (i < slotPositions.length) {
      if (slotPositions(i).length < slotPositions(rare).length) rare = i
      i += 1
    }
    val rarePos = slotPositions(rare)
    val rareOffs = slotOffsets(rare)
    var pi = 0
    while (pi < rarePos.length) {
      var oi = 0
      while (oi < rareOffs.length) {
        val base = rarePos(pi) - rareOffs(oi)
        if (base >= 0) {
          var ok = true
          var s = 0
          while (ok && s < slotOffsets.length) {
            val offs = slotOffsets(s)
            var j = 0
            while (ok && j < offs.length) {
              ok = containsPos(slotPositions(s), base + offs(j))
              j += 1
            }
            s += 1
          }
          if (ok) return true
        }
        oi += 1
      }
      pi += 1
    }
    false
  }

  /** All phrase matches in one segment, in docId order.
    *
    * @param slotBlocks  blocks of distinct term slot s (canonical term order)
    *                    within this segment, sorted by firstDoc
    * @param slotOffsets phrase token offsets where slot s's term must appear
    * @param idfs        idf per slot
    */
  def segmentMatches(slotBlocks: Array[Array[PosPostingBlock]],
      slotOffsets: Array[Array[Int]], idfs: Array[Double],
      avgdl: Double): Iterator[(Long, Double)] = {
    val nSlots = slotBlocks.length
    val cursors = slotBlocks.map(new PosCursor(_))
    if (cursors.exists(_.exhausted)) return Iterator.empty

    new Iterator[(Long, Double)] {
      private var pendingDoc = -1L
      private var pendingScore = 0.0
      private var done = false

      private def seek(): Unit = {
        while (pendingDoc < 0 && !done) {
          // leapfrog: align every cursor on the current max doc
          var target = cursors(0).doc
          var i = 1
          while (i < nSlots) {
            if (cursors(i).doc > target) target = cursors(i).doc
            i += 1
          }
          var aligned = true
          i = 0
          while (i < nSlots) {
            cursors(i).advanceTo(target)
            if (cursors(i).exhausted) { done = true; aligned = false }
            else if (cursors(i).doc != target) aligned = false
            i += 1
          }
          if (!done && aligned) {
            val slotPositions = Array.tabulate(nSlots)(s => cursors(s).positions)
            if (positionsMatch(slotPositions, slotOffsets)) {
              // ascending-slot fold == the oracle's fixed-order summation
              var score = 0.0
              var s = 0
              while (s < nSlots) {
                score += Bm25.addend(idfs(s), cursors(s).tf, cursors(s).dl, avgdl)
                s += 1
              }
              pendingDoc = target
              pendingScore = score
            }
            i = 0
            while (i < nSlots) {
              cursors(i).next()
              if (cursors(i).exhausted) done = true
              i += 1
            }
          }
        }
      }

      override def hasNext: Boolean = { seek(); pendingDoc >= 0 }
      override def next(): (Long, Double) = {
        seek()
        val r = (pendingDoc, pendingScore)
        pendingDoc = -1L
        r
      }
    }
  }
}
