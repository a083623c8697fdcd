package graft.ops

/** In-memory BPE merge-loop kernel — the single-task fast path of
  * [[Curation.bpeMergeRounds]] (r16 optimization round).
  *
  * The distributed loop's per-round cost at bench scale is pure job
  * overhead: the (word, cnt) relation is vocab-bounded (tens of
  * thousands of rows at sf0.1), yet every merge round paid a full
  * Spark aggregation job — 256 rounds ≈ 256 sequential jobs ≈ 24 s of
  * wall for ~2 s of arithmetic. This kernel runs the identical loop
  * over the aggregated vocabulary inside ONE executor task.
  *
  * Semantics are bit-for-bit those of the distributed loop and the
  * DuckDB oracle chain (BpeTrainSpec diffs all three):
  *  - state is the '|'-bounded symbol string per word, weighted by
  *    the word's instance count;
  *  - per round, the argmax pair by (count desc, pair asc) — pair
  *    strings are `a + " " + b` over [a-z] tokens, so Java string
  *    order == UTF8 binary order == the engines' ORDER BY;
  *  - the merge is exactly TWO passes of left-to-right
  *    non-overlapping literal replace of `"|a|b|"` with `"|ab|"`
  *    (`java.lang.String.replace` — the same scan `replace()`
  *    performs in Spark and DuckDB); the residue a double pass
  *    leaves on odd self-overlap runs is part of the contract;
  *  - each pick records the corpus token total AFTER its merge
  *    (per-word tokens = pairs + 1 ⇒ total = Σ cnt·len);
  *  - the loop stops early when no adjacent pair remains.
  *
  * Cost: pair counts are maintained INCREMENTALLY — a merge of pair
  * P only re-prices words whose current string contains P (found via
  * an occurs-in index with lazily-discarded stale entries), so a
  * round is O(words containing P · word length) plus one
  * O(distinct pairs) argmax scan, not a full corpus recount.
  */
private[ops] object BpeKernel extends Serializable {

  /** Split a '|'-bounded symbol string into its symbols. */
  private def symbols(s: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](8)
    var i = 0
    val n = s.length
    while (i < n) {
      val j = s.indexOf('|', i)
      if (j < 0) { if (i < n) { out += s.substring(i); () }; i = n }
      else { if (j > i) { out += s.substring(i, j); () }; i = j + 1 }
    }
    out.toArray
  }

  /** Number of symbols = '|' count − 1 for the canonical "|a|b|"
    * form (empty-middle-free, '|'-framed). */
  private def symCount(s: String): Int = {
    var c = 0
    var i = 0
    while (i < s.length) { if (s.charAt(i) == '|') c += 1; i += 1 }
    math.max(c - 1, 0)
  }

  /** Run `rounds` argmax-merge rounds over `(s, cnt)` words; returns
    * the pick table (round, pair, pair_count, corpus_toks). */
  def train(words: Iterator[(String, Long)], rounds: Int)
      : Seq[(Int, String, Long, Long)] = {
    val ws = new scala.collection.mutable.ArrayBuffer[String]()
    val cs = new scala.collection.mutable.ArrayBuffer[Long]()
    words.foreach { case (s, c) => ws += s; cs += c; () }
    val nW = ws.length
    var totalToks = 0L
    val counts = new java.util.HashMap[String, Long]()
    // pair → word indexes whose string contained the pair when last
    // re-priced; entries go stale after a rewrite and are re-checked
    // (s.contains) before use
    val buckets = new java.util.HashMap[String, java.util.ArrayList[Int]]()
    def addPairs(idx: Int, s: String, w: Long, index: Boolean): Unit = {
      val sy = symbols(s)
      var i = 0
      var last: String = null
      while (i < sy.length - 1) {
        val p = sy(i) + " " + sy(i + 1)
        counts.merge(p, w, (a, b) => a + b)
        if (index && (last == null || p != last)) {
          var b = buckets.get(p)
          if (b == null) { b = new java.util.ArrayList[Int](); buckets.put(p, b) }
          // dedupe only against the immediately preceding pair — full
          // per-word dedupe is not needed (processing skips repeats
          // via the rewritten-string check)
          if (b.isEmpty || b.get(b.size - 1) != idx) b.add(idx)
          ()
        }
        last = p
        i += 1
      }
    }
    def subPairs(s: String, w: Long): Unit = {
      val sy = symbols(s)
      var i = 0
      while (i < sy.length - 1) {
        counts.merge(sy(i) + " " + sy(i + 1), -w, (a, b) => a + b)
        i += 1
      }
    }
    var i = 0
    while (i < nW) {
      totalToks += cs(i) * symCount(ws(i))
      addPairs(i, ws(i), cs(i), index = true)
      i += 1
    }
    // round stamp per word: a bucket can carry the same word twice
    // (re-priced in an earlier round, then found again); the merge
    // must apply AT MOST once per word per round — the contract is
    // exactly one double-replace pass, never a second
    val lastRound = new Array[Int](nW)
    val picks = Seq.newBuilder[(Int, String, Long, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      // argmax by (count desc, pair asc) over live entries
      var bestP: String = null
      var bestC = 0L
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue
        if (c > bestC || (c == bestC && c > 0L &&
            (bestP == null || e.getKey.compareTo(bestP) < 0))) {
          bestC = c; bestP = e.getKey
        }
      }
      if (bestP == null) done = true
      else {
        val pat = "|" + bestP.replace(" ", "|") + "|"
        val rep = "|" + bestP.replace(" ", "") + "|"
        val affected = buckets.remove(bestP)
        if (affected != null) {
          val n = affected.size
          var k = 0
          while (k < n) {
            val idx = affected.get(k)
            val s = ws(idx)
            // skip stale entries and round-duplicates
            if (lastRound(idx) != r && s.contains(pat)) {
              lastRound(idx) = r
              val w = cs(idx)
              subPairs(s, w)
              val s2 = s.replace(pat, rep).replace(pat, rep)
              totalToks += (symCount(s2) - symCount(s)) * w
              addPairs(idx, s2, w, index = true)
              ws(idx) = s2
            }
            k += 1
          }
        }
        picks += ((r, bestP, bestC, totalToks))
      }
      r += 1
    }
    picks.result()
  }
}
