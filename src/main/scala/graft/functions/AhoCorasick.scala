package graft.functions

/** Aho–Corasick multi-pattern substring matcher — the production shape
  * for exact-substring decontamination (q_decontaminate_exact).
  *
  * Why (guide §1.2 "the distributed algorithm" / r17 sf100 evidence):
  * the naive plan probes every training document with `instr` once per
  * eval snippet — ×|eval| sequential scans of every text, measured
  * super-linear (exp 1.27, 462 s at sf100) because the eval suite is a
  * fixed benchmark while the corpus grows. The automaton matches ALL
  * snippets in ONE left-to-right pass per document (O(|text| + hits)),
  * built once on the driver from the collected (bounded, loudly
  * guarded) eval suite and broadcast.
  *
  * Semantics contract: [[matchedIds]] returns the ids of every pattern
  * that occurs as a SUBSTRING of the text (each id once) — exactly the
  * `instr(text, snip) > 0` predicate of the oracle's cross join,
  * including duplicate snippets carrying distinct ids. Matching is on
  * Java char units; for valid strings substring containment is
  * identical to DuckDB's strpos/Spark's instr byte-level answer
  * (UTF-8/UTF-16 are both self-synchronizing on code-point-aligned
  * patterns, and the gate corpus is ASCII).
  *
  * Scale: nodes ≤ Σ|pattern| + 1; the dense DFA is (nodes × alphabet)
  * ints — for a benchmark suite of thousands of short snippets this is
  * a few MB, broadcast once. Never corpus-proportional (the caller
  * guards the suite size the same way boundedBroadcast did).
  */
final class AhoCorasick private (
    alpha: Array[Int],        // char -> alphabet index, -1 if absent
    alphaSize: Int,
    dfa: Array[Int],          // node*alphaSize + a -> next node
    outIds: Array[Array[Long]], // node -> ids of patterns ending here (may be empty)
    outPat: Array[Int],       // node -> pattern ordinal ending here, -1 if none
    outLink: Array[Int],      // node -> nearest terminal node via fail chain, 0 = none
    val nPatterns: Int) extends Serializable {

  /** Distinct ids of all patterns contained in `text`, in first-match
    * order (callers aggregate with count/min — order-free). */
  def matchedIds(text: String): Seq[Long] = {
    if (text == null || nPatterns == 0) return Seq.empty
    val seen = new Array[Boolean](nPatterns)
    val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    var state = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      val a = alpha(c)
      state = if (a < 0) 0 else dfa(state * alphaSize + a)
      var t = if (outPat(state) >= 0) state else outLink(state)
      while (t != 0) {
        val pat = outPat(t)
        if (!seen(pat)) {
          seen(pat) = true
          buf ++= outIds(t)
        }
        t = outLink(t)
      }
      i += 1
    }
    buf.toSeq
  }
}

object AhoCorasick {

  /** Build from (id, pattern) pairs; duplicate patterns merge their ids
    * onto one terminal node. Empty patterns are rejected (an empty
    * snippet would "match" every document — the callers' length guards
    * make it impossible, and a loud error beats a silent flood). */
  def apply(entries: Seq[(Long, String)]): AhoCorasick = {
    require(entries.forall(_._2.nonEmpty), "AhoCorasick: empty pattern")
    // distinct patterns, ids grouped
    val byPat = entries.groupBy(_._2).toSeq.sortBy(_._1)
    val patterns = byPat.map(_._1).toArray
    val idsByPat = byPat.map(_._2.map(_._1).sorted.toArray).toArray
    // alphabet over pattern chars only; any other char resets to root
    val alpha = Array.fill(Char.MaxValue + 1)(-1)
    var alphaSize = 0
    patterns.foreach(_.foreach { ch =>
      if (alpha(ch) < 0) { alpha(ch) = alphaSize; alphaSize += 1 }
    })
    val maxNodes = patterns.map(_.length).sum + 1
    val trie = Array.fill(maxNodes * math.max(alphaSize, 1))(-1)
    val outPat = Array.fill(maxNodes)(-1)
    var nNodes = 1
    var p = 0
    while (p < patterns.length) {
      var node = 0
      patterns(p).foreach { ch =>
        val a = alpha(ch)
        var nxt = trie(node * alphaSize + a)
        if (nxt < 0) { nxt = nNodes; nNodes += 1; trie(node * alphaSize + a) = nxt }
        node = nxt
      }
      outPat(node) = p
      p += 1
    }
    // BFS fail links + DFA completion
    val fail = new Array[Int](nNodes)
    val outLink = new Array[Int](nNodes)
    val dfa = new Array[Int](nNodes * alphaSize)
    val queue = new Array[Int](nNodes)
    var qh = 0; var qt = 0
    var a = 0
    while (a < alphaSize) {
      val ch = trie(a)
      if (ch >= 0) { fail(ch) = 0; dfa(a) = ch; queue(qt) = ch; qt += 1 }
      else dfa(a) = 0
      a += 1
    }
    while (qh < qt) {
      val u = queue(qh); qh += 1
      outLink(u) = if (outPat(fail(u)) >= 0) fail(u) else outLink(fail(u))
      a = 0
      while (a < alphaSize) {
        val ch = trie(u * alphaSize + a)
        if (ch >= 0) {
          fail(ch) = dfa(fail(u) * alphaSize + a)
          dfa(u * alphaSize + a) = ch
          queue(qt) = ch; qt += 1
        } else {
          dfa(u * alphaSize + a) = dfa(fail(u) * alphaSize + a)
        }
        a += 1
      }
    }
    val outIds = new Array[Array[Long]](nNodes)
    var n = 0
    while (n < nNodes) {
      outIds(n) = if (outPat(n) >= 0) idsByPat(outPat(n)) else Array.emptyLongArray
      n += 1
    }
    new AhoCorasick(alpha, alphaSize,
      java.util.Arrays.copyOf(dfa, nNodes * alphaSize),
      outIds, java.util.Arrays.copyOf(outPat, nNodes), outLink, patterns.length)
  }
}
