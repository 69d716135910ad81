package graft.functions

import scala.collection.mutable

/** Byte-pair encoding — the REAL tokenizer face of t3 (whose
  * `bpe_tokens` column is a regex approximation of a BPE
  * pre-tokenizer): a greedy ranked-merge encoder over a trained
  * merges table, the public GPT-2-style algorithm (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword
  * Units"; Radford et al. 2019's byte-level variant fixes the
  * pre-tokenization and merge-rank scheme this follows).
  *
  * Shape choices, and where they diverge from GPT-2's shipped
  * tokenizer (whose 50k merges table is a model artifact, not
  * re-derivable here):
  *
  *   - pre-tokenization: letter runs / digit runs / punctuation runs,
  *     each carrying its preceding space (the ` ?\p{L}+`-family
  *     pattern of the public GPT-2 regex, without the apostrophe
  *     special cases); the SAME compiled pattern trains the merges
  *     ([[graft.BpeTrain]]) and encodes at query time, so train and
  *     serve can never disagree on word boundaries.
  *   - the base alphabet is CHARACTERS (not bytes): pure-JVM strings,
  *     unicode-safe, no byte-fallback table to ship. A merges table
  *     trained by [[graft.BpeTrain]] is closed over its corpus
  *     alphabet exactly like byte-level BPE is closed over bytes;
  *     unseen characters simply stay single-character tokens.
  *   - merges apply GREEDILY BY RANK (lowest trained rank first),
  *     the GPT-2 encode loop.
  *
  * The default merges table (`graft/bpe_merges.txt` on the classpath,
  * one `left<TAB>right` per line in rank order) is trained on the
  * sf0.01 documents corpus by `graft.BpeTrain` — deterministic
  * (count-then-lexicographic tie-break), checked in as a fixture.
  */
object Bpe {

  /** The shared pre-tokenizer: a run of letters, digits, or
    * other-non-space, each optionally absorbing one preceding space
    * (the GPT-2 ` ?` convention — spaces belong to the token that
    * follows them); remaining whitespace runs are dropped (they carry
    * no tokens in the space-prefixed scheme).
    */
  val PreToken: java.util.regex.Pattern = java.util.regex.Pattern
    .compile(" ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+")

  def preTokens(text: String): Iterator[String] = new Iterator[String] {
    private val m = PreToken.matcher(text)
    private var has = m.find()
    def hasNext: Boolean = has
    def next(): String = { val s = m.group(); has = m.find(); s }
  }

  /** A trained merges table, rank order = training order. */
  final class Vocab(val merges: IndexedSeq[(String, String)]) {
    private val rank: Map[(String, String), Int] = merges.zipWithIndex.toMap

    /** Greedy ranked-merge encode of ONE pre-token (GPT-2's encode
      * loop): repeatedly merge the adjacent pair with the LOWEST
      * trained rank until no adjacent pair is mergeable.
      */
    def encode(word: String): Vector[String] = {
      var parts: Vector[String] =
        word.iterator.map(_.toString).toVector
      while (parts.length > 1) {
        var bestRank = Int.MaxValue
        var bestIdx = -1
        var i = 0
        while (i < parts.length - 1) {
          rank.get((parts(i), parts(i + 1))) match {
            case Some(r) if r < bestRank => bestRank = r; bestIdx = i
            case _ =>
          }
          i += 1
        }
        if (bestIdx < 0) return parts
        parts = (parts.take(bestIdx) :+
          (parts(bestIdx) + parts(bestIdx + 1))) ++ parts.drop(bestIdx + 2)
      }
      parts
    }
  }

  /** BPE token count of a text, memoized per pre-token — natural text
    * repeats most of its words, so the merge loop runs once per
    * DISTINCT word per partition (the mapPartitions face shares one
    * memo across its rows).
    */
  def countTokens(
      text: String,
      vocab: Vocab,
      memo: mutable.HashMap[String, Int]): Long = {
    var n = 0L
    val it = preTokens(text)
    while (it.hasNext) {
      val w = it.next()
      n += memo.getOrElseUpdate(w, vocab.encode(w).length)
    }
    n
  }

  /** The BPE training loop (Sennrich et al. 2016) over a word
    * frequency table: start from characters, repeatedly merge the
    * most frequent adjacent symbol pair — ties broken
    * lexicographically, so the table is DETERMINISTIC for a given
    * corpus — and stop at `numMerges` or when nothing is left to
    * merge (a closed vocabulary saturates, like the checked-in
    * fixture does at 80). Driver-side by design: the input is the
    * vocabulary-sized distinct-word table (Spark aggregates word
    * counts corpus-side; see [[graft.BpeTrain]]), and BPE training is
    * a one-time fixture build, not a query-path operation.
    */
  def train(
      wordFreq: Seq[(String, Long)],
      numMerges: Int): IndexedSeq[(String, String)] = {
    // INCREMENTAL pair-count maintenance (r12 — the standard trainer
    // optimization, Sennrich et al. 2016 §3's released implementation
    // does the same): the naive loop ([[trainReference]]) recounts
    // EVERY pair of EVERY word per merge — O(merges × corpus-symbols),
    // hours at a realistic 32k-merge vocabulary. Here each merge
    // touches only the words that CONTAIN the merged pair (an
    // occurrence index), updating the global counts by that word's
    // exact before/after pair-multiset diff — so selection state is
    // always bitwise what a full recount would produce, and the output
    // is IDENTICAL to the reference loop (randomized-equivalence spec
    // + the fixture-regeneration spec pin it). Best-pair selection is
    // a lazy-deletion priority queue ordered (count desc, pair lex
    // asc): stale entries pop and drop when their count no longer
    // matches the live map — the same deterministic choice as the
    // reference's full minBy.
    val words: Array[(mutable.ArrayBuffer[String], Long)] =
      wordFreq.toArray.map { case (w, n) =>
        (mutable.ArrayBuffer.from(w.iterator.map(_.toString)), n)
      }
    val counts = mutable.HashMap.empty[(String, String), Long]
    val occurs = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    def pairsOf(syms: mutable.ArrayBuffer[String])
        : mutable.HashMap[(String, String), Long] = {
      val m = mutable.HashMap.empty[(String, String), Long]
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        m.update(p, m.getOrElse(p, 0L) + 1L)
        i += 1
      }
      m
    }
    // (count desc, then lexicographically LEAST pair first): the heap
    // dequeues its MAX, so ties invert the string comparison
    val ord = new Ordering[(Long, String, String)] {
      def compare(x: (Long, String, String),
          y: (Long, String, String)): Int = {
        val c = java.lang.Long.compare(x._1, y._1)
        if (c != 0) c
        else {
          val a = y._2.compareTo(x._2)
          if (a != 0) a else y._3.compareTo(x._3)
        }
      }
    }
    val pq = mutable.PriorityQueue.empty[(Long, String, String)](ord)
    def bump(p: (String, String), delta: Long, wi: Int): Unit = {
      val n = counts.getOrElse(p, 0L) + delta
      if (n <= 0L) { counts.remove(p); () }
      else {
        counts.update(p, n)
        // enqueue on EVERY live change — a decreased count needs its
        // own entry or the pair would become unselectable (its old
        // higher entry pops stale and drops)
        pq.enqueue((n, p._1, p._2))
        if (delta > 0L) {
          occurs.getOrElseUpdate(p, mutable.Set.empty) += wi; ()
        }
      }
    }
    words.zipWithIndex.foreach { case ((syms, n), wi) =>
      pairsOf(syms).foreach { case (p, k) =>
        counts.update(p, counts.getOrElse(p, 0L) + k * n)
        occurs.getOrElseUpdate(p, mutable.Set.empty) += wi
      }
    }
    counts.foreach { case ((a, b), n) => pq.enqueue((n, a, b)) }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var step = 0
    var done = false
    while (step < numMerges && !done) {
      // pop until a LIVE entry (count matches the map) surfaces
      var best: Option[(String, String)] = None
      while (best.isEmpty && pq.nonEmpty) {
        val (n, a, b) = pq.dequeue()
        if (counts.getOrElse((a, b), 0L) == n) best = Some((a, b))
      }
      best match {
        case None => done = true
        case Some(bp) =>
          merges += bp
          val joined = bp._1 + bp._2
          val touched = occurs.getOrElse(bp, mutable.Set.empty)
          touched.toArray.sorted.foreach { wi =>
            val (syms, n) = words(wi)
            val before = pairsOf(syms)
            if (before.contains(bp)) {
              // the reference's exact left-to-right application
              var i = 0
              while (i < syms.length - 1) {
                if (syms(i) == bp._1 && syms(i + 1) == bp._2) {
                  syms.update(i, joined)
                  syms.remove(i + 1)
                } else i += 1
              }
              val after = pairsOf(syms)
              (before.keySet ++ after.keySet).foreach { p =>
                val d = after.getOrElse(p, 0L) - before.getOrElse(p, 0L)
                if (d != 0L) bump(p, d * n, wi)
              }
            }
          }
          occurs.remove(bp)
          counts.remove(bp)
          step += 1
      }
    }
    merges.toIndexedSeq
  }

  /** The UNOPTIMIZED reference trainer — the full-recount loop
    * [[train]] is spec-equated against (randomized inputs + the
    * checked-in fixture). Kept verbatim so the equivalence gate is a
    * comparison against the naive algorithm, not against a past
    * version of the optimized one.
    */
  private[graft] def trainReference(
      wordFreq: Seq[(String, Long)],
      numMerges: Int): IndexedSeq[(String, String)] = {
    val words: Array[(mutable.ArrayBuffer[String], Long)] =
      wordFreq.toArray.map { case (w, n) =>
        (mutable.ArrayBuffer.from(w.iterator.map(_.toString)), n)
      }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var step = 0
    var done = false
    while (step < numMerges && !done) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        // deterministic: highest count, then lexicographically least
        val best = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        val joined = best._1 + best._2
        words.foreach { case (syms, _) =>
          var i = 0
          while (i < syms.length - 1) {
            if (syms(i) == best._1 && syms(i + 1) == best._2) {
              syms.update(i, joined)
              syms.remove(i + 1)
            } else i += 1
          }
        }
        step += 1
      }
    }
    merges.toIndexedSeq
  }

  /** Parse a merges table (one `left<TAB>right` per line, rank
    * order).
    */
  def parseMerges(lines: Iterator[String]): IndexedSeq[(String, String)] =
    lines.filter(_.nonEmpty).map { l =>
      val t = l.split("\t", 2)
      require(t.length == 2, s"malformed merges line: '$l'")
      (t(0), t(1))
    }.toIndexedSeq

  /** The checked-in default merges fixture (see the class doc). */
  lazy val defaultMerges: IndexedSeq[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft/bpe_merges.txt")
    require(in != null,
      "graft/bpe_merges.txt missing from the classpath — run " +
        "graft.BpeTrain to regenerate the fixture")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try parseMerges(src.getLines()) finally src.close()
  }
}
