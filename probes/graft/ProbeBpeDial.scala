package graft

// disposable probe main (not part of the library): probe 28 — the BPE
// fit at PRODUCTION dials (VERDICT r14 item 6). The gate fits 512
// words / 64 merges; a production tokenizer fits tens of thousands of
// words and 1k+ merges, all in the DRIVER loop (the corpus only pays
// the one word-count aggregate). This probe prices learnMerges itself
// on a synthetic Zipf dictionary so the dial's cost curve is measured,
// not guessed: cost per merge is O(Vocab · avg-symbols) for the pair
// recount plus the same for the merge apply, so total is
// O(Merges · Vocab · len) — quadratic in nothing.
object ProbeBpeDial {
  def main(args: Array[String]): Unit = {
    // deterministic synthetic dictionary: pseudo-words over a 26-letter
    // alphabet via an LCG (no RNG-API dependence), Zipf-ish frequencies
    def mkVocab(n: Int): Seq[(String, Long)] = {
      var x = 12345L
      def next(): Long = { x = (x * 6364136223846793005L + 1442695040888963407L); x >>> 33 }
      (0 until n).map { i =>
        val len = 3 + (next() % 10).toInt
        val w = new StringBuilder
        (0 until len).foreach(_ => w += ('a' + (next() % 26).toInt).toChar)
        (w.result(), (1000000L / (i + 1)) + 1) // Zipf rank weight
      }.distinct
    }
    val grid = Seq((512, 64), (5000, 256), (20000, 512), (50000, 1000),
      (50000, 2000))
    grid.foreach { case (v, m) =>
      val vocab = mkVocab(v)
      // private[graft] access via the package: time the pure fit
      val t0 = System.nanoTime()
      val merges = graft.operators.Bpe.learnMerges(vocab, m)
      val s = (System.nanoTime() - t0) / 1e9
      println(f"fit V=$v%6d M=$m%5d: $s%8.2f s  (learned ${merges.size} merges)")
    }
  }
}
