package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** #171 — the BPE tokenizer: the driver-side fit (merge table), the
  * double-replace fixpoint rule, and the dictionary-encode plan.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learnMerges: merge-all fixpoint through the double-replace rule") {
    // " a b a b " is the replace-overlap trap: a single left-to-right
    // pass consumes the shared boundary space and merges only the
    // first occurrence — the documented second pass must catch the
    // skipped one, so the chain fully contracts over two iterations
    val merges = Bpe.learnMerges(Seq(("abab", 2L)), n = 8)
    assert(merges == Seq(("a", "b"), ("ab", "ab")),
      s"got $merges — the (a,b) merge must collapse BOTH occurrences " +
        "before the next iteration counts pairs")
  }

  test("learnMerges: deterministic (count desc, pair asc) tie-break") {
    // (b,a) and (a,b) tie at count 1 — lexicographic pair order wins
    val merges = Bpe.learnMerges(Seq(("ba", 1L), ("ab", 1L)), n = 1)
    assert(merges == Seq(("a", "b")))
  }

  test("learnMerges: frequency weights beat word count") {
    // 'zz' at freq 5 outweighs three distinct words sharing (a,t)
    val merges = Bpe.learnMerges(
      Seq(("zz", 5L), ("at", 1L), ("bat", 1L), ("cat", 1L)), n = 1)
    assert(merges == Seq(("z", "z")))
  }

  test("bpeTokenize end-to-end on a planted corpus") {
    val docs = Seq(
      (1L, "the the cat"), // three alpha words
      (2L, "THE cat!"),    // lowercases; 'cat!' fails the alpha gate
      (3L, null.asInstanceOf[String]), // excluded (dirty-record rule)
      (4L, "!!! 123"))     // visible, zero alpha words
      .toDF("doc_id", "text")
    // fit by hand: freq the=3 cat=1 → merges (h,e)(t,he)(a,t)(c,at)
    // → both survivors encode to ONE token per word
    val got = Bpe.bpeTokenize(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, 3L, 3L, 1.0),
      (2L, 1L, 1L, 1.0),
      (4L, 0L, 0L, -1.0)), s"got ${got.toSeq}")
  }

  test("vocab/merges dials: defaults pin the gate fit; a binding cap only drops tail pair mass") {
    // r19 verdict item 4: the production dials must not move the
    // gated #171/#172 definitions — dialing vocab at or above the
    // corpus' distinct-word count is a NO-OP (the gate corpora sit at
    // 31 words, far under the 512 default, so the gate fit already
    // IS full-corpus pair statistics; probe 42 measures the cap's
    // bias where it binds).
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val fitDefault = graft.operators.Bpe.learnFromWords(docs)
    assert(fitDefault == graft.operators.Bpe.learnFromWords(docs,
      vocab = 512, merges = 64), "explicit defaults drifted")
    assert(fitDefault == graft.operators.Bpe.learnFromWords(docs,
      vocab = 100000), "an above-dictionary vocab cap must be a no-op")
    // a BINDING cap fits on a subset of the pair statistics — on a
    // planted corpus where the tail flips the top pair, the dial must
    // actually bind (guards against the cap being applied after the
    // pair count instead of before)
    val planted = Seq(
      (1L, "xy xy xy"), (2L, "ab"), (3L, "ab"), (4L, "ab"), (5L, "ab"))
      .toDF("doc_id", "text")
    // full stats: ab freq 4 > xy freq 3 → (a,b) first
    assert(graft.operators.Bpe.learnFromWords(planted, merges = 1) ==
      Seq(("a", "b")))
    // vocab = 1 keeps only the top word BY FREQ (ab, freq 4)
    assert(graft.operators.Bpe.learnFromWords(planted, vocab = 1,
      merges = 1) == Seq(("a", "b")))
    // vocab = 2 adds xy — table unchanged in rank-1 but the window is
    // the top-2 words, not the corpus
    assert(graft.operators.Bpe.learnFromWords(planted, vocab = 2,
      merges = 2) == Seq(("a", "b"), ("x", "y")))
  }

  test("q_bpe_tokenize: deterministic, fertility within subword bounds") {
    val a = SparkEntry.queries("q_bpe_tokenize")(spark, sfTiny).collect()
    val b = SparkEntry.queries("q_bpe_tokenize")(spark, sfTiny).collect()
    assert(a.toSeq == b.toSeq, "refit must be bit-identical")
    assert(a.nonEmpty)
    a.filter(_.getLong(1) > 0).foreach { r =>
      val fert = r.getDouble(3)
      // every word is >= 1 token (fertility >= 1); merges only ever
      // SHRINK a word's char-grain segmentation
      assert(fert >= 1.0, s"doc ${r.getLong(0)}: fertility $fert < 1")
      assert(r.getLong(2) >= r.getLong(1))
    }
  }

  test("incremental fit == naive recount fit, bit-for-bit") {
    // the shipped learnMerges is the delta-maintained Sennrich
    // structure; its correctness argument IS equality with the
    // straightforward recount fit, on adversarial and bulk vocabs
    // (the corpus-level equality is separately enforced by the
    // unrolled-CTE oracle gates #171/#172, which re-derive the naive
    // fit in SQL)
    def zipf(nWords: Int): Seq[(String, Long)] = {
      var x = 12345L
      def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x >>> 33 }
      (0 until nWords).map { i =>
        val len = 3 + (next() % 10).toInt
        val w = new StringBuilder
        (0 until len).foreach(_ => w += ('a' + (next() % 26).toInt).toChar)
        (w.result(), 1000000L / (i + 1) + 1)
        // dedupe by WORD, not (word, freq): the real vocab is a
        // groupBy-word aggregate, so a word can never appear twice
        // with different frequencies — the synthetic must honor the
        // unique-word contract of learnMerges' callers (ADVICE r15)
      }.groupBy(_._1).map(_._2.head).toSeq.sortBy(w => -w._2 -> w._1)
    }
    val cases: Seq[(Seq[(String, Long)], Int)] = Seq(
      (Seq(("abab", 2L)), 8),                      // the overlap trap
      (Seq(("ba", 1L), ("ab", 1L)), 4),            // tie-break
      (Seq(("aaaa", 3L), ("aaa", 2L)), 8),         // self-pair runs
      (Seq(("zz", 5L), ("at", 1L), ("bat", 1L), ("cat", 1L)), 8),
      (zipf(500), 64),                             // gate-dial shape
      (zipf(2000), 128))                           // bulk
    cases.foreach { case (vocab, n) =>
      val fast = Bpe.learnMerges(vocab, n)
      val slow = Bpe.learnMergesNaive(vocab, n)
      assert(fast == slow,
        s"incremental fit diverged at |V|=${vocab.size}, n=$n:\n$fast\n$slow")
    }
  }
}
