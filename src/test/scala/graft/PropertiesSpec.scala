package graft

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{CosineSimilarity, DotProduct, MinHashSig, SimHash64, WordShingles}

/** Randomized property tests for the custom expressions' eval paths —
  * pure JVM, no Spark jobs, fixed seed for reproducibility.
  */
class PropertiesSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)

  private def randomText(): String = {
    val words = Seq.fill(rnd.nextInt(12))(
      Seq.fill(1 + rnd.nextInt(6))(('a' + rnd.nextInt(26)).toChar).mkString)
    val lead = " " * rnd.nextInt(3)
    val trail = " " * rnd.nextInt(3)
    lead + words.map(w => w + " " * (1 + rnd.nextInt(3))).mkString.trim + trail
  }

  /** Straight-line reference implementation of the shingling contract. */
  private def referenceShingles(text: String, n: Int): Seq[String] = {
    val toks = text.split(' ').filter(_.nonEmpty)
    if (toks.length < n) Seq.empty
    else toks.sliding(n).map(_.mkString(" ")).toSeq.distinct
  }

  test("word_shingles.compute == reference on 500 random texts, n in 1..4") {
    for (_ <- 1 to 500) {
      val text = randomText()
      val n = 1 + rnd.nextInt(4)
      val got = WordShingles.compute(UTF8String.fromString(text), n)
        .toArray[UTF8String](org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
      assert(got == referenceShingles(text, n), s"text=<$text> n=$n")
    }
  }

  test("word_shingles handles unicode and empty input") {
    assert(WordShingles.compute(UTF8String.fromString(""), 3).numElements() == 0)
    val zh = WordShingles.compute(UTF8String.fromString("中文 字 符 测试"), 3)
      .toArray[UTF8String](org.apache.spark.sql.types.StringType).map(_.toString)
    assert(zh.toSeq == Seq("中文 字 符", "字 符 测试"))
  }

  /** Random text mixing ASCII words, multibyte unicode words, and
    * space runs — the byte-scanning simhash tokenizer must agree with
    * String.split on all of it.
    */
  private def randomUnicodeText(): String = {
    val pool = Seq("alpha", "beta", "中文测试", "русский", "emoji🙂x", "añejo", "ß")
    Seq.fill(rnd.nextInt(10))(
      pool(rnd.nextInt(pool.length)) + " " * (1 + rnd.nextInt(3)))
      .mkString + (" " * rnd.nextInt(2))
  }

  /** Straight-line reference simhash: per-token xxhash64(seed 42),
    * ±1 per bit over token multiplicity, sign → bit.
    */
  private def referenceSimhash(text: String): Long = {
    val counters = new Array[Int](64)
    text.split(' ').filter(_.nonEmpty).foreach { tok =>
      val h = XXH64.hashUTF8String(UTF8String.fromString(tok), 42L)
      for (i <- 0 until 64)
        if (((h >>> i) & 1L) != 0L) counters(i) += 1 else counters(i) -= 1
    }
    (0 until 64).foldLeft(0L)((acc, i) =>
      if (counters(i) > 0) acc | (1L << i) else acc)
  }

  test("simhash64.compute == reference on 500 random unicode texts") {
    for (_ <- 1 to 500) {
      val text = randomUnicodeText()
      val got = SimHash64.compute(UTF8String.fromString(text))
      assert(got == referenceSimhash(text), s"text=<$text>")
    }
  }

  test("minhash_sig.compute == per-slot min of chained xxhash64") {
    for (_ <- 1 to 200) {
      val k = 1 + rnd.nextInt(64)
      val shingles = Seq.fill(1 + rnd.nextInt(20))(randomText().trim)
        .filter(_.nonEmpty).distinct
      if (shingles.nonEmpty) {
        val arr = new GenericArrayData(
          shingles.map(s => UTF8String.fromString(s): Any).toArray)
        val got = MinHashSig.compute(arr, k)
          .toLongArray()
        val want = (0 until k).map { i =>
          val seed = XXH64.hashInt(i, 42L)
          shingles.map(s => XXH64.hashUTF8String(UTF8String.fromString(s), seed)).min
        }
        assert(got.toSeq == want, s"k=$k shingles=$shingles")
      }
    }
    assert(MinHashSig.compute(new GenericArrayData(Array.empty[Any]), 8) == null)
  }

  test("dot_product eval matches the scalar left fold and nulls on mismatch") {
    val expr = DotProduct(null, null) // eval path only
    for (_ <- 1 to 200) {
      val d = 1 + rnd.nextInt(64)
      val a = Array.fill(d)(rnd.nextDouble() * 2 - 1)
      val b = Array.fill(d)(rnd.nextDouble() * 2 - 1)
      val got = expr.nullSafeEval(
        new GenericArrayData(a.map(x => x: Any)),
        new GenericArrayData(b.map(x => x: Any))).asInstanceOf[Double]
      var dot = 0.0
      for (i <- 0 until d) dot += a(i) * b(i)
      assert(java.lang.Double.compare(got, dot) == 0, s"got=$got want=$dot")
    }
    // length mismatch and NULL element both yield NULL (zip_with parity)
    assert(expr.nullSafeEval(
      new GenericArrayData(Array[Any](1.0, 2.0)),
      new GenericArrayData(Array[Any](1.0))) == null)
    assert(expr.nullSafeEval(
      new GenericArrayData(Array[Any](1.0, null)),
      new GenericArrayData(Array[Any](1.0, 2.0))) == null)
  }

  test("cosine_sim eval is bit-identical to the scalar left fold") {
    val expr = CosineSimilarity(null, null) // eval path only
    for (_ <- 1 to 500) {
      val d = 1 + rnd.nextInt(64)
      val a = Array.fill(d)(rnd.nextDouble() * 2 - 1)
      val b = Array.fill(d)(rnd.nextDouble() * 2 - 1)
      val got = expr.nullSafeEval(
        new GenericArrayData(a.map(x => x: Any)),
        new GenericArrayData(b.map(x => x: Any))).asInstanceOf[Double]
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- 0 until d) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      val want = dot / (math.sqrt(na) * math.sqrt(nb))
      assert(java.lang.Double.compare(got, want) == 0 ||
        (got.isNaN && want.isNaN), s"got=$got want=$want")
    }
  }

  test("cosine_sim nulls undefined inputs: zero norm, mismatch, NaN poison") {
    // NULL, not NaN: a NaN cosine sorts ABOVE every real score in a
    // descending top-k, so one dead vector would head every query's
    // result; NULL drops/ranks-last identically in both engines
    val expr = CosineSimilarity(null, null)
    def arr(xs: Double*) = new GenericArrayData(xs.toArray.map(x => x: Any))
    assert(expr.nullSafeEval(arr(0.0, 0.0), arr(1.0, 2.0)) == null,
      "zero-norm left must be null")
    assert(expr.nullSafeEval(arr(1.0, 2.0), arr(0.0, 0.0)) == null,
      "zero-norm right must be null")
    assert(expr.nullSafeEval(arr(1.0, 2.0), arr(1.0)) == null,
      "length mismatch must be null")
    assert(expr.nullSafeEval(arr(Double.NaN, 1.0), arr(1.0, 1.0)) == null,
      "NaN-poisoned vector must be null")
    val ok = expr.nullSafeEval(arr(1.0, 0.0), arr(1.0, 0.0))
    assert(ok.asInstanceOf[Double] == 1.0)
  }
}
