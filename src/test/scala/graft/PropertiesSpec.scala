package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{CosineSimilarity, WordShingles}

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
}
