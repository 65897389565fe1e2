package graft

import org.apache.spark.sql.functions._
import graft.api.Graft

/** The contamination n-gram dial: the batch core (explode + broadcast
  * join + per-doc count) and the stream form (one-row vocabulary +
  * array_intersect) are INDEPENDENT formulations of the same overlap
  * statistic — cross-pinning them at several n values proves the dial
  * changes both identically, including the long-shingle settings
  * (n = 8) published decontamination pipelines run that the tiny-doc
  * gated query (n = 3) never exercises. The clean test corpus has no
  * cross-document 8-token span, so the n = 8 firing case runs on a
  * planted leak (the same probe discipline as CJK/PII).
  */
class ContaminationSpec extends SparkSpec {

  test("batch and stream contamination agree for n in {3, 8} and K in {1, 5}") {
    val docs = Tables.documents(spark, sf)
    val isBench = pmod(col("doc_id"), lit(97L)) === 0
    val corpus = docs.where(!isBench)
    val bench = docs.where(isBench)
    for (n <- Seq(3, 8); k <- Seq(1L, 5L)) {
      val batch = Graft.contamination(corpus, bench, "doc_id", "text",
        n = n, minOverlap = k)
      val stream = graft.streaming.Streams.contaminationCheck(
        corpus, bench, "doc_id", "text", n = n, minOverlap = k)
      assert(batch.exceptAll(stream).count() == 0 &&
        stream.exceptAll(batch).count() == 0,
        s"batch and stream contamination diverged at n=$n K=$k")
      // the n=3 leg must actually fire on the real corpus (the n=8 leg
      // is exercised on the planted leak below — no 8-token span
      // crosses documents in the clean synthetic corpus)
      if (k == 1L && n == 3) assert(batch.count() > 0, "no overlap rows at n=3")
    }
  }

  test("an 8-gram dial catches a verbatim leak and clears phrase overlap") {
    import spark.implicits._
    val leak = "the quick brown fox jumps over the lazy dog every single morning"
    val bench = Seq((100L, s"benchmark question says $leak end of prompt"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      1L -> s"some padding then $leak and a conclusion", // verbatim 12-token leak
      2L -> "the quick brown fox appears here but the sentence then diverges",
      3L -> "entirely unrelated text about parquet partitioning at scale"
    ).toDF("doc_id", "text")
    for ((impl, name) <- Seq(
        ((n: Int, k: Long) => Graft.contamination(corpus, bench, "doc_id", "text", n, k),
          "batch"),
        ((n: Int, k: Long) => graft.streaming.Streams.contaminationCheck(
          corpus, bench, "doc_id", "text", n, k), "stream"))) {
      // 12-token verbatim span = 5 distinct 8-gram shingles
      val at8 = impl(8, 5L).collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
      assert(at8.keySet == Set(1L), s"$name n=8 flagged ${at8.keySet}")
      assert(at8(1L) == ((5L, true)), s"$name n=8 overlap ${at8(1L)}")
      // at n=3 the shared phrase in doc 2 overlaps too — the recall side
      val at3 = impl(3, 5L).collect().map(r => r.getLong(0)).toSet
      assert(at3.contains(1L) && at3.contains(2L) && !at3.contains(3L),
        s"$name n=3 flagged $at3")
    }
  }

  test("longer shingles are strictly more precise (hit set shrinks with n)") {
    val docs = Tables.documents(spark, sf)
    val isBench = pmod(col("doc_id"), lit(97L)) === 0
    val hits = Seq(3, 5, 8).map { n =>
      n -> Graft.contamination(docs.where(!isBench), docs.where(isBench),
        "doc_id", "text", n = n, minOverlap = 1L)
        .select("id").collect().map(_.getLong(0)).toSet
    }.toMap
    // an n+1-gram overlap implies n-gram overlap on the same span, so
    // the flagged set can only shrink as n grows
    assert(hits(5).subsetOf(hits(3)), "n=5 flagged a doc n=3 did not")
    assert(hits(8).subsetOf(hits(5)), "n=8 flagged a doc n=5 did not")
    assert(hits(5).size < hits(3).size,
      "the dial had no effect on this corpus; test data too weak")
  }
}
