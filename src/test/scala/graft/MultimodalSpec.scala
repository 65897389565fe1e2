package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** The decode plumbing (typed schema, partition-batch shape,
  * determinism) — the part the DuckDB gate can't see.
  */
class MultimodalSpec extends SparkSpec {

  test("media table: payload bytes survive the binary round-trip") {
    val media = Multimodal.mediaTable(spark, sf)
    val r = media.filter(_.doc_id == 0L).head()
    assert(r.payload.nonEmpty)
    assert(Set("png", "jpeg", "wav").contains(r.format))
    assert(r.width % 32 == 0 && r.height % 32 == 0)
  }

  test("decode features are deterministic across runs and partitionings") {
    val media = Multimodal.mediaTable(spark, sf)
    val a = Multimodal.decodeFeatures(media).toDF()
    val b = Multimodal.decodeFeatures(media.repartition(7)).toDF()
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      "decode output depends on partitioning")
  }

  test("payload_md5 equals Spark's builtin md5 of the same bytes") {
    val feats = Multimodal.decodeFeatures(Multimodal.mediaTable(spark, sf)).toDF()
    val ref = Tables.documents(spark, sf)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("ref_md5"))
    val bad = feats.join(ref, "doc_id")
      .where(col("payload_md5") =!= col("ref_md5")).count()
    assert(bad == 0)
  }

  test("frame sampling: sampled byte sum is consistent and deterministic") {
    val media = Multimodal.mediaTable(spark, sf)
    val a = Multimodal.frameSample(media).toDF()
    val b = Multimodal.frameSample(media.repartition(5)).toDF()
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    // sampling every frame (every=1) must reproduce the full byte_sum
    val full = Multimodal.frameSample(media, every = 1).toDF()
      .select(col("doc_id"), col("sampled_byte_sum"))
    val ref = Multimodal.decodeFeatures(media).toDF()
      .select(col("doc_id"), col("byte_sum"))
    val bad = full.join(ref, "doc_id")
      .where(col("sampled_byte_sum") =!= col("byte_sum")).count()
    assert(bad == 0, "every=1 frame sampling lost bytes")
  }

  test("byte_sum matches an independent aggregate of the payload bytes") {
    val feats = Multimodal.decodeFeatures(Multimodal.mediaTable(spark, sf)).toDF()
    // independent derivation via SQL aggregate over the unpacked bytes
    val ref = Tables.documents(spark, sf).select(col("doc_id"),
      aggregate(transform(split(col("text"), ""),
          c => when(length(c) > 0, ascii(c)).otherwise(0)),
        lit(0L), (acc, x) => acc + x).as("char_sum"))
    // byte_sum >= char_sum iff multibyte chars present; for pure-ASCII
    // docs the two must be equal — check on ASCII-only docs.
    val asciiDocs = Tables.documents(spark, sf)
      .where(col("text").rlike("^[\\x00-\\x7F]*$")).select("doc_id")
    val bad = feats.join(ref, "doc_id").join(asciiDocs, "doc_id")
      .where(col("byte_sum") =!= col("char_sum")).count()
    assert(bad == 0)
  }
}
