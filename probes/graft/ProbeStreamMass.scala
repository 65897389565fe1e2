package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

// disposable probe main: r18 verdict item 6 — the AT-MASS streaming
// crosscheck. Batch has an sf1-class crosscheck (x10 scalegen corpus
// through the gate queries); streaming folds were only ever proven
// fold == one-shot at spec scale. This drives the three heaviest
// maintenance folds over the x10 corpus (500k docs / 524k vectors)
// in 4 uneven chunks + a replay of chunk 0, asserting the maintained
// state equals the one-shot batch computation EXACTLY (collect-set /
// exceptAll equality, no tolerance) at a decade above gate SF:
//   - cmsSink        (additive sketch partials; #202's fold #203)
//   - mixPlanSink    (mixture totals; alpha applied at read — #206)
//   - ivfSqIndexSink (frozen-artifact SQ8 encode at ingest — #209)
// args: [dir=/tmp/sfx10] [chunks=4]
object ProbeStreamMass {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfx10")
    val nChunks = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.streaming.Streams
    val base = java.nio.file.Files.createTempDirectory("graft_mass_").toString
    def chunkOf(df: DataFrame, key: String, i: Int) =
      // uneven on purpose: chunk 0 carries ~half the mass
      df.where(pmod(pmod(xxhash64(col(key)), lit(nChunks.toLong * 2)),
        lit(nChunks.toLong)) === i)

    // ---- CMS fold at mass -------------------------------------------
    val docs = Tables.documents(spark, dir)
    val (depth, width) = (5, 8192)
    var t0 = System.nanoTime()
    (0 until nChunks).foreach { i =>
      Streams.applyCmsBatch(chunkOf(docs, "doc_id", i), i.toLong,
        depth, width, s"$base/cms", "text")
    }
    // replay chunk 0 (at-least-once): fold must be a fixpoint
    Streams.applyCmsBatch(chunkOf(docs, "doc_id", 0), 0L,
      depth, width, s"$base/cms", "text")
    val folded = Streams.cmsState(spark, s"$base/cms").get
      .select("d", "bucket", "n").collect().toSet
    val oneShot = graft.api.Graft.cmsSketch(
        docs.select(explode(split(col("text"), " ")).as("word"))
          .filter(length(col("word")) > 0), "word", depth, width)
      .select("d", "bucket", "n").collect().toSet
    println(f"cms:    fold==oneshot ${folded == oneShot}  " +
      f"rows=${folded.size}  wall=${(System.nanoTime() - t0) / 1e9}%6.1f s")
    require(folded == oneShot, "CMS fold diverged at mass")

    // ---- mixture-plan fold at mass ----------------------------------
    t0 = System.nanoTime()
    val toks = docs.select(col("doc_id"), col("source"),
      graft.operators.Text.wsTokenCount.as("n_tokens"))
      .localCheckpoint(true)
    (0 until nChunks).foreach { i =>
      Streams.applyMixPlanBatch(chunkOf(toks, "doc_id", i), i.toLong,
        s"$base/mix", "source", "n_tokens")
    }
    Streams.applyMixPlanBatch(chunkOf(toks, "doc_id", 0), 0L,
      s"$base/mix", "source", "n_tokens")
    val alpha = 0.25; val budget = 50000000L
    val foldedMix = Streams.mixAlphaState(spark, s"$base/mix", alpha,
      budget).get.collect().toSet
    val oneShotMix = graft.api.Graft.mixAlpha(toks, "source", "n_tokens",
      alpha, budget).collect().toSet
    println(f"mix:    fold==oneshot ${foldedMix == oneShotMix}  " +
      f"rows=${foldedMix.size}  wall=${(System.nanoTime() - t0) / 1e9}%6.1f s")
    require(foldedMix == oneShotMix, "mixture fold diverged at mass")

    // ---- IVF x SQ8 ingest fold at mass ------------------------------
    t0 = System.nanoTime()
    val Dim = 64
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .localCheckpoint(true)
    // frozen artifacts: mod-rule centroids (the gate's deterministic
    // flavor — the fold under test is the ENCODE, not the fit)
    val cents = emb.where(pmod(col("vec_id"), lit(1000L)) === 0)
      .select((col("vec_id") / 1000L).cast("long").as("cent_id"),
        col("v").as("cv")).localCheckpoint(true)
    val bounds = graft.api.Graft.ivfSqBounds(emb, "vec_id", "v",
      cents, "cent_id", "cv", Dim).localCheckpoint(true)
    (0 until nChunks).foreach { i =>
      Streams.applyIvfSqBatch(chunkOf(emb, "vec_id", i), i.toLong,
        cents, bounds, s"$base/ivfsq", Dim, "vec_id", "v",
        "cent_id", "cv", residual = true)
    }
    Streams.applyIvfSqBatch(chunkOf(emb, "vec_id", 0), 0L,
      cents, bounds, s"$base/ivfsq", Dim, "vec_id", "v",
      "cent_id", "cv", residual = true)
    val foldedIdx = Streams.ivfSqIndexState(spark, s"$base/ivfsq").get
    val oneShotIdx = graft.api.Graft.ivfSqIndex(emb, "vec_id", "v",
      cents, "cent_id", "cv", bounds, Dim, residual = true)
    val extra = foldedIdx.exceptAll(oneShotIdx).count()
    val missing = oneShotIdx.exceptAll(foldedIdx).count()
    val nIdx = foldedIdx.count()
    println(f"ivfsq:  fold==oneshot ${extra == 0 && missing == 0}  " +
      f"rows=$nIdx  extra=$extra missing=$missing  " +
      f"wall=${(System.nanoTime() - t0) / 1e9}%6.1f s")
    require(extra == 0 && missing == 0, "IVF x SQ ingest diverged at mass")
    println(s"ALL FOLDS EXACT AT x10 MASS (dir=$dir, chunks=$nChunks + replay)")
    spark.stop()
  }
}
