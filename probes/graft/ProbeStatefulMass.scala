package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

// disposable probe main: probe 43 — r19 verdict item 3. Probe 39
// witnessed the ADDITIVE folds (cms/mixAlpha/ivfSqIngest) exact at
// x10 mass; the state-GROWING maintenance sinks — dupClusterSink
// (labels contract via mergeComponents), winnowDedupSink (fingerprint
// store + verdicts), trainingManifestSink (keeper/funnel/manifest
// sub-stores) — had only gate-SF fixpoint specs, and state-growth
// bugs hide BELOW gate SF. This drives each sink over the x10
// scalegen corpus (50k docs) in uneven chunks with a MID-STREAM
// replay (at-least-once re-delivery of a completed batch while later
// batches still follow), asserting final state == the one-shot batch
// computation EXACTLY, and prints state-size-vs-ingest numbers per
// chunk for SCALING.md.
// args: [dir=/tmp/sfx10] [chunks=4]
object ProbeStatefulMass {
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
    val base = java.nio.file.Files.createTempDirectory("graft_smass_").toString
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "text", "lang", "source").localCheckpoint(true)
    val nDocs = docs.count()
    println(s"== probe 43: stateful sinks at x10 mass ($nDocs docs, " +
      s"$nChunks chunks + mid-stream replay of chunk 1) ==")

    // two chunkings, one per spec discipline: winnow/dup take PURE
    // id-range chunks (every pair's larger id arrives no earlier than
    // its smaller id — id_new is the later doc, so verdict
    // orientation matches the one-shot doc_a < doc_b surface); the
    // manifest additionally reroutes its benchmark slice
    // (doc_id % 97 == 0) to chunk 0 so the contamination stage sees
    // the benchmark before anything it could contaminate (the
    // bench-first gate-SF spec discipline). The first probe run used
    // bench-first chunks for ALL sinks and the winnow comparison
    // "diverged" with extra ≈ missing ≈ half the verdicts — pure
    // orientation flips from benchmark docs arriving before smaller
    // ids, not a state bug.
    val bounds = docs.select(col("doc_id"))
      .select(percentile_approx(col("doc_id"),
        array((1 until nChunks).map(i => lit(i.toDouble / nChunks)): _*),
        lit(100000)).as("qs")).head.getSeq[Long](0)
    def idChunkOf(i: Int): DataFrame = {
      val lo = if (i == 0) Long.MinValue else bounds(i - 1)
      val hi = if (i == nChunks - 1) Long.MaxValue else bounds(i)
      docs.where(col("doc_id") > lit(lo) && col("doc_id") <= lit(hi))
    }
    def benchFirstChunkOf(i: Int): DataFrame = {
      val inRange = idChunkOf(i).where(!(col("doc_id") % 97 === 0))
      if (i == 0) inRange.unionByName(docs.where(col("doc_id") % 97 === 0))
      else inRange
    }

    // ---- dupClusterSink at mass -------------------------------------
    var t0 = System.nanoTime()
    (0 until nChunks).foreach { i =>
      val t = System.nanoTime()
      Streams.applyDupClusterBatch(idChunkOf(i), i.toLong,
        s"$base/dup", "doc_id", "text", 3, 0.8, Int.MaxValue)
      if (i == 1) // mid-stream at-least-once re-delivery
        Streams.applyDupClusterBatch(idChunkOf(1), 1L,
          s"$base/dup", "doc_id", "text", 3, 0.8, Int.MaxValue)
      val labels = Streams.dupClusterState(spark, s"$base/dup").get.count()
      println(f"dup:    chunk $i ingested  labels=$labels%7d  " +
        f"wall=${(System.nanoTime() - t) / 1e9}%6.1f s")
    }
    val gotDup = Streams.dupClusterState(spark, s"$base/dup").get
    val wantDup = graft.api.Graft.connectedComponents(
      graft.api.Graft.ngramJaccardPairs(docs, "doc_id", "text"),
      "id_a", "id_b")
    val dupExtra = gotDup.exceptAll(wantDup).count()
    val dupMissing = wantDup.exceptAll(gotDup).count()
    println(f"dup:    state==oneshot ${dupExtra == 0 && dupMissing == 0}  " +
      f"labels=${gotDup.count()}  extra=$dupExtra missing=$dupMissing  " +
      f"wall=${(System.nanoTime() - t0) / 1e9}%6.1f s")
    require(dupExtra == 0 && dupMissing == 0,
      "dupClusterSink labeling diverged from batch CC at mass")

    // ---- winnowDedupSink at mass ------------------------------------
    // The df-cap is evaluated AS-OF-INGEST in the incremental path
    // (store-so-far + batch) but GLOBALLY in the one-shot, so fold ==
    // one-shot holds exactly iff no fingerprint crosses the cap
    // mid-history. At gate SF no fp reaches 64; at x10 many do (run 2
    // of this probe measured ~half the 250 k verdicts differing in
    // shared/jaccard under the default cap — pair SETS nearly equal,
    // the numbers computed over different capped universes). So: the
    // EXACTNESS witness runs with the cap lifted above the corpus'
    // max df (the contract's premise restored), and the default-cap
    // run reports the as-of-ingest drift as a measured number.
    t0 = System.nanoTime()
    import graft.operators.Dedup.{WinnowK, WinnowW, WinnowTau, WinnowDfCap}
    val dfStats = graft.api.Graft.winnowIndex(docs, "doc_id", "text")
      .groupBy("shingle").agg(count(lit(1)).as("df"))
      .agg(max("df"), expr("percentile(df, 0.99D)")).head
    val (maxDf, p99Df) = (dfStats.getLong(0), dfStats.getDouble(1))
    println(f"winnow: corpus fp df max=$maxDf p99=$p99Df%.0f " +
      f"(default cap $WinnowDfCap — " +
      f"${if (maxDf > WinnowDfCap) "CROSSES" else "under"} cap at x10)")
    val capW = (maxDf + 1).toInt
    (0 until nChunks).foreach { i =>
      val t = System.nanoTime()
      Streams.applyWinnowBatch(idChunkOf(i), i.toLong, s"$base/win",
        "doc_id", "text", WinnowK, WinnowW, WinnowTau, capW)
      if (i == 1)
        Streams.applyWinnowBatch(idChunkOf(1), 1L, s"$base/win",
          "doc_id", "text", WinnowK, WinnowW, WinnowTau, capW)
      val idx = spark.read.parquet(s"$base/win/index").count()
      val v = Streams.winnowVerdicts(spark, s"$base/win").get.count()
      println(f"winnow: chunk $i ingested  index_rows=$idx%9d " +
        f"verdicts=$v%7d  wall=${(System.nanoTime() - t) / 1e9}%6.1f s")
    }
    val gotWin = Streams.winnowVerdicts(spark, s"$base/win").get
      .select(col("id_old").as("doc_a"), col("id_new").as("doc_b"),
        col("inter").as("shared"), col("jaccard"))
    val wantWin = graft.api.Graft.winnowPairs(docs, "doc_id", "text",
        dfCap = capW.toLong)
      .select("doc_a", "doc_b", "shared", "jaccard")
    val winExtra = gotWin.exceptAll(wantWin).count()
    val winMissing = wantWin.exceptAll(gotWin).count()
    println(f"winnow: state==oneshot ${winExtra == 0 && winMissing == 0} " +
      f"(cap $capW > max df)  verdicts=${gotWin.count()}  " +
      f"extra=$winExtra missing=$winMissing  " +
      f"wall=${(System.nanoTime() - t0) / 1e9}%6.1f s")
    require(winExtra == 0 && winMissing == 0,
      "winnowDedupSink verdicts diverged from batch winnowPairs at mass " +
        "with the df-cap above max df — a REAL state bug, not cap drift")
    spark.catalog.clearCache()
    // default-cap drift readout (as-of-ingest semantics, measured)
    (0 until nChunks).foreach { i =>
      Streams.applyWinnowBatch(idChunkOf(i), i.toLong, s"$base/winc",
        "doc_id", "text", WinnowK, WinnowW, WinnowTau, WinnowDfCap.toInt)
    }
    val gotC = Streams.winnowVerdicts(spark, s"$base/winc").get
      .select(col("id_old").as("doc_a"), col("id_new").as("doc_b"),
        col("inter").as("shared"), col("jaccard")).persist()
    val wantC = graft.api.Graft.winnowPairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b", "shared", "jaccard").persist()
    val pairsOnlyGot = gotC.select("doc_a", "doc_b")
    val pairsOnlyWant = wantC.select("doc_a", "doc_b")
    println(f"winnow: DEFAULT-cap drift at x10 — verdicts " +
      f"fold=${gotC.count()} oneshot=${wantC.count()}  " +
      f"pair-set extra=${pairsOnlyGot.exceptAll(pairsOnlyWant).count()} " +
      f"missing=${pairsOnlyWant.exceptAll(pairsOnlyGot).count()}  " +
      f"full-row extra=${gotC.exceptAll(wantC).count()} " +
      f"(rows differing only in shared/jaccard = the as-of-ingest cap " +
      "universe; see winnowDedupSink scaladoc)")
    gotC.unpersist(); wantC.unpersist()
    spark.catalog.clearCache()

    // ---- trainingManifestSink at mass -------------------------------
    // The manifest's cluster stage runs incrementalDedupPairs at the
    // gate dial dfCap = 64 — AS-OF-INGEST like every
    // incrementalPairsStored consumer — while the one-shot #190 caps
    // on global df. At x10 the 3-gram df distribution blows through
    // the cap (max 250, p99 180 vs 64), so fold == one-shot cannot
    // hold there BY CONTRACT; the exactness witness runs where the
    // premise holds (arg 3 = a x2 scalegen dir, max df ~50 < 64) and
    // the x10 run reports the drift.
    def runManifest(d: String, tag: String, assertEqual: Boolean): Unit = {
      val mdocs = Tables.documents(spark, d)
        .select("doc_id", "text", "lang", "source").localCheckpoint(true)
      val mb = java.nio.file.Files.createTempDirectory("graft_sman_").toString
      val bounds2 = mdocs.select(percentile_approx(col("doc_id"),
        array((1 until nChunks).map(i => lit(i.toDouble / nChunks)): _*),
        lit(100000)).as("qs")).head.getSeq[Long](0)
      def mchunk(i: Int): DataFrame = {
        val lo = if (i == 0) Long.MinValue else bounds2(i - 1)
        val hi = if (i == nChunks - 1) Long.MaxValue else bounds2(i)
        val inR = mdocs.where(col("doc_id") > lit(lo) &&
          col("doc_id") <= lit(hi) && !(col("doc_id") % 97 === 0))
        if (i == 0) inR.unionByName(mdocs.where(col("doc_id") % 97 === 0))
        else inR
      }
      val t = System.nanoTime()
      (0 until nChunks).foreach { i =>
        Streams.applyTrainingManifestBatch(mchunk(i), i.toLong,
          s"$mb/man", "doc_id", "text", "lang", "source")
        if (i == 1)
          Streams.applyTrainingManifestBatch(mchunk(1), 1L,
            s"$mb/man", "doc_id", "text", "lang", "source")
      }
      val gotMan = Streams.trainingManifestState(spark, s"$mb/man").get
        .collect().map(_.toSeq).toSeq
      val wantMan = SparkEntry.queries("q_training_manifest")(spark, d)
        .collect().map(_.toSeq).toSeq
      println(f"manifest[$tag]: state==oneshot ${gotMan == wantMan}  " +
        f"fold_rows=${gotMan.size} oneshot_rows=${wantMan.size}  " +
        f"wall=${(System.nanoTime() - t) / 1e9}%6.1f s" +
        (if (!assertEqual && gotMan != wantMan)
          "  (EXPECTED drift: as-of-ingest dfCap=64 vs global — " +
            "cap crossed mid-history at this mass)" else ""))
      if (assertEqual) require(gotMan == wantMan,
        s"manifest fold diverged at $tag where the df-cap premise " +
          "holds — a REAL state bug, not cap drift")
    }
    val x2dir = args.lift(2).getOrElse("/tmp/sfx2")
    runManifest(dir, "x10", assertEqual = false)
    runManifest(x2dir, "x2-premise", assertEqual = true)
    println(s"STATEFUL SINKS: dup + winnow EXACT at x10; manifest EXACT " +
      s"at x2 (cap premise) with x10 drift reported (dir=$dir, " +
      s"chunks=$nChunks + mid-stream replay)")
    spark.stop()
  }
}
