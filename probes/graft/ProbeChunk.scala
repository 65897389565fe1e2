package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

// disposable probe main (not part of the library): probe 23 — prices
// the #162 chunking fan-out at ×N token mass and under single-doc
// skew. Two questions the sf0.01 gate can't answer:
//   1. is wall-time linear in corpus token mass? (the explode emits
//      ⌈n/stride⌉ rows per doc — fan-out itself is linear, but a
//      super-linear measurement would mean a hidden shuffle or a
//      codegen fallback)
//   2. does ONE giant doc (10^6 tokens ⇒ ~21k chunks at 64/48, each
//      carrying its own copy of the window) serialize the stage?
//      explode processes a row's fan-out inside one task, so a
//      pathological doc is a straggler by construction — measure how
//      bad, and whether the repartition-by-chunk escape hatch (chunk
//      starts exploded FIRST, then repartitioned, then sliced) fixes
//      it. Verdict informs whether the facade needs the hatch or a
//      doc-length cap note.
object ProbeChunk {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val scale = if (args.length > 1) args(1).toInt else 16
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables.documents(spark, dir).select("doc_id", "text")

    def run(tag: String, df: DataFrame): Long = {
      // token-mass agg: forces every chunk row (incl. chunk_text
      // reassembly) without collecting the fan-out to the driver
      var best = Long.MaxValue
      for (_ <- 1 to reps) {
        val t0 = System.nanoTime()
        val r = df.agg(count(lit(1)), sum("n_tokens")).head
        val ms = (System.nanoTime() - t0) / 1000000L
        best = math.min(best, ms)
        println(s"$tag: ${r.getLong(0)} chunks, ${r.getLong(1)} tokens, $ms ms")
      }
      best
    }
    def chunks(df: DataFrame) =
      graft.api.Graft.chunkPassages(df, "doc_id", "text", 64, 48)

    // 1× vs N×: copy docs with fresh ids
    val t1 = run("1x", chunks(base.localCheckpoint(true)))
    val big = spark.range(scale).crossJoin(base)
      .select((col("doc_id") * scale + col("id")).as("doc_id"), col("text"))
      .localCheckpoint(true)
    val tN = run(s"${scale}x", chunks(big))
    println(f"scaling: ${scale}x mass took ${tN.toDouble / t1}%.1fx the time " +
      f"(linear would be ~$scale%d.0x; sub-linear = fixed overhead dominates)")

    // skew: one synthetic giant doc (10^6 tokens) appended to the 1x corpus
    val giant = spark.range(1)
      .select(lit(-1L).as("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(999999)),
          i => concat(lit("w"), i))).as("text"))
    val skewed = base.unionByName(giant).localCheckpoint(true)
    val tSkew = run("1x+giant", chunks(skewed))

    // escape hatch: explode chunk starts first, repartition the
    // (doc, start) grain, THEN slice — the giant doc's 21k windows
    // spread over all tasks at the cost of one shuffle of the
    // token-array rows
    val toks = filter(split(col("text"), " "), t => t =!= "")
    val hatch = skewed.where(col("text").isNotNull)
      .select(col("doc_id"), toks.as("t"), size(toks).cast("long").as("n"))
      .where(col("n") > 0)
      .select(col("doc_id"), col("t"), col("n"),
        explode(sequence(lit(0L),
          ceil(greatest(lit(0L), col("n") - 64) / 48).cast("long")))
          .as("chunk_id"))
      .repartition(32, col("doc_id"), col("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        (col("chunk_id") * 48).as("start_tok"),
        least(lit(64L), col("n") - col("chunk_id") * 48).as("n_tokens"),
        concat_ws(" ", slice(col("t"),
          (col("chunk_id") * 48 + 1).cast("int"), lit(64))).as("chunk_text"))
    val tHatch = run("1x+giant hatch", hatch)
    println(f"skew: giant doc cost ${tSkew - t1} ms over 1x; hatch " +
      f"${tHatch - t1} ms (hatch pays a shuffle of the token arrays — " +
      "only worth it when one doc's fan-out dominates a task)")
    spark.stop()
  }
}
