package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

// disposable probe main (not part of the library): probe 26 — prices
// the PQ family (#177-#181) at ×N corpus mass. Three questions the
// sf gate can't answer:
//   1. is pqEncode linear in n? (one broadcast join + two
//      map-side-combinable aggregates — a super-linear measurement
//      would mean the codebook stopped broadcasting or the agg lost
//      its partial)
//   2. does the k-means codebook fit stay one-pass-per-round? (the
//      exploded subvector frame is n×m rows; the per-round cost must
//      scale with that and nothing else)
//   3. does IVFADC routing actually buy the sublinear scan at scale —
//      ivfPqQuery(nprobe=3 of 32) vs flat pqQuery over the same
//      encoded corpus?
object ProbePq {
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
    val base = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .localCheckpoint(true)
    val n = base.count()
    // ×N by id-shifted copies; vectors perturbed per copy in one dim so
    // cells/codes don't collapse to N-fold degeneracy
    val big = (0 until scale).map { c =>
      base.select((col("vec_id") + lit(c.toLong * 1000000L)).as("vec_id"),
        transform(col("v"), (x, i) =>
          when(i === 0, x + lit(c * 1e-3)).otherwise(x)).as("v"))
    }.reduce(_ unionByName _).localCheckpoint(true)
    println(s"base n=$n, big n=${big.count()}")

    def time(tag: String)(body: => Unit): Long = {
      var best = Long.MaxValue
      for (_ <- 1 to reps) {
        val t0 = System.nanoTime()
        body
        val ms = (System.nanoTime() - t0) / 1000000L
        best = math.min(best, ms)
        println(s"$tag: $ms ms")
      }
      best
    }

    import graft.api.Graft
    // 1. fit cost ×1 vs ×N (k=64 codes, 3 rounds)
    val f1 = time("fit x1")(Graft.pqCodebooks(base, "vec_id", "v", 64, 8, 64, 3))
    val fN = time(s"fit x$scale")(Graft.pqCodebooks(big, "vec_id", "v", 64, 8, 64, 3))
    val books = Graft.pqCodebooks(big, "vec_id", "v", 64, 8, 64, 3)
      .localCheckpoint(true)
    // 2. encode cost ×1 vs ×N
    val e1 = time("encode x1")(
      Graft.pqEncode(base, "vec_id", "v", books).agg(count(lit(1))).head)
    val eN = time(s"encode x$scale")(
      Graft.pqEncode(big, "vec_id", "v", books).agg(count(lit(1))).head)
    // 3. routed vs flat serving over the ×N encoded corpus
    val cents = Graft.kmeansCentroids(big, "vec_id", "v", 32, 2)
      .localCheckpoint(true)
    // residual = false: `books` is fitted on RAW vectors, and this
    // probe's flat leg reuses the index's codes through pqQuery — the
    // raw flavor is the one where both legs share a quantizer (the
    // residual flavor's cost curve is ProbeScale256's job)
    val index = Graft.ivfPqIndex(big, "vec_id", "v",
      cents, "cent_id", "cv", books, residual = false).localCheckpoint(true)
    val codes = index.select("id", "codes").localCheckpoint(true)
    val queries = base.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
      .localCheckpoint(true)
    val flat = time("pqQuery flat")(
      Graft.pqQuery(codes, books, queries, "qid", "qv", 20, excludeSelf = true)
        .agg(count(lit(1))).head)
    val routed = time("ivfPqQuery nprobe=3/32")(
      Graft.ivfPqQuery(index, cents, "cent_id", "cv", books,
        queries, "qid", "qv", 20, nprobe = 3, excludeSelf = true,
        residual = false)
        .agg(count(lit(1))).head)
    println(f"SUMMARY fit x1=$f1 ms xN=$fN ms (${fN.toDouble / f1}%.1fx for ${scale}x mass)")
    println(f"SUMMARY encode x1=$e1 ms xN=$eN ms (${eN.toDouble / e1}%.1fx)")
    println(f"SUMMARY serve flat=$flat ms routed=$routed ms (routed/flat=${routed.toDouble / flat}%.2f)")
    spark.stop()
  }
}
