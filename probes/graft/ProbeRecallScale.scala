package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

// disposable probe main: SCALING probe 33 — residual-IVFADC recall at
// ×64/×256-class mass on a NON-degenerate corpus (VERDICT r16 item 1:
// probe 30 priced COST at ×256 but its clone-ladder corpus put every
// query's nearest neighbor a quantization-invisible 1e-3 away, so its
// recall numbers measured nothing). Corpus here: a deterministic
// hash-generated Gaussian-ish MIXTURE — `nClusters` centers in [0,1]^64,
// every vector = its cluster's center + per-component noise — so
// nearest neighbors are genuine same-cluster vectors at realistic
// distances and IVF cells have real structure to learn.
//
// Measured per (N, cells, nprobe, flavor ∈ {raw, residual}):
// true-top-1-in-top-20 recall over 64 queries, mean scan fraction
// (probed cell mass / corpus), and serve wall.
// args: [Ns=131072,524288] [cells=32,64,128] [nprobes=1,3,8]
object ProbeRecallScale {
  def main(args: Array[String]): Unit = {
    val ns = args.headOption.getOrElse("131072,524288")
      .split(",").map(_.trim.toLong).toSeq
    val cellsDials = (if (args.length > 1) args(1) else "32,64,128")
      .split(",").map(_.trim.toInt).toSeq
    val nprobes = (if (args.length > 2) args(2) else "1,3,8")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.DotProduct.register(spark)
    graft.functions.CosineSimilarity.register(spark)
    import graft.api.Graft

    val Dim = 64; val M = 8; val K = 64
    val nClusters = 256
    val nq = 64

    // deterministic synthetic mixture: u(id, c, salt) ∈ [0, 1) from
    // xxhash64 — center spread 1.0, noise spread 0.25, so same-cluster
    // vectors are near but NOT clones (component-wise noise distance
    // ~0.1 rms vs ~0.29 between random centers)
    def u(idCol: org.apache.spark.sql.Column, c: org.apache.spark.sql.Column,
        salt: Int) =
      (pmod(xxhash64(idCol, c, lit(salt)), lit(1000000L)).cast("double")
        / 1000000.0)
    def mixture(n: Long): DataFrame =
      spark.range(n).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(Dim - 1)), c =>
          u(pmod(col("id"), lit(nClusters.toLong)), c, 1) +
            lit(0.25) * (u(col("id"), c, 2) - lit(0.5))).as("v"))
        .repartition(32).localCheckpoint(true)

    def time[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    for (n <- ns) {
      val emb = mixture(n)
      println(s"== corpus n=$n (${emb.count()} vectors, $nClusters clusters) ==")
      val queries = emb.where(col("vec_id") < nq)
        .select(col("vec_id").as("qid"), col("v").as("qv")).localCheckpoint(true)
      // exact ground truth: brute top-1 per query (excluding self)
      val w = Window.partitionBy("q_id").orderBy(col("dot").desc, col("vec_id"))
      val top1 = emb.crossJoin(broadcast(
          queries.select(col("qid").as("q_id"), col("qv"))))
        .where(col("vec_id") =!= col("q_id"))
        .withColumn("dot", call_function("dot_product", col("qv"), col("v")))
        .withColumn("r", row_number().over(w)).where(col("r") === 1)
        .select(col("q_id"), col("vec_id").as("id")).localCheckpoint(true)
      val nTruth = top1.count()

      for (cells <- cellsDials) {
        val cents = Graft.kmeansCentroids(emb, "vec_id", "v", cells, 2)
          .localCheckpoint(true)
        // cell mass for scan-fraction accounting
        val cellMass = Graft.ivfIndex(emb, "vec_id", "v", cents, "cent_id", "cv")
          .groupBy("cell").agg(count(lit(1)).as("m")).localCheckpoint(true)
        val rawBooks = Graft.pqCodebooks(emb, "vec_id", "v", Dim, M, K, 2)
          .localCheckpoint(true)
        val resBooks = Graft.ivfPqCodebooks(emb, "vec_id", "v",
          cents, "cent_id", "cv", Dim, M, K, 2).localCheckpoint(true)
        val rawIdx = Graft.ivfPqIndex(emb, "vec_id", "v", cents, "cent_id",
          "cv", rawBooks, residual = false).localCheckpoint(true)
        val resIdx = Graft.ivfPqIndex(emb, "vec_id", "v", cents, "cent_id",
          "cv", resBooks, residual = true).localCheckpoint(true)
        for (nprobe <- nprobes) {
          // scan fraction: per query, probed-cell mass / n, averaged
          val probes = queries.crossJoin(broadcast(cents))
            .withColumn("c", call_function("cosine_sim", col("cv"), col("qv")))
            .withColumn("r", row_number().over(Window.partitionBy("qid")
              .orderBy(col("c").desc, col("cent_id"))))
            .where(col("r") <= nprobe)
            .select(col("qid"), col("cent_id").as("cell"))
          val frac = probes.join(cellMass, "cell")
            .groupBy("qid").agg(sum("m").as("pm"))
            .agg(avg(col("pm").cast("double") / n)).head().getDouble(0)
          def hits(idx: DataFrame, books: DataFrame, res: Boolean): (Long, Double) =
            time {
              val s = Graft.ivfPqQuery(idx, cents, "cent_id", "cv", books,
                queries, "qid", "qv", k = 20, nprobe = nprobe,
                excludeSelf = true, residual = res)
              top1.join(s.select("q_id", "id"), Seq("q_id", "id")).count()
            }
          val (hRaw, tRaw) = hits(rawIdx, rawBooks, res = false)
          val (hRes, tRes) = hits(resIdx, resBooks, res = true)
          println(f"n=$n%7d cells=$cells%4d nprobe=$nprobe%2d " +
            f"scan=${frac * 100}%5.1f%% " +
            f"raw=${hRaw.toDouble / nTruth}%5.3f (${tRaw}%5.1f s)  " +
            f"residual=${hRes.toDouble / nTruth}%5.3f (${tRes}%5.1f s)")
        }
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
