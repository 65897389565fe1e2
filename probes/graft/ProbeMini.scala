package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// throwaway minimal repro for the v#N ATTRIBUTE_NOT_FOUND crash
object ProbeMini {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.api.Graft
    val emb = spark.range(200).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(7)), c =>
        (pmod(xxhash64(col("id"), c), lit(1000L)).cast("double") / 500.0)
          - lit(1.0)).as("v"))
      .repartition(4).localCheckpoint(true)
    println("== step 1: fit (spread, iters=1)")
    val cents = Graft.kmeansCentroids(emb, "vec_id", "v", k = 4, iters = 1)
    println("fit rows: " + cents.count())
    println("== step 2: ivfIndex over fit output (no checkpoint)")
    val idx = Graft.ivfIndex(emb, "vec_id", "v", cents, "cent_id", "cv")
    println("idx rows: " + idx.count())
    println("== step 3: ivfResiduals")
    val r = Graft.ivfResiduals(emb, "vec_id", "v", cents, "cent_id", "cv")
    println("resid rows: " + r.count())
    println("== step 4: sqBounds over residuals")
    val b = Graft.sqBounds(r.select(col("id"), col("rvec")), "id", "rvec", 8)
    println("bounds rows: " + b.count())
    println("== step 5: ivfQuery over fresh index")
    val q = emb.where(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    println("served rows: " + Graft.ivfQuery(idx, cents, "cent_id", "cv",
      q, "qid", "qv", k = 3, nprobe = 2, excludeSelf = true).count())
    println("== step 6: per-cell bounds -> ivfSqIndex -> ivfSqQuery")
    val bc = Graft.ivfSqBoundsPerCell(emb, "vec_id", "v",
      cents, "cent_id", "cv", 8)
    val sqi = Graft.ivfSqIndex(emb, "vec_id", "v", cents, "cent_id", "cv",
      bc, 8)
    println("sq idx rows: " + sqi.count())
    println("sq served: " + Graft.ivfSqQuery(sqi, cents, "cent_id", "cv",
      bc, q, "qid", "qv", k = 3, nprobe = 2, excludeSelf = true).count())
    println("== step 7: ivfPq residual pipeline")
    val books = Graft.ivfPqCodebooks(emb, "vec_id", "v", cents,
      "cent_id", "cv", 8, 2, 4, 1)
    val pqi = Graft.ivfPqIndex(emb, "vec_id", "v", cents, "cent_id", "cv",
      books, residual = true)
    println("pq idx rows: " + pqi.count())
    println("pq served: " + Graft.ivfPqQuery(pqi, cents, "cent_id", "cv",
      books, q, "qid", "qv", k = 3, nprobe = 2, excludeSelf = true,
      residual = true).count())
    println("ALL OK")
    spark.stop()
  }
}
