package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// disposable probe main: #161 label purity growth at x16 and the
// sampleMod dial. The broadcast-probe exact KNN costs
// n * (n/sampleMod) cosines: at a fixed dial a 16x corpus means 256x
// compute; scaling the dial with the corpus (constant probe COUNT)
// restores linear growth with an unchanged estimator variance.
// env: base corpus from SPARK_GRAFT_SF_DIR, x16 at /tmp/scale/x16
object ProbePurity {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val x16 = "/tmp/scale/x16"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(name: String, dir: String, mod: Long): Unit =
      for (rep <- 1 to 2) {
        val t0 = System.nanoTime()
        graft.api.Graft.labelPurity(Tables.embeddings(spark, dir),
            "vec_id", "embedding", "label", dim = 64, sampleMod = mod)
          .write.format("noop").mode("overwrite").save()
        println(f"$name mod=$mod rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    run("x1", sf, 10L)
    run("x16_fixed_dial", x16, 10L)
    run("x16_scaled_dial", x16, 160L)
    spark.stop()
  }
}
