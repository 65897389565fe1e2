package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// disposable probe main (not part of the library): data profiling
// (#95, Graft.profile) exact vs approx on a wide synthetic table —
// the exact flavor pays the multi-distinct Expand (input ×k for k
// profiled columns), the HLL flavor is one pass. Measures how the gap
// scales with the column count.
// args: [N=50000000]
object ProbeProfile {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 50000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = spark.range(n).select(
      col("id"),
      pmod(xxhash64(col("id"), lit(1)), lit(1000000L)).as("c1"),
      pmod(xxhash64(col("id"), lit(2)), lit(10000L)).as("c2"),
      pmod(xxhash64(col("id"), lit(3)), lit(100L)).as("c3"),
      (pmod(xxhash64(col("id"), lit(4)), lit(100000L)) / lit(100.0)).as("c4"))
      .localCheckpoint(true)
    println(s"N=$n")
    for (k <- Seq(2, 4); rep <- 1 to 2) {
      val cols = Seq("id", "c1", "c2", "c3", "c4").take(k + 1)
      val t0 = System.nanoTime()
      graft.api.Graft.profile(rows, cols).count()
      val t1 = System.nanoTime()
      graft.api.Graft.profile(rows, cols, approx = true).count()
      val t2 = System.nanoTime()
      println(f"k=${k + 1} rep$rep exact=${(t1 - t0) / 1e9}%.2f s " +
        f"approx=${(t2 - t1) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
