package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// disposable probe main (not part of the library): the decimal-sum
// accumulator fast path. Spark's sum over decimal(p,s) plans a
// decimal(p+10,s) accumulator; above precision 18 Decimal leaves its
// compact-long representation and every row update goes through
// java.math.BigDecimal.setScale (observed directly in thread dumps of
// the money aggregates). Summing the same values at decimal(8,2) —
// lossless for TPC-H money columns, which cap below 10^6 — keeps the
// accumulator at decimal(18,2), inside the compact-long path; summing
// raw cents as BIGINT is the no-decimal ceiling. Measures a q1-shaped
// groupBy over synthetic money values.
// args: [N=200000000] [G=4]
object ProbeDecimal {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 200000000L
    val g = if (args.length > 1) args(1).toLong else 4L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // cents in [0, 10^8) => dollars < 10^6, the TPC-H money envelope
    val rows = spark.range(n)
      .select(pmod(col("id"), lit(g)).as("grp"),
        pmod(xxhash64(col("id")), lit(100000000L)).as("cents"))
      .select(col("grp"), col("cents"),
        (col("cents") / 100.0).cast("decimal(12,2)").as("d12"))
      .localCheckpoint(true)
    println(s"N=$n G=$g")
    for (rep <- 1 to 2) {
      val t0 = System.nanoTime()
      // accumulator decimal(22,2): BigDecimal slow path
      rows.groupBy("grp").agg(sum(col("d12")).as("s")).count()
      val t1 = System.nanoTime()
      // accumulator decimal(18,2): compact-long fast path
      rows.groupBy("grp")
        .agg(sum(col("d12").cast("decimal(8,2)")).as("s")).count()
      val t2 = System.nanoTime()
      // pure long adds: the ceiling
      rows.groupBy("grp").agg(sum(col("cents")).as("s")).count()
      val t3 = System.nanoTime()
      println(f"rep$rep dec22acc=${(t1 - t0) / 1e9}%.2f s " +
        f"dec18acc=${(t2 - t1) / 1e9}%.2f s " +
        f"bigint=${(t3 - t2) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
