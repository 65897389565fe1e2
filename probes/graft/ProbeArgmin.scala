package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

// disposable probe main (not part of the library): argmin-per-group as
// a mergeable struct-min aggregate (#94's shape) vs the row_number
// window (#24's shape) on a SKEWED grouping — one hot group owning a
// fixed fraction of all rows, the case where the window must buffer
// and sort the hot group in a single task while struct-min keeps
// collapsing map-side partials.
// args: [N=50000000] [G=100000] [hotFrac=0.3]
object ProbeArgmin {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 50000000L
    val g = if (args.length > 1) args(1).toLong else 100000L
    val hotFrac = if (args.length > 2) args(2).toDouble else 0.3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val hot = (n * hotFrac).toLong
    val rows = spark.range(n)
      .select(col("id"),
        when(col("id") < hot, lit(0L))
          .otherwise(pmod(xxhash64(col("id")), lit(g))).as("grp"),
        pmod(xxhash64(col("id"), lit(7)), lit(1000000L)).as("v"))
      .localCheckpoint(true)
    println(s"N=$n G=$g hotRows=$hot")
    val w = Window.partitionBy("grp").orderBy(col("v"), col("id"))
    for (rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val a = rows.groupBy("grp")
        .agg(min(struct(col("v"), col("id"))).as("b"))
        .select(col("grp"), col("b.v"), col("b.id")).count()
      val t1 = System.nanoTime()
      val b = rows.withColumn("rk", row_number().over(w))
        .where(col("rk") === 1).select("grp", "v", "id").count()
      val t2 = System.nanoTime()
      println(f"rep$rep structMin=${(t1 - t0) / 1e9}%.2f s ($a rows) " +
        f"window=${(t2 - t1) / 1e9}%.2f s ($b rows)")
    }
    spark.stop()
  }
}
