package graft

// disposable probe main: the measurement behind the r18 banded-gate
// envelope — Spark HLL++ (default 5% rsd, m=512 registers) absolute
// and relative error vs exact distincts across the test corpora and
// the x10 scalegen corpus. Finding: small-n ABSOLUTE error far
// exceeds the textbook linear-counting sigma (delta 9 at n=110; 4-6
// at n=20-40), while large-n relative error stays under 3x rsd —
// hence the two-regime band max(16, 0.15*exact) on #40/#101.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbeHllBand {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/tmp/sfx10", "/root/testdata/sf0.1",
        "/root/testdata/sf0.01", "/tmp/nasty/star")) {
      val est = graft.operators.Stats.provinceStatsApproxEst(spark, dir)
        .select(col("n_name"), col("day"), col("order_ct_approx"))
      val ex = graft.operators.Stats.qProvinceStats(spark, dir)
        .select(col("n_name"), col("day"), col("order_ct"))
      val j = ex.join(est, Seq("n_name", "day"))
        .withColumn("delta", abs(col("order_ct_approx") - col("order_ct")))
      val top = j.orderBy(col("delta").desc).limit(1).collect()(0)
      val relTop = j.where(col("order_ct") > 0)
        .withColumn("rel", col("delta").cast("double") / col("order_ct"))
        .orderBy(col("rel").desc).limit(3).collect()
      println(s"$dir: maxDelta=${top.getAs[Long]("delta")} at ct=${top.getAs[Long]("order_ct")}; " +
        s"worst rel=" + relTop.map(r => f"${r.getAs[Double]("rel")}%.3f@ct${r.getAs[Long]("order_ct")}").mkString(","))
      // profile gate's HLL at big n: orders keys
      val o = graft.Tables.orders(spark, dir)
      val e2 = o.agg(countDistinct("o_orderkey")).head.getLong(0)
      val a2 = o.agg(approx_count_distinct("o_orderkey")).head.getLong(0)
      println(s"  o_orderkey: exact=$e2 hll=$a2 rel=${math.abs(a2 - e2).toDouble / e2}")
    }
    spark.stop()
  }
}
