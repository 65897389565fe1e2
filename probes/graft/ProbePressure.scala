package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// disposable probe main (probe 20's A/B witness): the PRE-round-12
// formulations of the blowup family — decimal-accumulator province
// stats and the mixed HLL+declarative profile aggregate — timed
// side-by-side with the shipped allocation-free forms, intended to run
// both QUIET and under memory pressure (tools/hostcheck.py tells you
// which you got; a held-resident page-churn hog reproduces the
// oversubscribed host's first-touch pathology locally).
// env: SPARK_GRAFT_SF_DIR
object ProbePressure {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => org.apache.spark.sql.DataFrame): Unit =
      for (rep <- 1 to 2) {
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        println(f"$name rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    // OLD province stats: decimal(17,4) line revenue -> decimal(27,4)
    // sum accumulator (above the compact-long ceiling: BigDecimal per
    // row update at BOTH aggregation levels)
    def provinceOld = {
      val o = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_orderdate")
      val l = Tables.lineitem(spark, sf)
        .select("l_orderkey", "l_extendedprice", "l_discount")
      val c = Tables.customer(spark, sf).select("c_custkey", "c_nationkey")
      val n = Tables.nation(spark, sf).select("n_nationkey", "n_name")
      val perOrder = l.groupBy("l_orderkey")
        .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
          (lit(BigDecimal(1).setScale(2)).cast("decimal(4,2)") -
            col("l_discount").cast("decimal(4,2)"))).as("rev"))
      o.join(perOrder, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("order_ct"), sum("rev").cast("double").as("amount"))
        .orderBy("n_name", "day")
    }
    // OLD approx profile: ONE mixed aggregate — the HLL imperative
    // functions disable whole-stage codegen for the whole stage
    def profileOldMixed = {
      val o = Tables.orders(spark, sf).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"),
        datediff(col("o_orderdate").cast("date"),
          lit("1970-01-01").cast("date")).as("o_orderdate_day"),
        col("o_orderpriority"))
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate_day", "o_orderpriority")
      o.agg(count(lit(1)).as("_rows"), cols.zipWithIndex.flatMap { case (c, i) =>
        Seq(count(col(c)).as(s"_nn$i"),
          approx_count_distinct(col(c)).cast("long").as(s"_nd$i"),
          min(expr(s"try_cast($c AS DOUBLE)")).as(s"_mn$i"),
          max(expr(s"try_cast($c AS DOUBLE)")).as(s"_mx$i")) }: _*)
    }
    time("province_OLD_decimal")(provinceOld)
    time("province_NEW_e4long")(SparkEntry.queries("q_province_stats")(spark, sf))
    time("profile_OLD_mixed")(profileOldMixed)
    time("profile_NEW_split")(SparkEntry.queries("q_profile_orders_approx")(spark, sf))
    spark.stop()
  }
}
