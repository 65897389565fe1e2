package graft

import org.apache.spark.sql.functions._

/** Scale-technique proofs: co-located fact-fact joins via bucketing,
  * and salted exact count-distinct for skewed keys. At 100 TB the
  * orders⋈lineitem family shuffles both facts on every run unless the
  * tables are bucket-stored on the join key. This spec proves the
  * mechanics end-to-end: bucket both facts on the order key, join, and
  * assert the plan has NO shuffle exchange — the property Tables.scala
  * is structured to adopt (one loader to switch to bucketed reads).
  */
class BucketingSpec extends SparkSpec {

  test("salted count-distinct is exact for every skewed key") {
    // event_type is the skewed key here (a handful of values over the
    // whole table — the shape that funnels a plain count(distinct)
    // through one task per hot key at scale)
    val ev = Tables.events(spark, sf)
    val direct = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("direct_ct"))
    val salted = graft.operators.Stats.distinctPerKeySalted(
      ev, "event_type", "user_id", salts = 16)
    val joined = direct.join(salted, "event_type")
    assert(joined.count() == direct.count(), "a key went missing")
    assert(joined.where(col("direct_ct") =!= col("distinct_ct")).count() == 0,
      "salted distinct diverged from the direct count")
  }

  test("bucketed orders join lineitem with zero shuffle exchanges") {
    val wh = java.nio.file.Files.createTempDirectory("graft_bt_").toString
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    try {
      Tables.orders(spark, sfTiny)
        .select("o_orderkey", "o_custkey", "o_orderdate")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/b_orders").saveAsTable("b_orders")
      Tables.lineitem(spark, sfTiny)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/b_lineitem").saveAsTable("b_lineitem")

      // bucketed scans satisfy the join's distribution requirement —
      // exercised with the EXACT #5 (q_order_wide) join shape: equi
      // key + ship-date range residual, which rides the SMJ unchanged
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"),
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") >= col("o_orderdate") &&
            col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      // and it computes the same rows as the shuffled join
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10L * 1024 * 1024)
      val expected = Tables.orders(spark, sfTiny)
        .join(Tables.lineitem(spark, sfTiny),
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") >= col("o_orderdate") &&
            col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10L * 1024 * 1024)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
