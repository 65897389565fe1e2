package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

// disposable probe main (not part of the library): #120's aggregate
// rewrite of TPC-H Q21 (one fact exchange + windows over the
// contracted (order, supplier) frame) vs the classic double self-join
// (EXISTS other supplier / NOT EXISTS other late supplier as
// LeftSemi + LeftAnti on the fact). Both forms are gated equal by the
// DuckDB oracle at the test SFs; this measures what the rewrite is
// worth as the fact grows past the broadcast threshold — on the star
// corpus at sf0.1 (600k lines) the two tie (~1.2 s each, the self
// join's build sides still fit), so the probe generates a synthetic
// fact of N lines / ~L lines per order where the self-join's build
// sides are corpus-scale.
// args: [N=50000000] [L=4] [lateFrac=0.05]
object ProbeQ21 {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 50000000L
    val lpo = if (args.length > 1) args(1).toLong else 4L
    val lateFrac = if (args.length > 2) args(2).toDouble else 0.05
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ~L lines per order, ~L distinct suppliers per order, lateFrac of
    // lines late — the post-join (order, supplier, late) projection of
    // Q21, which is exactly where the two formulations diverge
    val wide = spark.range(n).select(
        (col("id") / lpo).cast("long").as("l_orderkey"),
        pmod(xxhash64(col("id")), lit(1000L)).as("l_suppkey"),
        (pmod(xxhash64(col("id"), lit(7)), lit(10000L)) <
          (lateFrac * 10000).toLong).as("late"))
      .localCheckpoint(true)
    println(s"N=$n linesPerOrder=$lpo lateFrac=$lateFrac")

    def rewrite() = {
      val g1 = wide.groupBy("l_orderkey", "l_suppkey")
        .agg(sum(col("late").cast("long")).as("n_late"))
      val w = Window.partitionBy("l_orderkey")
      g1.withColumn("n_supp", count(lit(1)).over(w))
        .withColumn("n_late_supp",
          sum(when(col("n_late") > 0, 1L).otherwise(0L)).over(w))
        .filter(col("n_late") > 0 && col("n_supp") > 1 &&
          col("n_late_supp") === 1)
        .groupBy("l_suppkey").agg(sum(col("n_late")).as("numwait"))
        .orderBy(col("numwait").desc, col("l_suppkey")).limit(100)
    }

    def selfJoin() = {
      val w1 = wide.filter(col("late"))
      val w2 = wide.select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
      val w3 = wide.filter(col("late"))
        .select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"))
      w1.join(w2, col("l_orderkey") === col("o2") &&
          col("l_suppkey") =!= col("s2"), "left_semi")
        .join(w3, col("l_orderkey") === col("o3") &&
          col("l_suppkey") =!= col("s3"), "left_anti")
        .groupBy("l_suppkey").agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("l_suppkey")).limit(100)
    }

    // window-free rewrite: the per-order counts come from a second
    // aggregation of the contracted frame, re-attached by join —
    // trades the window SORT for a (contracted-scale) shuffle join
    def twoAgg() = {
      val g1 = wide.groupBy("l_orderkey", "l_suppkey")
        .agg(sum(col("late").cast("long")).as("n_late"))
      val g2 = g1.groupBy("l_orderkey").agg(
          count(lit(1)).as("n_supp"),
          sum(when(col("n_late") > 0, 1L).otherwise(0L)).as("n_late_supp"))
        .filter(col("n_supp") > 1 && col("n_late_supp") === 1)
        .select("l_orderkey")
      g1.filter(col("n_late") > 0)
        .join(g2, "l_orderkey")
        .groupBy("l_suppkey").agg(sum(col("n_late")).as("numwait"))
        .orderBy(col("numwait").desc, col("l_suppkey")).limit(100)
    }

    // single-exchange rewrite: repartition by order FIRST — hash(ok)
    // satisfies both the (ok, sk) agg's and the window's clustered
    // distribution, so the contraction and the window run in place
    // with ONE fact-grain exchange. Map-side combine is forfeited,
    // but at ~L distinct suppliers per order it contracted ~nothing.
    def fused() = {
      val g1 = wide.repartition(col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(sum(col("late").cast("long")).as("n_late"))
      val w = Window.partitionBy("l_orderkey")
      g1.withColumn("n_supp", count(lit(1)).over(w))
        .withColumn("n_late_supp",
          sum(when(col("n_late") > 0, 1L).otherwise(0L)).over(w))
        .filter(col("n_late") > 0 && col("n_supp") > 1 &&
          col("n_late_supp") === 1)
        .groupBy("l_suppkey").agg(sum(col("n_late")).as("numwait"))
        .orderBy(col("numwait").desc, col("l_suppkey")).limit(100)
    }

    for (rep <- 1 to 4) {
      val t0 = System.nanoTime()
      val a = rewrite().collect().length
      val t1 = System.nanoTime()
      val b = selfJoin().collect().length
      val t2 = System.nanoTime()
      val c = twoAgg().collect().length
      val t3 = System.nanoTime()
      val d = fused().collect().length
      val t4 = System.nanoTime()
      println(f"rep$rep rewrite=${(t1 - t0) / 1e9}%.2f s ($a rows) " +
        f"selfJoin=${(t2 - t1) / 1e9}%.2f s ($b rows) " +
        f"twoAgg=${(t3 - t2) / 1e9}%.2f s ($c rows) " +
        f"fused=${(t4 - t3) / 1e9}%.2f s ($d rows)")
    }
    println("fused plan:")
    fused().explain("formatted")
    spark.stop()
  }
}
