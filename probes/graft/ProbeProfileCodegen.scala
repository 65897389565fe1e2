package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// disposable probe main: q_profile_orders_approx's single wide
// aggregate mixes HLL (ImperativeAggregate -> whole-stage codegen OFF
// for the entire stage) with 19 declarative min/max/counts, so ALL of
// it runs interpreted, boxing per row -- the allocation churn a
// memory-pressured host amplifies 10-100x. Compares the split shape:
// declarative agg (codegen'd) + HLL-only agg, crossed 1-row x 1-row.
// Prints GC time deltas as the allocation witness.
// args: none; env SPARK_GRAFT_SF_DIR
object ProbeProfileCodegen {
  def gcMs(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
  }
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.Tables
    def o = Tables.orders(spark, sf).select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice"),
      datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).as("o_orderdate_day"),
      col("o_orderpriority"))
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate_day", "o_orderpriority")
    def time(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      for (rep <- 1 to 3) {
        val g0 = gcMs(); val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        println(f"$name rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s gc=${gcMs() - g0} ms")
      }
    }
    def declAgg = o.agg(count(lit(1)).as("_rows"),
      cols.zipWithIndex.flatMap { case (c, i) => Seq(
        count(col(c)).as(s"_nn$i"),
        min(expr(s"try_cast($c AS DOUBLE)")).as(s"_mn$i"),
        max(expr(s"try_cast($c AS DOUBLE)")).as(s"_mx$i")) }: _*)
    def hllAgg = o.agg(
      approx_count_distinct(col(cols.head)).as("_nd0"),
      cols.tail.zipWithIndex.map { case (c, i) =>
        approx_count_distinct(col(c)).as(s"_nd${i + 1}") }: _*)
    time("current_full")(SparkEntry.queries("q_profile_orders_approx")(spark, sf))
    time("split_decl")(declAgg)
    time("split_hll")(hllAgg)
    time("split_joined")(declAgg.crossJoin(hllAgg))
    val d = declAgg
    d.write.format("noop").mode("overwrite").save()
    val plan = d.queryExecution.executedPlan.toString
    println("decl plan has WholeStageCodegen: " + plan.contains("WholeStageCodegen") +
      " / stars: " + "\\*\\(\\d+\\)".r.findAllIn(plan).size)
    spark.stop()
  }
}
