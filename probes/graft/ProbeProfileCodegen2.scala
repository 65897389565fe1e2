package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// disposable probe: bisect which aggregate function knocks the
// declarative profile agg out of whole-stage codegen.
object ProbeProfileCodegen2 {
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
    def o = graft.Tables.orders(spark, sf)
    def check(name: String, f: org.apache.spark.sql.DataFrame): Unit = {
      f.write.format("noop").mode("overwrite").save()
      val p = f.queryExecution.executedPlan.toString
      println(s"$name codegen=${p.contains("WholeStageCodegen")}")
    }
    check("range_sum", spark.range(1000).agg(sum("id")))
    check("orders_minmax", o.agg(min("o_totalprice"), max("o_totalprice"), count(lit(1))))
    check("orders_trycast", o.agg(min(expr("try_cast(o_orderkey AS DOUBLE)"))))
    check("orders_trycast_str", o.agg(min(expr("try_cast(o_orderstatus AS DOUBLE)"))))
    check("orders_datediff", o.select(datediff(col("o_orderdate").cast("date"),
      lit("1970-01-01").cast("date")).as("d")).agg(min("d")))
    spark.stop()
  }
}
