package graft

import org.apache.spark.sql.SparkSession

// disposable probe main: print the executed plan of named queries
// args: query names; env SPARK_GRAFT_SF_DIR
object ProbeExplain {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { q =>
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
