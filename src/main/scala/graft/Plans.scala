package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit utility: `runMain graft.Plans [queryName ...]` prints the
  * formatted physical plan of the named queries (all queries when no
  * args) against SPARK_GRAFT_SF_DIR. Used to keep docs/PLANS.md honest
  * and to eyeball broadcast/pushdown/codegen properties beyond what
  * PlanSpec asserts.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      println(s"\n===== $name =====")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
