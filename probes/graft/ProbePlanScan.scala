package graft

import org.apache.spark.sql.SparkSession

// disposable probe main (not part of the library): dump, per
// registered query, the sequence of shuffle-exchange partitioning
// keys in the sf0.001 physical plan — a quick census for probe-14-
// style elidable exchanges (an exchange whose keys are a SUPERSET of
// a later same-subtree exchange's keys could have been one exchange
// on the subset via the clustered-distribution subset rule).
// args: [sfDir=/root/testdata/sf0.001]
object ProbePlanScan {
  def main(args: Array[String]): Unit = {
    val sf = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ex = "Exchange hashpartitioning\\(([^)]*)\\)".r
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, sf).queryExecution.executedPlan.toString
        val keys = ex.findAllMatchIn(p).map(_.group(1)
          .replaceAll("#\\d+L?", "").replaceAll(", \\d+$", "")).toList
        println(s"$name :: ${keys.size} :: ${keys.mkString(" | ")}")
      } catch { case e: Throwable => println(s"$name :: ERR ${e.getMessage}") }
    }
    spark.stop()
  }
}
