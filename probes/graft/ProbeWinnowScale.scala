package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
// disposable: probe 27 follow-up — the winnow x1/x16/x64 ladder at
// REPS=3 on a checked-quiet host (the first capture's x16/x64 minima
// inverted under intermittent noise)
object ProbeWinnowScale {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    def docsX(scale: Int): DataFrame =
      (0 until scale).map { c =>
        docs.select((col("doc_id") + lit(c.toLong * 10000000L)).as("doc_id"),
          col("text"))
      }.reduce(_ unionByName _).localCheckpoint(true)
    def time(tag: String)(body: => Unit): Unit =
      (1 to 3).foreach { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); body
        println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    import graft.api.Graft
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    time("winnow x1")(noop(Graft.winnowPairs(docs, "doc_id", "text")))
    val d16 = docsX(16); println("x16 " + d16.count())
    time("winnow x16")(noop(Graft.winnowPairs(d16, "doc_id", "text")))
    val d64 = docsX(64); println("x64 " + d64.count())
    time("winnow x64")(noop(Graft.winnowPairs(d64, "doc_id", "text")))
    spark.stop()
  }
}
