package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

// disposable probe main (not part of the library): prices the #125
// reshape — the ORIGINAL two-branch form (tf and df each re-run the
// corpus scan + word explode) vs the SHIPPED one-scan persisted
// (doc, source, word) contraction — on a corpus scaled by copying
// documents with fresh ids, where the explode cost grows with the
// corpus and the persist overhead stays contraction-sized.
object ProbeTfidf {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val scale = if (args.length > 1) args(1).toInt else 16
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables.documents(spark, dir).select("doc_id", "source", "text")
    val big = spark.range(scale).crossJoin(base)
      .select((col("doc_id") * scale + col("id")).as("doc_id"),
        col("source"), col("text"))
      .localCheckpoint(true)
    println(s"corpus: ${big.count()} docs (x$scale)")

    def words(df: DataFrame) = df
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)

    def tail(tf: DataFrame, dfreq: DataFrame, n: DataFrame): DataFrame = {
      val w = Window.partitionBy("source")
        .orderBy(col("tfidf").desc, col("word"))
      tf.join(dfreq, "word").crossJoin(broadcast(n))
        .withColumn("tfidf",
          round(col("tf").cast("double") *
            log(col("n_docs").cast("double") / col("df").cast("double")), 6))
        .withColumn("rk", row_number().over(w).cast("long"))
        .where(col("rk") <= 10)
        .select("source", "rk", "word", "tf", "df", "tfidf")
    }

    def twoScan(): DataFrame = {
      val ws = words(big)
      tail(
        ws.groupBy("source", "word").agg(count(lit(1)).as("tf")),
        ws.select("doc_id", "word").distinct()
          .groupBy("word").agg(count(lit(1)).as("df")),
        big.agg(count(lit(1)).as("n_docs")))
    }

    def oneScan(): DataFrame = {
      val docWord = words(big)
        .groupBy(col("doc_id"), col("source"), col("word"))
        .agg(count(lit(1)).as("c")).persist()
      val out = tail(
        docWord.groupBy("source", "word").agg(sum("c").as("tf")),
        docWord.groupBy("word").agg(count(lit(1)).as("df")),
        big.agg(count(lit(1)).as("n_docs")))
      out
    }

    def time(name: String, f: () => DataFrame): Double = {
      var last = 0.0
      (1 to reps).foreach { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        last = (System.nanoTime() - t0) / 1e9
      }
      println(f"$name: $last%.2f s (rep$reps)")
      last
    }

    val a = time("two_scan", twoScan _)
    val b = time("one_scan", oneScan _)
    println(f"""{"scale":$scale,"two_scan_s":$a%.3f,"one_scan_s":$b%.3f,"ratio":${a / b}%.2f}""")
    spark.stop()
  }
}
