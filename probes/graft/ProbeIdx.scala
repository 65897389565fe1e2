package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// disposable probe main (not part of the library): steady-state
// incremental dedup — base index pre-stored, only the delta shingled;
// warmed + repeated for a fair comparison against the from-text path
object ProbeIdx {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val out = args(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val mod = if (args.length > 2) args(2).toLong else 3L
    val docs = Tables.documents(spark, dir)
    val isDelta = pmod(col("doc_id"), lit(mod)) === 1L
    docs.limit(32).write.format("noop").mode("overwrite").save()
    graft.api.Graft.shingleIndex(docs.where(!isDelta), "doc_id", "text")
      .write.mode("overwrite").parquet(out)
    // decompose: raw cost of scanning the stored index vs re-shingling
    // the same base from text
    for (rep <- 1 to 2) {
      val s1 = System.nanoTime()
      val ir = spark.read.parquet(out).count()
      val s2 = System.nanoTime()
      val sr = graft.api.Graft.shingleIndex(
        docs.where(!isDelta), "doc_id", "text").count()
      val s3 = System.nanoTime()
      println(f"PROBE rep=$rep scan_index=${(s2-s1)/1e9}%.2f rows=$ir%d " +
        f"reshingle=${(s3-s2)/1e9}%.2f rows=$sr%d")
    }
    graft.api.Graft.writeShingleIndex(
      graft.api.Graft.shingleIndex(docs.where(!isDelta), "doc_id", "text"),
      "probe_base_idx", buckets = 32, overwrite = true)
    for (rep <- 1 to 2) {
      val t1 = System.nanoTime()
      val n = graft.api.Graft.incrementalDedupPairsIndexed(
        spark.read.parquet(out),
        graft.api.Graft.shingleIndex(docs.where(isDelta), "doc_id", "text"),
        dfCap = 64).count()
      spark.catalog.clearCache()
      println(f"PROBE rep=$rep indexed_ingest=${(System.nanoTime()-t1)/1e9}%.2f pairs=$n%d")
      val t0 = System.nanoTime()
      val b = graft.api.Graft.incrementalDedupPairsIndexed(
        spark.table("probe_base_idx"),
        graft.api.Graft.shingleIndex(docs.where(isDelta), "doc_id", "text"),
        dfCap = 64).count()
      spark.catalog.clearCache()
      println(f"PROBE rep=$rep bucketed_ingest=${(System.nanoTime()-t0)/1e9}%.2f pairs=$b%d")
      val t2 = System.nanoTime()
      val m = graft.api.Graft.incrementalDedupPairs(
        docs.where(!isDelta), docs.where(isDelta), "doc_id", "text",
        dfCap = 64).count()
      spark.catalog.clearCache()
      println(f"PROBE rep=$rep from_text=${(System.nanoTime()-t2)/1e9}%.2f pairs=$m%d")
    }
    // plan shape: how many exchanges does each form pay?
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      "(?m)^\\s*\\+?-? ?Exchange".r
        .findAllIn(df.queryExecution.executedPlan.toString).length
    val fromBucketed = graft.api.Graft.incrementalDedupPairsIndexed(
      spark.table("probe_base_idx"),
      graft.api.Graft.shingleIndex(docs.where(isDelta), "doc_id", "text"),
      dfCap = 64)
    val fromFlat = graft.api.Graft.incrementalDedupPairsIndexed(
      spark.read.parquet(out),
      graft.api.Graft.shingleIndex(docs.where(isDelta), "doc_id", "text"),
      dfCap = 64)
    println(s"PROBE exchanges bucketed=${exchanges(fromBucketed)} " +
      s"flat=${exchanges(fromFlat)}")
    spark.stop()
  }
}
