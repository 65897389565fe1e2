package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// disposable probe main (VERDICT r11 item 6): exercise the cdcApply
// upsert sink at two bucket counts and under a planted bucket-skew
// batch (half the change rows hitting ONE hot key — the
// uniform-key-ness assumption real CDC feeds violate), the probe-17
// discipline applied to the sink. Reports seconds per apply + touched
// buckets so the SCALING.md entry records where the skew cost lands
// (single-bucket task) and what the bucket-count dial buys.
// args: [seedRows=2000000] [batchRows=500000]
object ProbeCdc {
  def main(args: Array[String]): Unit = {
    val seedRows = if (args.length > 0) args(0).toLong else 2000000L
    val batchRows = if (args.length > 1) args(1).toLong else 500000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def batch(rows: Long, version: Int, hot: Boolean) = {
      val base = spark.range(rows)
      val keyed =
        if (!hot) base.select((col("id") % seedRows).as("k"))
        else base.select(
          when(col("id") % 2 === 0, lit(0L))
            .otherwise(col("id") % seedRows).as("k"))
      keyed.select(col("k"),
        concat(lit("v"), col("k")).as("payload"),
        lit(version).as("ver"),
        lit("upsert").as("op"))
    }
    for (nb <- Seq(16, 64); hot <- Seq(false, true)) {
      val path = java.nio.file.Files
        .createTempDirectory(s"probe-cdc-$nb-$hot").toString
      val t0 = System.nanoTime()
      graft.sinks.Sinks.cdcApply(batch(seedRows, 1, hot = false), path,
        Seq("k"), "ver", numBuckets = nb)
      val tSeed = (System.nanoTime() - t0) / 1e9
      for (rep <- 1 to 2) {
        val t1 = System.nanoTime()
        graft.sinks.Sinks.cdcApply(batch(batchRows, 1 + rep, hot), path,
          Seq("k"), "ver", numBuckets = nb)
        val tApply = (System.nanoTime() - t1) / 1e9
        println(f"buckets=$nb hot=$hot rep$rep seed=$tSeed%.1f s apply=$tApply%.2f s")
      }
      val snap = graft.sinks.Sinks.cdcSnapshot(spark, path)
      println(s"buckets=$nb hot=$hot rows=${snap.count()} " +
        s"hotRow=${snap.where(col("k") === 0).select("ver").head.getInt(0)}")
      // recursive temp cleanup
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(path)).iterator().asScala
        .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    // pruning payoff: a batch confined to ONE key touches one bucket;
    // apply cost should be bucket-sized, not table-sized
    for (nb <- Seq(16, 64)) {
      val path = java.nio.file.Files
        .createTempDirectory(s"probe-cdc-one-$nb").toString
      graft.sinks.Sinks.cdcApply(batch(seedRows, 1, hot = false), path,
        Seq("k"), "ver", numBuckets = nb)
      for (rep <- 1 to 2) {
        val one = spark.range(batchRows).select(lit(0L).as("k"),
          lit("hot").as("payload"), (lit(10) + lit(rep)).as("ver"),
          lit("upsert").as("op"))
        val t1 = System.nanoTime()
        graft.sinks.Sinks.cdcApply(one, path, Seq("k"), "ver", numBuckets = nb)
        println(f"buckets=$nb onekey rep$rep apply=${(System.nanoTime() - t1) / 1e9}%.2f s")
      }
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(path)).iterator().asScala
        .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    spark.stop()
  }
}
