package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.sinks.Sinks
import graft.streaming.LogEvent

/** The serving (exactly-once parquet) and dimension (keyed upsert)
  * sinks.
  */
class SinksSpec extends SparkSpec {

  private def ev(id: Long, user: Long, tsUs: Long) =
    LogEvent(id, user, "view", new java.sql.Timestamp(tsUs / 1000), tsUs, 1.0, null)

  test("serving sink: partitioned, exactly-once across restart from checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft_serve_").toString
    val ms = MemoryStream[LogEvent]
    val withDay = ms.toDF()
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    val q1 = Sinks.servingSink(withDay, s"$base/out", s"$base/ckpt", "day")
    ms.addData(Seq(ev(1, 1, 1_000_000L), ev(2, 2, 90_000_000_000_000L)))
    q1.processAllAvailable(); q1.stop()
    // restart from the same checkpoint: nothing replays into the sink
    val q2 = Sinks.servingSink(withDay, s"$base/out", s"$base/ckpt", "day")
    ms.addData(Seq(ev(3, 3, 2_000_000L)))
    q2.processAllAvailable(); q2.stop()
    val out = spark.read.parquet(s"$base/out")
    assert(out.count() == 3, "restart must not duplicate committed batches")
    // day partitioning materialized as directories (pruning surface)
    assert(out.select("day").distinct().count() == 2)
    val dirs = new java.io.File(s"$base/out").listFiles().map(_.getName)
    assert(dirs.exists(_.startsWith("day=")), dirs.mkString(","))
  }

  test("dim upsert recovers a snapshot left renamed aside by a crashed swap") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_dimrec_").toString
    val mk = (k: Long, v: Long, p: Long) =>
      (k, v, p)
    // seed a snapshot, then simulate a crash mid-swap: target renamed to
    // __old, stale __staging left behind
    Seq(mk(1, 100, 10), mk(2, 100, 20)).toDF("dim_key", "version", "payload")
      .write.parquet(s"$base/dim")
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(s"$base/dim"),
      new org.apache.hadoop.fs.Path(s"$base/dim__old"))
    Seq(mk(9, 1, 99)).toDF("dim_key", "version", "payload")
      .write.parquet(s"$base/dim__staging")
    // next upsert must restore __old (not lose keys 1 and 2)
    Sinks.upsert(Seq(mk(1, 200, 11)).toDF("dim_key", "version", "payload"),
      s"$base/dim", Seq("dim_key"), "version")
    val snap = spark.read.parquet(s"$base/dim")
      .select("dim_key", "payload").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(snap == Map(1L -> 11L, 2L -> 20L),
      s"crash recovery lost the retired snapshot: $snap")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$base/dim__staging")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$base/dim__old")))
  }

  test("compaction collapses small files, preserves rows, leaves no residue") {
    val base = Files.createTempDirectory("graft_compact_").toString
    val dir = s"$base/t"
    // 40 one-row files — the shape a minute-cadence streaming sink leaves
    val df = Tables.nation(spark, sfTiny).limit(10)
    (0 until 4).foreach { _ =>
      df.repartition(10).write.mode("append").parquet(dir)
    }
    val before = spark.read.parquet(dir)
    val beforeRows = before.count()
    val beforeSum = before.agg(sum("n_nationkey")).collect()(0).getLong(0)
    val (nBefore, nAfter) = Sinks.compactParquet(spark, dir)
    assert(nBefore >= 40 && nAfter == 1,
      s"expected 40+ files -> 1, got $nBefore -> $nAfter")
    val after = spark.read.parquet(dir)
    assert(after.count() == beforeRows)
    assert(after.agg(sum("n_nationkey")).collect()(0).getLong(0) == beforeSum,
      "compaction changed the data")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"${dir}__compact_staging")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"${dir}__compact_old")))
    // second run is a no-op: already at/below the target file count
    assert(Sinks.compactParquet(spark, dir) == (1, 1))
  }

  test("store stats: fold matches the filesystem, drives the compaction trigger") {
    import java.nio.file.{Files => JFiles, Paths}
    import scala.jdk.CollectionConverters._
    val base = Files.createTempDirectory("graft_stats_").toString
    // a replay-safe store shape: subtree with batch=N partitions of
    // deliberately tiny files, plus a second healthy subtree
    (0 until 3).foreach { b =>
      spark.range(20).repartition(4)
        .write.mode("overwrite").parquet(s"$base/stats/batch=$b")
    }
    spark.range(1000).coalesce(1)
      .write.mode("overwrite").parquet(s"$base/big")
    val stats = Sinks.storeStats(spark, base, smallFileBytes = 1024 * 1024,
        minFiles = 4, smallFrac = 0.5)
      .collect().map(r => r.getString(0) -> r).toMap
    // fold == filesystem truth
    def fsParquetCount(sub: String): Long =
      JFiles.walk(Paths.get(base, sub)).iterator().asScala
        .count(p => p.toString.endsWith(".parquet"))
    assert(stats("stats").getLong(1) == fsParquetCount("stats"))
    assert(stats("stats").getLong(2) == 3L, "batch partition count")
    assert(stats("big").getLong(1) == fsParquetCount("big"))
    // 12 tiny files > minFiles at 100% small → trigger fires; the
    // single-file subtree stays quiet
    assert(stats("stats").getBoolean(6), "small-file subtree must trigger")
    assert(!stats("big").getBoolean(6), "healthy subtree must not trigger")
    // compaction clears the trigger without losing rows
    val beforeRows = spark.read.parquet(s"$base/stats/batch=0").count()
    Sinks.compactParquet(spark, s"$base/stats/batch=0", targetBytes = 64L << 20)
    assert(spark.read.parquet(s"$base/stats/batch=0").count() == beforeRows)
    val after = Sinks.storeStats(spark, s"$base/stats",
        smallFileBytes = 1024 * 1024, minFiles = 4, smallFrac = 0.5)
      .where(col("subtree") === "batch=0").head
    assert(after.getLong(1) == 1L, s"batch=0 should compact to one file, got $after")
  }

  test("cdc apply: latest wins, deletes drop, untouched buckets are not rewritten") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_cdc_").toString
    val t = s"$base/t"
    val n = 8
    def cdc(rows: Seq[(Long, Long, String, Long)]) =
      rows.toDF("k", "ver", "op", "payload")
    // the table's own routing function, evaluated per key
    val bucketOf = (1L to 20L).map { k =>
      k -> spark.range(1).select(pmod(hash(lit(k)), lit(n))).first().getInt(0)
    }.toMap
    val byBucket = (1L to 20L).groupBy(bucketOf)
    val Seq(kA, kDel) = byBucket.values.find(_.size >= 2).get.take(2).toSeq
    val kQuiet = byBucket.collectFirst {
      case (b, ks) if b != bucketOf(kA) => ks.head
    }.get
    Sinks.cdcApply(cdc((1L to 20L).map(k => (k, 1L, "insert", k * 10))),
      t, Seq("k"), "ver", "op", n)
    val quietDir = new java.io.File(s"$t/bucket=${bucketOf(kQuiet)}")
    def fingerprint = quietDir.listFiles().map(f =>
      (f.getName, f.lastModified, f.length)).sortBy(_._1).toSeq
    val before = fingerprint
    // batch 2 touches ONLY kA's bucket: update kA, delete kDel
    val batch2 = cdc(Seq((kA, 2L, "update", 777L), (kDel, 2L, "delete", 0L)))
    Sinks.cdcApply(batch2, t, Seq("k"), "ver", "op", n)
    assert(fingerprint == before,
      "a bucket with no batch keys was rewritten")
    def snap = Sinks.cdcSnapshot(spark, t).select("k", "payload")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = (1L to 20L).filter(_ != kDel)
      .map(k => k -> (if (k == kA) 777L else k * 10)).toMap
    assert(snap == expected, s"merge state drifted: $snap")
    // replaying the same batch is a no-op (foreachBatch at-least-once)
    Sinks.cdcApply(batch2, t, Seq("k"), "ver", "op", n)
    assert(snap == expected, "replay was not idempotent")
    // a different bucket count must fail loudly, not mis-route silently
    intercept[IllegalArgumentException] {
      Sinks.cdcApply(batch2, t, Seq("k"), "ver", "op", n * 2)
    }
    // deleting EVERY key of a bucket must remove the bucket dir too —
    // dynamic overwrite alone would leave the stale dir in place
    val bucketA = bucketOf(kA)
    val allOfA = byBucket(bucketA).filter(_ != kDel)
    Sinks.cdcApply(cdc(allOfA.map(k => (k, 9L, "delete", 0L))),
      t, Seq("k"), "ver", "op", n)
    assert(!new java.io.File(s"$t/bucket=$bucketA").exists(),
      "an emptied bucket left a stale directory")
    assert(snap == (expected -- allOfA), s"post-sweep state drifted: $snap")
  }

  test("cdc apply sink: a micro-batched change stream lands as final per-key state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft_cdcs_").toString
    val ms = MemoryStream[(Long, Long, String, Long)]
    val cdc = ms.toDF().toDF("k", "ver", "op", "payload")
    val q = Sinks.cdcApplySink(cdc, s"$base/t", s"$base/ckpt",
      Seq("k"), "ver", "op", numBuckets = 4).start()
    val batches = Seq(
      Seq((1L, 1L, "insert", 10L), (2L, 1L, "insert", 20L), (3L, 1L, "insert", 30L)),
      Seq((1L, 2L, "update", 11L), (2L, 2L, "delete", 0L)),
      Seq((2L, 3L, "insert", 22L), (4L, 1L, "insert", 40L)))
    try {
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    } finally q.stop()
    // oracle: window over the whole change log
    val all = batches.flatten.toDF("k", "ver", "op", "payload")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("ver").desc)
    val want = all.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1 && col("op") =!= "delete")
      .select("k", "payload")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Sinks.cdcSnapshot(spark, s"$base/t").select("k", "payload")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, s"stream CDC state $got != change-log oracle $want")
  }

  test("dim upsert sink: snapshot keeps the latest version per key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft_dim_").toString
    val ms = MemoryStream[LogEvent]
    // key = user_id, version = ts_us, value carried in event_type slot
    val dims = ms.toDF().select(
      col("user_id").as("dim_key"), col("ts_us").as("version"),
      col("event_id").as("payload"))
    val q = Sinks.dimUpsertSink(dims, s"$base/dim", s"$base/ckpt",
      Seq("dim_key"), "version").start()
    try {
      ms.addData(Seq(ev(10, 1, 100), ev(20, 2, 100)))
      q.processAllAvailable()
      // second batch: newer version for key 1, older (stale) for key 2
      ms.addData(Seq(ev(11, 1, 200), ev(19, 2, 50)))
      q.processAllAvailable()
    } finally q.stop()
    val snap = spark.read.parquet(s"$base/dim")
      .select("dim_key", "payload").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(snap == Map(1L -> 11L, 2L -> 20L),
      s"expected latest-version rows only, got $snap")
  }
}
