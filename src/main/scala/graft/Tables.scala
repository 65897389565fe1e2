package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central parquet loaders for the test star schema.
  *
  * One place to later swap in bucketed / partitioned reads on a real
  * cluster. Loaders take the scale-factor directory so the same code
  * runs at any SF. Column pruning + filter pushdown are left to
  * Catalyst — callers `select` early and the scan shrinks accordingly.
  */
object Tables {
  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")

  /** Normalizes `events.ts` to a `ts_us` BIGINT (epoch microseconds)
    * column whatever the file's physical encoding — the rest of the
    * engine works in integer micros only, so the gate's time math is
    * engine- and timezone-independent. Three encodings seen across
    * testdata generations, branched on the LOADED schema:
    *
    *  - TIMESTAMP(NANOS): Spark's reader rejects it unless
    *    `spark.sql.legacy.parquet.nanosAsLong=true`, which surfaces a
    *    BIGINT of nanos → `ts div 1000`, the same truncation DuckDB
    *    applies loading ns into its µs TIMESTAMP. The flag is
    *    session-wide, so the loader must not set it as a read side
    *    effect (r4 advice) — graft's entry points (Verify/Bench/Plans,
    *    the test base) set it at session build, and a nanos file read
    *    without it fails loudly below.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false) → TIMESTAMP_NTZ:
    *    `timestampdiff(MICROSECOND, epoch, ts)` — an NTZ−NTZ
    *    difference, no session-timezone dependence; DuckDB's
    *    `epoch_us(ts)` yields the identical integer.
    *  - TIMESTAMP(MICROS, adjusted) → TIMESTAMP: `unix_micros`.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, unix_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    // the NANOS marker may sit on a wrapped cause (Spark surfaces
    // PARQUET_TYPE_ILLEGAL via AnalysisException but can re-wrap it in
    // SparkException layers), so walk the cause chain rather than
    // matching the top-level message only (review r11)
    def mentionsNanos(t: Throwable): Boolean =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .exists(c => c.getMessage != null && c.getMessage.contains("NANOS"))
    val raw =
      try load(spark, dir, "events")
      catch {
        case e: Exception if mentionsNanos(e) =>
          throw new IllegalStateException(
            "events.parquet carries TIMESTAMP(NANOS); set " +
              "spark.sql.legacy.parquet.nanosAsLong=true on the SparkSession " +
              "builder — the loader deliberately does not mutate session conf",
            e)
      }
    val tsUs = raw.schema("ts").dataType match {
      case LongType         => expr("ts div 1000")
      case TimestampNTZType =>
        expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
      case TimestampType    => unix_micros(col("ts"))
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type ${other.simpleString}")
    }
    raw.withColumn("ts_us", tsUs).drop("ts")
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  private def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
