package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-lines event ingestion (the Spark-native stand-in for the
  * reference's Kafka `ods_base_log` topic, BaseLogApp.java:33-45):
  * lines arrive as raw strings (exactly the shape a Kafka `value`
  * column has) and parse through `from_json` with corrupt-record
  * capture, in both batch and incremental (file-streaming) form.
  * Malformed lines are NOT dropped — they surface with `corrupt` set
  * and keep their raw line for the dead-letter sink, the reference's
  * dirty-data side output.
  *
  * Scale notes: the text source parallelizes by file split and
  * `from_json` is a codegen'd per-row expression, so ingestion runs at
  * scan speed; PERMISSIVE capture keeps the pipeline total (no
  * poison-pill failures at 100 TB). Downstream operators see the exact
  * `events`-table schema plus `corrupt`/`raw_line`, and the identical
  * parse expression applies unchanged to a real Kafka `value` column.
  */
object JsonEventSource {

  /** The wire schema of one log line (ts as epoch micros, matching the
    * `ts_us` convention of the events table) + the capture column.
    */
  val wireSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts_us", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType),
    StructField("_corrupt_record", StringType)))

  private val parseOptions = Map(
    "mode" -> "PERMISSIVE",
    "columnNameOfCorruptRecord" -> "_corrupt_record")

  /** `raw` must carry one JSON line per row in a string column named
    * `line` (what a Kafka source calls `CAST(value AS STRING)`).
    */
  def parse(raw: DataFrame): DataFrame =
    raw
      .select(col("line").as("raw_line"),
        from_json(col("line"), wireSchema, parseOptions).as("e"))
      .select(
        col("e.event_id").as("event_id"),
        col("e.ts_us").as("ts_us"),
        col("e.user_id").as("user_id"),
        col("e.event_type").as("event_type"),
        col("e.value").as("value"),
        col("e.props").as("props"),
        (col("e").isNull || col("e._corrupt_record").isNotNull).as("corrupt"),
        col("raw_line"))

  /** Batch read of a directory of JSON-line files. */
  def read(spark: SparkSession, path: String): DataFrame =
    parse(spark.read.text(path).withColumnRenamed("value", "line"))

  /** Incremental read: new files under `path` become new micro-batches
    * (`readStream → transforms → writeStream`; pairs with
    * [[graft.streaming.Streams.routeLogs]] and the per-route sinks).
    */
  def readStream(spark: SparkSession, path: String): DataFrame =
    parse(spark.readStream
      .option("maxFilesPerTrigger", 8)
      .text(path)
      .withColumnRenamed("value", "line"))
}
