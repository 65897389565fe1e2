package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-lines DOCUMENT ingestion — the raw-crawl shape a training-data
  * pipeline actually starts from (one JSON object per line with
  * id/text/lang/source fields), parsed with corrupt-record capture in
  * batch and incremental form. The document sibling of
  * [[JsonEventSource]] (the reference's BaseLogApp dirty-data side
  * output, applied to the corpus table): malformed lines are NOT
  * dropped — they surface with `corrupt` set and keep their raw line
  * for the dead-letter sink — and a parseable line with no usable id
  * or text is flagged `invalid` (the dirty-record rule stated at
  * ingest, BEFORE any operator sees the row) rather than silently
  * entering the corpus.
  *
  * Scale notes: the text source parallelizes by file split and
  * `from_json` is a codegen'd per-row expression, so ingestion runs
  * at scan speed; PERMISSIVE capture keeps the pipeline total (no
  * poison-pill failures at 100 TB). `valid(...)` yields exactly the
  * documents-table schema, so every gated operator (and the streaming
  * ingest twins — [[graft.streaming.Streams.dedupChunks]] et al.)
  * runs unchanged on freshly ingested corpus.
  */
object JsonDocSource {

  /** The wire schema of one document line + the capture column. */
  val wireSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("_corrupt_record", StringType)))

  private val parseOptions = Map(
    "mode" -> "PERMISSIVE",
    "columnNameOfCorruptRecord" -> "_corrupt_record")

  /** `raw` must carry one JSON line per row in a string column named
    * `line`. Output: the wire fields plus `n_chars` (derived — the
    * documents-table column), `corrupt` (unparseable), `invalid`
    * (parsed but no usable doc_id/text), and `raw_line`.
    */
  def parse(raw: DataFrame): DataFrame =
    raw
      .select(col("line").as("raw_line"),
        from_json(col("line"), wireSchema, parseOptions).as("d"))
      .select(
        col("d.doc_id").as("doc_id"),
        col("d.text").as("text"),
        col("d.lang").as("lang"),
        col("d.source").as("source"),
        length(col("d.text")).cast("long").as("n_chars"),
        (col("d").isNull || col("d._corrupt_record").isNotNull).as("corrupt"),
        // the dirty-document rule at ingest: a row with no id cannot
        // dedup or join; a row with no text has nothing to curate
        (col("d.doc_id").isNull || col("d.text").isNull).as("invalid"),
        col("raw_line"))

  /** The clean slice at the EXACT documents-table schema — what flows
    * into the gated operators. */
  def valid(parsed: DataFrame): DataFrame =
    parsed.where(!col("corrupt") && !col("invalid"))
      .select("doc_id", "text", "lang", "source", "n_chars")

  /** The dead-letter slice: raw lines of corrupt or invalid rows. */
  def deadLetter(parsed: DataFrame): DataFrame =
    parsed.where(col("corrupt") || col("invalid"))
      .select(col("raw_line"), col("corrupt"), col("invalid"))

  /** Batch read of a directory of JSON-line files. */
  def read(spark: SparkSession, path: String): DataFrame =
    parse(spark.read.text(path).withColumnRenamed("value", "line"))

  /** Incremental read: new files under `path` become new micro-batches. */
  def readStream(spark: SparkSession, path: String): DataFrame =
    parse(spark.readStream
      .option("maxFilesPerTrigger", 8)
      .text(path)
      .withColumnRenamed("value", "line"))
}
