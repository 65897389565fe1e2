package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.sources.JsonDocSource
import graft.streaming.Streams

/** JSON-lines DOCUMENT ingestion: schema + validity routing at the
  * corpus boundary, and the incremental source feeding the chunk-dedup
  * ingest twin end-to-end (raw crawl file → curated passage stream).
  */
class JsonDocSourceSpec extends SparkSpec {

  private def writeLines(dir: String, name: String, lines: Seq[String]): Unit =
    Files.write(Paths.get(dir, name),
      String.join("\n", lines: _*).getBytes("UTF-8"))

  private val good = Seq(
    """{"doc_id":1,"text":"alpha beta gamma","lang":"en","source":"web"}""",
    """{"doc_id":2,"text":"alpha beta gamma","lang":"en","source":"web"}""",
    """{"doc_id":3,"text":"delta epsilon","lang":"en","source":"books"}""")
  private val dirty = Seq(
    """{"doc_id":4,"lang":"en","source":"web"}""",          // no text → invalid
    """{"text":"orphan text","lang":"en","source":"web"}""", // no id → invalid
    """not json at all""")                                   // corrupt

  test("batch read: valid/invalid/corrupt route at ingest; clean slice has the table schema") {
    val dir = Files.createTempDirectory("graft_jdoc_").toString
    writeLines(dir, "part-0.jsonl", good ++ dirty)
    val parsed = JsonDocSource.read(spark, dir)
    assert(parsed.count() == 6, "every line must surface")
    assert(parsed.where(col("corrupt")).count() == 1)
    assert(parsed.where(col("invalid") && !col("corrupt")).count() == 2)
    // dead letters keep their raw lines; the clean slice is exactly
    // the documents-table schema with n_chars derived
    assert(JsonDocSource.deadLetter(parsed).count() == 3)
    assert(JsonDocSource.deadLetter(parsed)
      .where(col("raw_line").isNull).count() == 0)
    val clean = JsonDocSource.valid(parsed)
    assert(clean.columns.toSeq ==
      Seq("doc_id", "text", "lang", "source", "n_chars"))
    assert(clean.count() == 3)
    assert(clean.where(col("doc_id") === 1).select("n_chars")
      .head.getLong(0) == 16L)
  }

  test("gate-scale parity: a JSONL rendering of sf0.1 preserves hash-gate semantics") {
    // r13 verdict item 7: the toy spec corpus proves ROUTING; this
    // proves the ingest BOUNDARY preserves operator results at gate
    // scale — render the whole sf0.1 documents table as JSON lines,
    // re-ingest through valid(), run gated operator cores on both
    // paths, and require bit-identical outputs (same md5 over the
    // sorted rows ⟺ same driver hash gate).
    val dir = Files.createTempDirectory("graft_jdoc_sf_").toString
    val parquetDocs = Tables.documents(spark, "/root/testdata/sf0.1")
      .localCheckpoint(true)
    parquetDocs
      .select(to_json(struct(col("doc_id"), col("text"), col("lang"),
        col("source"))).as("line"))
      .coalesce(2).write.mode("overwrite").text(dir)
    val ingested = JsonDocSource.valid(JsonDocSource.read(spark, dir))
      .localCheckpoint(true)
    // valid() drops rows with no usable id/text — mirror that slice
    // on the parquet side so the comparison is apples-to-apples
    val pqSlice = parquetDocs
      .where(col("doc_id").isNotNull && col("text").isNotNull)
      .select("doc_id", "text", "lang", "source", "n_chars")
    def md5Of(df: org.apache.spark.sql.DataFrame): String = {
      val cols = df.columns.sorted.map(c => col(c).cast("string"))
      val line = md5(concat_ws("", cols: _*))
      // order-insensitive: xor-fold the per-row md5 halves
      df.select(line.as("h"))
        .agg(sum(conv(substring(col("h"), 1, 15), 16, 10).cast("decimal(38,0)"))
          .cast("string").as("acc"))
        .head.getString(0)
    }
    assert(ingested.count() == pqSlice.count(),
      "every parquet row must survive the JSONL round-trip")
    assert(md5Of(ingested) == md5Of(pqSlice),
      "ingested slice must be bit-identical to the parquet table")
    // gated operator cores run on both paths: the subword tokenizer
    // (fit + encode — sensitive to any text mangling) and the
    // passage-grain dedup (chunking + normalization + keeper rule)
    val viaJson = graft.operators.Bpe.bpeTokenize(ingested)
    val viaPq = graft.operators.Bpe.bpeTokenize(pqSlice)
    assert(md5Of(viaJson) == md5Of(viaPq),
      "q_bpe_tokenize must hash identically through the JSONL boundary")
    val dedupJson = graft.api.Graft.chunkDedup(ingested, "doc_id", "text",
      graft.operators.Corpus.ChunkWindow, graft.operators.Corpus.ChunkStride)
    val dedupPq = graft.api.Graft.chunkDedup(pqSlice, "doc_id", "text",
      graft.operators.Corpus.ChunkWindow, graft.operators.Corpus.ChunkStride)
    assert(md5Of(dedupJson) == md5Of(dedupPq),
      "q_chunk_dedup must hash identically through the JSONL boundary")
  }

  test("raw crawl file → chunk-dedup ingest twin, end-to-end incremental") {
    val dir = Files.createTempDirectory("graft_jdoc_stream_").toString
    writeLines(dir, "f0.jsonl", good.take(2) ++ dirty)
    // the clean slice flows UNCHANGED into the #166 passage-dedup
    // twin; ingest time stands in for event time (derived column —
    // deterministic here so the spec can reason about the horizon)
    val stream = JsonDocSource.valid(JsonDocSource.readStream(spark, dir))
      .withColumn("ts", timestamp_seconds(lit(1700000000L) + col("doc_id")))
    val q = Streams.dedupChunks(stream, window = 8, stride = 8)
      .writeStream.format("memory").queryName("jdoc_chunks")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // docs 1 and 2 are verbatim copies → their single 3-token chunk
      // dedups to ONE survivor; dirty lines never reach the stream
      assert(spark.table("jdoc_chunks").count() == 1)
      // a NEW crawl file arriving becomes a new micro-batch; doc 3's
      // distinct chunk survives, doc 1's re-sent copy stays dropped
      // (fingerprint still inside the watermark horizon)
      writeLines(dir, "f1.jsonl", Seq(good(0), good(2)))
      q.processAllAvailable()
      val out = spark.table("jdoc_chunks")
        .select("doc_id", "chunk_text").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(out == Set(
        (1L, "alpha beta gamma"), (3L, "delta epsilon")), out.toString)
    } finally q.stop()
  }
}
