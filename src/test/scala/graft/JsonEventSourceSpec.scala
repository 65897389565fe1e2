package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.sources.JsonEventSource
import graft.streaming.Streams

/** JSON-lines ingestion: schema enforcement, corrupt capture, and the
  * incremental file source feeding the routing stream end-to-end.
  */
class JsonEventSourceSpec extends SparkSpec {

  private def writeLines(dir: String, name: String, lines: Seq[String]): Unit =
    Files.write(Paths.get(dir, name),
      String.join("\n", lines: _*).getBytes("UTF-8"))

  private val good = Seq(
    """{"event_id":1,"ts_us":1000000,"user_id":7,"event_type":"view","value":1.5,"props":"{\"k\":3}"}""",
    """{"event_id":2,"ts_us":2000000,"user_id":7,"event_type":"signup","value":0.5,"props":"{\"k\":9}"}""",
    """{"event_id":3,"ts_us":3000000,"user_id":8,"event_type":"error","value":0.0,"props":"{\"k\":1}"}""")
  private val corrupt = Seq(
    """{"event_id":4,"ts_us":"not-a-number"}""",
    """this is not json at all""")

  test("batch read: schema enforced, corrupt lines captured not dropped") {
    val dir = Files.createTempDirectory("graft_json_").toString
    writeLines(dir, "part-0.json", good ++ corrupt)
    val df = JsonEventSource.read(spark, dir)
    assert(df.count() == 5, "corrupt lines must surface, not vanish")
    assert(df.where(col("corrupt")).count() == 2)
    assert(df.where(!col("corrupt")).select("event_id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    // a corrupt row keeps its raw line for the dead-letter sink
    assert(df.where(col("corrupt")).where(col("raw_line").isNull).count() == 0)
  }

  test("streamed ingestion routes identically to batch, file by file") {
    val dir = Files.createTempDirectory("graft_json_stream_").toString
    writeLines(dir, "f0.json", good)
    val routed = Streams.routeLogs(JsonEventSource.readStream(spark, dir))
      .withColumn("route", when(col("corrupt"), "dirty").otherwise(col("route")))
    val q = routed.writeStream.format("memory").queryName("json_route")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("json_route").count() == 3)
      // a NEW file arriving becomes a new micro-batch (incremental source)
      writeLines(dir, "f1.json", corrupt)
      q.processAllAvailable()
      val byRoute = spark.table("json_route")
        .groupBy("route").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // view -> page, signup -> start, error -> dirty, 2 corrupt -> dirty
      assert(byRoute == Map("page" -> 1L, "start" -> 1L, "dirty" -> 3L), byRoute.toString)
    } finally q.stop()
  }
}
