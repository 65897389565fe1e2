package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

// disposable probe main: the SQ8 STORAGE claim measured, not asserted —
// write the same vectors as (a) float64 arrays, (b) float32 arrays,
// (c) SQ8 byte codes, all parquet+snappy, and compare on-disk bytes.
// Parquet compression could in principle erode the 8x headline (bytes
// dictionary/RLE-encode differently than doubles), so the real ratio
// is an empirical question. Uses the probe-33 mixture corpus.
// args: [n=131072]
object ProbeSqSize {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(131072L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.api.Graft
    val Dim = 64
    def u(idCol: org.apache.spark.sql.Column, c: org.apache.spark.sql.Column,
        salt: Int) =
      (pmod(xxhash64(idCol, c, lit(salt)), lit(1000000L)).cast("double")
        / 1000000.0)
    val emb = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(Dim - 1)), c =>
        u(pmod(col("id"), lit(256L)), c, 1) +
          lit(0.25) * (u(col("id"), c, 2) - lit(0.5))).as("v"))
      .localCheckpoint(true)
    val bounds = Graft.sqBounds(emb, "vec_id", "v", Dim)
    val base = java.nio.file.Files.createTempDirectory("sqsize_").toString
    def sizeOf(dir: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum else f.length()
      walk(new java.io.File(dir))
    }
    emb.write.mode("overwrite").parquet(s"$base/f64")
    emb.select(col("vec_id"),
        transform(col("v"), x => x.cast("float")).as("v"))
      .write.mode("overwrite").parquet(s"$base/f32")
    Graft.sqEncode(emb, "vec_id", "v", bounds, Dim)
      .write.mode("overwrite").parquet(s"$base/sq8")
    val (s64, s32, s8) = (sizeOf(s"$base/f64"), sizeOf(s"$base/f32"),
      sizeOf(s"$base/sq8"))
    println(f"n=$n f64=${s64 / 1048576.0}%7.1f MiB  " +
      f"f32=${s32 / 1048576.0}%7.1f MiB  sq8=${s8 / 1048576.0}%7.1f MiB  " +
      f"ratio f64/sq8=${s64.toDouble / s8}%5.2f  f32/sq8=${s32.toDouble / s8}%5.2f")
    spark.stop()
  }
}
