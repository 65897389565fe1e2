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

  /** events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
    * reader rejects; read nanos as long and normalize to a `ts_us`
    * BIGINT (epoch microseconds) column — the same truncation DuckDB
    * applies when it loads ns into its µs TIMESTAMP, so oracle SQL uses
    * `epoch_us(ts)` and the two engines see identical values.
    *
    * The nanosAsLong flag is session-wide; graft's own entry points
    * (Verify/Bench/Plans and the test base) set it at session build.
    * The defensive set below keeps this loader self-sufficient for
    * sessions built elsewhere — note the documented side effect: AFTER
    * the first events read, any nanos-parquet read in the same session
    * also surfaces longs.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts_us", org.apache.spark.sql.functions.expr("ts div 1000"))
      .drop("ts")
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  private def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
