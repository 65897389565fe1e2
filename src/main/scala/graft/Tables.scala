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
    * The nanosAsLong flag is session-wide, so a library loader must
    * not set it as a read side effect (r4 advice: a surprising
    * mutation — after it, EVERY nanos-parquet read in the session
    * surfaces longs). Instead the loader REQUIRES the flag at session
    * build and fails loudly with the fix; graft's own entry points
    * (Verify/Bench/Plans and the test base) all set it there.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      throw new IllegalStateException(
        "Tables.events requires spark.sql.legacy.parquet.nanosAsLong=true " +
          "(events.parquet carries TIMESTAMP(NANOS)); set it on the " +
          "SparkSession builder — the loader deliberately does not mutate " +
          "session conf")
    load(spark, dir, "events")
      .withColumn("ts_us", org.apache.spark.sql.functions.expr("ts div 1000"))
      .drop("ts")
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  private def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
