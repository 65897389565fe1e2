package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Core OLAP queries (SURVEY.md §2.2 #21-24).
  *
  * Money math goes through exact DECIMAL so results are identical under
  * any partitioning / aggregation order, then is cast to DOUBLE for a
  * stable, DuckDB-matchable output schema (SURVEY.md §6a).
  *
  * Scale notes: single-pass scan + hash agg for Q1 (map-side partial
  * agg, one shuffle on the tiny group key); Q3/Q5 broadcast every dim
  * and sort-merge the fact-fact join on the equi key.
  */
object Olap {

  /** Exact decimal views of the double money columns. */
  private def dQty   = col("l_quantity").cast("decimal(12,2)")
  private def dPrice = col("l_extendedprice").cast("decimal(12,2)")
  private def dDisc  = col("l_discount").cast("decimal(4,2)")
  private def dTax   = col("l_tax").cast("decimal(4,2)")
  private val one    = lit(BigDecimal(1).setScale(2)).cast("decimal(4,2)")

  /** TPC-H Q1 pricing summary — full-scan aggregate.
    * Reference semantics: the DWS-layer "sum everything by a small key"
    * shape (VisitorStatsApp.java:41-152 measure sums).
    */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    l.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dQty).cast("double").as("sum_qty"),
        sum(dPrice).cast("double").as("sum_base_price"),
        sum(dPrice * (one - dDisc)).cast("double").as("sum_disc_price"),
        sum(dPrice * (one - dDisc) * (one + dTax)).cast("double").as("sum_charge"),
        (sum(dQty).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(dPrice).cast("double") / count(lit(1))).as("avg_price"),
        (sum(dDisc).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
