package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The single definition of the exact-decimal money views every money
  * aggregate flows through (SURVEY.md §6a: decimal math → results are
  * partitioning-independent and DuckDB-matchable). Shared so a
  * precision change cannot drift between the OLAP, join, and stats
  * operators.
  */
private[operators] object Money {
  def dQty: Column   = col("l_quantity").cast("decimal(12,2)")
  def dPrice: Column = col("l_extendedprice").cast("decimal(12,2)")
  def dDisc: Column  = col("l_discount").cast("decimal(4,2)")
  def dTax: Column   = col("l_tax").cast("decimal(4,2)")
  val one: Column    = lit(BigDecimal(1).setScale(2)).cast("decimal(4,2)")

  /** Per-line revenue `extendedprice * (1 - discount)` as double (the
    * projection q_order_wide / q_payment_wide emit).
    */
  def lineRevenue: Column = (dPrice * (one - dDisc)).cast("double")
}
