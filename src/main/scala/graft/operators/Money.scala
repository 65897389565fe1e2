package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The single definition of the exact-decimal money views every money
  * aggregate flows through (SURVEY.md §6a: decimal math → results are
  * partitioning-independent and DuckDB-matchable). Shared so a
  * precision change cannot drift between the OLAP, join, and stats
  * operators.
  *
  * NUMERATOR BUDGET (r17, found by the ×10 sf1-class crosscheck): a
  * decimal sum cast to double is cross-engine bit-exact only while its
  * integer numerator (sum × 10^scale) stays ≤ 2^53 ≈ 9×10^15 — above
  * that, DuckDB's decimal→double cast double-rounds (double(N) /
  * double(10^scale), two roundings) while Spark's BigDecimal cast
  * rounds once, a 1-ulp divergence. Headroom per scale: a scale-6
  * product sum (price×(1−d)×(1+t)) crosses at ~$9×10⁹ PER GROUP —
  * q1's whole-table groups crossed it at sf1; scale-4 sums cross at
  * ~$9×10¹¹, scale-2 at ~$9×10¹³. Any sum whose per-group total can
  * approach its budget must `round(sum, 2)` (cents) before the double
  * cast, on BOTH engines — the sum stays exact decimal arithmetic,
  * only the emitted value quantizes.
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
