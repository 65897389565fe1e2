package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Temporal operators Spark lacks as built-ins (SURVEY.md §2.4 #41):
  * the as-of join, composed from existing operators (SURVEY.md §4
  * preference order (a)) rather than a custom SparkPlan.
  */
object Temporal {

  /** #41 — `q_asof_join`: last-touch attribution. Each purchase event
    * is joined to the SAME user's most recent view at-or-before the
    * purchase time (NULL columns when the user never viewed before
    * buying) — the classic as-of join, which neither Spark SQL nor the
    * reference has natively (the reference approximates it with its
    * ±bounded interval joins, OrderWideApp.java:84-90).
    *
    * Spark-first realization — the union trick, NOT a range join: tag
    * views 0 / purchases 1, union, and take `last(view, ignoreNulls)`
    * over (user, time, tag, view_id) ordered rows. No join in the
    * plan, no per-pair work, per-key cost linear in events-per-user.
    * Shuffle budget: ONE exchange on user_id for the as-of window plus
    * the final orderBy's range exchange — the event stream moves once,
    * never a pair fan-out. That is the shape that survives 100 TB,
    * where a range-join formulation would fan out every (view,
    * purchase) pair inside the bound and an unbounded lookback can't
    * be range-joined at all.
    *
    * "Most recent view" needs a tie-break under equal timestamps
    * (both engines, and any as-of engine, would otherwise pick
    * arbitrarily): the window ORDERS views at the same instant by
    * view_id ascending, so `last(..., ignoreNulls)` lands on the MAX
    * view_id — fused into the one as-of pass (probe 14's discipline;
    * a separate (user, ts) dedup window would cost the view stream a
    * second fact-grain exchange for the same answer).
    */
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val v = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("ts_us").as("v_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts_us").as("p_ts"))
    // tag views 0 so a view AT the purchase timestamp sorts first and
    // is visible to the purchase (inclusive v_ts <= p_ts bound)
    val tagged = v.select(col("user_id"), col("v_ts").as("t"), lit(0).as("tag"),
        col("view_id"), col("v_ts"), lit(null).cast("long").as("purchase_id"))
      .unionAll(p.select(col("user_id"), col("p_ts").as("t"), lit(1).as("tag"),
        lit(null).cast("long").as("view_id"), lit(null).cast("long").as("v_ts"),
        col("purchase_id")))
    val w = Window.partitionBy("user_id").orderBy("t", "tag", "view_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_view_id", last("view_id", ignoreNulls = true).over(w))
      .withColumn("last_v_ts", last("v_ts", ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("purchase_id"), col("user_id"), col("t").as("p_ts"),
        col("last_view_id").as("view_id"), col("last_v_ts").as("v_ts"),
        (col("t") - col("last_v_ts")).as("gap_us"))
      .orderBy("purchase_id")
  }

  /** Oracle: DuckDB's native ASOF LEFT JOIN over the same deduplicated
    * view stream — an independent engine's as-of implementation
    * cross-checking the union-trick formulation.
    */
  val qAsofJoinSql: String =
    """WITH v0 AS (
      |  SELECT event_id AS view_id, user_id, epoch_us(ts) AS v_ts
      |  FROM events WHERE event_type = 'view'),
      |v AS (
      |  SELECT view_id, user_id, v_ts FROM (
      |    SELECT *, row_number() OVER (PARTITION BY user_id, v_ts ORDER BY view_id DESC) AS rn
      |    FROM v0) WHERE rn = 1),
      |p AS (
      |  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS p_ts
      |  FROM events WHERE event_type = 'purchase')
      |SELECT p.purchase_id, p.user_id, p.p_ts,
      |  v.view_id, v.v_ts, p.p_ts - v.v_ts AS gap_us
      |FROM p ASOF LEFT JOIN v
      |  ON p.user_id = v.user_id AND v.v_ts <= p.p_ts
      |ORDER BY purchase_id""".stripMargin

  /** Every 199th order opens a 7-day promotion window (inclusive day
    * span, label = the order key) — the deterministic interval table
    * #65 range-joins lineitem ship dates into. The SQL twin embeds the
    * same literals.
    */
  private val PromoMod = 199L
  private val PromoSpanDays = 6L

  /** #65 — `q_range_join`: point-in-interval join with NO equi key —
    * which lineitem ship dates fall inside which promotion windows.
    * Spark has no native range join: the naive `ON p BETWEEN lo AND
    * hi` plans as BroadcastNestedLoopJoin (dies when neither side
    * broadcasts) or CartesianProduct. This is the published bucketed
    * formulation ([[graft.api.Graft.rangeJoin]]): quantize the domain
    * into fixed-width buckets, explode each interval to the buckets it
    * overlaps, map each point to its single containing bucket, then
    * EQUI-join on the bucket id and keep pairs passing the exact
    * bounds — a shuffle-partitionable join at any scale. Each
    * (point, interval) pair meets in exactly one bucket (the point's),
    * so no post-join dedup exists. Bucket width = the 7-day window
    * span: each interval lands in ≤ 2 buckets, fan-out bounded at 2×.
    *
    * The DuckDB oracle runs the same predicate as a native
    * inequality join (IEJoin) — an independent engine's range-join
    * implementation cross-checking the bucketed one.
    */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val epoch = to_date(lit("1970-01-01"))
    val iv = Tables.orders(spark, dir)
      .where(pmod(col("o_orderkey"), lit(PromoMod)) === 0)
      .select(col("o_orderkey").as("promo_id"),
        datediff(col("o_orderdate"), epoch).cast("long").as("lo"))
      .withColumn("hi", col("lo") + PromoSpanDays)
    val pt = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        datediff(col("l_shipdate"), epoch).cast("long").as("ship_day"))
    graft.api.Graft.rangeJoin(pt, "ship_day", iv, "lo", "hi",
        bucketWidth = PromoSpanDays + 1)
      .select(col("l_orderkey"), col("l_linenumber"), col("promo_id"),
        col("ship_day"))
      .orderBy("l_orderkey", "l_linenumber", "promo_id", "ship_day")
  }

  val qRangeJoinSql: String =
    s"""WITH iv AS (
      |  SELECT o_orderkey AS promo_id,
      |    CAST(datediff('day', DATE '1970-01-01', o_orderdate) AS BIGINT) AS lo
      |  FROM orders WHERE ((o_orderkey % $PromoMod) + $PromoMod) % $PromoMod = 0),
      |pt AS (
      |  SELECT l_orderkey, l_linenumber,
      |    CAST(datediff('day', DATE '1970-01-01', l_shipdate) AS BIGINT) AS ship_day
      |  FROM lineitem)
      |SELECT l_orderkey, l_linenumber, promo_id, ship_day
      |FROM pt JOIN iv ON ship_day BETWEEN lo AND lo + $PromoSpanDays
      |ORDER BY l_orderkey, l_linenumber, promo_id, ship_day""".stripMargin
}
