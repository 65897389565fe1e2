package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Per-user behavioral operators: dedup, jump detection, sessionization,
  * funnel (SURVEY.md §2.1 #3, #4, #14, #15).
  *
  * Reference semantics: UniqueVisitApp.java:37-71 (daily first-visit
  * dedup via keyed ValueState + TTL), UserJumpDetailApp.java:54-104
  * (CEP jump pattern), and the page-flow analysis implicit in
  * BaseLogApp's page stream.
  *
  * Scale notes: everything here shuffles exactly once on user_id (the
  * window-function partition key); daily UV additionally does a
  * partial-agg count-distinct which Spark plans as two-level hash agg.
  */
object Sessions {

  /** Shared with Stats.qVisitorStats — its uj_ct/sv_ct measures must
    * stay in lockstep with q_user_jump / q_sessionize.
    */
  private[operators] val TenMinUs = 10L * 60 * 1000 * 1000
  private[operators] val GapUs    = 30L * 60 * 1000 * 1000 // session gap: 30 min

  private def dayCol = date_format(timestamp_micros(col("ts_us")), "yyyy-MM-dd")

  /** #3 — daily unique visitors (UniqueVisitApp.java:37-71). At scale
    * this is one hash-partitioned exact count-distinct per day; the
    * 100 TB variant swaps in approx_count_distinct.
    */
  def qUniqueVisitorsDaily(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(dayCol.as("day"))
      .agg(countDistinct(col("user_id")).as("uv"))
      .orderBy("day")

  val qUniqueVisitorsDailySql: String =
    """SELECT strftime(ts, '%Y-%m-%d') AS day,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS uv
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** #4 — jump detection (UserJumpDetailApp.java:54-104 CEP): an entry
    * ("view") event whose user emits no further event within 10 min is
    * a jump. CEP re-expressed as lead() over the per-user timeline.
    */
  def qUserJump(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    Tables.events(spark, dir)
      .withColumn("next_ts_us", lead("ts_us", 1).over(w))
      .filter(col("event_type") === "view" &&
        (col("next_ts_us").isNull || col("next_ts_us") - col("ts_us") > TenMinUs))
      .select("event_id", "user_id")
      .orderBy("event_id")
  }

  val qUserJumpSql: String =
    """WITH t AS (
      |  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
      |    LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS next_ts_us
      |  FROM events)
      |SELECT event_id, user_id FROM t
      |WHERE event_type = 'view'
      |  AND (next_ts_us IS NULL OR next_ts_us - ts_us > 600000000)
      |ORDER BY event_id""".stripMargin

  /** #14 — gap-based sessionization (30 min inactivity): lag + running
    * sum of session-start flags, then per-session stats. Both window
    * passes share the user_id partitioning — one shuffle total.
    */
  def qSessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    Tables.events(spark, dir)
      .withColumn("prev_ts_us", lag("ts_us", 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts_us").isNull || col("ts_us") - col("prev_ts_us") > GapUs, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum("new_sess").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_seq")
      .agg(
        min("ts_us").as("session_start_us"),
        count(lit(1)).as("n_events"),
        (max("ts_us") - min("ts_us")).as("duration_us"))
      .orderBy("user_id", "session_seq")
  }

  val qSessionizeSql: String =
    """WITH t AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |    LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_ts_us
      |  FROM events),
      |flagged AS (
      |  SELECT *, CASE WHEN prev_ts_us IS NULL OR ts_us - prev_ts_us > 1800000000 THEN 1 ELSE 0 END AS new_sess
      |  FROM t),
      |numbered AS (
      |  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      |  FROM flagged)
      |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
      |  MIN(ts_us) AS session_start_us,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  MAX(ts_us) - MIN(ts_us) AS duration_us
      |FROM numbered GROUP BY user_id, session_seq
      |ORDER BY user_id, session_seq""".stripMargin

  /** The funnel's per-(user, day) stage frame — ONE definition shared
    * by #15 (stage counts) and #100 (conversion latency), so the stage
    * semantics cannot drift between the two readouts.
    *
    * Shaped as chained window aggregates over ONE events pass
    * (probe 14's subset-rule discipline): the three per-stage firsts
    * are `min(when(...))` windows over the SAME (user, day) partition
    * — each stage's predicate reads the previous stage's column, so
    * Spark plans three same-partitioning Window ops over a SINGLE
    * fact-grain exchange, then the contraction to (user, day) grain
    * runs in place. The branch-and-join formulation this replaced
    * scanned events three times and exchanged each stage branch
    * separately (3 scans + 3 fact exchanges + 2 joins → 1 scan +
    * 1 exchange + 0 joins); at 100 TB the two extra corpus scans
    * dominate everything else in the query.
    *
    * Exact original semantics, pinned by the unchanged oracle: a
    * (user, day) row exists iff the group has ≥1 view EVENT (even
    * all-null-ts, where `v_ts` stays null); `c_ts` requires a
    * non-null user (the join formulation's null keys matched nothing)
    * and a click strictly after `v_ts`; `p_ts` a purchase strictly
    * after `c_ts` (both vacuously null when the prior stage is null —
    * null comparisons fail the `when`).
    */
  private def funnelStages(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "day")
    Tables.events(spark, dir)
      // only the three funnel types reach the window (pushed into the
      // scan); a (user, day) group with no view row is dropped below
      // anyway, so this changes nothing but the sorted row count
      .where(col("event_type").isin("view", "click", "purchase"))
      .withColumn("day", dayCol)
      .withColumn("v_ts",
        min(when(col("event_type") === "view", col("ts_us"))).over(w))
      .withColumn("c_ts",
        min(when(col("event_type") === "click" &&
          col("user_id").isNotNull && col("ts_us") > col("v_ts"),
          col("ts_us"))).over(w))
      .withColumn("p_ts",
        min(when(col("event_type") === "purchase" &&
          col("ts_us") > col("c_ts"), col("ts_us"))).over(w))
      .groupBy("user_id", "day")
      // group existence (≥1 view EVENT, even all-null-ts) folds into
      // the contraction — no window pass needed for it
      .agg(max(when(col("event_type") === "view", lit(1))).as("has_view"),
        min("v_ts").as("v_ts"),
        min("c_ts").as("c_ts"), min("p_ts").as("p_ts"))
      .filter(col("has_view") === 1)
  }

  /** #15 — view→click→purchase funnel per user-day: the per-stage
    * user counts over [[funnelStages]]'s frame.
    */
  def qEventFunnel(spark: SparkSession, dir: String): DataFrame =
    funnelStages(spark, dir)
      .groupBy("day")
      .agg(
        count(col("v_ts")).as("view_users"),
        count(col("c_ts")).as("click_users"),
        count(col("p_ts")).as("purchase_users"))
      .orderBy("day")

  /** #100 — `q_conversion_latency`: how long the funnel takes — per
    * day, the count of fully-converting (user, day) pairs and the
    * p50/p90 of first-view→first-purchase latency in event-time
    * micros. Composes #15's SHARED stage frames (the latency is
    * between the same `v_ts`/`p_ts` the funnel counts, by
    * construction); exact `percentile` interpolates identically to
    * DuckDB `quantile_cont` (pinned by #62). Latencies are exact
    * integer micros until the final interpolation — no float drift.
    * At 100 TB the per-day quantile groups swap to
    * `approx_percentile` (the #62/#63 pairing) unchanged elsewhere.
    */
  def qConversionLatency(spark: SparkSession, dir: String): DataFrame = {
    funnelStages(spark, dir)
      // fully-converting pairs; p_ts non-null implies v_ts non-null
      // (the stage chain), so the latency is never null here
      .filter(col("p_ts").isNotNull)
      .withColumn("lat_us", col("p_ts") - col("v_ts"))
      .groupBy("day")
      .agg(count(lit(1)).as("conversions"),
        expr("percentile(lat_us, array(0.5D, 0.9D))").as("q"))
      .select(col("day"), col("conversions"),
        col("q").getItem(0).as("p50_us"), col("q").getItem(1).as("p90_us"))
      .orderBy("day")
  }

  /** #76 — cohort retention matrix: users grouped by their first active
    * day (the cohort), counted on each later active day they return.
    * The classic growth-analytics readout over the reference's page
    * stream (BaseLogApp page semantics; the "is_new + return visit"
    * question its DWS layer answers per-day, here answered per-cohort).
    *
    * Shaped as ONE user_id shuffle: `collect_set(day)` per user (the
    * map-side partial agg already dedupes, and per-user state is
    * bounded by distinct active DAYS — ≤366/year regardless of event
    * volume), then cohort = array_min and one explode; the final
    * (cohort, offset) agg is a second, tiny shuffle. Each user lands
    * exactly once per (cohort_day, day_offset) cell, so COUNT(*) IS
    * the distinct-user count — no count-distinct at the matrix grain.
    */
  def qRetentionCohorts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("user_id"), dayCol.as("day"))
      // dirty-record rule (reference: BaseLogApp's side-output): an
      // event without a user or a timestamp belongs to no cohort cell.
      // EXPLICIT in both formulations — otherwise Spark's null-skipping
      // collect_set and SQL's null GROUP BY key diverge on dirty data
      // (caught by the planted nasty-events parity probe)
      .where(col("user_id").isNotNull && col("day").isNotNull)
      .groupBy("user_id")
      .agg(collect_set("day").as("days"))
      // yyyy-MM-dd sorts lexicographically as dates, so array_min is
      // the earliest active day
      .select(array_min(col("days")).as("cohort_day"),
        explode(col("days")).as("day"))
      .select(col("cohort_day"),
        datediff(to_date(col("day")), to_date(col("cohort_day")))
          .cast("long").as("day_offset"))
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("active_users"))
      .orderBy("cohort_day", "day_offset")

  /** #99 — `q_event_transitions`: the page-flow TRANSITION MATRIX (the
    * reference's page-flow question, UserJumpDetailApp/BaseLogApp page
    * semantics, generalized): per (prev event type → event type) pair,
    * the transition count and row-normalized probability — the Markov
    * readout funnel design starts from. One user_id window pass (the
    * same exchange every Sessions op reuses), one tiny type-pair
    * aggregate; the probability window runs over |types|² rows, never
    * the corpus. Dirty-record rule applied explicitly (events without
    * a user or timestamp order nothing). The probability is ONE
    * integer-over-integer division per output row — deterministic
    * under any partitioning, identical in DuckDB.
    */
  def qEventTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val p = Window.partitionBy("prev")
    Tables.events(spark, dir)
      .where(col("user_id").isNotNull && col("ts_us").isNotNull)
      .withColumn("prev", lag("event_type", 1).over(w))
      .where(col("prev").isNotNull)
      .groupBy("prev", "event_type")
      .agg(count(lit(1)).as("ct"))
      .withColumn("p", col("ct").cast("double") / sum("ct").over(p))
      .orderBy("prev", "event_type")
  }

  val qEventTransitionsSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
      |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      |t AS (
      |  SELECT event_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev
      |  FROM e),
      |c AS (
      |  SELECT prev, event_type, CAST(COUNT(*) AS BIGINT) AS ct
      |  FROM t WHERE prev IS NOT NULL GROUP BY 1, 2)
      |SELECT prev, event_type, ct,
      |  CAST(ct AS DOUBLE) / SUM(ct) OVER (PARTITION BY prev) AS p
      |FROM c ORDER BY prev, event_type""".stripMargin

  val qRetentionCohortsSql: String =
    """WITH active AS (
      |  SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day FROM events
      |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      |cohort AS (
      |  SELECT user_id, MIN(day) AS cohort_day FROM active GROUP BY user_id)
      |SELECT c.cohort_day,
      |  date_diff('day', CAST(c.cohort_day AS DATE), CAST(a.day AS DATE)) AS day_offset,
      |  CAST(COUNT(*) AS BIGINT) AS active_users
      |FROM active a JOIN cohort c ON a.user_id = c.user_id
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** SQL twin of [[funnelStages]] — the CTE prefix #15 and #100 share. */
  private val funnelCtesSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, strftime(ts, '%Y-%m-%d') AS day FROM events),
      |views AS (
      |  SELECT user_id, day, MIN(ts_us) AS v_ts FROM ev WHERE event_type = 'view' GROUP BY 1, 2),
      |clicks AS (
      |  SELECT e.user_id, e.day, MIN(e.ts_us) AS c_ts FROM ev e
      |  JOIN views v ON e.user_id = v.user_id AND e.day = v.day
      |  WHERE e.event_type = 'click' AND e.ts_us > v.v_ts GROUP BY 1, 2),
      |purchases AS (
      |  SELECT e.user_id, e.day, MIN(e.ts_us) AS p_ts FROM ev e
      |  JOIN clicks c ON e.user_id = c.user_id AND e.day = c.day
      |  WHERE e.event_type = 'purchase' AND e.ts_us > c.c_ts GROUP BY 1, 2)""".stripMargin

  val qEventFunnelSql: String = funnelCtesSql +
    """
      |SELECT v.day,
      |  CAST(COUNT(v.v_ts) AS BIGINT) AS view_users,
      |  CAST(COUNT(c.c_ts) AS BIGINT) AS click_users,
      |  CAST(COUNT(p.p_ts) AS BIGINT) AS purchase_users
      |FROM views v
      |LEFT JOIN clicks c ON v.user_id = c.user_id AND v.day = c.day
      |LEFT JOIN purchases p ON v.user_id = p.user_id AND v.day = p.day
      |GROUP BY v.day ORDER BY v.day""".stripMargin

  val qConversionLatencySql: String = funnelCtesSql +
    """
      |SELECT p.day, CAST(COUNT(*) AS BIGINT) AS conversions,
      |  quantile_cont(p.p_ts - v.v_ts, 0.50) AS p50_us,
      |  quantile_cont(p.p_ts - v.v_ts, 0.90) AS p90_us
      |FROM purchases p JOIN views v ON p.user_id = v.user_id AND p.day = v.day
      |GROUP BY p.day ORDER BY p.day""".stripMargin

  /** #186 — `q_user_rate_outliers`: per-user EVENT-RATE metrics, the
    * bot/automation screen a behavioral-log curation pass runs before
    * training on clickstreams — `(user_id, n_events, active_minutes,
    * min_gap_us, events_per_minute)`. `active_minutes` counts distinct
    * ts-minute buckets (integer `div`, floor-identical cross-engine on
    * the non-negative domain), `min_gap_us` the tightest consecutive
    * gap in the user's (ts, event_id)-ordered timeline (NULL for
    * single-event users — both engines' MIN ignores the lag NULL),
    * `events_per_minute` ONE integer division. A human cannot produce
    * a 0-gap or a triple-digit per-minute rate; the flag THRESHOLD is
    * downstream policy, so the gate pins the metrics, not a verdict.
    * Dirty rule: NULL user/ts rows are unattributable and excluded,
    * stated identically in the oracle; pre-epoch (negative `ts_us`)
    * rows are ALSO excluded — the minute bucket uses integer
    * division, which truncates toward zero in Spark but floors in
    * DuckDB, so the cross-engine parity claim only holds on the
    * non-negative domain and the filter ENFORCES that domain rather
    * than assuming it.
    *
    * Plan: one exchange for the per-user timeline window (gap), then
    * the minute pre-aggregation contracts (user, minute) BEFORE the
    * final user-grain aggregate — no Expand, no distinct-aggregate,
    * every shuffle key user-bounded (the #9/#10 pre-agg discipline).
    */
  def qUserRateOutliers(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    Tables.events(spark, dir)
      .where(col("user_id").isNotNull && col("ts_us").isNotNull &&
        col("ts_us") >= 0)
      .select(col("user_id"), col("event_id"), col("ts_us"))
      .withColumn("gap_us", col("ts_us") - lag("ts_us", 1).over(w))
      .withColumn("m", expr("ts_us div 60000000"))
      .groupBy("user_id", "m")
      .agg(count(lit(1)).as("n"), min("gap_us").as("mg"))
      .groupBy("user_id")
      .agg(sum("n").as("n_events"),
        count(lit(1)).as("active_minutes"),
        min("mg").as("min_gap_us"))
      .withColumn("events_per_minute",
        col("n_events").cast("double") / col("active_minutes"))
      .orderBy("user_id")
  }

  val qUserRateOutliersSql: String =
    """WITH t AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |    epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id) AS gap_us,
      |    epoch_us(ts) // 60000000 AS m
      |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
      |    AND epoch_us(ts) >= 0),
      |per_min AS (
      |  SELECT user_id, m, CAST(count(*) AS BIGINT) AS n,
      |    min(gap_us) AS mg
      |  FROM t GROUP BY 1, 2)
      |SELECT user_id, CAST(sum(n) AS BIGINT) AS n_events,
      |  CAST(count(*) AS BIGINT) AS active_minutes,
      |  min(mg) AS min_gap_us,
      |  CAST(sum(n) AS DOUBLE) / count(*) AS events_per_minute
      |FROM per_min GROUP BY user_id ORDER BY user_id""".stripMargin
}
