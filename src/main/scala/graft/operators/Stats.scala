package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** DWS-layer windowed multi-measure statistics (SURVEY.md §2.1 #9-12).
  *
  * Reference semantics: VisitorStatsApp.java:41-152 (union-of-streams →
  * keyed tumbling window → measure sums), ProductStatsApp.java:67-319
  * (per-sku multi-measure with count-distinct order sets),
  * ProvinceStatsSqlApp.java:34-53, KeywordStatsApp.java:30-59.
  *
  * Scale notes: the visitor-stats sv/uj branches share the user_id
  * window shuffle (same window spec → one exchange feeds both); the uv
  * branch keys by (user_id, day) — a second exchange — and each union
  * branch re-scans the (column-pruned) events subtree. The final agg is
  * one hash agg on the small (hour, cohort) key. Product/province stats
  * are fact-side partial aggs + broadcast dim joins. Sums over money go
  * through DECIMAL so results are partitioning-independent.
  */
object Stats {

  // thresholds shared with the standalone operators so the union's
  // uj/sv measures can never drift from q_user_jump / q_sessionize
  private def TenMinUs = Sessions.TenMinUs
  private def GapUs    = Sessions.GapUs

  /** #9 — visitor stats: the four measures (pv, daily uv, session
    * starts, jumps) keyed by (hour, channel cohort), one summing agg
    * (VisitorStatsApp.java:41-152).
    *
    * Computed in a SINGLE events pass: each row carries its own
    * measure flags (row_number over (user, day) for uv; lag/lead over
    * user for sv/uj) and one aggregate sums them — where the previous
    * union-of-4-frames formulation re-scanned the (pruned) events
    * subtree four times and ran three separate window stages. Two
    * window exchanges (user_id, day) and (user_id), then the final
    * small (hour, cohort) agg — per-measure results identical row for
    * row, so the oracle keeps its union formulation.
    */
  def qVisitorStats(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val wDay = Window.partitionBy("user_id", "day").orderBy("ts_us", "event_id")
    val zeroD = lit(BigDecimal(0).setScale(2)).cast("decimal(12,2)")
    Tables.events(spark, dir)
      .withColumn("stt", date_format(timestamp_micros(col("ts_us")), "yyyy-MM-dd HH"))
      .withColumn("ch", concat(lit("ch"), col("user_id") % 3))
      .withColumn("day", date_format(timestamp_micros(col("ts_us")), "yyyy-MM-dd"))
      .withColumn("rn_day", row_number().over(wDay))
      .withColumn("prev_ts_us", lag("ts_us", 1).over(w))
      .withColumn("next_ts_us", lead("ts_us", 1).over(w))
      .select(col("stt"), col("ch"), col("event_type"), col("value"),
        when(col("rn_day") === 1, 1L).otherwise(0L).as("uv"),
        when(col("event_type") === "view", 1L).otherwise(0L).as("pv"),
        when(col("prev_ts_us").isNull || col("ts_us") - col("prev_ts_us") > GapUs, 1L)
          .otherwise(0L).as("sv"),
        when(col("event_type") === "view" &&
          (col("next_ts_us").isNull || col("next_ts_us") - col("ts_us") > TenMinUs), 1L)
          .otherwise(0L).as("uj"))
      // union-exact dur contribution: a view contributes its value
      // (NULL stays NULL — SQL SUM skips it), and every uv/sv/uj flag
      // contributed a 0.00 row in the union formulation, which matters
      // ONLY for SUM's null-ness: a group whose sole view has NULL
      // value must still sum to 0.0 when that row carries a flag, and
      // to NULL when it does not
      .withColumn("dur",
        when(col("event_type") === "view" && col("value").isNotNull,
          col("value").cast("decimal(12,2)"))
          .otherwise(when(col("uv") + col("sv") + col("uj") > 0, zeroD)
            .otherwise(lit(null).cast("decimal(12,2)"))))
      // an event that is no view, no daily first, no session start and
      // no jump contributed NO row in the union formulation — without
      // this filter a (stt, ch) bucket of only such events would emit
      // a spurious all-zero group (5 of them at sf0.001)
      .where(col("uv") + col("pv") + col("sv") + col("uj") > 0)
      .groupBy("stt", "ch")
      .agg(sum("uv").as("uv_ct"), sum("pv").as("pv_ct"),
        sum("sv").as("sv_ct"), sum("uj").as("uj_ct"),
        sum("dur").cast("double").as("dur_sum"))
      .orderBy("stt", "ch")
  }

  val qVisitorStatsSql: String =
    """WITH base AS (
      |  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
      |    strftime(ts, '%Y-%m-%d %H') AS stt,
      |    'ch' || CAST(user_id % 3 AS VARCHAR) AS ch,
      |    strftime(ts, '%Y-%m-%d') AS day, "value" AS v
      |  FROM events),
      |pv AS (
      |  SELECT stt, ch, 0 AS uv, 1 AS pv, 0 AS sv, 0 AS uj, CAST(v AS DECIMAL(12,2)) AS dur
      |  FROM base WHERE event_type = 'view'),
      |uv AS (
      |  SELECT stt, ch, 1, 0, 0, 0, CAST(0 AS DECIMAL(12,2)) FROM (
      |    SELECT stt, ch, ROW_NUMBER() OVER (PARTITION BY user_id, day ORDER BY ts_us, event_id) AS rn
      |    FROM base) WHERE rn = 1),
      |sv AS (
      |  SELECT stt, ch, 0, 0, 1, 0, CAST(0 AS DECIMAL(12,2)) FROM (
      |    SELECT stt, ch, ts_us, LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_ts_us
      |    FROM base) WHERE prev_ts_us IS NULL OR ts_us - prev_ts_us > 1800000000),
      |uj AS (
      |  SELECT stt, ch, 0, 0, 0, 1, CAST(0 AS DECIMAL(12,2)) FROM (
      |    SELECT stt, ch, event_type, ts_us,
      |      LEAD(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS next_ts_us
      |    FROM base) WHERE event_type = 'view' AND (next_ts_us IS NULL OR next_ts_us - ts_us > 600000000)),
      |unioned AS (
      |  SELECT * FROM pv UNION ALL SELECT * FROM uv UNION ALL SELECT * FROM sv UNION ALL SELECT * FROM uj)
      |SELECT stt, ch, CAST(SUM(uv) AS BIGINT) AS uv_ct, CAST(SUM(pv) AS BIGINT) AS pv_ct,
      |  CAST(SUM(sv) AS BIGINT) AS sv_ct, CAST(SUM(uj) AS BIGINT) AS uj_ct,
      |  CAST(SUM(dur) AS DOUBLE) AS dur_sum
      |FROM unioned GROUP BY stt, ch ORDER BY stt, ch""".stripMargin

  /** #77 — HOPPING-window visitor stats: 1 h windows sliding every
    * 30 min, per event type — the overlapping-window flavor the
    * reference reserves for its sliding Flink windows (VisitorStatsApp
    * uses tumbling; the hop is the other native window kind). Each
    * event lands in exactly windowLen/slide = 2 windows.
    *
    * Spark plans `window(ts, len, slide)` as a 2-row generator (an
    * Expand, map-side — NOT a join against a window table) feeding one
    * hash agg: the shuffle carries pre-aggregated (window, type)
    * partials, so doubling via overlap happens before the exchange,
    * not across it. The exact per-window count-distinct is the small-
    * cohort readout; at 100 TB the user count swaps to HLL exactly as
    * #11→#40.
    */
  def qSlidingWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      // explicit dirty-record rule: window() silently drops a null
      // timestamp while the oracle's hop arithmetic would emit a null
      // window row — state the filter in BOTH so the twins agree on
      // dirty data (caught by the planted nasty-events parity probe)
      .where(col("ts_us").isNotNull)
      .withColumn("tsm", timestamp_micros(col("ts_us")))
      .groupBy(window(col("tsm"), "1 hour", "30 minutes").as("win"),
        col("event_type"))
      .agg(count(lit(1)).as("events"),
        countDistinct(col("user_id")).as("users"))
      .select(date_format(col("win.start"), "yyyy-MM-dd HH:mm").as("win_start"),
        col("event_type"), col("events"), col("users"))
      .orderBy("win_start", "event_type")

  /** Epoch-aligned hop starts, restated for DuckDB: the two windows
    * containing ts start at (ts_us div slide − k)·slide for k ∈ {0,1}
    * (every point is inside both — ts − ws < 30 min + 30 min = len).
    */
  val qSlidingWindowSql: String =
    """WITH t AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
      |  WHERE ts IS NOT NULL),
      |w AS (
      |  SELECT user_id, event_type,
      |    (ts_us // 1800000000 - k.k) * 1800000000 AS ws_us
      |  FROM t CROSS JOIN (SELECT UNNEST([0, 1]) AS k) k)
      |SELECT strftime(make_timestamp(ws_us), '%Y-%m-%d %H:%M') AS win_start,
      |  event_type,
      |  CAST(COUNT(*) AS BIGINT) AS events,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users
      |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** #10 — per-product multi-measure stats with exact count-distinct
    * order ids + broadcast dim enrichment (ProductStatsApp.java:209-319).
    *
    * Shaped as a two-level aggregate over a MERGE-PINNED status join
    * (probe 14's discipline, the Q21 shape): the l⋈o SMJ output is
    * hash(orderkey)-partitioned, which satisfies the clustered
    * distribution of the (partkey, orderkey, status) contraction via
    * the subset rule — so the pre-agg that turns
    * `count(distinct l_orderkey)` into a plain `count(*)` (no Expand)
    * runs IN PLACE and the fact crosses exactly ONE exchange at every
    * scale. The (partkey, orderkey) grain contracts lineitem by
    * ~nothing (a part appears once per order), so pre-aggregating
    * BEFORE the join bought no combine — it just cost the fact a
    * second exchange once orders outgrew the broadcast threshold.
    * Status rides in the contraction keys (constant per order — same
    * groups), the final per-part agg exchanges only the contracted
    * frame, and nested decimal sums keep results exact.
    */
  def qProductStats(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_orderstatus")
    val p = Tables.part(spark, dir).select("p_partkey", "p_brand")
    l.join(o.hint("merge"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_partkey", "l_orderkey", "o_orderstatus")
      .agg(
        count(lit(1)).as("line_ct"),
        sum(Money.dQty).as("qty"),
        sum(Money.dPrice).as("amt"))
      .groupBy("l_partkey")
      .agg(
        count(lit(1)).as("order_ct"),
        sum("line_ct").as("item_ct"),
        sum("qty").cast("double").as("quantity_sum"),
        sum("amt").cast("double").as("amount_sum"),
        sum(when(col("o_orderstatus") === "F", col("amt"))).cast("double").as("paid_amount"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .select("l_partkey", "p_brand", "order_ct", "item_ct",
        "quantity_sum", "amount_sum", "paid_amount")
      .orderBy("l_partkey")
  }

  val qProductStatsSql: String =
    """SELECT l_partkey, p_brand,
      |  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS order_ct,
      |  CAST(COUNT(*) AS BIGINT) AS item_ct,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS quantity_sum,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS amount_sum,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS DOUBLE) AS paid_amount
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN part ON l_partkey = p_partkey
      |GROUP BY l_partkey, p_brand
      |ORDER BY l_partkey""".stripMargin

  /** #11 — per-province (≈nation) per-day order stats
    * (ProvinceStatsSqlApp.java:34-53): the reference counts DISTINCT
    * order ids over the line-grain order-wide stream, so the distinct
    * is computed where it is meaningful — at lineitem grain, where an
    * order contributes many rows. Dims broadcast; money = exact decimal
    * line revenue.
    */
  /** Shared order-grain base for the #11 family: line revenue
    * pre-aggregated to ORDER grain, then joined to orders + broadcast
    * dims. The pre-agg is why none of the consumers needs a distinct:
    * each surviving order contributes exactly ONE row (with one nation
    * and one day), so `count(distinct o_orderkey)` becomes `count(*)`
    * at every grouping level and Spark never plans the Expand
    * (input ×2) a mixed distinct/non-distinct aggregate requires.
    * Money rides as `rev_e4`, per-order revenue in 10⁻⁴-dollar units
    * as a LONG — the probe-12 compact-accumulator dial (docs/
    * SCALING.md): `sum(decimal(17,4))` plans a `decimal(27,4)`
    * accumulator, above the precision-18 compact-long ceiling, so
    * every row update churned `java.math.BigDecimal` — the hottest
    * frame in thread dumps and the allocation profile a memory-
    * pressured host amplifies 10-100× (BASELINE_LOCAL.md; the r10/r11
    * driver-capture blowups were exactly this family). Fixed-point
    * longs make both aggregation levels allocation-free:
    *   rev_e4 = round(price·100)·(100 − round(disc·100))
    * is EXACT for 2-decimal money inputs (TPC-H money is generated in
    * cents; round() repairs the ≤1e-7 binary error of double·100, so
    * the long equals the decimal(12,2)-cast value the oracles use —
    * crosschecked hash-equal at sf0.01 and sf0.1). Overflow is loud,
    * not silent: ANSI mode (Spark 4 default) throws on long-sum
    * overflow; headroom is per GROUP key — nation×day sums stay
    * ≤ ~10¹⁶ e4-units at sf100k, 600× under Long.MaxValue — while a
    * single grand total crossing ~9·10¹⁴ dollars must fall back to
    * the decimal p+10 path (probe 12's deployment rule).
    * Columns: o_orderkey, n_name, day, rev_e4 (consumers that ignore
    * o_orderkey get it pruned out of the scan by Catalyst).
    */
  private def provinceOrderGrain(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_orderdate")
    val l = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val c = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val n = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    val priceE2 = round(col("l_extendedprice") * 100).cast("long")
    val discE2  = round(col("l_discount") * 100).cast("long")
    val perOrder = l.groupBy("l_orderkey")
      .agg(sum(priceE2 * (lit(100L) - discE2)).as("rev_e4"))
    o.join(perOrder, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("o_orderkey"), col("n_name"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"), col("rev_e4"))
  }

  /** e4-long → the same double the oracles' `CAST(SUM(decimal) AS
    * DOUBLE)` yields: the long is the exact sum scaled by 10⁴, so
    * dividing as DECIMAL (exact — result scale ≥ 4) and then casting
    * reproduces Spark's correctly-rounded decimal→double conversion
    * bit for bit. The division runs on GROUP rows only (thousands),
    * never on the corpus.
    */
  private def e4Amount(c: Column): Column =
    (c.cast("decimal(34,0)") / lit(10000)).cast("double")

  def qProvinceStats(spark: SparkSession, dir: String): DataFrame =
    provinceOrderGrain(spark, dir)
      .groupBy("n_name", "day")
      .agg(
        count(lit(1)).as("order_ct"),
        sum("rev_e4").as("s_e4"))
      .select(col("n_name"), col("day"), col("order_ct"),
        e4Amount(col("s_e4")).as("amount"))
      .orderBy("n_name", "day")

  val qProvinceStatsSql: String =
    """SELECT n_name, strftime(o_orderdate, '%Y-%m-%d') AS day,
      |  CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS order_ct,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS amount
      |FROM orders
      |JOIN lineitem ON o_orderkey = l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name, day
      |ORDER BY n_name, day""".stripMargin

  /** The estimate-serving form of #40 — the 100 TB flavor of
    * province stats (SURVEY.md §5 "count-distinct"): HLL distinct
    * (single-pass, mergeable sketch, no expand) over the same
    * order-grain rows the exact #11 dedupes. The count stays an HLL
    * sketch over o_orderkey (multiplicity-insensitive, so the pre-agg
    * does not change its estimate): at 100 TB this is what replaces
    * the exact count when the per-group distinct set no longer fits
    * an exact pass. Known trade (probe 20): HLL is an
    * ImperativeAggregate, so this GROUPED aggregate runs outside
    * whole-stage codegen — the #101 two-aggregate split does not
    * compose here without scanning the join base twice, and the
    * group-grain row count keeps the interpreted cost bounded.
    */
  def provinceStatsApproxEst(spark: SparkSession, dir: String): DataFrame =
    provinceOrderGrain(spark, dir)
      .groupBy("n_name", "day")
      .agg(
        approx_count_distinct(col("o_orderkey")).as("order_ct_approx"),
        sum("rev_e4").as("s_e4"))
      .select(col("n_name"), col("day"), col("order_ct_approx"),
        e4Amount(col("s_e4")).as("amount"))
      .orderBy("n_name", "day")

  /** #40 — `q_province_stats_approx`: the BOUND-CHECKED gate over the
    * HLL flavor (r17 verdict item 2 — previously rows-only, because
    * sketch values are implementation-specific and have no
    * cross-engine oracle). The gate emits the EXACT readout plus a
    * per-group `approx_ok` band flag — |HLL − exact| ≤ max(16, 15%
    * of exact) — so the full DuckDB hash gate now FAILS if any
    * group's estimate leaves its band (the oracle asserts literal
    * TRUE per group), while the sketch value itself never crosses
    * engines. The envelope is sized from MEASURED two-regime
    * behavior of Spark's HLL++ at the default 5% rsd (m = 512
    * registers): asymptotically the relative error stays ≤ 3×rsd
    * (worst measured 6.7% at n = 1.5 k, 1.3% at 1.5 M), but in the
    * small-n linear-counting/bias-table regime the ABSOLUTE error
    * dominates — worst measured delta 9 at n = 110 and 4-6 at
    * n = 20-40 on the ×10 corpus (≫ the textbook LC σ of 0.6-3.5;
    * the bias-correction handoff is the likely culprit) — so the
    * floor is ~2× the worst observed absolute miss, and a genuinely
    * broken sketch (orders-of-magnitude off) still fails loudly.
    * Exact and estimate ride ONE aggregate over the shared
    * order-grain pre-agg: at order grain count(1) IS the exact
    * distinct-order count, so the band costs no extra pass.
    */
  def qProvinceStatsApprox(spark: SparkSession, dir: String): DataFrame =
    provinceOrderGrain(spark, dir)
      .groupBy("n_name", "day")
      .agg(
        count(lit(1)).as("order_ct"),
        approx_count_distinct(col("o_orderkey")).as("est"),
        sum("rev_e4").as("s_e4"))
      .select(col("n_name"), col("day"), col("order_ct"),
        e4Amount(col("s_e4")).as("amount"),
        (abs(col("est").cast("double") - col("order_ct").cast("double")) <=
          greatest(lit(16.0), col("order_ct").cast("double") * lit(0.15)))
          .as("approx_ok"))
      .orderBy("n_name", "day")

  /** #40's oracle: the exact #11 readout with a literal TRUE band
    * flag — a Spark-side estimate outside its band flips `approx_ok`
    * to false and the hash gate fails on that group's row.
    */
  val qProvinceStatsApproxSql: String =
    """SELECT n_name, strftime(o_orderdate, '%Y-%m-%d') AS day,
      |  CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS order_ct,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS amount,
      |  TRUE AS approx_ok
      |FROM orders
      |JOIN lineitem ON o_orderkey = l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name, day
      |ORDER BY n_name, day""".stripMargin

  /** #42 — `q_province_rollup`: the ROLLUP flavor of #11 — per
    * (nation, day) stats plus per-nation subtotals plus a grand total
    * in ONE pass (what a DWS serving layer actually materializes;
    * ProvinceStatsSqlApp.java:34-53 computes only the finest grain and
    * the reference re-aggregates in ClickHouse). Spark plans rollup as
    * a single Expand (×3 grouping sets) + one hash agg — no extra
    * shuffle versus the flat aggregate. Built on the same order-grain
    * pre-agg as #11, so `count(*)` is an exact distinct-order count at
    * EVERY rollup level (each order contributes exactly one row with
    * one nation and one day). NULL grouping markers are folded to
    * 'ALL' so the output needs no grouping_id column.
    */
  def qProvinceRollup(spark: SparkSession, dir: String): DataFrame = {
    provinceOrderGrain(spark, dir)
      .select(col("n_name").as("grp_nation"), col("day").as("grp_day"), col("rev_e4"))
      // Column-overload rollup on purpose: rollup(String*) resolves the
      // names via df.col(), whose dataset-id metadata makes Spark's
      // ambiguous-self-join check reject the post-rollup references
      // (the Expand duplicates the grouping attributes); bare col()
      // references carry no dataset tag and analyze cleanly
      .rollup(col("grp_nation"), col("grp_day"))
      .agg(count(lit(1)).as("order_ct"), sum("rev_e4").as("s_e4"))
      .select(coalesce(col("grp_nation"), lit("ALL")).as("n_name"),
        coalesce(col("grp_day"), lit("ALL")).as("day"),
        col("order_ct"), e4Amount(col("s_e4")).as("amount"))
      .orderBy("n_name", "day")
  }

  val qProvinceRollupSql: String =
    """WITH per_order AS (
      |  SELECT l_orderkey,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS rev
      |  FROM lineitem GROUP BY l_orderkey)
      |SELECT coalesce(n_name, 'ALL') AS n_name,
      |  coalesce(strftime(o_orderdate, '%Y-%m-%d'), 'ALL') AS day,
      |  CAST(COUNT(*) AS BIGINT) AS order_ct,
      |  CAST(SUM(rev) AS DOUBLE) AS amount
      |FROM orders
      |JOIN per_order ON o_orderkey = l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY ROLLUP (n_name, strftime(o_orderdate, '%Y-%m-%d'))
      |ORDER BY n_name, day""".stripMargin

  /** #78 — CUBE over (region, nation) on the same order-grain pre-agg
    * as #42's rollup: all four grouping sets — (r,n), (r), (n), () —
    * in ONE pass. The gid column is the portable grouping id
    * (grouping(region)·2 + grouping(nation)), which disambiguates a
    * real 'ALL' value from a subtotal row without relying on either
    * engine's native GROUPING_ID bit order.
    *
    * Scale shape: Spark plans cube as a 4-row Expand over the
    * pre-aggregated order grain — the fact-side join tree collapses to
    * order rows BEFORE the Expand multiplies anything, and the partial
    * agg then collapses each grouping set map-side, so the exchange
    * carries ≤ 4× the (tiny) group-key cardinality, never 4× the
    * corpus.
    */
  def qCubeStats(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(spark, dir).select("n_nationkey", "n_name", "n_regionkey")
    val r = Tables.region(spark, dir).select("r_regionkey", "r_name")
    provinceOrderGrain(spark, dir)
      .join(broadcast(n.join(broadcast(r),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_name").as("nn"), col("r_name"))),
        col("n_name") === col("nn"))
      .select(col("r_name").as("grp_region"), col("n_name").as("grp_nation"),
        col("rev_e4"))
      .cube(col("grp_region"), col("grp_nation"))
      .agg(
        (grouping(col("grp_region")) * 2 + grouping(col("grp_nation")))
          .cast("long").as("gid"),
        count(lit(1)).as("order_ct"),
        sum("rev_e4").as("s_e4"))
      .select(coalesce(col("grp_region"), lit("ALL")).as("r_name"),
        coalesce(col("grp_nation"), lit("ALL")).as("n_name"),
        col("gid"), col("order_ct"), e4Amount(col("s_e4")).as("amount"))
      .orderBy("gid", "r_name", "n_name")
  }

  val qCubeStatsSql: String =
    """WITH per_order AS (
      |  SELECT l_orderkey,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS rev
      |  FROM lineitem GROUP BY l_orderkey)
      |SELECT coalesce(r_name, 'ALL') AS r_name,
      |  coalesce(n_name, 'ALL') AS n_name,
      |  CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS BIGINT) AS gid,
      |  CAST(COUNT(*) AS BIGINT) AS order_ct,
      |  CAST(SUM(rev) AS DOUBLE) AS amount
      |FROM orders
      |JOIN per_order ON o_orderkey = l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY CUBE (r_name, n_name)
      |ORDER BY gid, r_name, n_name""".stripMargin

  /** Salted exact count-distinct — the documented skew remedy
    * (SURVEY.md §5) as a reusable operator. Salting by `hash(id) % n`
    * splits each key's id space into n DISJOINT shards, counts exact
    * distincts per (key, shard), and sums the shard counts — exact
    * because the shards partition the id space.
    *
    * MEASURED CAVEAT (probe 38, r19 — bench_evidence/
    * probe38_skew_salt.log): on Spark this remedy never beat the
    * built-in `count(distinct)` at any planted dial (80M rows, hot
    * key up to 50% of the corpus, distinct cardinality up to 60M —
    * direct 11.4 s vs salted 15–28 s), because Spark's planner
    * ALREADY rewrites a distinct aggregate into two phases whose
    * first shuffles on (key, value) — the value itself is the salt —
    * leaving the hot reducer a cheap count over pre-deduplicated
    * rows. Reach for this operator only where that rewrite is
    * unavailable: inside `flatMapGroupsWithState` keyed state, an
    * engine without the rewrite, or when the per-(key, shard) counts
    * themselves are the wanted output. The JOIN-side story is the
    * opposite — see [[graft.api.Graft.saltedJoin]], measured 10×
    * over the plain shuffle join and 3.3× over AQE's skew split at a
    * 16×-average hot task.
    */
  def distinctPerKeySalted(df: DataFrame, keyCol: String, idCol: String,
      salts: Int): DataFrame =
    df.select(col(keyCol), col(idCol))
      .withColumn("salt", pmod(hash(col(idCol)), lit(salts)))
      .groupBy(col(keyCol), col("salt"))
      .agg(countDistinct(col(idCol)).as("part_ct"))
      .groupBy(col(keyCol))
      .agg(sum("part_ct").as("distinct_ct"))

  /** #12 — keyword split-and-count (KeywordStatsApp.java:30-59 +
    * KeywordUtil tokenizer UDTF): explode(split) is a map-side
    * generator; the only shuffle is the final (word, source) agg.
    */
  def qKeywordStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("word"), col("source"))
      .filter(length(col("word")) > 0)
      .groupBy("word", "source")
      .agg(count(lit(1)).as("ct"))
      .orderBy("word", "source")

  val qKeywordStatsSql: String =
    """SELECT word, source, CAST(COUNT(*) AS BIGINT) AS ct FROM (
      |  SELECT unnest(string_split(text, ' ')) AS word, source FROM documents)
      |WHERE length(word) > 0
      |GROUP BY word, source ORDER BY word, source""".stripMargin

  /** The CJK word-unit explode shared by #54 and its spec: `textCol` →
    * one `word` row per unit, `carry` columns preserved. Escaped range
    * = U+4E00–U+9FFF (CJK Unified Ideographs; the literal chars ARE
    * those codepoints).
    */
  private[graft] def explodeCjkWords(df: DataFrame, textCol: String,
      carry: Seq[String]): DataFrame = {
    // internal stage columns are underscore-prefixed so a user frame
    // carrying plausible names ('tok', 'run') cannot collide; 'word'
    // is the documented output name, so a carry of that is rejected
    // instead of silently shadowed
    require(!carry.contains("word"),
      "explodeCjkWords emits a 'word' column; rename the carried column")
    val han = "一-鿿"
    val runPattern = s"[$han]+|[^$han]+"
    val cols = carry.map(col)
    val bigrams = transform(
      sequence(lit(1), length(col("_cjk_run")) - 1),
      i => col("_cjk_run").substr(i, lit(2)))
    df.select(explode(split(col(textCol), " ")).as("_cjk_tok") +: cols: _*)
      .filter(length(col("_cjk_tok")) > 0)
      .select(explode(regexp_extract_all(col("_cjk_tok"), lit(runPattern), lit(0)))
        .as("_cjk_run") +: cols: _*)
      .select(explode(
        when(col("_cjk_run").rlike(s"^[$han]") && length(col("_cjk_run")) >= 2,
          bigrams)
          .otherwise(array(col("_cjk_run")))).as("word") +: cols: _*)
  }

  /** #54 — `q_keyword_stats_cjk`: #12 with CJK-aware tokenization. The
    * reference tokenizes search keywords with a CJK segmenter
    * (KeywordUtil.java:12-14 + SplitFunction.java) because its domain
    * is Chinese e-commerce — whitespace splitting turns a CJK sentence
    * into one giant "word". This operator applies the standard
    * PUBLIC-algorithm fallback, character-bigram segmentation (the
    * classic CJK indexing unit in IR systems): within each whitespace
    * token, maximal Han runs (U+4E00–U+9FFF) expand to their
    * overlapping character bigrams (a lone Han char stays itself);
    * non-Han runs pass through whole. Mixed tokens like "abc中文def"
    * yield "abc", "中文", "def"-style units. The identical rule is
    * expressible in DuckDB (RE2 run-split + substr bigrams), so unlike
    * a dictionary segmenter this stays hash-gated.
    *
    * All three explodes are map-side generators; the only shuffle is
    * the final (word, source) aggregate — same scale shape as #12.
    */
  def qKeywordStatsCjk(spark: SparkSession, dir: String): DataFrame =
    explodeCjkWords(Tables.documents(spark, dir), "text", Seq("source"))
      .groupBy("word", "source")
      .agg(count(lit(1)).as("ct"))
      .orderBy("word", "source")

  val qKeywordStatsCjkSql: String =
    """WITH toks AS (
      |  SELECT source, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
      |  FROM documents),
      |runs AS (
      |  SELECT source, unnest(regexp_extract_all(tok, '[\x{4e00}-\x{9fff}]+|[^\x{4e00}-\x{9fff}]+')) AS run
      |  FROM toks),
      |words AS (
      |  SELECT source,
      |    unnest(CASE WHEN regexp_matches(run, '^[\x{4e00}-\x{9fff}]') AND length(run) >= 2
      |      THEN list_transform(range(1, length(run)), i -> substr(run, i, 2))
      |      ELSE [run] END) AS word
      |  FROM runs)
      |SELECT word, source, CAST(COUNT(*) AS BIGINT) AS ct
      |FROM words GROUP BY word, source ORDER BY word, source""".stripMargin
}
