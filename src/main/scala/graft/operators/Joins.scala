package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** DWM-layer wide tables: interval joins + dimension enrichment
  * (SURVEY.md §2.1 #5-8).
  *
  * Reference semantics: OrderWideApp.java:84-90 (order⋈detail interval
  * join ±5 s), PaymentWideApp.java:67-75 (payment⋈order-wide, −15 min /
  * +5 s asymmetric bounds), DimAsyncFunction.java + OrderWideApp.java:
  * 96-195 (six async dimension lookups).
  *
  * Scale notes: every fact-fact interval join here has an equi key
  * (orderkey / user_id) so Catalyst plans SortMergeJoin on the key with
  * the time range as a residual condition — never a cartesian. The
  * range bound caps per-key fan-out. Dim lookups are broadcast hash
  * joins (dims ≪ facts at any scale) — the Spark-native equivalent of
  * the reference's async+Redis-cached point lookups.
  */
object Joins {

  private def revenue = Money.lineRevenue

  /** #5 — order wide table: orders⋈lineitem on the order key with the
    * ship date inside [orderdate, orderdate+90d] (OrderWideApp.java:
    * 84-90 `between(-5s, +5s)` rescaled to the batch data's granularity).
    */
  // the presentation sort keys on EVERY output column: the generator
  // emits duplicate (l_orderkey, l_linenumber) pairs (11785 at sf0.01),
  // so the natural key alone leaves tie order engine-dependent and the
  // driver's hash gate at the mercy of tie luck; full-column sort is
  // deterministic because full output rows are distinct
  def qOrderWide(spark: SparkSession, dir: String): DataFrame =
    qOrderWideBase(spark, dir).orderBy("o_orderkey", "l_linenumber",
      "o_custkey", "l_partkey", "l_suppkey", "revenue")

  val qOrderWideSql: String =
    """SELECT o_orderkey, l_linenumber, o_custkey, l_partkey, l_suppkey,
      |  CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |  AND l_shipdate >= o_orderdate
      |  AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
      |ORDER BY o_orderkey, l_linenumber, o_custkey, l_partkey, l_suppkey, revenue""".stripMargin

  /** #6 — pure event-stream interval join: each view joined to the same
    * user's purchases within the following 10 minutes. Equi key =
    * user_id, time range residual.
    */
  def qEventIntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val v = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("ts_us").as("v_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"), col("ts_us").as("p_ts"))
    v.join(p, col("user_id") === col("p_user") &&
        col("p_ts") > col("v_ts") &&
        col("p_ts") <= col("v_ts") + lit(10L * 60 * 1000 * 1000))
      .select(col("view_id"), col("purchase_id"), col("user_id"),
        (col("p_ts") - col("v_ts")).as("gap_us"))
      .orderBy("view_id", "purchase_id")
  }

  val qEventIntervalJoinSql: String =
    """WITH v AS (SELECT event_id AS view_id, user_id, epoch_us(ts) AS v_ts FROM events WHERE event_type = 'view'),
      |p AS (SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS p_ts FROM events WHERE event_type = 'purchase')
      |SELECT view_id, purchase_id, v.user_id, p_ts - v_ts AS gap_us
      |FROM v JOIN p ON v.user_id = p.user_id
      |  AND p_ts > v_ts AND p_ts <= v_ts + 600000000
      |ORDER BY view_id, purchase_id""".stripMargin

  /** #7 — payment-wide asymmetric interval join (PaymentWideApp.java:
    * 67-75, −15 min/+5 s): lineitem paired with its order when the ship
    * date falls in the asymmetric window [orderdate−15d, orderdate+5d].
    */
  def qPaymentWide(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") >= col("o_orderdate") - expr("INTERVAL 15 DAYS") &&
        col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 5 DAYS"))
      .select(col("o_orderkey"), col("l_linenumber"), col("o_custkey"),
        col("o_totalprice"), revenue.as("revenue"))
      // full-column sort: duplicate (orderkey, linenumber) pairs exist
      // in the data (see qOrderWide) — identical remaining rows are the
      // only possible ties, for which order is immaterial to the hash
      .orderBy("o_orderkey", "l_linenumber", "o_custkey", "o_totalprice",
        "revenue")
  }

  val qPaymentWideSql: String =
    """SELECT o_orderkey, l_linenumber, o_custkey, o_totalprice,
      |  CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  AND l_shipdate >= o_orderdate - INTERVAL 15 DAY
      |  AND l_shipdate <= o_orderdate + INTERVAL 5 DAY
      |ORDER BY o_orderkey, l_linenumber, o_custkey, o_totalprice, revenue""".stripMargin

  /** #8 — six-dimension enrichment of the order-wide table
    * (DimAsyncFunction.java; OrderWideApp.java:96-195): customer,
    * customer-nation, region, part, supplier, supplier-nation — every
    * dim broadcast.
    */
  def qOrderEnriched(spark: SparkSession, dir: String): DataFrame = {
    val wide = qOrderWideBase(spark, dir)
    val c = Tables.customer(spark, dir).select("c_custkey", "c_name", "c_nationkey")
    val n = Tables.nation(spark, dir).select("n_nationkey", "n_name", "n_regionkey")
    val r = Tables.region(spark, dir).select("r_regionkey", "r_name")
    val p = Tables.part(spark, dir).select("p_partkey", "p_brand")
    val s = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
    val sn = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("sn_nationkey"), col("n_name").as("s_nation"))
    wide
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(sn), col("s_nationkey") === col("sn_nationkey"))
      .select(col("o_orderkey"), col("l_linenumber"), col("c_name"),
        col("n_name"), col("r_name"), col("p_brand"), col("s_name"),
        col("s_nation"), col("revenue"))
      // full-column sort — duplicate (orderkey, linenumber) pairs in
      // the data make the natural key non-unique (see qOrderWide)
      .orderBy("o_orderkey", "l_linenumber", "c_name", "n_name", "r_name",
        "p_brand", "s_name", "s_nation", "revenue")
  }

  /** The one definition of an "order wide" row — qOrderWide adds only
    * the presentation sort; qOrderEnriched joins dims onto it unsorted.
    */
  private def qOrderWideBase(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    o.join(l, col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") >= col("o_orderdate") &&
        col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .select(col("o_orderkey"), col("l_linenumber"), col("o_custkey"),
        col("l_partkey"), col("l_suppkey"), revenue.as("revenue"))
  }

  val qOrderEnrichedSql: String =
    """WITH wide AS (
      |  SELECT o_orderkey, l_linenumber, o_custkey, l_partkey, l_suppkey,
      |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |    AND l_shipdate >= o_orderdate AND l_shipdate <= o_orderdate + INTERVAL 90 DAY)
      |SELECT o_orderkey, l_linenumber, c_name, n.n_name AS n_name, r_name, p_brand, s_name,
      |  sn.n_name AS s_nation, revenue
      |FROM wide
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n ON c_nationkey = n.n_nationkey
      |JOIN region ON n.n_regionkey = r_regionkey
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation sn ON s_nationkey = sn.n_nationkey
      |ORDER BY o_orderkey, l_linenumber, c_name, n_name, r_name, p_brand,
      |  s_name, s_nation, revenue""".stripMargin
}
