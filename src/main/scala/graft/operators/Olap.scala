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

  import Money.{dQty, dPrice, dDisc, dTax, one}

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
        // the two multi-factor sums quantize to CENTS before the
        // double cast (r17, found by the ×10 sf1-class crosscheck): at
        // scale 6 a whole-table charge sum's integer numerator crosses
        // 2^53 around ~$2.8×10¹⁰ total, and DuckDB's decimal→double
        // cast double-rounds there (double(N)/double(10^s), two
        // roundings) while Spark's BigDecimal cast rounds once — a
        // 1-ulp divergence. Cents keep the numerator exact to ~$9×10¹³
        // (≈ sf10⁴) and both engines round the same exact decimal the
        // same way. The sum itself stays exact decimal arithmetic.
        round(sum(dPrice * (one - dDisc)), 2).cast("double")
          .as("sum_disc_price"),
        round(sum(dPrice * (one - dDisc) * (one + dTax)), 2).cast("double")
          .as("sum_charge"),
        (sum(dQty).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(dPrice).cast("double") / count(lit(1))).as("avg_price"),
        (sum(dDisc).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** TPC-H Q3 shipping priority: dim-filtered 3-way join, top-10 by
    * revenue. Customer side broadcasts; orders⋈lineitem sort-merges on
    * the order key. The top-N is a global sort of an already-aggregated
    * (small) frame.
    */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = "1998-03-15"
    val c = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit(cutoff).cast("timestamp_ntz"))
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit(cutoff).cast("timestamp_ntz"))
    o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        col("o_orderpriority"))
      .agg(sum(dPrice * (one - dDisc)).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
      .select("o_orderkey", "revenue", "orderdate", "o_orderpriority")
  }

  val q3Sql: String =
    """SELECT o_orderkey,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15'
      |  AND l_shipdate > TIMESTAMP '1998-03-15'
      |GROUP BY o_orderkey, orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin

  /** TPC-H Q5 local-supplier volume: 6-way join where every dim
    * (customer, supplier, nation, region) broadcasts and the only big
    * shuffle is orders⋈lineitem on the order key.
    */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp_ntz"))
      .select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val s = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val n = Tables.nation(spark, dir).select("n_nationkey", "n_name", "n_regionkey")
    val r = Tables.region(spark, dir)
      .filter(col("r_name") === "ASIA").select("r_regionkey")
    o.join(l, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(dPrice * (one - dDisc)).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5Sql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  /** #24 — top-N (3) orders per customer by total price: one shuffle on
    * the partition key, rank inside each partition. At 100 TB the same
    * plan holds — no global sort, no collect.
    */
  def qTopnPerGroup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn").cast("long").as("rn"),
        col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_custkey", "rn")
  }

  val qTopnPerGroupSql: String =
    """SELECT o_custkey, CAST(rn AS BIGINT) AS rn, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders)
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  /** #80 — churned high-balance customers per nation (TPC-H Q22
    * flavor, recast as the churn question this data can answer —
    * every synthetic customer has SOME order, so "never ordered" is
    * empty by construction): customers whose balance beats the
    * positive-balance average and who placed no order on/after the
    * cutoff. The no-recent-orders test is a LEFT ANTI join — the date
    * predicate pushes into the orders parquet scan, the scan prunes to
    * the single 8-byte key column, and the join shuffles once on
    * c_custkey opposite the (much smaller) filtered customer side.
    *
    * The average-balance gate is restated multiply-through —
    * `bal·N > S` with S an exact DECIMAL sum — because `bal > S/N` in
    * DOUBLE puts engine-specific FP summation order on a comparison
    * boundary; products of exact decimals tie out bit-for-bit on any
    * partitioning. The 1-row threshold frame broadcasts (no collect).
    */
  def qCustomersInactive(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val dBal = col("c_acctbal").cast("decimal(12,2)")
    val thresh = c.where(col("c_acctbal") > 0)
      .agg(sum(dBal).as("s"), count(lit(1)).as("cnt"))
    val n = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    c.crossJoin(broadcast(thresh))
      .where(dBal * col("cnt") > col("s"))
      .join(Tables.orders(spark, dir)
        .where(col("o_orderdate") >= lit(ChurnCutoff).cast("timestamp_ntz"))
        .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("numcust"),
        sum(dBal).cast("double").as("totacctbal"))
      .orderBy("n_name")
  }

  /** Last order date on/after this = still active. The test corpus
    * spans 1995-01..2001-08; the cutoff leaves a real churn cohort at
    * every SF.
    */
  private val ChurnCutoff = "2001-01-01"

  val qCustomersInactiveSql: String =
    s"""WITH t AS (
      |  SELECT SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS s, COUNT(*) AS cnt
      |  FROM customer WHERE c_acctbal > 0)
      |SELECT n_name, CAST(COUNT(*) AS BIGINT) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
      |FROM customer, nation, t
      |WHERE c_nationkey = n_nationkey
      |  AND CAST(c_acctbal AS DECIMAL(12,2)) * cnt > s
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |    WHERE o.o_custkey = customer.c_custkey
      |      AND o.o_orderdate >= TIMESTAMP '$ChurnCutoff')
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** #79 — monthly revenue pivoted into one column per region: the
    * BI-style wide readout (`.pivot` with EXPLICIT values — the
    * values-less overload runs a driver-side distinct scan to discover
    * columns, which is a collect in disguise and non-deterministic
    * column order besides). Pivot compiles to a single hash agg whose
    * map-side partials carry one slot per declared region — no Expand,
    * no join, one exchange on the (tiny) month key. MIDDLE EAST is
    * aliased with an underscore because a space is illegal in a
    * parquet column name (the driver persists results as parquet).
    */
  def qPivotRevenue(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_orderdate")
    val l = Tables.lineitem(spark, dir).select("l_orderkey", "l_extendedprice", "l_discount")
    val c = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val n = Tables.nation(spark, dir).select("n_nationkey", "n_regionkey")
    val r = Tables.region(spark, dir).select("r_regionkey", "r_name")
    val perOrder = l.groupBy("l_orderkey")
      .agg(sum(dPrice * (one - dDisc)).as("rev"))
    o.join(perOrder, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        col("r_name"), col("rev"))
      .groupBy("month")
      .pivot("r_name", Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"))
      .agg(sum(col("rev")).cast("double"))
      .withColumnRenamed("MIDDLE EAST", "MIDDLE_EAST")
      .orderBy("month")
  }

  val qPivotRevenueSql: String =
    """WITH per_order AS (
      |  SELECT l_orderkey,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS rev
      |  FROM lineitem GROUP BY l_orderkey),
      |grain AS (
      |  SELECT strftime(o_orderdate, '%Y-%m') AS month, r_name, rev
      |  FROM orders
      |  JOIN per_order ON o_orderkey = l_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey)
      |SELECT month,
      |  CAST(SUM(CASE WHEN r_name = 'AFRICA' THEN rev END) AS DOUBLE) AS "AFRICA",
      |  CAST(SUM(CASE WHEN r_name = 'AMERICA' THEN rev END) AS DOUBLE) AS "AMERICA",
      |  CAST(SUM(CASE WHEN r_name = 'ASIA' THEN rev END) AS DOUBLE) AS "ASIA",
      |  CAST(SUM(CASE WHEN r_name = 'EUROPE' THEN rev END) AS DOUBLE) AS "EUROPE",
      |  CAST(SUM(CASE WHEN r_name = 'MIDDLE EAST' THEN rev END) AS DOUBLE) AS "MIDDLE_EAST"
      |FROM grain GROUP BY month ORDER BY month""".stripMargin

  /** #85 — TPC-H Q4 flavor (order-priority checking): orders from one
    * quarter that had at least one late-shipped line (shipped > 60 days
    * after the order date), counted per priority. The existential test
    * is a LEFT SEMI join — lineitem contributes at most one match per
    * order, nothing from the right side is carried, and the range
    * predicate rides as the residual condition on the o_orderkey
    * sort-merge. At 100 TB both sides shuffle once on the order key;
    * the quarter filter pushes into the orders scan first.
    */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp_ntz"))
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val l = Tables.lineitem(spark, dir).select("l_orderkey", "l_shipdate")
    o.join(l, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  val q4Sql: String =
    """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-04-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey
      |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** #86 — TPC-H Q13 flavor (customer order-count distribution): how
    * many customers placed exactly k non-urgent orders, INCLUDING the
    * zero bucket — which forces a LEFT OUTER join (a semi/inner join
    * cannot see customers with no match; the filter must live in the
    * join condition, not a WHERE, or the zero bucket vanishes).
    * Customer scales with the corpus, so neither side broadcasts: one
    * shuffle pair on c_custkey, then the histogram re-agg on the tiny
    * count key. `count(o_orderkey)` (not count(*)) makes the unmatched
    * rows count 0.
    */
  def q13CustDistribution(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select("c_custkey")
    val o = Tables.orders(spark, dir)
      .select("o_custkey", "o_orderkey", "o_orderpriority")
    c.join(o, col("c_custkey") === col("o_custkey") &&
        col("o_orderpriority") =!= "1-URGENT", "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13Sql: String =
    """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
      |  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      |  FROM customer
      |  LEFT OUTER JOIN orders ON c_custkey = o_custkey
      |    AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey)
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** #87 — TPC-H Q17 flavor (small-quantity revenue): revenue from
    * lines of one brand whose quantity is below 20% of that part's
    * average. The correlated scalar subquery decorrelates to a
    * per-part aggregate — realized here as whole-partition window
    * sums over l_partkey, so the brand slice shuffles ONCE and there
    * is no self-join at all (per-part row counts are bounded by the
    * lines-per-part constant, so the window buffer is bounded). The
    * brand filter broadcasts part keys into the lineitem scan first;
    * only the brand's slice ever reaches the exchange.
    *
    * The 20%-of-average gate is multiplied through
    * (`qty·cnt·5 < sum`) over exact decimals — `qty < 0.2·sum/cnt`
    * in DOUBLE puts FP division on a comparison boundary.
    */
  def q17SmallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bparts = Tables.part(spark, dir)
      .filter(col("p_brand") === "Brand#1").select("p_partkey")
    val l = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .join(broadcast(bparts), col("l_partkey") === col("p_partkey"))
    val w = Window.partitionBy("l_partkey")
    l.withColumn("s", sum(dQty).over(w))
      .withColumn("cnt", count(lit(1)).over(w))
      .filter(dQty * col("cnt") * lit(5) < col("s"))
      .agg((sum(dPrice).cast("double") / lit(7.0)).as("avg_yearly"),
        count(lit(1)).as("n_lines"))
  }

  val q17Sql: String =
    """WITH pa AS (
      |  SELECT l_partkey AS pk, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS s,
      |    COUNT(*) AS cnt
      |  FROM lineitem JOIN part ON p_partkey = l_partkey
      |  WHERE p_brand = 'Brand#1' GROUP BY l_partkey)
      |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly,
      |  CAST(COUNT(*) AS BIGINT) AS n_lines
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |JOIN pa ON pa.pk = l_partkey
      |WHERE p_brand = 'Brand#1'
      |  AND CAST(l_quantity AS DECIMAL(12,2)) * cnt * 5 < s""".stripMargin

  /** #88 — TPC-H Q18 flavor (large-volume orders): orders whose total
    * quantity exceeds 250, with their customer. The HAVING-filtered
    * per-order aggregate acts as the probe side of the subsequent
    * joins — after the having gate it is a sliver of the order count,
    * so AQE turns both joins into broadcasts at runtime without being
    * told (at planning time the sizes are unknowable; this is exactly
    * the dynamic re-plan AQE exists for). Top-100 by price is a
    * distributed TakeOrdered, not a global sort.
    */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(sum(dQty).as("sq"))
      .filter(col("sq") > lit(BigDecimal(250).setScale(2)))
    val o = Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val c = Tables.customer(spark, dir).select("c_custkey", "c_name")
    big.join(o, col("o_orderkey") === col("l_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        col("o_totalprice"), col("sq").cast("double").as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  val q18Sql: String =
    """SELECT c_name, o_custkey, o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_totalprice,
      |  CAST(sq AS DOUBLE) AS sum_qty
      |FROM (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sq
      |      FROM lineitem GROUP BY l_orderkey HAVING sq > 250)
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  /** #89 — TPC-H Q7 flavor (cross-nation volume): revenue shipped
    * between every DISTINCT (supplier nation, customer nation) pair by
    * ship year. The nation dim plays two roles — joined twice under
    * different aliases, both broadcast (role-playing dims cost two
    * broadcasts, never two shuffles). The corpus-scale work is the
    * same two exchanges as every order-grain query: lineitem⋈orders
    * on the order key, then ⋈customer on c_custkey; supplier and both
    * nation roles ride along map-side. LINEITEM IS THE STREAM SIDE
    * (r22): the r21 shape put the fact table on the right of the
    * order-key join, and at sf0.1 the planner's size estimate put the
    * 5-column lineitem under the broadcast threshold — the driver
    * then built a 600 k-row HashedRelation serially, the measured
    * cause of q7's 3× pin inflation AND its inverse core scaling
    * (0.60 at 8-vs-32 cores: the build does not parallelize). With
    * the fact table leftmost the planner builds the narrow orders /
    * customer sides at gate SF and degrades to the intended two
    * sort-merge exchanges at 100 TB.
    */
  def q7NationVolume(spark: SparkSession, dir: String): DataFrame = {
    val n1 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("nk1"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("nk2"), col("n_name").as("cust_nation"))
    val s = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val c = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("nk1"))
      .join(broadcast(n2), col("c_nationkey") === col("nk2"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(dPrice * (one - dDisc)).cast("double").as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val q7Sql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(year(l_shipdate) AS INT) AS l_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE n1.n_name <> n2.n_name
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** #94 — TPC-H Q2 flavor (min-cost supplier): for every size-10
    * part, the supplier that shipped it cheapest (lowest observed line
    * price; ties → lowest suppkey). The correlated `= (SELECT min …)`
    * decorrelates to ARGMIN VIA STRUCT-MIN: `min(struct(cost, supp))`
    * is a lexicographic min — an ordinary mergeable aggregate that
    * partial-aggregates map-side, unlike the row_number window (#24's
    * shape) which must buffer and sort each group in one task. At
    * 100 TB with a hot part key, struct-min keeps collapsing partials;
    * the window would funnel the hot group through one buffer. The
    * oracle states the SAME semantics through the window formulation —
    * two independent expressions of argmin agreeing is the gate.
    * No float ties exist to worry about: equal costs fall back to the
    * suppkey component, so the argmin is total either way.
    */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val p10 = Tables.part(spark, dir)
      .filter(col("p_size") === 10).select("p_partkey", "p_name")
    val s = Tables.supplier(spark, dir).select("s_suppkey", "s_name", "s_nationkey")
    val n = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey", "l_extendedprice")
      // "lowest OBSERVED price": a supplier whose every line carries a
      // null price has no observation and must not win the argmin —
      // without this filter a null cost sorts FIRST in Spark's struct
      // ordering but LAST in the oracle's ORDER BY (DuckDB defaults
      // nulls last), a latent divergence on dirty data
      .where(col("l_extendedprice").isNotNull)
      .join(broadcast(p10), col("l_partkey") === col("p_partkey"))
      .groupBy("p_partkey", "p_name", "l_suppkey")
      .agg(min(col("l_extendedprice")).as("cost"))
      .groupBy("p_partkey", "p_name")
      .agg(min(struct(col("cost"), col("l_suppkey"))).as("b"))
      .select(col("p_partkey"), col("p_name"),
        col("b.l_suppkey").as("s_suppkey"), col("b.cost").as("cost"))
      .join(broadcast(s), "s_suppkey")
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select("p_partkey", "p_name", "s_name", "n_name", "cost")
      .orderBy("p_partkey")
  }

  val q2Sql: String =
    """WITH ps AS (
      |  SELECT p_partkey, p_name, l_suppkey, MIN(l_extendedprice) AS cost
      |  FROM lineitem JOIN part ON p_partkey = l_partkey
      |  WHERE p_size = 10 AND l_extendedprice IS NOT NULL
      |  GROUP BY 1, 2, 3),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY p_partkey
      |    ORDER BY cost, l_suppkey) AS rk
      |  FROM ps)
      |SELECT p_partkey, p_name, s_name, n_name, cost
      |FROM r JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE rk = 1 ORDER BY p_partkey""".stripMargin

  /** #108 — TPC-H Q6 (forecast revenue change): the scan-only shape.
    * All three range predicates reach the parquet reader as
    * PushedFilters (raw-column comparisons, no casts in the way), no
    * join exists, and the ungrouped aggregate collapses map-side so
    * the exchange carries one partial row per task regardless of
    * corpus size — the 100 TB cost is exactly one pruned columnar
    * scan (4 of 11 lineitem columns read; PlanSpec pins pushdown,
    * pruning, and zero joins). The discount bounds compare the STORED
    * doubles against the same literals in both engines — no
    * arithmetic touches the comparison, so no FP boundary can
    * straddle engines (the discount domain is 0.01-stepped).
    */
  def q6RevenueChange(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum(dPrice * dDisc).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  val q6Sql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
      |  CAST(COUNT(*) AS BIGINT) AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  /** #109 — TPC-H Q10 (returned-item reporting): top-20 customers by
    * revenue lost to returns in a quarter. Customer scales with the
    * corpus, so the plan is the q7 discipline: the date-pruned orders
    * slice joins the 'R'-filtered lineitem slice on the order key,
    * THEN shuffles once on c_custkey against customer; only the tiny
    * nation dim broadcasts. The top-20 is a distributed TakeOrdered
    * over the grouped frame (never a global sort), tie-broken on
    * c_custkey so the cutoff is total.
    */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp_ntz") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp_ntz"))
      .select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val n = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    o.join(l, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(sum(dPrice * (one - dDisc)).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
      .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
  }

  val q10Sql: String =
    """SELECT c_custkey, c_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |  c_acctbal, n_name
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-10-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** #110 — TPC-H Q14 (promo revenue share): the conditional-ratio
    * aggregate. One month of lineitem joins part on the part key to
    * classify each line, then BOTH sums come out of a single grouped-
    * less aggregate pass (promo sum via a null-passing CASE — no
    * second scan, no self-join). The part side carries parquet stats,
    * so the planner broadcasts it unhinted at gate scale and flips to
    * a shuffle join when part outgrows the threshold at 100 TB
    * (PlanSpec pins the gate-scale broadcast). The ratio divides two
    * exact-decimal sums cast to double, NULL-guarded on both engines
    * (`NULLIF` / `when`) so an all-returns month cannot divide by
    * zero under ANSI.
    */
  def q14PromoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir).select("p_partkey", "p_type")
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1996-10-01").cast("timestamp_ntz"))
      .select("l_partkey", "l_extendedprice", "l_discount")
    val rev = dPrice * (one - dDisc)
    l.join(p, col("l_partkey") === col("p_partkey"))
      .agg(sum(when(col("p_type") === "PROMO", rev)).cast("double").as("_p"),
        sum(rev).cast("double").as("_t"))
      .select(
        (lit(100.0) * col("_p") / when(col("_t") =!= 0.0, col("_t"))).as("promo_pct"),
        col("_t").as("total_revenue"))
  }

  val q14Sql: String =
    """SELECT
      |  100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) END) AS DOUBLE)
      |    / NULLIF(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE), 0) AS promo_pct,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total_revenue
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      |  AND l_shipdate < TIMESTAMP '1996-10-01'""".stripMargin

  /** #111 — TPC-H Q19 flavor (disjunctive-predicate revenue): an
    * OR-of-ANDs spanning both join sides, placed IN the join
    * condition so Catalyst can extract the per-side implications —
    * the brand/size disjunction (part-only columns) and the quantity
    * disjunction (lineitem-only) each push below the join into their
    * scans, and only the pre-filtered slivers meet at the part key.
    * Writing it as a post-join WHERE would compute the full join
    * first; this shape is WHY Q19 is the canonical pushdown test.
    * Quantities are integral doubles compared against int literals —
    * identical comparisons both engines.
    */
  def q19DiscountedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir).select("p_partkey", "p_brand", "p_size")
    val l = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    l.join(p, col("l_partkey") === col("p_partkey") && (
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
          col("l_quantity").between(20, 30))))
      .agg(sum(dPrice * (one - dDisc)).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  val q19Sql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |  CAST(COUNT(*) AS BIGINT) AS n_lines
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
      |       AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
      |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  /** #112 — TPC-H Q8 flavor (market share): of the ECONOMY-part
    * revenue ASIA-region customers ordered in 1996-97, what share did
    * suppliers from NATION_7 ship, per year? The heaviest OLAP shape
    * in the surface: a 6-table join where BOTH nation roles appear —
    * the customer's nation exists only to reach the region filter
    * (broadcast, then dropped), the supplier's nation feeds the
    * conditional numerator — and the share is the #110 one-pass
    * conditional-ratio (CASE inside sum, no second scan). Corpus-scale
    * work is the standard exchanges (l⋈o on orderkey, ⋈c on custkey);
    * every dim broadcasts; a year with no NATION_7 lines yields NULL
    * share in both engines (null-passing CASE sum over a non-empty
    * group), and the denominator cannot be zero because prices are
    * positive and the group exists only if a line does.
    */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir)
      .filter(col("r_name") === "ASIA").select("r_regionkey")
    val nC = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("cn_key"), col("n_regionkey"))
    val nS = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val c = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val s = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val p = Tables.part(spark, dir)
      .filter(col("p_type") === "ECONOMY").select("p_partkey")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val l = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount")
    val rev = dPrice * (one - dDisc)
    l.join(p, col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nC), col("c_nationkey") === col("cn_key"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nS), col("s_nationkey") === col("sn_key"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        (sum(when(col("supp_nation") === "NATION_7", rev)).cast("double") /
          sum(rev).cast("double")).as("mkt_share"),
        sum(rev).cast("double").as("total_volume"))
      .orderBy("o_year")
  }

  val q8Sql: String =
    """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
      |  CAST(SUM(CASE WHEN ns.n_name = 'NATION_7' THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) END) AS DOUBLE)
      |    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS mkt_share,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total_volume
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation nc ON c_nationkey = nc.n_nationkey
      |JOIN region ON nc.n_regionkey = r_regionkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ns ON s_nationkey = ns.n_nationkey
      |WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY 1 ORDER BY o_year""".stripMargin

  /** #113 — TPC-H Q12 flavor (late-shipment priority mix): among 1996
    * lines shipped more than 90 days after their order date, how many
    * came from high- vs low-priority orders, per line status. The
    * two-way conditional count (both columns out of ONE pass — the Q12
    * signature) over a fact-fact equi join whose date predicate prunes
    * the lineitem scan (PushedFilters) while the lateness comparison —
    * spanning both sides — rides as the join residual. Neither side
    * broadcasts at scale; one exchange pair on the order key, then the
    * re-agg on the 2-value status key.
    */
  def q12LatePriority(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz"))
      .select("l_orderkey", "l_shipdate", "l_linestatus")
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    l.join(o, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .groupBy("l_linestatus")
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy("l_linestatus")
  }

  val q12Sql: String =
    """SELECT l_linestatus,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_shipdate > o_orderdate + INTERVAL 90 DAY
      |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  /** #114 — TPC-H Q15 (top supplier): the supplier(s) whose 1996-H1
    * shipped revenue equals the global maximum. The GLOBAL-SCALAR
    * pattern: one shuffle aggregates revenue per supplier, the 1-row
    * max broadcasts back onto that same frame (an equi join ON the
    * revenue value — never a window over all suppliers, which would
    * sort a corpus-scaled frame to keep one row), and only the winner
    * sliver (ties only, explicitly broadcast — the post-filter frame
    * is stats-less, the #107 lesson) meets the supplier dim. The
    * equality compares DECIMAL aggregates computed by the same engine
    * that filters on them — never a cross-engine float comparison;
    * each engine casts to double only in the final projection.
    */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1996-07-01").cast("timestamp_ntz"))
      .select("l_suppkey", "l_extendedprice", "l_discount")
    // the per-supplier aggregate feeds BOTH the winner side and the
    // global max — persisted so the corpus is scanned and shuffled
    // once, not twice (supplier-sized, tiny relative to lineitem; the
    // bench harness clears the cache between queries, matching the
    // #96/#98 shared-subtree contract)
    val rev = l.groupBy("l_suppkey")
      .agg(sum(dPrice * (one - dDisc)).as("total_rev"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mx = rev.agg(max(col("total_rev")).as("mx"))
    val winners = rev.join(broadcast(mx), col("total_rev") === col("mx"))
    Tables.supplier(spark, dir).select("s_suppkey", "s_name")
      .join(broadcast(winners), col("s_suppkey") === col("l_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_rev").cast("double").as("total_revenue"))
      .orderBy("s_suppkey")
  }

  val q15Sql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS total_rev
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-07-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
      |FROM supplier JOIN rev ON s_suppkey = l_suppkey
      |WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  /** #115 — TPC-H Q11 flavor (important positions): parts whose 1996
    * shipped value exceeds 1/10000 of the global total — the
    * grouped-HAVING-vs-GLOBAL-SCALAR shape (Q15 resolves an equality
    * argmax; this resolves a threshold fraction). One shuffle builds
    * the per-part values; the SAME frame re-aggregates to the 1-row
    * total that broadcasts back as the filter bound. The fraction
    * test is cross-multiplied (`value * 10000 > total`) so both
    * engines compare exact decimals — a decimal division would round
    * differently under Spark's and DuckDB's result-scale rules.
    */
  def q11ImportantPositions(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz"))
      .select("l_partkey", "l_extendedprice", "l_discount")
    // the per-part aggregate feeds BOTH the kept side and the global
    // total — persisted so the corpus is scanned and shuffled once
    // (part-sized; the bench harness clears the cache between
    // queries, matching the #96/#98 shared-subtree contract)
    val byPart = l.groupBy("l_partkey")
      .agg(sum(dPrice * (one - dDisc)).as("val_d"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = byPart.agg(sum(col("val_d")).as("total_d"))
    byPart.join(broadcast(total),
        col("val_d") * lit(10000L) > col("total_d"))
      .select(col("l_partkey"),
        col("val_d").cast("double").as("part_value"))
      .orderBy(col("part_value").desc, col("l_partkey"))
  }

  val q11Sql: String =
    """WITH byp AS (
      |  SELECT l_partkey,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS val_d
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1997-01-01'
      |  GROUP BY l_partkey)
      |SELECT l_partkey, CAST(val_d AS DOUBLE) AS part_value
      |FROM byp
      |WHERE val_d * 10000 > (SELECT SUM(val_d) FROM byp)
      |ORDER BY part_value DESC, l_partkey""".stripMargin

  /** #116 — TPC-H Q16 flavor (supplier variety): how many DISTINCT
    * suppliers shipped each (brand, type, size) in 1996, excluding
    * blacklisted suppliers (negative account balance — the
    * s_comment-complaints stand-in). The NOT-IN-subquery shape plans
    * as a LEFT ANTI join (PlanSpec-pinned): the tiny blacklist
    * broadcasts, so the exclusion is map-side; then one exchange on
    * the part key attaches attributes and the single-column
    * count(DISTINCT) plans the standard two-phase aggregate — no
    * Expand (only MIXED distincts expand, the #95 trade).
    */
  def q16SupplierVariety(spark: SparkSession, dir: String): DataFrame = {
    val bad = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0.0).select("s_suppkey")
    val p = Tables.part(spark, dir)
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz"))
      .select("l_partkey", "l_suppkey")
    l.join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(p, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  val q16Sql: String =
    """SELECT p_brand, p_type, p_size,
      |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_suppkey NOT IN (
      |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** #117 — TPC-H Q22 flavor (idle rich customers): per market
    * segment, the count and balance mass of customers who hold an
    * above-average positive balance yet placed no RECENT order (none
    * since 2000 — every customer in this corpus has SOME order, so
    * the classic lifetime predicate would gate on an empty set).
    * Three canonical pieces in one query: a global scalar (the
    * average, broadcast back), an anti-join against a corpus-scaled
    * fact (the recency test — shuffles on the key, unlike #116's
    * broadcast blacklist, with the date bound pruning the orders
    * scan), and the final tiny-key aggregate. The average test is
    * cross-multiplied (`bal * n_pos > sum_pos`) so both engines
    * compare exact decimals — never an engine-computed double average
    * whose summation order differs under partitioning.
    */
  def q22IdleRich(spark: SparkSession, dir: String): DataFrame = {
    val dBal = col("c_acctbal").cast("decimal(12,2)")
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"), dBal.as("bal_d"))
    val avgPos = c.filter(col("bal_d") > 0)
      .agg(sum(col("bal_d")).as("sum_pos"), count(lit(1)).as("n_pos"))
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp_ntz"))
      .select("o_custkey")
    c.join(broadcast(avgPos), col("bal_d") * col("n_pos") > col("sum_pos"))
      .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("numcust"),
        sum(col("bal_d")).cast("double").as("totacctbal"))
      .orderBy("c_mktsegment")
  }

  val q22Sql: String =
    """WITH pos AS (
      |  SELECT SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS sum_pos,
      |    COUNT(*) AS n_pos
      |  FROM customer WHERE CAST(c_acctbal AS DECIMAL(12,2)) > 0)
      |SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
      |FROM customer, pos
      |WHERE CAST(c_acctbal AS DECIMAL(12,2)) * n_pos > sum_pos
      |  AND NOT EXISTS (
      |    SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |      AND o_orderdate >= TIMESTAMP '2000-01-01')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** #118 — TPC-H Q9 flavor (product profit): per supplier nation and
    * order year, profit on red parts — revenue minus a 10%-of-retail
    * carrying cost (the ps_supplycost stand-in on this schema, which
    * has no partsupp). The widest SUBSTRING-pushdown join: the
    * `p_name LIKE '%red%'` contains-filter reaches the part scan as a
    * PushedFilters StringContains (PlanSpec-pinned), so only the red
    * sliver of part ever joins; corpus-scale work is the l⋈o
    * order-key exchange; supplier/nation/part broadcast at gate scale.
    * All profit arithmetic stays in exact DECIMAL until the final
    * double cast — subtraction alignment is exact in both engines.
    */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .filter(col("p_name").contains("red"))
      .select("p_partkey", "p_retailprice")
    val s = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val n = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_orderdate")
    val l = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount")
    val dRetail = col("p_retailprice").cast("decimal(12,2)")
    val cost = dRetail * dQty * lit(BigDecimal("0.10")).cast("decimal(4,2)")
    val amount = dPrice * (one - dDisc) - cost
    l.join(p, col("l_partkey") === col("p_partkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      .agg(sum(amount).cast("double").as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val q9Sql: String =
    """SELECT n_name AS nation,
      |  CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
      |  CAST(SUM(
      |    CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
      |    - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) * CAST(0.10 AS DECIMAL(4,2))
      |  ) AS DOUBLE) AS sum_profit
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN orders ON l_orderkey = o_orderkey
      |WHERE p_name LIKE '%red%'
      |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin

  /** #119 — TPC-H Q20 flavor (dominant suppliers): suppliers who in
    * 1996 shipped MORE THAN HALF of some small-part's total quantity.
    * The chained-reduction shape: the corpus contracts to
    * (part, supplier) quantity grain in one shuffle (persisted — the
    * per-part total is a RE-aggregation of that same frame, the #115
    * discipline), the dominance test cross-multiplies in exact
    * decimal (`qty_ps * 2 > qty_p`), and the surviving supplier-key
    * sliver SEMI-joins the supplier dim (a semi join never widens —
    * the #85 lesson — so no distinct is needed even when one supplier
    * dominates many parts... the distinct below keeps the sliver
    * minimal before the broadcast instead). The `p_name LIKE
    * 'small%'` prefix reaches the part scan as a StringStartsWith.
    */
  def q20DominantSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .filter(col("p_name").startsWith("small")).select("p_partkey")
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz"))
      .select("l_partkey", "l_suppkey", "l_quantity")
    val perPS = l.join(p, col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(dQty).as("qty_ps"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val perP = perPS.groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("qty_ps")).as("qty_p"))
    val dominant = perPS
      .join(perP, col("l_partkey") === col("pk") &&
        col("qty_ps") * lit(2L) > col("qty_p"))
      .select("l_suppkey").distinct()
    Tables.supplier(spark, dir).select("s_suppkey", "s_name")
      .join(broadcast(dominant), col("s_suppkey") === col("l_suppkey"),
        "left_semi")
      .orderBy("s_suppkey")
  }

  val q20Sql: String =
    """WITH ps AS (
      |  SELECT l_partkey, l_suppkey,
      |    SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty_ps
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_name LIKE 'small%'
      |    AND l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1997-01-01'
      |  GROUP BY l_partkey, l_suppkey),
      |tot AS (
      |  SELECT l_partkey, SUM(qty_ps) AS qty_p FROM ps GROUP BY l_partkey)
      |SELECT s_suppkey, s_name FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM ps JOIN tot USING (l_partkey)
      |  WHERE qty_ps * 2 > qty_p)
      |ORDER BY s_suppkey""".stripMargin

  /** #120 — TPC-H Q21 flavor (sole late supplier): suppliers whose
    * late line (shipped >90 days after the order date) was the ONLY
    * late one in a multi-supplier order. The classic formulation is
    * two SELF-joins on the fact (EXISTS another supplier / NOT EXISTS
    * another late supplier) — at 100 TB that's three corpus-scale
    * shuffle joins. This plans the AGGREGATE REWRITE instead: ONE
    * l⋈o exchange, contraction to (order, supplier) grain in the
    * same pass, then a window over the CONTRACTED frame (per-order
    * groups are bounded by order width, so no skew) computes
    * supplier-count and late-supplier-count per order; the waiting
    * predicate is a map-side filter on those counts. The DuckDB
    * oracle states the classic EXISTS/NOT-EXISTS form — the gate
    * proves the rewrite IS the classic semantics (the #94
    * two-independent-expressions pattern). Top-100 is a distributed
    * TakeOrdered, tie-broken on s_name (unique per supplier).
    *
    * The l⋈o join is PINNED to sort-merge (probe 14): SMJ output is
    * hash(l_orderkey)-partitioned, which satisfies the clustered
    * distribution of BOTH the (order, supplier) contraction (subset
    * rule) and the per-order window — so everything after the join
    * runs in place and the whole query moves the fact through exactly
    * ONE exchange at every scale. Letting orders broadcast (the
    * default below the threshold) leaves the fact in scan
    * partitioning and costs TWO fact-grain exchanges instead
    * (groupBy(ok, sk), then the window's re-exchange by ok) — the
    * probe measured that two-exchange shape 1.3-1.8x slower at 50M
    * lines than the single-exchange shape pinned here.
    */
  def q21SoleLateSupplier(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_orderdate")
    val l = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
    val late = (col("l_shipdate") >
      col("o_orderdate") + expr("INTERVAL 90 DAYS")).cast("long")
    val g1 = l.join(o.hint("merge"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "l_suppkey")
      .agg(sum(late).as("n_late"))
    val w = Window.partitionBy("l_orderkey")
    val g2 = g1
      .withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("n_late_supp",
        sum(when(col("n_late") > 0, 1L).otherwise(0L)).over(w))
    val s = Tables.supplier(spark, dir).select("s_suppkey", "s_name")
    g2.filter(col("n_late") > 0 && col("n_supp") > 1 &&
        col("n_late_supp") === 1)
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(sum(col("n_late")).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  val q21Sql: String =
    """WITH wide AS (
      |  SELECT l_orderkey, l_suppkey,
      |    (l_shipdate > o_orderdate + INTERVAL 90 DAY) AS late
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
      |SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
      |FROM wide w1 JOIN supplier ON w1.l_suppkey = s_suppkey
      |WHERE w1.late
      |  AND EXISTS (SELECT 1 FROM wide w2
      |    WHERE w2.l_orderkey = w1.l_orderkey
      |      AND w2.l_suppkey <> w1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM wide w3
      |    WHERE w3.l_orderkey = w1.l_orderkey
      |      AND w3.l_suppkey <> w1.l_suppkey AND w3.late)
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_disc_price,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** #174 — `q_gmv_daily`: the reference's ADS/serving GMV readout
    * (ProductStatsMapper.java:12 `select sum(order_amount) from
    * product_stats where toYYYYMMDD(stt)=#{date}`, served by
    * SugarController.java:24 `/api/sugar/gmv`) re-expressed over the
    * raw fact tables, for EVERY day at once — the gate covers all
    * values of the endpoint's `date` parameter in one frame instead
    * of one point lookup. `stat_date` is the reference's yyyyMMdd
    * integer key; `gmv` the discounted revenue of orders PLACED that
    * day (order grain, the reference's order_amount roll-up).
    *
    * Scale: one fact-fact equi-join l⋈o on the order key (the #10
    * shape), then a partial-aggregated contraction onto the tiny
    * date key — days are bounded (~2.4k rows here), so the final
    * shuffle is trivially small at any corpus size.
    */
  def qGmvDaily(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyyMMdd").cast("int").as("stat_date"))
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), (dPrice * (one - dDisc)).as("rev"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("stat_date")
      .agg(sum(col("rev")).cast("double").as("gmv"))
      .orderBy("stat_date")
  }

  val qGmvDailySql: String =
    """SELECT CAST(strftime(o_orderdate, '%Y%m%d') AS INT) AS stat_date,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS gmv
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** #175 — `q_gmv_brand_topn`: the reference's second serving
    * endpoint (ProductStatsMapper.java:15 `select tm_name,
    * sum(order_amount) ... group by tm_name order by order_amount
    * desc limit N`, SugarController.java:39 `/api/sugar/tm`) — GMV by
    * BRAND, top-5 per day, for every day at once. `p_brand` stands in
    * for the reference's trademark dim (its tm_name lookup is the #10
    * dim join). Rank ties break by brand ascending so the served
    * top-N is deterministic — the reference's bare `order by
    * order_amount desc` leaves tie order to ClickHouse; a gated query
    * cannot.
    *
    * Scale: the same single fact-fact exchange as #174 with the part
    * dim BROADCAST onto the line side; the rank window runs on the
    * already-contracted (day × brand) frame — thousands of rows, so
    * the per-day sort is noise. Ranking compares the exact DECIMAL
    * sums (cast to double only on output) so Spark and the oracle
    * order identical values identically.
    */
  def qGmvBrandTopn(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyyMMdd").cast("int").as("stat_date"))
    val p = Tables.part(spark, dir).select("p_partkey", "p_brand")
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"),
        (dPrice * (one - dDisc)).as("rev"))
    val byBrand = l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("stat_date"), col("p_brand").as("brand"))
      .agg(sum(col("rev")).as("gmv_d"))
    byBrand
      .withColumn("rn", row_number().over(Window.partitionBy("stat_date")
        .orderBy(col("gmv_d").desc, col("brand"))))
      .filter(col("rn") <= 5)
      .select(col("stat_date"), col("rn"), col("brand"),
        col("gmv_d").cast("double").as("gmv"))
      .orderBy("stat_date", "rn")
  }

  val qGmvBrandTopnSql: String =
    """WITH by_brand AS (
      |  SELECT CAST(strftime(o_orderdate, '%Y%m%d') AS INT) AS stat_date,
      |    p_brand AS brand,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS gmv_d
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY 1, 2)
      |SELECT stat_date, rn, brand, CAST(gmv_d AS DOUBLE) AS gmv FROM (
      |  SELECT stat_date, brand, gmv_d,
      |    row_number() OVER (PARTITION BY stat_date
      |      ORDER BY gmv_d DESC, brand) AS rn
      |  FROM by_brand)
      |WHERE rn <= 5 ORDER BY stat_date, rn""".stripMargin
}
