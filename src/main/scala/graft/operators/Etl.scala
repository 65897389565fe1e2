package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Log-ETL operators (SURVEY.md §2.1 #1, #2, #13).
  *
  * Reference semantics: BaseLogApp.java:33-116 (JSON parse with dirty
  * side-output, keyed-state is-new correction, stream routing) and
  * BaseDBApp.java:32-75 (broadcast-config dynamic routing).
  *
  * Scale notes: #1/#13 are embarrassingly parallel map-side transforms
  * (no shuffle; the config join broadcasts a tiny dim). #2 shuffles
  * once on user_id — the same key every downstream per-user operator
  * reuses.
  */
object Etl {

  /** #1 — parse the JSON props payload, validate, and route each event
    * to its target stream (BaseLogApp page/start routing with a dirty
    * side-output: BaseLogApp.java:32-75). Pure projection: no shuffle
    * beyond the final presentation sort.
    */
  def qEtlJsonRoute(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .withColumn("route",
        when(col("k").isNull || col("user_id").isNull, "dirty")
          .when(col("event_type") === "error", "dirty")
          .when(col("event_type") === "signup", "start")
          .otherwise("page"))
      .select("event_id", "user_id", "event_type", "route", "k")
      .orderBy("event_id")
  }

  // json_valid + TRY_CAST mirror Spark's forgiving get_json_object
  // semantics: malformed props or a non-numeric k must route the row to
  // 'dirty', not abort the whole oracle query with a cast error.
  val qEtlJsonRouteSql: String =
    """WITH t AS (
      |  SELECT event_id, user_id, event_type,
      |    CASE WHEN props IS NOT NULL AND json_valid(props)
      |         THEN TRY_CAST(json_extract(props, '$.k') AS BIGINT) END AS k
      |  FROM events)
      |SELECT event_id, user_id, event_type,
      |  CASE WHEN k IS NULL OR user_id IS NULL THEN 'dirty'
      |       WHEN event_type = 'error' THEN 'dirty'
      |       WHEN event_type = 'signup' THEN 'start'
      |       ELSE 'page' END AS route, k
      |FROM t ORDER BY event_id""".stripMargin

  /** #2 — is-new correction: only a user's first-ever event keeps
    * is_new=1 (BaseLogApp.java:54-67 ValueState fix). One shuffle on
    * user_id; ties broken by event_id for determinism.
    */
  def qNewUserFix(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    Tables.events(spark, dir)
      .withColumn("is_new",
        when(row_number().over(w) === 1, 1L).otherwise(0L))
      .select("event_id", "user_id", "is_new")
      .orderBy("event_id")
  }

  val qNewUserFixSql: String =
    """SELECT event_id, user_id,
      |  CAST(CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) = 1
      |       THEN 1 ELSE 0 END AS BIGINT) AS is_new
      |FROM events ORDER BY event_id""".stripMargin

  /** #13 — broadcast-config dynamic routing (BaseDBApp.java:32-75 +
    * TableProcessFunction): a tiny in-memory routing table decides each
    * event's sink. The config side is broadcast — zero shuffle on the
    * fact stream at any scale.
    */
  /** The routing table #13/#55 (and the streaming twin) broadcast —
    * the reference's TableProcess config rows (BaseDBApp's broadcast
    * state, TableProcessFunction.java). One definition so batch,
    * CDC, and streaming routing cannot drift.
    */
  private[graft] def routingConfig(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("view", "dwd_page_log", "kafka"),
      ("click", "dwd_page_log", "kafka"),
      ("signup", "dwd_start_log", "kafka"),
      ("purchase", "dwd_order_info", "hbase"),
      ("error", "dwd_dirty", "none")
    ).toDF("event_type", "sink_table", "sink_type")
  }

  def qConfigRoute(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .join(broadcast(routingConfig(spark)), Seq("event_type"), "left")
      .select("event_id", "event_type", "sink_table", "sink_type")
      .orderBy("event_id")

  /** SQL twin of [[routingConfig]] — composed into both routing
    * oracles so the config rows have ONE definition per language.
    */
  private val configCteSql: String =
    """config(event_type, sink_table, sink_type) AS (VALUES
      |  ('view', 'dwd_page_log', 'kafka'),
      |  ('click', 'dwd_page_log', 'kafka'),
      |  ('signup', 'dwd_start_log', 'kafka'),
      |  ('purchase', 'dwd_order_info', 'hbase'),
      |  ('error', 'dwd_dirty', 'none'))""".stripMargin

  val qConfigRouteSql: String =
    s"""WITH $configCteSql
      |SELECT e.event_id, e.event_type, c.sink_table, c.sink_type
      |FROM events e LEFT JOIN config c USING (event_type)
      |ORDER BY e.event_id""".stripMargin

  /** The op-derivation + delete-drop + route transform shared by #55
    * and its streaming twin (works on any frame with event_id +
    * event_type — batch table or stream).
    */
  private[graft] def cdcRouted(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    events
      .withColumn("op",
        when(pmod(col("event_id"), lit(10L)) === 0, "delete")
          .when(pmod(col("event_id"), lit(10L)) <= 2, "update")
          .otherwise("insert"))
      .where(col("op") =!= "delete")
      .join(broadcast(routingConfig(spark)), Seq("event_type"), "left")
      .select("event_id", "event_type", "op", "sink_table", "sink_type")
  }

  /** #55 — `q_cdc_route`: CDC operation-type semantics on top of #13's
    * dynamic routing. The reference's CDC pipeline carries an op type
    * with before/after images (CustomerDeserialization.java:30-65) and
    * DROPS DELETE records before routing (BaseDBApp.java:31-33 — the
    * business rule that deletes don't propagate to sinks); survivors
    * route by the broadcast config with the op preserved so downstream
    * upserts can distinguish insert from update.
    *
    * The test schema has no CDC feed, so the op derives
    * deterministically from the event id with plain integer math both
    * engines evaluate identically (~10% delete / 20% update / 70%
    * insert). The modeled semantics — an op column, the delete-drop
    * rule, routing with op preserved — are the reference's; the
    * derivation is a stand-in for a real change stream's op field.
    * Map-side only: a filter plus the broadcast config join, zero
    * shuffle on the fact stream at any scale.
    */
  def qCdcRoute(spark: SparkSession, dir: String): DataFrame =
    cdcRouted(Tables.events(spark, dir)).orderBy("event_id")

  // ((x % 10) + 10) % 10 is DuckDB's pmod: the two engines' % disagree
  // on negative ids (Spark pmod(-3,10)=7, DuckDB -3%10=-3), so the
  // oracle folds to the non-negative residue explicitly
  val qCdcRouteSql: String =
    s"""WITH $configCteSql,
      |cdc AS (
      |  SELECT event_id, event_type,
      |    CASE WHEN ((event_id % 10) + 10) % 10 = 0 THEN 'delete'
      |         WHEN ((event_id % 10) + 10) % 10 <= 2 THEN 'update'
      |         ELSE 'insert' END AS op
      |  FROM events)
      |SELECT e.event_id, e.event_type, e.op, c.sink_table, c.sink_type
      |FROM cdc e LEFT JOIN config c USING (event_type)
      |WHERE e.op <> 'delete'
      |ORDER BY e.event_id""".stripMargin
}
