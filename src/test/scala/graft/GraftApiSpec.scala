package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.api.Graft

/** The DataFrame-in/out facade must agree exactly with the gated
  * queries that bind the same semantics to the test tables — so the
  * user-facing surface and the correctness-gated surface cannot drift.
  */
class GraftApiSpec extends SparkSpec {

  private def same(a: DataFrame, b: DataFrame, what: String): Unit =
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      s"$what: facade output differs from the gated query")

  test("exactDedup reproduces q_dedup_exact") {
    val api = Graft.exactDedup(Tables.documents(spark, sf), "doc_id", "text")
      .select(col("id").as("doc_id"), col("fp"), col("canonical_id"),
        col("group_size"), col("is_dup"))
    same(api, SparkEntry.queries("q_dedup_exact")(spark, sf), "exactDedup")
  }

  test("ngramJaccardPairs reproduces both jaccard queries") {
    val docs = Tables.documents(spark, sf)
    val api = Graft.ngramJaccardPairs(docs, "doc_id", "text")
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
        col("inter"), col("jaccard"))
    same(api, SparkEntry.queries("q_dedup_ngram_jaccard")(spark, sf),
      "ngramJaccardPairs")
    // with the cap, the capped gated query (cap does not bind at sf0.01,
    // but the code path is the capped one)
    val capped = Graft.ngramJaccardPairs(docs, "doc_id", "text", dfCap = 64)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
        col("inter"), col("jaccard"))
    same(capped, SparkEntry.queries("q_dedup_ngram_jaccard_capped")(spark, sf),
      "ngramJaccardPairs(dfCap)")
  }

  test("connectedComponents over the jaccard pairs reproduces q_dup_clusters") {
    val pairs = SparkEntry.queries("q_dedup_ngram_jaccard")(spark, sf)
      .select("doc_a", "doc_b")
    val api = Graft.connectedComponents(pairs, "doc_a", "doc_b")
      .select(col("id").as("doc_id"), col("component_id").as("cluster_id"),
        col("component_size").as("cluster_size"))
    same(api, SparkEntry.queries("q_dup_clusters")(spark, sf),
      "connectedComponents")
  }

  test("asofJoin reproduces q_asof_join") {
    val ev = Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts_us").as("p_ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts_us").as("v_ts"))
    val api = Graft.asofJoin(purchases, views, "user_id", "p_ts", "v_ts",
        Seq("view_id", "v_ts"))
      .withColumn("gap_us", col("p_ts") - col("v_ts"))
      .select("purchase_id", "user_id", "p_ts", "view_id", "v_ts", "gap_us")
    same(api, SparkEntry.queries("q_asof_join")(spark, sf), "asofJoin")
  }

  test("sessionize reproduces q_sessionize") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("ts_us"), col("event_id"))
    val api = Graft.sessionize(ev, "user_id", "ts_us", 1800L * 1000 * 1000)
      .select(col("user_id"), col("session_seq"), col("session_start_us"),
        col("n_events"), col("duration_us"))
    val want = SparkEntry.queries("q_sessionize")(spark, sf)
    // q_sessionize orders by (ts_us, event_id); the generic orders by
    // ts_us alone — session membership only differs under exact-ts
    // ties ACROSS a gap boundary, absent in the data; compare outputs
    same(api, want, "sessionize")
  }

  test("topKPerGroup reproduces q_topn_per_group") {
    val api = Graft.topKPerGroup(Tables.orders(spark, sf), 3,
        Seq("o_custkey"), Seq(col("o_totalprice").desc, col("o_orderkey")))
      .select(col("o_custkey"), col("rank").as("rn"),
        col("o_orderkey"), col("o_totalprice"))
    same(api, SparkEntry.queries("q_topn_per_group")(spark, sf), "topKPerGroup")
  }
}
