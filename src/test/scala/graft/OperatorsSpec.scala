package graft

import org.apache.spark.sql.functions._

/** Every SparkEntry query runs at sf0.01 and returns rows with its
  * declared schema; plus targeted semantic assertions per family.
  */
class OperatorsSpec extends SparkSpec {

  test("every registered query returns rows at sf0.01") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      val n = df.limit(1).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("queries with oracle SQL expose stable column names") {
    // The driver's compare hashes name-sorted columns; a rename breaks
    // the gate silently, so pin the contract here.
    val expected = Map(
      "q1_pricing_summary" -> Set("l_returnflag", "l_linestatus", "sum_qty",
        "sum_base_price", "sum_disc_price", "sum_charge", "avg_qty",
        "avg_price", "avg_disc", "count_order"),
      "q_dedup_ngram_jaccard" -> Set("doc_a", "doc_b", "inter", "jaccard"),
      "q_ann_cosine_topk" -> Set("q_id", "rank", "vec_id", "cos"),
      "q_multimodal_meta" -> Set("doc_id", "format", "width", "height",
        "payload_len", "payload_md5"))
    expected.foreach { case (name, cols) =>
      val got = SparkEntry.queries(name)(spark, sf).columns.toSet
      assert(got == cols, s"$name columns drifted: $got")
    }
  }

  test("new-user fix marks exactly one first event per user") {
    val df = SparkEntry.queries("q_new_user_fix")(spark, sf)
    val bad = df.where(col("is_new") === 1L)
      .groupBy("user_id").count()
      .where(col("count") =!= 1).count()
    assert(bad == 0, "a user has != 1 first event")
    val users = df.select("user_id").distinct().count()
    val firsts = df.where(col("is_new") === 1L).count()
    assert(users == firsts, "some user lacks a first event")
  }

  test("sessionize: durations are non-negative and bounded by the day span") {
    val df = SparkEntry.queries("q_sessionize")(spark, sf)
    assert(df.where(col("duration_us") < 0).count() == 0)
    assert(df.where(col("n_events") < 1).count() == 0)
  }

  test("funnel stage counts are monotonically decreasing") {
    val df = SparkEntry.queries("q_event_funnel")(spark, sf)
    val bad = df.where(
      col("click_users") > col("view_users") ||
        col("purchase_users") > col("click_users")).count()
    assert(bad == 0)
  }

  test("approx province stats track the exact distincts within HLL error") {
    val exact = SparkEntry.queries("q_province_stats")(spark, sf)
      .select(col("n_name"), col("day"), col("order_ct"))
    val approx = SparkEntry.queries("q_province_stats_approx")(spark, sf)
      .select(col("n_name"), col("day"), col("order_ct_approx"))
    val bad = exact.join(approx, Seq("n_name", "day"))
      .where(abs(col("order_ct_approx") - col("order_ct")) >
        greatest(col("order_ct") * 0.15, lit(2.0))).count()
    assert(bad == 0, "HLL estimate strayed beyond 15% of the exact count")
  }

  test("user-jump events have no follow-up within 10 minutes") {
    // every flagged jump must be a view event; re-derive the count from
    // the raw table as an independent check
    val jumps = SparkEntry.queries("q_user_jump")(spark, sf)
    val views = Tables.events(spark, sf)
      .where(col("event_type") === "view").select("event_id")
    assert(jumps.join(views, "event_id").count() == jumps.count())
  }
}
