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

  test("retention: offset-0 diagonal is the cohort size and bounds every later cell") {
    val df = SparkEntry.queries("q_retention_cohorts")(spark, sf).cache()
    try {
      // every user is active on their own cohort day, so the offset-0
      // column partitions the user base exactly
      val day0Total = df.where(col("day_offset") === 0)
        .agg(sum("active_users")).first().getLong(0)
      val users = Tables.events(spark, sf).select("user_id").distinct().count()
      assert(day0Total == users, s"offset-0 sum $day0Total != $users distinct users")
      // a cohort can never retain more users than it started with
      val sizes = df.where(col("day_offset") === 0)
        .select(col("cohort_day"), col("active_users").as("cohort_size"))
      val bad = df.join(sizes, "cohort_day")
        .where(col("active_users") > col("cohort_size")).count()
      assert(bad == 0, "a retention cell exceeds its cohort size")
    } finally df.unpersist()
  }

  test("cube grand total reconciles with its leaves and with the pivot matrix") {
    val cube = SparkEntry.queries("q_cube_stats")(spark, sf).cache()
    try {
      val grand = cube.where(col("gid") === 3).select("order_ct", "amount")
        .first()
      val leafCt = cube.where(col("gid") === 0)
        .agg(sum("order_ct")).first().getLong(0)
      assert(grand.getLong(0) == leafCt,
        s"cube leaves sum to $leafCt but the grand total says ${grand.getLong(0)}")
      // the pivot spreads the same order-grain revenue over (month ×
      // region) cells — its cell total must equal the cube's grand total
      val pivot = SparkEntry.queries("q_pivot_revenue")(spark, sf)
      val cells = pivot.columns.filter(_ != "month")
        .map(c => coalesce(col(c), lit(0.0))).reduce(_ + _)
      val pivotTotal = pivot.agg(sum(cells)).first().getDouble(0)
      assert(math.abs(pivotTotal - grand.getDouble(1)) < 1e-4,
        s"pivot total $pivotTotal != cube grand total ${grand.getDouble(1)}")
    } finally cube.unpersist()
  }

  test("approx province stats track the exact distincts within HLL error") {
    // the estimate-serving form (the gate itself is now the banded
    // readout whose oracle asserts the same envelope — r18)
    val exact = SparkEntry.queries("q_province_stats")(spark, sf)
      .select(col("n_name"), col("day"), col("order_ct"))
    val approx = graft.operators.Stats.provinceStatsApproxEst(spark, sf)
      .select(col("n_name"), col("day"), col("order_ct_approx"))
    val bad = exact.join(approx, Seq("n_name", "day"))
      .where(abs(col("order_ct_approx") - col("order_ct")) >
        greatest(col("order_ct") * 0.15, lit(16.0))).count()
    assert(bad == 0, "HLL estimate strayed beyond the measured envelope")
    // and the banded GATE itself reports every group in-band here
    val gate = SparkEntry.queries("q_province_stats_approx")(spark, sf)
    assert(gate.where(!col("approx_ok")).count() == 0,
      "the banded gate flagged an out-of-band estimate on clean data")
    // negative control: the band flag compares genuinely different
    // numbers somewhere (15k-distinct o_orderkey is past HLL++'s
    // exact sparse regime), so a broken sketch COULD flip it — the
    // gate is not trivially comparing equal values
    val est = graft.api.Graft.profile(
      Tables.orders(spark, sf), Seq("o_orderkey"), approx = true)
      .select(col("n_distinct")).head.getLong(0)
    val ex = Tables.orders(spark, sf)
      .select(countDistinct(col("o_orderkey"))).head.getLong(0)
    assert(est != ex,
      s"HLL ($est) == exact ($ex) on 15k keys — the band test is vacuous here")
  }

  test("approx token quantiles track the exact percentiles within the gate's rank band") {
    // the estimate-serving form shares tokenQuantilesEstArr with the
    // banded gate (same sketch dials by construction — r18 review);
    // this spec is what keeps it LIVE (r18 ADVICE: it was unused, so
    // the shared-subplan guarantee was unrealized)
    val exact = SparkEntry.queries("q_token_quantiles")(spark, sf)
    val approx = graft.operators.Corpus.tokenQuantilesApproxEst(spark, sf)
    assert(approx.collect().map(_.getString(0)).toSeq ==
      exact.collect().map(_.getString(0)).toSeq,
      "estimate-serving form and exact #62 disagree on the group set")
    // accuracy 10000 ⟹ rank error ≤ 1e-4: on this corpus the sketch
    // quantile must sit within the exact p25..p90 HULL per source —
    // a weak but estimator-independent sanity band
    val joined = exact.select(col("source").as("_s"),
        col("p25").as("e25"), col("p90").as("e90"))
      .join(approx, col("_s") <=> col("source"))
    Seq("p25", "p50", "p75", "p90").foreach { c =>
      val strays = joined.where(col(c) < col("e25") * 0.5 ||
        col(c) > col("e90") * 1.5).count()
      assert(strays == 0, s"$c strayed far outside the exact hull")
    }
  }

  test("banded quantile gate keeps the NULL-source group (null-safe estimate join)") {
    // r18 review: the gate's estimate join must be null-safe — SQL
    // GROUP BY keeps a NULL-source group on both engines, and a plain
    // equi-join would silently drop its rows here while the DuckDB
    // oracle kept the group (hash mismatch on legal dirty data).
    // Plant a corpus with null sources and assert the gate emits the
    // same group set as the exact #62 twin, including the null group,
    // with its rank flags computed.
    val dir = java.nio.file.Files.createTempDirectory("graft_nullsrc_").toString
    Tables.documents(spark, sfTiny)
      .withColumn("source",
        when(col("doc_id") % 7 === 0, lit(null: String))
          .otherwise(col("source")))
      // an ALL-null-text source (every fetch failed): the rank-band
      // contract holds VACUOUSLY — flags TRUE on both engines, never
      // the NaN 0/0 ratio that would flip them (r19 review)
      .withColumn("text",
        when(col("source") === "src9", lit(null: String))
          .otherwise(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val approx = SparkEntry.queries("q_token_quantiles_approx")(spark, dir)
    val exact = SparkEntry.queries("q_token_quantiles")(spark, dir)
    assert(approx.where(col("source").isNull).count() == 1,
      "the NULL-source group vanished from the banded gate")
    assert(approx.count() == exact.count(),
      "gate and exact twin disagree on the group set")
    val nullRow = approx.where(col("source").isNull).collect()(0)
    Seq("p25_ok", "p50_ok", "p75_ok", "p90_ok").foreach { c =>
      assert(nullRow.getAs[Boolean](c),
        s"$c not computed in-band for the null-source group")
    }
    val vac = approx.where(col("source") === "src9").collect()
    assert(vac.length == 1 && vac(0).isNullAt(vac(0).fieldIndex("p50")),
      "all-null-text source should keep its docs row with null quantiles")
    Seq("p25_ok", "p50_ok", "p75_ok", "p90_ok").foreach { c =>
      assert(vac(0).getAs[Boolean](c),
        s"$c must hold vacuously for an all-null-text source, not NaN-flip")
    }
  }

  test("as-of join: every attached view precedes its purchase, and is the latest") {
    val df = SparkEntry.queries("q_asof_join")(spark, sf)
    // inclusive bound: v_ts <= p_ts, never after
    assert(df.where(col("v_ts") > col("p_ts")).count() == 0)
    // independent re-derivation for a sample: no OTHER view of the same
    // user may fall strictly between the attached view and the purchase
    val views = Tables.events(spark, sf).where(col("event_type") === "view")
      .select(col("user_id").as("vu"), col("ts_us"))
    val gaps = df.where(col("v_ts").isNotNull).limit(200)
      .join(views, col("user_id") === col("vu") &&
        col("ts_us") > col("v_ts") && col("ts_us") <= col("p_ts"))
    assert(gaps.count() == 0, "a later view than the attached one exists before the purchase")
    // purchases with no prior view keep NULL view columns (left as-of)
    val p = Tables.events(spark, sf).where(col("event_type") === "purchase").count()
    assert(df.count() == p, "as-of must keep every purchase exactly once")
  }

  test("province rollup: subtotals reconcile with the flat province stats") {
    val flat = SparkEntry.queries("q_province_stats")(spark, sf)
    val roll = SparkEntry.queries("q_province_rollup")(spark, sf)
    // grand total row equals the sum over the flat result
    val grand = roll.where(col("n_name") === "ALL" && col("day") === "ALL")
      .select("order_ct").collect()(0).getLong(0)
    val flatSum = flat.agg(sum("order_ct")).collect()(0).getLong(0)
    assert(grand == flatSum, s"grand total $grand != flat sum $flatSum")
    // finest-grain rows match the flat query one-for-one
    val fine = roll.where(col("n_name") =!= "ALL" && col("day") =!= "ALL")
    assert(fine.count() == flat.count())
    assert(fine.join(flat, Seq("n_name", "day"))
      .where(fine("order_ct") =!= flat("order_ct")).count() == 0)
  }

  test("capped jaccard equals the uncapped operator wherever the cap does not bind") {
    // max shingle df at test SF is 25 < 64, so the two operators must
    // agree exactly — the cap only changes behavior on corpora with
    // boilerplate shingles (docs/SCALING.md probe 3)
    val capped = SparkEntry.queries("q_dedup_ngram_jaccard_capped")(spark, sf)
    val plain = SparkEntry.queries("q_dedup_ngram_jaccard")(spark, sf)
    assert(capped.exceptAll(plain).count() == 0 &&
      plain.exceptAll(capped).count() == 0,
      "capped jaccard diverged from #26 although the cap does not bind here")
  }

  test("dup clusters: labels are fixpoints and cover exactly the paired docs") {
    val pairs = SparkEntry.queries("q_dedup_ngram_jaccard")(spark, sf)
      .select("doc_a", "doc_b")
    val clusters = SparkEntry.queries("q_dup_clusters")(spark, sf)
    // every edge endpoint is labeled, and both endpoints share a cluster
    val lab = clusters.select(col("doc_id"), col("cluster_id"))
    val mismatched = pairs
      .join(lab.select(col("doc_id").as("doc_a"), col("cluster_id").as("ca")), "doc_a")
      .join(lab.select(col("doc_id").as("doc_b"), col("cluster_id").as("cb")), "doc_b")
      .where(col("ca") =!= col("cb")).count()
    assert(mismatched == 0, "an edge spans two clusters — propagation not at fixpoint")
    // cluster_id is the min member id of its cluster
    val bad = clusters.groupBy("cluster_id").agg(min("doc_id").as("mn"))
      .where(col("cluster_id") =!= col("mn")).count()
    assert(bad == 0, "cluster_id must equal the minimum member doc_id")
  }

  test("CJK keyword tokenization: Han runs expand to character bigrams") {
    import spark.implicits._
    val docs = Seq(
      (1L, "深度学习模型 训练"),
      (2L, "abc中文def"),
      (3L, "山 hello world"),
      (4L, "AI赋能2024")
    ).toDF("doc_id", "text")
    val words = graft.operators.Stats
      .explodeCjkWords(docs, "text", Seq("doc_id"))
      .select("doc_id", "word").as[(Long, String)]
      .collect().toSeq.sorted
    val expect = (
      Seq("深度", "度学", "学习", "习模", "模型", "训练").map(1L -> _) ++
      Seq("abc", "中文", "def").map(2L -> _) ++
      Seq("山", "hello", "world").map(3L -> _) ++
      Seq("AI", "赋能", "2024").map(4L -> _)).sorted
    assert(words == expect)
  }

  test("CJK keyword stats equal #12 on the Han-free test corpus") {
    // the corpus has zero Han chars (checked in generation), so every
    // token is a single non-Han run passing through whole — the CJK
    // variant must reduce exactly to whitespace tokenization
    val cjk = SparkEntry.queries("q_keyword_stats_cjk")(spark, sf)
    val plain = SparkEntry.queries("q_keyword_stats")(spark, sf)
    assert(cjk.exceptAll(plain).count() == 0 &&
      plain.exceptAll(cjk).count() == 0)
  }

  test("cdc route drops deletes and routes survivors like #13") {
    val cdc = SparkEntry.queries("q_cdc_route")(spark, sf)
    assert(cdc.where(col("op") === "delete").isEmpty, "deletes must not propagate")
    assert(cdc.where(!col("op").isin("insert", "update")).isEmpty)
    val cfg = SparkEntry.queries("q_config_route")(spark, sf)
      .where(pmod(col("event_id"), lit(10L)) =!= 0)
    assert(cdc.select("event_id", "event_type", "sink_table", "sink_type")
      .exceptAll(cfg.select("event_id", "event_type", "sink_table", "sink_type"))
      .isEmpty && cdc.count() == cfg.count(),
      "non-delete records must route exactly as q_config_route")
  }

  test("hash sample: ~10% kept, deterministic, and per-stratum unbiased") {
    val docs = Tables.documents(spark, sf)
    val samp = SparkEntry.queries("q_sample_hash")(spark, sf)
    val frac = samp.count().toDouble / docs.count()
    assert(math.abs(frac - 0.10) < 0.02, s"corpus-wide fraction $frac")
    // deterministic: a second invocation keeps the identical set
    assert(samp.exceptAll(SparkEntry.queries("q_sample_hash")(spark, sf)).isEmpty)
    // no stratum is wildly over/under-sampled (hash independent of stratum)
    val bad = samp.groupBy("source").count()
      .join(docs.groupBy("source").agg(count(lit(1)).as("n")), "source")
      .where(col("count").cast("double") / col("n") > 0.25 ||
        col("count").cast("double") / col("n") < 0.02)
    assert(bad.isEmpty, "a stratum's sample fraction left [2%, 25%]")
  }

  test("pack sequences equal a straight-line reference packing") {
    // Recompute #106 sequentially per shard on collected sf0.01 rows
    // (sf0.01 because its shards span MULTIPLE packs with straddling
    // docs — at sf0.001 every shard fits pack 0 and the boundary
    // logic would pass untested): same shard hash, same whitespace
    // token rule, same concat-and-chunk boundaries — the distributed
    // window must reproduce it exactly.
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id").cast("long"), col("text")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1))))
    val b = 512L
    def tokens(t: Option[String]): Long =
      t.map(_.split(' ').count(_.nonEmpty).toLong).getOrElse(0L)
    def shard(id: Long): Long = {
      val folded = id ^ (id >> 31)
      val m = ((folded % 2147483648L) + 2147483648L) % 2147483648L
      (m * 1103515245L % 2147483648L) % 16L
    }
    val expected = docs.groupBy { case (id, _) => shard(id) }.toSeq
      .flatMap { case (sh, rows) =>
        var cum = 0L
        rows.sortBy(_._1).map { case (_, t) =>
          val n = tokens(t)
          val pack = cum / b
          val split = n > 0 && (cum + n - 1) / b > pack
          cum += n
          (sh, pack, n, split)
        }
      }
      .groupBy { case (sh, pack, _, _) => (sh, pack) }.toSeq
      .map { case ((sh, pack), rs) =>
        (sh, pack, rs.size.toLong, rs.map(_._3).sum,
          rs.count(_._4).toLong)
      }.sorted
    val got = SparkEntry.queries("q_pack_sequences")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq.sorted
    assert(got == expected)
    // conservation: every doc starts in exactly one pack
    assert(got.map(_._3).sum == docs.length.toLong)
    assert(got.map(_._4).sum == docs.map(d => tokens(d._2)).sum)
    // the corpus must actually exercise boundaries: multiple packs per
    // shard and straddling docs (else this test passes vacuously)
    assert(got.map(_._2).max > 0, "no shard spans multiple packs")
    assert(got.map(_._5).sum > 0, "no doc straddles a pack boundary")
  }

  test("pii scrub: planted emails and phones redact with exact counts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact alice.smith+spam@example.co.uk or call +1-555-123-4567 now"),
      (2L, "two mails a@b.io c.d@e.org and digits 123456789 plus 1234-5678-90"),
      (3L, "clean text with no pii at all"),
      (4L, "edge: not-an-email @@ and short 1234567")
    ).toDF("doc_id", "text")
    val got = graft.operators.Text.piiScrubbed(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 1L, "contact <EMAIL> or call <PHONE> now"),
      (2L, 2L, 2L, "two mails <EMAIL> <EMAIL> and digits <PHONE> plus <PHONE>"),
      (3L, 0L, 0L, "clean text with no pii at all"),
      (4L, 0L, 0L, "edge: not-an-email @@ and short 1234567")))
  }

  test("contamination: no benchmark doc reported, verdicts match counts") {
    val cont = SparkEntry.queries("q_contamination")(spark, sf)
    assert(cont.where(pmod(col("doc_id"), lit(97L)) === 0).isEmpty,
      "benchmark docs must not appear in the contamination report")
    assert(cont.where(col("contaminated") =!= (col("n_overlap") >= 5)).isEmpty)
    assert(cont.where(col("n_overlap") < 1).isEmpty)
  }

  test("bloom contamination verdicts equal the exact-broadcast flavor") {
    import spark.implicits._
    // the no-false-negatives claim, end to end: prefilter + confirm
    // must reproduce #58 row for row
    val exact = SparkEntry.queries("q_contamination")(spark, sf)
    val bloom = SparkEntry.queries("q_contamination_bloom")(spark, sf)
    assert(bloom.exceptAll(exact).isEmpty && exact.exceptAll(bloom).isEmpty,
      "bloom-prefiltered verdicts diverged from the exact pipeline")
    // an empty benchmark yields the empty verdict set, not a crash
    // (the aggregate's NULL sketch path)
    val empty = graft.api.Graft.contaminationBloom(
      Tables.documents(spark, sfTiny),
      Tables.documents(spark, sfTiny).where(lit(false)),
      "doc_id", "text")
    assert(empty.isEmpty, "empty benchmark must contaminate nothing")
    // facade == gated query on the same slices
    val docs = Tables.documents(spark, sfTiny)
    val isBench = pmod(col("doc_id"), lit(97L)) === 0
    val viaFacade = graft.api.Graft.contaminationBloom(
      docs.where(!isBench), docs.where(isBench), "doc_id", "text")
      .select(col("id").as("doc_id"), col("n_overlap"), col("contaminated"))
    val gated = SparkEntry.queries("q_contamination_bloom")(spark, sfTiny)
    assert(viaFacade.exceptAll(gated).isEmpty &&
      gated.exceptAll(viaFacade).isEmpty)
  }

  test("struct-min argmin equals the window argmin on random data with ties") {
    // #94's decorrelation claim, on data the gate never sees: heavy
    // value ties (10 distinct v over 2000 rows) force the suppkey-style
    // tie-break to decide, and both formulations must land on the same
    // row for every group
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(7)
    val df = Seq.fill(2000)((rnd.nextInt(50).toLong, rnd.nextInt(20).toLong,
      rnd.nextInt(10).toDouble)).toDF("grp", "id", "v")
    val viaAgg = df.groupBy("grp")
      .agg(min(struct(col("v"), col("id"))).as("b"))
      .select(col("grp"), col("b.v").as("v"), col("b.id").as("id"))
    val w = Window.partitionBy("grp").orderBy(col("v"), col("id"))
    val viaWin = df.withColumn("rk", row_number().over(w))
      .where(col("rk") === 1).select("grp", "v", "id")
    assert(viaAgg.exceptAll(viaWin).isEmpty && viaWin.exceptAll(viaAgg).isEmpty,
      "struct-min and window argmin disagree")
  }

  test("profile counts nulls correctly (the orders gate has none)") {
    import spark.implicits._
    val df = Seq[(Option[Long], String)](
      (Some(1L), "a"), (None, "b"), (Some(3L), null),
      (Some(3L), "a"), (None, null)).toDF("x", "s")
    val rows = graft.api.Graft.profile(df, Seq("x", "s")).collect()
      .map(r => r.getString(0) -> r).toMap
    val x = rows("x"); val s = rows("s")
    assert(x.getLong(1) == 5 && x.getLong(2) == 3 && x.getLong(3) == 2,
      s"x: rows/nonnull/distinct ${x.toSeq}")
    assert(x.getDouble(4) == 1.0 && x.getDouble(5) == 3.0)
    assert(s.getLong(1) == 5 && s.getLong(2) == 3 && s.getLong(3) == 2,
      s"s: rows/nonnull/distinct ${s.toSeq}")
    assert(s.isNullAt(4) && s.isNullAt(5),
      "string columns must profile null min/max")
  }

  test("mixture sample keeps ~bp/10000 of a large stratum") {
    import spark.implicits._
    val n = 100000L
    val df = spark.range(n).select(col("id"), lit("a").as("src"))
    for (bp <- Seq(1000L, 2500L, 9000L)) {
      val kept = graft.api.Graft
        .mixtureSample(df, "id", "src", Map("a" -> bp)).count()
      val want = n * bp / 10000.0
      assert(math.abs(kept - want) <= 0.02 * n,
        s"bp=$bp kept $kept, want ~$want")
    }
  }

  test("quality and langid survive empty and whitespace-only docs") {
    // under ANSI an unguarded ratio would throw DIVIDE_BY_ZERO and one
    // empty doc would kill the whole 100 TB quality pass; the guarded
    // form yields NULL ratios (= what DuckDB computes for x/0)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    Seq((0L, "", "en", "src0", 0L), (1L, "   ", "en", "src0", 3L),
      (2L, "real text here now", "en", "src0", 18L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
    val q = SparkEntry.queries("q_text_quality")(spark, dir).collect()
    val byId = q.map(r => r.getLong(0) -> r).toMap
    assert(byId(0L).isNullAt(2) && byId(1L).isNullAt(2),
      "zero-token docs must carry null mean_word_len")
    assert(byId(0L).isNullAt(5), "empty doc must carry a null score")
    // the whitespace-only doc DOES score (0.4·(1−punct) + least-skipped
    // null stopword term — both engines skip nulls in least identically)
    assert(!byId(1L).isNullAt(5) && !byId(2L).isNullAt(5))
    assert(SparkEntry.queries("q_text_langid")(spark, dir).count() == 3)
    // the calibration analytic must drop the null-score doc, not bucket it
    assert(SparkEntry.queries("q_quality_dup_calibration")(spark, dir)
      .agg(sum("docs")).collect().head.getLong(0) == 2)
  }

  test("unigram-LM quality ranks common prose above rare gibberish") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_lm").toString
    // "the cat sat" words repeat across docs (high corpus probability);
    // doc 2's tokens are corpus-unique (probability 1/T each); doc 3
    // is empty and must surface with n_tokens=0 and a NULL score
    Seq(
      (0L, "the cat sat on the mat the cat sat again", "en", "s0", 40L),
      (1L, "the cat sat on the mat once more today yes", "en", "s0", 42L),
      (2L, "zq9x kvw7 jjplm qqqzz wxyzt", "en", "s0", 27L),
      (3L, "", "en", "s0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
    val rows = SparkEntry.queries("q_quality_lm")(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.size == 4, "every document must surface exactly once")
    assert(rows(3L).getLong(1) == 0L && rows(3L).isNullAt(2),
      "token-less doc must carry n_tokens=0 and NULL score")
    val common = rows(0L).getDouble(2)
    val gibberish = rows(2L).getDouble(2)
    assert(common > gibberish,
      s"common prose ($common) must outscore corpus-unique gibberish ($gibberish)")
    // partitioning-independence of the decimal sum: 3-way repartition
    // of the same corpus must give bit-identical scores (the §6a claim)
    val base = SparkEntry.queries("q_quality_lm")(spark, sf).collect().toSeq
    val p = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try {
      val alt = SparkEntry.queries("q_quality_lm")(spark, sf).collect().toSeq
      assert(alt == base, "avg_logprob drifted under a different partitioning")
    } finally spark.conf.set("spark.sql.shuffle.partitions", p)
  }

  test("tfidf surfaces source-concentrated terms, never universal ones") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tfidf").toString
    // "shared" appears in EVERY doc -> ln(N/df)=ln(1)=0 -> can never
    // rank; "alpha" is concentrated in src_a and must head its list
    Seq(
      (0L, "shared alpha alpha alpha words here", "en", "src_a", 35L),
      (1L, "shared alpha alpha other words too", "en", "src_a", 34L),
      (2L, "shared beta beta beta words here", "en", "src_b", 32L),
      (3L, "shared beta gamma other words too", "en", "src_b", 33L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
    val out = SparkEntry.queries("q_tfidf_terms")(spark, dir)
    assert(out.where(col("word") === "shared" && col("tfidf") > 0.0)
      .count() == 0, "a word in every doc has idf 0 and must not score")
    val topA = out.where(col("source") === "src_a" && col("rk") === 1)
      .select("word").as[String].collect()
    assert(topA.toSeq == Seq("alpha"),
      s"src_a's top term must be its concentrated word, got ${topA.toSeq}")
    // rank is dense 1..k per source on the real corpus
    val bad = SparkEntry.queries("q_tfidf_terms")(spark, sf)
      .groupBy("source").agg(max("rk").as("mx"), count(lit(1)).as("n"))
      .where(col("mx") =!= col("n")).count()
    assert(bad == 0, "rk must be dense per source")
  }

  test("events loader normalizes every ts encoding to the same ts_us") {
    import spark.implicits._
    // the driver's current files (timestamp[us] NTZ) already gate the
    // NTZ branch and the nasty ev corpus the nanos branch; this pins
    // the third — adjusted-UTC micros (TimestampType) — and that the
    // three agree on the same instant
    val dir = java.nio.file.Files.createTempDirectory("graft_tsenc").toString
    val usec = 1704067207179575L // 2024-01-01T00:00:07.179575Z
    Seq((1L, new java.sql.Timestamp(usec / 1000), 7L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      // java.sql.Timestamp keeps millis; restore the micros precision
      .withColumn("ts", timestamp_micros(lit(usec)))
      .write.mode("overwrite").parquet(dir + "/events.parquet")
    val got = Tables.events(spark, dir).select("ts_us").as[Long].head()
    assert(got == usec, s"adjusted-micros branch: got $got, want $usec")
    // and the NTZ branch on the real corpus yields epoch micros that
    // DuckDB's epoch_us(ts) reproduces (spot-pinned value range)
    val sample = Tables.events(spark, sfTiny)
      .agg(min("ts_us"), max("ts_us")).head
    assert(sample.getLong(0) > 1500000000000000L &&
      sample.getLong(1) < 2000000000000000L,
      "NTZ branch must land in the epoch-micros range")
  }

  test("rate outliers: planted bot and human score exactly; singles keep NULL gap") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_rate").toString
    val minUs = 60000000L
    val base = 1704067200000000L // aligned to a minute boundary
    // user 1: a bot — 30 events inside one minute, two at the SAME
    // microsecond (gap 0); user 2: a human — 3 events minutes apart;
    // user 3: a single event (no gap defined)
    val bot = (0 until 30).map(i =>
      (100L + i, base + math.min(i, 28) * 1000L, 1L, "view", 0.0, "{}"))
    val human = Seq(
      (200L, base, 2L, "view", 0.0, "{}"),
      (201L, base + 5 * minUs, 2L, "click", 0.0, "{}"),
      (202L, base + 11 * minUs, 2L, "view", 0.0, "{}"))
    val single = Seq((300L, base, 3L, "view", 0.0, "{}"))
    (bot ++ human ++ single)
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir + "/events.parquet")
    val out = SparkEntry.queries("q_user_rate_outliers")(spark, dir)
      .orderBy("user_id")
      .as[(Long, Long, Long, Option[Long], Double)].collect().toSeq
    assert(out == Seq(
      (1L, 30L, 1L, Some(0L), 30.0), // 29 distinct ts + one 0-gap twin
      (2L, 3L, 3L, Some(5 * minUs), 1.0),
      (3L, 1L, 1L, None, 1.0)), s"planted rate metrics wrong: $out")
  }

  test("user-jump events have no follow-up within 10 minutes") {
    // every flagged jump must be a view event; re-derive the count from
    // the raw table as an independent check
    val jumps = SparkEntry.queries("q_user_jump")(spark, sf)
    val views = Tables.events(spark, sf)
      .where(col("event_type") === "view").select("event_id")
    assert(jumps.join(views, "event_id").count() == jumps.count())
  }

  test("chunkRows boundary cases: short doc, exact boundary, tail, dirty rows") {
    import spark.implicits._
    def chunks(text: String, window: Int, stride: Int) =
      operators.Corpus.chunkRows(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text",
        window, stride)
        .orderBy("chunk_id")
        .select("chunk_id", "start_tok", "n_tokens", "chunk_text")
        .as[(Long, Long, Long, String)].collect().toSeq
    val words = (1 to 100).map(i => s"w$i")
    def doc(n: Int) = words.take(n).mkString(" ")

    // doc shorter than one window: exactly one full-doc chunk
    assert(chunks(doc(10), 64, 48) ==
      Seq((0L, 0L, 10L, doc(10))))
    // exactly one window: still one chunk (no empty tail at start=stride)
    assert(chunks(doc(64), 64, 48) == Seq((0L, 0L, 64L, doc(64))))
    // one past a stride boundary: second chunk starts at 48, tail short
    val c65 = chunks(doc(65), 64, 48)
    assert(c65.map(c => (c._1, c._2, c._3)) ==
      Seq((0L, 0L, 64L), (1L, 48L, 17L)))
    assert(c65(1)._4 == words.slice(48, 65).mkString(" "))
    // overlap contract: chunk k covers [k*stride, k*stride+window),
    // and chunking stops once a window reaches the end of the doc —
    // start 96 would be a pure suffix of chunk 1 and must not emit
    val c100 = chunks(doc(100), 64, 48)
    assert(c100.map(c => (c._1, c._2, c._3)) ==
      Seq((0L, 0L, 64L), (1L, 48L, 52L)))
    assert(c100(1)._4 == words.slice(48, 100).mkString(" "))
    // stride == window: non-overlapping blocks, every token exactly once
    val blocks = chunks(doc(100), 40, 40)
    assert(blocks.map(c => (c._2, c._3)) ==
      Seq((0L, 40L), (40L, 40L), (80L, 20L)))
    assert(blocks.map(_._4).mkString(" ") == doc(100))
    // dirty rows: NULL / empty / whitespace-only produce no chunks;
    // runs of spaces don't make empty tokens
    val dirty = Seq((1L, null: String), (2L, ""), (3L, "   "),
      (4L, "  a   b  ")).toDF("doc_id", "text")
    val got = operators.Corpus.chunkRows(dirty, "doc_id", "text", 4, 4)
      .select("doc_id", "n_tokens", "chunk_text")
      .as[(Long, Long, String)].collect().toSeq
    assert(got == Seq((4L, 2L, "a b")))
    // loud guards: bad dials and reserved output columns
    intercept[IllegalArgumentException] {
      operators.Corpus.chunkRows(dirty, "doc_id", "text", 0, 1) }
    intercept[IllegalArgumentException] {
      operators.Corpus.chunkRows(dirty, "doc_id", "text", 4, 5) }
    intercept[IllegalArgumentException] {
      operators.Corpus.chunkRows(
        dirty.withColumn("chunk_id", lit(1)), "doc_id", "text", 4, 4) }
  }

  test("curation verdicts reconcile exactly with the funnel dashboard") {
    val verdicts = SparkEntry.queries("q_curation_verdicts")(spark, sf)
      .localCheckpoint(true)
    val funnel = SparkEntry.queries("q_curation_funnel")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // every doc gets exactly one verdict row
    assert(verdicts.count() == funnel(0L))
    // survivors at stage k == docs still alive past gate k: the
    // dashboard is exactly the verdict table's contraction
    (1L to 6L).foreach { k =>
      val alive = verdicts.where(
        col("keep") || col("drop_stage") > k).count()
      assert(alive == funnel(k),
        s"stage $k: verdicts say $alive alive, funnel says ${funnel(k)}")
    }
    // kept docs carry no reason; dropped docs carry exactly one
    assert(verdicts.where(col("keep") &&
      (col("drop_stage").isNotNull || col("drop_reason").isNotNull))
      .count() == 0)
    assert(verdicts.where(!col("keep") &&
      (col("drop_stage").isNull || col("drop_reason").isNull))
      .count() == 0)
    // reason labels match their stage
    val pairs = verdicts.where(!col("keep"))
      .select("drop_stage", "drop_reason").distinct().collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSet
    val legal = Set(1L -> "lang", 2L -> "quality", 3L -> "repetition",
      4L -> "blocklist", 5L -> "exact_dup",
      6L -> "benchmark", 6L -> "contaminated")
    assert(pairs.subsetOf(legal), s"illegal stage/reason pairs: $pairs")
  }

  test("chunk dedup: copies drop to the lowest keeper; case folds; within-doc repeats drop") {
    import spark.implicits._
    val text = (1 to 100).map(i => s"tok$i").mkString(" ")
    val df = Seq((10L, text), (20L, text), (30L, text.toUpperCase))
      .toDF("doc_id", "text")
    val drops = operators.Corpus.chunkDedupRows(df, "doc_id", "text", 64, 48)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // 100 tokens at 64/48 → 2 chunks per doc; docs 20 and 30 (the
    // upper-cased copy — normalization folds case) drop every chunk
    // onto doc 10's matching chunk, in groups of 3
    assert(drops == Seq(
      (20L, 0L, 10L, 0L, 3L), (20L, 1L, 10L, 1L, 3L),
      (30L, 0L, 10L, 0L, 3L), (30L, 1L, 10L, 1L, 3L)))
    // a repeated block INSIDE one doc dedups against itself: with
    // stride = window = 4 both chunks read "a b c d"
    val rep = Seq((5L, "a b c d a b c d")).toDF("doc_id", "text")
    val d2 = operators.Corpus.chunkDedupRows(rep, "doc_id", "text", 4, 4)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(d2 == Seq((5L, 1L, 5L, 0L, 2L)))
  }
}
