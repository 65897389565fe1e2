package graft

/** Physical-plan assertions (SURVEY.md §5): dims broadcast, no
  * accidental cartesian products, candidate joins stay equi-keyed.
  * These guard the 100 TB properties that row-count gates can't see.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("ANN index builds are exchange-free: ivfIndex / ivfResiduals / pqEncode (r20)") {
    // the r20 honesty pass: these three previously groupBy'd unique
    // ids (contracting nothing — the corpus re-shuffled per build,
    // pqEncode twice); they now assign inside ONE map-side projection
    // over a collected artifact literal. This pin keeps them that way.
    import graft.api.Graft
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cents = emb.where(col("vec_id") % 47 === 0)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"))
    val idxPlan = Graft.ivfIndex(emb, "vec_id", "v", cents, "cent_id", "cv")
      .queryExecution.executedPlan.toString
    assert(!idxPlan.contains("Exchange") && !idxPlan.contains("Join"),
      s"ivfIndex must be a pure scan->project:\n$idxPlan")
    val resPlan = Graft.ivfResiduals(emb, "vec_id", "v", cents,
        "cent_id", "cv")
      .queryExecution.executedPlan.toString
    assert(!resPlan.contains("Exchange") && !resPlan.contains("Join"),
      s"ivfResiduals must be a pure scan->project (residual inline):\n$resPlan")
    val books = Graft.pqCodebooks(emb, "vec_id", "v", 64, 8, 4, 1)
    val encPlan = Graft.pqEncode(emb, "vec_id", "v", books)
      .queryExecution.executedPlan.toString
    assert(!encPlan.contains("Exchange") && !encPlan.contains("Join"),
      s"pqEncode must be a pure scan->project:\n$encPlan")
  }

  test("resize gate is declarative: no object boundary, no decode (r21)") {
    // #153 — the gate emits the metadata-only resize plan; before r21
    // it ran the full typed decode stage (MapPartitions over
    // MediaRecord objects, a tw·th·3 resample buffer + md5 per row)
    // and dropped the digest column — ~150 KB/row of dead allocation
    // Spark could not prune through the object boundary. The plan must
    // stay scan -> project -> sort, whole-stage codegen throughout.
    val p = plan("q_multimodal_resize")
    assert(!p.contains("MapPartitions") && !p.contains("DeserializeToObject"),
      s"resize gate reverted to the typed decode path:\n$p")
    assert(!"Exchange hashpartitioning".r.findFirstIn(p).isDefined,
      s"resize gate should have no hash exchange (only the sort range):\n$p")
  }

  test("order enrichment broadcasts all six dimension joins") {
    val p = plan("q_order_enriched")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).size
    assert(broadcasts >= 6, s"expected >=6 broadcast joins, got $broadcasts:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("interval joins plan as equi-joins with range residuals, not cartesian") {
    Seq("q_order_wide", "q_payment_wide", "q_event_interval_join").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q degenerated to cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin") || q == "q_event_interval_join",
        s"$q uses nested-loop join")
    }
  }

  test("domain stats drops the blocklist via broadcast ANTI join, map-side") {
    val p = plan("q_domain_stats")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"blocklist drop must be a broadcast left-anti join:\n$p")
    // the corpus side must not shuffle FOR THE DROP: the only exchanges
    // are the fingerprint window + the domain rollup
    assert(!p.contains("SortMergeJoin"), s"blocklist drop shuffled the corpus:\n$p")
  }

  test("substring dedup never forms a pair grain: joins are flag-lookups") {
    val p = plan("q_dedup_substring")
    // window-hash flag join + the two per-doc rollup joins; no
    // corpus×corpus self-join shape (that would be the df² pair grain
    // this operator exists to avoid)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"substring dedup degenerated to an all-pairs shape:\n$p")
  }

  test("langid-ngram classify side never shuffles the corpus (r17 rework)") {
    // VERDICT r16 item 2: the pre-r17 form exploded a (doc, gram)
    // frame and shuffled it twice (once to count, once to rank). The
    // per-row profile expression leaves exactly THREE hash exchanges:
    // the fit's (lang, gram) count, the fit's per-lang rank window,
    // and the one-row-per-doc argmin contraction — nothing
    // corpus-sized crosses a shuffle, at any scale.
    val p = plan("q_text_langid_ngram")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles == 3, s"expected 3 hash exchanges, got $shuffles:\n$p")
    assert(p.contains("char_ngram_profile") && p.contains("oop_distance"),
      s"classify side must use the codegen'd profile + fold:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"corpus-sized join crept into langid:\n$p")
    assert(p.contains("partial_min_by"),
      s"the argmin must contract map-side before its exchange:\n$p")
  }

  test("C4 and Gopher rule batteries stay map-only: no hash exchange, no join") {
    Seq("q_c4_rules", "q_gopher_rules", "q_gopher_repetition").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Exchange hashpartitioning"),
        s"$q must not shuffle (per-row projection):\n$p")
      assert(!p.contains("Join"), s"$q must not join:\n$p")
    }
  }

  test("crossmodal top-k broadcasts the query side; the media corpus never shuffles pre-rank") {
    val p = plan("q_crossmodal_topk")
    // the 10-query text tower rides a BroadcastNestedLoopJoin into the
    // linear media scan (the #30 exact-baseline shape); a
    // SortMergeJoin/CartesianProduct here would shuffle or square the
    // corpus side
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"query side must broadcast into the media scan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"crossmodal degenerated:\n$p")
  }

  test("image phash gate is one signature-keyed window, no joins") {
    val p = plan("q_image_phash_dedup")
    assert(!p.contains("Join"),
      s"the exact phash gate must not join (window on the 8-byte hash):\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1,
      s"expected a single phash-keyed exchange, got $exchanges:\n$p")
  }

  test("knn label purity broadcasts the probe sample; corpus scan stays linear") {
    val p = plan("q_knn_label_purity")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"probe sample must broadcast into the corpus scan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"purity scan degenerated:\n$p")
  }

  test("DSIR: the 256-row bucket model broadcasts, the corpus never joins itself") {
    val p = plan("q_dsir_weights")
    assert(p.contains("BroadcastHashJoin"),
      s"the bucket model must broadcast into the tf join:\n$p")
    assert(!p.contains("CartesianProduct"), s"dsir degenerated:\n$p")
  }

  test("source overlap contracts to fp grain before pairing: two corpus scans, no doc-grain self-join") {
    val p = plan("q_source_overlap")
    // one scan feeds the fp contraction, one the per-source totals;
    // a doc-grain self-join (the docs² shape this operator avoids)
    // would show as a third corpus scan or a corpus-side SMJ
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans <= 2, s"expected <=2 corpus scans, got $scans:\n$p")
    assert(!p.contains("CartesianProduct"), s"overlap degenerated:\n$p")
  }

  test("LM buckets assign map-side from broadcast cutoffs, never a per-lang window") {
    val p = plan("q_lm_buckets")
    // the scale trap this operator avoids: an ntile window over a
    // language partition would sort a whole language in ONE task at
    // 100 TB ("Window" = the exec node; percentile the AGGREGATE is
    // the sanctioned lang-grain shape)
    assert(!p.contains("Window"),
      s"bucket assignment must not be a window function:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"lang-grain cutoffs must broadcast:\n$p")
  }

  test("ngram contamination joins on window hashes, never a pair grain") {
    val p = plan("q_contamination_ngram")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"contamination degenerated to an all-pairs shape:\n$p")
  }

  test("BPE tokenize encodes the dictionary: broadcast joins, text pruned at the scan") {
    val p = plan("q_bpe_tokenize")
    assert(!p.contains("CartesianProduct"))
    // dictionary→counts and perDoc→docs rejoins both broadcast the
    // contracted side; the corpus-sized word stream never sort-merges
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).size
    assert(broadcasts >= 2, s"expected >=2 broadcast joins:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(text)]"),
      s"text non-null filter must reach the parquet scan:\n$p")
  }

  test("ANN recall composes the gate shapes: query side broadcasts, top-k prunes map-side") {
    val p = plan("q_ann_recall")
    assert(!p.contains("CartesianProduct"))
    // both branches broadcast their bounded side (probe queries /
    // centroids) against a LINEAR corpus scan
    assert(p.contains("BroadcastNestedLoopJoin BuildRight") ||
      p.contains("BroadcastHashJoin"), s"bounded side must broadcast:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"per-query top-k must prune before the exchange:\n$p")
  }

  test("no registered query degenerates to CartesianProduct") {
    SparkEntry.queries.keys.foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q contains CartesianProduct")
    }
  }

  test("ANN brute force broadcasts the query side, never the corpus") {
    // BroadcastNestedLoopJoin is the sanctioned plan here (10-row query
    // set against the corpus — linear, not quadratic); the broadcast
    // must be the small side.
    val p = plan("q_ann_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"expected broadcast of the query set:\n$p")
  }

  test("PQ gates: codebook and query sides broadcast, corpus never shuffle-joins") {
    // #177/#178: the seed codebook and the 10-query set ride broadcast
    // joins onto the corpus scan; the only exchanges are the encode
    // aggregate and the per-query window — a corpus-sized join side
    // would mean the compressed index is being shuffled for nothing
    for (q <- Seq("q_ann_pq", "q_pq_code_usage")) {
      val p = plan(q)
      assert(p.contains("BroadcastNestedLoopJoin"),
        s"$q: expected broadcast codebook/query joins:\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
        s"$q: corpus-sized shuffle join crept in:\n$p")
    }
  }

  test("rank top-k prunes map-side before the exchange (WindowGroupLimit)") {
    // docs/SCALING.md claims the `rank <= k` filter bounds the rank
    // shuffle to k rows per group per map task — pin the optimizer
    // actually planting WindowGroupLimit in both the gated ANN top-k
    // and the generic facade, instead of trusting the claim
    val p1 = plan("q_ann_cosine_topk")
    assert(p1.contains("WindowGroupLimit"),
      s"q_ann_cosine_topk must prune map-side before the rank exchange:\n$p1")
    val p2 = graft.api.Graft.topKPerGroup(
        Tables.events(spark, sf), 3, Seq("event_type"),
        Seq(org.apache.spark.sql.functions.col("ts_us").desc,
          org.apache.spark.sql.functions.col("event_id")))
      .queryExecution.executedPlan.toString
    assert(p2.contains("WindowGroupLimit"),
      s"topKPerGroup must prune map-side before the rank exchange:\n$p2")
  }

  test("candidate dedup joins shuffle on the candidate key (equi join)") {
    Seq("q_dedup_ngram_jaccard", "q_dedup_minhash_lsh", "q_dedup_simhash",
      "q_dedup_minhash_gated", "q_dedup_simhash_gated",
      "q_dedup_embedding", "q_dedup_incremental").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q is not candidate-join shaped:\n$p")
    }
  }

  test("churn anti-join pushes the date cutoff into the orders scan") {
    val p = plan("q_customers_inactive")
    assert(p.contains("LeftAnti"), s"expected a left anti join:\n$p")
    assert("PushedFilters:[^\\]]*GreaterThanOrEqual\\(o_orderdate".r
      .findFirstIn(p).isDefined,
      s"date cutoff must reach the orders parquet scan:\n$p")
  }

  test("cube expands AFTER the order-grain pre-agg, not over the fact rows") {
    // HashAggregate(keys=[l_orderkey...]) below Expand in the tree =
    // the 4-way grouping-set multiply sees order grain, never lineitem
    val p = plan("q_cube_stats")
    assert(p.contains("Expand"), s"cube must plan an Expand:\n$p")
    val expandIdx = p.indexOf("Expand")
    val preAggIdx = p.indexOf("l_orderkey", expandIdx)
    assert(preAggIdx > 0,
      s"expected the per-order pre-agg beneath the Expand:\n$p")
  }

  test("as-of join plans with zero joins — one window pass, one shuffle") {
    // the union trick means the plan must contain a Window over the
    // user_id exchange and NO join operator at all; a join-shaped as-of
    // would fan out pairs and die at 100 TB. The view tie-break is
    // fused into the as-of window's ordering (probe 14), so the event
    // stream crosses exactly ONE hash exchange.
    val p = plan("q_asof_join")
    assert(!p.contains("Join"), s"as-of must not plan any join:\n$p")
    assert(p.contains("Window"), s"expected the union-trick window pass:\n$p")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles == 1, s"expected exactly 1 hash exchange, got $shuffles:\n$p")
  }

  test("funnel and conversion latency plan one scan, one fact exchange, no joins") {
    // funnelStages chains the three stage firsts as same-partition
    // window aggregates over a single events pass (probe 14): the
    // branch-and-join form scanned events 3x and exchanged each stage
    // separately. Pin: no join, one (user, day) fact exchange plus the
    // tiny day agg — 2 hash exchanges total.
    Seq("q_event_funnel", "q_conversion_latency").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Join"), s"$q must not plan any join:\n$p")
      val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(shuffles == 2, s"$q: expected 2 hash exchanges, got $shuffles:\n$p")
      val scans = "Scan parquet".r.findAllIn(p).size
      assert(scans == 1, s"$q: expected a single events scan, got $scans:\n$p")
    }
  }

  test("corpus diff plans the full-outer SMJ (probe 15), drift stays join-free") {
    // Graft.corpusDiff is the textbook full-outer sort-merge join on
    // the id — probe 15 measured the tag-union + corpus-sized hash
    // aggregate alternative 1.2-1.8x slower at the same shuffle
    // volume. Pin: a FullOuter SMJ, no BroadcastNestedLoop/Cartesian,
    // 3 hash exchanges (two snapshot sides + the (source, status)
    // readout agg).
    val p = plan("q_corpus_diff")
    assert(p.contains("SortMergeJoin") && p.contains("FullOuter"),
      s"corpus diff must plan a full-outer SMJ:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles == 3, s"expected 3 hash exchanges, got $shuffles:\n$p")
    // drift: one scan (both snapshot memberships are per-row hash
    // tests), one contracted (source, bucket) exchange, per-source
    // window + final agg over the contracted frame only
    val p2 = plan("q_corpus_drift")
    assert(!p2.contains("Join"), s"corpus drift must not plan a join:\n$p2")
    val scans2 = "Scan parquet".r.findAllIn(p2).size
    assert(scans2 == 1, s"drift must scan documents once, got $scans2:\n$p2")
    val shuffles2 = "Exchange hashpartitioning".r.findAllIn(p2).size
    assert(shuffles2 == 2, s"expected 2 hash exchanges, got $shuffles2:\n$p2")
  }

  test("GMV serving readouts: map-side partials, broadcast dims, rank pushdown") {
    // #174 q_gmv_daily: the date rollup must partial-aggregate before
    // its (tiny, date-keyed) exchange — at 100 TB the map-side combine
    // is what keeps the shuffle at days-grain, not line-grain
    val pd = plan("q_gmv_daily")
    assert(pd.contains("partial_sum"), s"daily GMV lost map-side combine:\n$pd")
    assert(!pd.contains("CartesianProduct"))
    // #175 q_gmv_brand_topn: part dim broadcasts; the per-day top-5 is
    // computed map-side via WindowGroupLimit BEFORE the window exchange
    // (rank pushdown), so only ≤5 rows per (day, partition) move
    val pb = plan("q_gmv_brand_topn")
    assert(pb.contains("BroadcastHashJoin"), s"part dim must broadcast:\n$pb")
    assert("WindowGroupLimit".r.findAllIn(pb).size >= 2,
      s"top-5 rank must push down (partial+final WindowGroupLimit):\n$pb")
    assert(!pb.contains("CartesianProduct"))
  }

  test("winnow dedup: codegen'd fingerprint pass, no interpreted HOFs, no cartesian") {
    // #176 q_dedup_winnow: the per-doc sketch must be the native
    // winnow_fps expression (one primitive loop, codegen-forwarded) —
    // the interpreted transform/aggregate HOF formulation of the same
    // math was ~100x slower and must never come back
    val p = plan("q_dedup_winnow")
    assert(p.contains("winnow_fps"), s"native winnow_fps expression missing:\n$p")
    assert(!p.contains("ArrayTransform") && !p.contains("ArrayAggregate"),
      s"interpreted higher-order functions crept back into the sketch:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("count-distinct stats plan without Expand (order-grain pre-agg)") {
    // q_product_stats / q_province_stats pre-aggregate at order grain,
    // so the mixed distinct+non-distinct Expand (input ×2) must be gone
    Seq("q_product_stats", "q_province_stats", "q_province_rollup").foreach { q =>
      val p = plan(q)
      val expands = "Expand".r.findAllIn(p).size
      val allowed = if (q == "q_province_rollup") 1 else 0 // rollup's own grouping-set Expand
      assert(expands <= allowed, s"$q plans $expands Expand nodes (allowed $allowed):\n$p")
    }
  }

  test("signature computation stays map-side: no shuffle before LSH banding") {
    // minhash_sig/simhash64 replaced explode+groupBy signature builds;
    // the only aggregates left in the simhash PAIR plans are the final
    // pair-grouping, so the plan must not contain a per-token Generate.
    // (The r19 #28 GATE deliberately contains the explode-based
    // reference formulation — it is the differential referee, not the
    // production path — so the production pin moved to the facade.)
    val facade = graft.api.Graft.simhashPairs(
        Tables.documents(spark, sf), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!facade.contains("Generate explode"),
      s"simhashPairs should not explode tokens any more:\n$facade")
    val gated = plan("q_dedup_simhash_gated")
    assert(!gated.contains("Generate explode"),
      s"q_dedup_simhash_gated should not explode tokens any more:\n$gated")
  }

  test("parquet scans push filters down (events filtered by event_type)") {
    val p = SparkEntry.queries("q_event_interval_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("event_type"),
      s"event_type filter not pushed to scan:\n$p")
  }

  test("range join plans as an equi join on the bucket, never nested-loop") {
    val p = plan("q_range_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"bucketed range join degenerated to a non-equi plan:\n$p")
  }

  test("split assignment broadcasts the dup-label side") {
    // the label set is bounded by docs-with-a-dup and already
    // materialized by the eager fixpoint — the corpus-side scan must
    // stream past a broadcast of it, not sort-merge against it
    val p = plan("q_split_assign")
    assert(p.contains("BroadcastHashJoin"),
      s"dup-label join must broadcast at gate scale:\n$p")
    assert(!p.contains("SortMergeJoin"), s"unexpected SMJ:\n$p")
  }

  test("pack sequences reuses the window's shard partitioning for the agg") {
    // One hash exchange total: the window shuffles by shard, and the
    // (shard, pack) aggregate must ride that partitioning (shard is a
    // subset of the grouping key) instead of re-shuffling. The only
    // other exchange is the final presentation orderBy's range
    // partitioning.
    val p = plan("q_pack_sequences")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 1,
      s"expected exactly one hash exchange (the shard window), got $hashEx:\n$p")
  }

  test("hash sample plans with zero exchanges (map-only)") {
    val p = graft.api.Graft.hashSample(Tables.documents(spark, sf), "doc_id", 0.10)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"the map-only sample must not shuffle:\n$p")
  }

  test("contamination broadcasts the benchmark vocabulary") {
    val p = SparkEntry.queries("q_contamination")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"benchmark vocab must broadcast, corpus side must stream:\n$p")
  }

  test("existential order check plans as a LEFT SEMI join") {
    // q4: EXISTS must become a semi join (right side never widens the
    // output), with the late-ship range riding as the residual on the
    // o_orderkey equi condition — not a full join + distinct
    val p = plan("q4_order_priority")
    assert(p.contains("LeftSemi"), s"expected a left semi join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"existential check degenerated to a non-equi plan:\n$p")
  }

  test("customer distribution keeps the zero bucket via LEFT OUTER") {
    val p = plan("q13_cust_distribution")
    assert(p.contains("LeftOuter"), s"expected a left outer join:\n$p")
  }

  test("small-qty revenue decorrelates to one window pass, no self-join") {
    // q17: the correlated per-part average must become whole-partition
    // window sums — exactly one join (the broadcast brand filter), no
    // lineitem self-join
    val p = plan("q17_small_qty_revenue")
    assert(p.contains("Window"), s"expected the decorrelated window pass:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the brand slice must not self-join or shuffle-join:\n$p")
  }

  test("nation volume broadcasts both role-playing nation dims") {
    val p = plan("q7_nation_volume")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).size
    assert(broadcasts >= 3, s"supplier + both nation roles must broadcast:\n$p")
  }

  test("vocab coverage takes top-k before the single-task cumsum window") {
    // TakeOrderedAndProject must sit BELOW the Window in the tree —
    // a global-window cumsum over the full vocabulary is the straggler
    // shape this query exists to avoid
    val p = plan("q_vocab_coverage")
    val take = p.indexOf("TakeOrderedAndProject")
    val win = p.indexOf("Window")
    assert(take >= 0 && win >= 0 && take > win,
      s"expected TakeOrdered beneath the Window (top-k first):\n$p")
  }

  test("min-cost supplier plans argmin as mergeable aggregates, no window") {
    // struct-min partial-aggregates map-side; a Window here would mean
    // the plan regressed to the buffer-one-group-per-task shape
    val p = plan("q2_min_cost_supplier")
    assert(!p.contains("Window"), s"argmin must not plan a window:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected the two-level partial-aggregated argmin:\n$p")
  }

  test("outlier bounds broadcast back; corpus never shuffles on source") {
    val p = plan("q_outlier_docs")
    assert(p.contains("BroadcastHashJoin"),
      s"per-source bounds must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the corpus must not shuffle-join a per-source bounds frame:\n$p")
  }

  test("profile plans split passes with no Expand (exact r21, approx r11)") {
    // the exact flavor previously paid the multi-distinct Expand
    // (input ×(k+1), wide tuple-keyed partials); since r21 it splits
    // into one declarative pass + k narrow per-column distinct
    // aggregates — no Expand anywhere in the batch deterministic
    // paths. The streaming/nondet fallback keeps the mixed single
    // pass and IS allowed to Expand.
    val o = Tables.orders(spark, sf)
    val cols = Seq("o_orderkey", "o_custkey", "o_totalprice")
    val pExact = graft.api.Graft.profile(o, cols)
      .queryExecution.executedPlan.toString
    val pApprox = graft.api.Graft.profile(o, cols, approx = true)
      .queryExecution.executedPlan.toString
    assert(!pExact.contains("Expand"), s"exact profile must not Expand (r21 split):\n$pExact")
    assert(!pApprox.contains("Expand"), s"approx profile must not Expand:\n$pApprox")
    // the fallback single-pass shape (nondet source) still multi-distincts
    val nd = o.withColumn("r", org.apache.spark.sql.functions.rand(7))
    val pNd = graft.api.Graft.profile(nd, cols)
      .queryExecution.executedPlan.toString
    assert(pNd.contains("Expand"),
      s"nondet fallback must stay a single mixed pass:\n$pNd")
  }

  test("mixture sample broadcasts the rates config, corpus stays map-only") {
    val p = plan("q_sample_weighted")
    assert(p.contains("BroadcastHashJoin"), s"rates config must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the corpus side must not shuffle-join against a 20-row config:\n$p")
  }

  test("cdc route keeps the fact side shuffle-free (broadcast config)") {
    val p = SparkEntry.queries("q_cdc_route")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"config join must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"fact stream must not shuffle-join:\n$p")
  }

  test("large-orders top-100 is a distributed TakeOrdered, not a global sort") {
    // docs/PLANS.md: each task keeps its local top-100 and only those
    // merge on the driver side of the limit — a global Sort over the
    // joined frame is the straggler shape the plan must avoid
    val p = plan("q18_large_orders")
    assert(p.contains("TakeOrderedAndProject"),
      s"expected a distributed top-k:\n$p")
  }

  test("pivot compiles to one hash agg with no Expand (explicit values)") {
    // .pivot with EXPLICIT region values plans one aggregate whose
    // partials carry a slot per region; a values-less pivot would run
    // a driver-side distinct scan first and an Expand-shaped plan
    val p = plan("q_pivot_revenue")
    assert(!p.contains("Expand"), s"pivot must not Expand:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"dims must broadcast:\n$p")
  }

  test("retention matrix plans without Expand (COUNT(*) at cell grain)") {
    // each user lands exactly once per (cohort, offset) cell, so the
    // matrix count is a plain count — a count-distinct here would
    // re-plan the mixed-distinct Expand the design removed
    val p = plan("q_retention_cohorts")
    assert(!p.contains("Expand"),
      s"retention must not plan a distinct Expand:\n$p")
  }

  test("sliding window assigns hops map-side — no join in the plan") {
    // window(ts, 1h, 30m) must expand each event to its <=2 hops in
    // the scan projection; a join-against-hop-table formulation would
    // shuffle the corpus twice
    val p = plan("q_sliding_window")
    assert(!p.contains("Join"), s"hop assignment must be map-side:\n$p")
  }

  test("Q6 is scan-only: predicates pushed, columns pruned, zero joins") {
    // the whole 100 TB cost of Q6 is one pruned columnar scan — all
    // three range predicates must reach the reader and the ReadSchema
    // must carry only the 4 referenced lineitem columns
    val p = plan("q6_revenue_change")
    assert(!p.contains("Join"), s"Q6 must not join:\n$p")
    assert("PushedFilters:[^\\]]*l_shipdate".r.findFirstIn(p).isDefined &&
      "PushedFilters:[^\\]]*l_discount".r.findFirstIn(p).isDefined &&
      "PushedFilters:[^\\]]*l_quantity".r.findFirstIn(p).isDefined,
      s"all three Q6 predicates must push into the scan:\n$p")
    val read = "ReadSchema:[^\\n]*".r.findFirstIn(p).getOrElse("")
    Seq("l_orderkey", "l_partkey", "l_returnflag", "l_comment").foreach { c =>
      assert(!read.contains(c), s"Q6 scan must prune $c:\n$read")
    }
  }

  test("Q10 broadcasts only nation; top-20 is a distributed TakeOrdered") {
    // customer scales with the corpus, so it must NOT broadcast — the
    // q7 discipline: fact-fact shuffle joins, tiny dim broadcast, and
    // the limit as TakeOrdered instead of a global sort
    val p = plan("q10_returned_items")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).size
    assert(broadcasts >= 1, s"nation must broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 must be a distributed TakeOrdered, not Sort+Limit:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("Q14 classifies lines via a broadcast part join at gate scale") {
    // part carries parquet stats, so the planner broadcasts it
    // unhinted here and flips to shuffle when part outgrows the
    // threshold at 100 TB — the flexibility the hint-free form keeps
    val p = plan("q14_promo_revenue")
    assert(p.contains("BroadcastHashJoin"),
      s"part side must broadcast at gate scale:\n$p")
  }

  test("Q8 broadcasts every dim including both nation roles") {
    // region, both nation aliases, and the filtered part/supplier
    // sides must all broadcast at gate scale — corpus-scale work is
    // only the l⋈o and ⋈c exchanges
    val p = plan("q8_market_share")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).size
    assert(broadcasts >= 3, s"expected >=3 broadcast joins, got $broadcasts:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("Q12 prunes the lineitem scan by shipdate; lateness is a residual") {
    // the single-side date range must reach the parquet reader while
    // the cross-side comparison stays in the join
    val p = plan("q12_late_priority")
    assert("PushedFilters:[^\\]]*l_shipdate".r.findFirstIn(p).isDefined,
      s"shipdate range must push into the lineitem scan:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"Q12 must stay an equi join with the lateness residual:\n$p")
  }

  test("Q15 resolves the global max without a Window over suppliers") {
    // the 1-row max and the winner sliver broadcast back; a window
    // formulation would sort the whole per-supplier frame in one task
    val p = plan("q15_top_supplier")
    assert(!p.contains("Window"), s"Q15 must not plan a Window:\n$p")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).size
    assert(broadcasts >= 2,
      s"max scalar + winner sliver must broadcast, got $broadcasts:\n$p")
  }

  test("Q11 aggregates the corpus once — both consumers read the cache") {
    // the per-part frame feeds the kept side AND the global total;
    // without the persist the lineitem scan + partkey shuffle run
    // twice. The 1-row total joins as a broadcast (nested-loop is
    // correct: the bound is an inequality, and the build side is one
    // row by construction)
    val p = plan("q11_important_positions")
    assert(p.contains("InMemoryTableScan"),
      s"shared per-part agg must be reused via cache:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"1-row total must broadcast:\n$p")
    spark.catalog.clearCache()
  }

  test("Q16 plans the blacklist as a broadcast LEFT ANTI, no Expand") {
    // NOT IN → LeftAnti on the tiny negative-balance sliver (map-side
    // exclusion); the single-column count(DISTINCT) must plan the
    // two-phase aggregate, not the mixed-distinct Expand
    val p = plan("q16_supplier_variety")
    assert(p.contains("LeftAnti"), s"NOT IN must plan as anti join:\n$p")
    assert(!p.contains("Expand"),
      s"single-column distinct must not Expand:\n$p")
  }

  test("Q22 anti-joins recent orders with the date bound pushed down") {
    val p = plan("q22_idle_rich")
    assert(p.contains("LeftAnti"),
      s"the no-recent-orders test must plan as anti join:\n$p")
    assert("PushedFilters:[^\\]]*GreaterThanOrEqual\\(o_orderdate".r
      .findFirstIn(p).isDefined,
      s"recency bound must prune the orders scan:\n$p")
  }

  test("Q9 pushes the name contains-filter into the part scan") {
    // only the red sliver of part may ever reach the join
    val p = plan("q9_product_profit")
    assert(p.contains("StringContains(p_name,red)"),
      s"LIKE '%red%' must push as StringContains:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("Q20 contracts once and semi-joins the supplier dim") {
    // the (part, supplier) grain is aggregated once and re-read from
    // cache for the per-part total; the dominant-key sliver must
    // reduce supplier via LEFT SEMI (never widening)
    val p = plan("q20_dominant_suppliers")
    assert(p.contains("InMemoryTableScan"),
      s"shared (part,supplier) agg must be reused via cache:\n$p")
    assert(p.contains("LeftSemi"), s"supplier filter must be a semi join:\n$p")
    spark.catalog.clearCache()
  }

  test("Q21 plans the aggregate rewrite: two joins, no self-join") {
    // the classic EXISTS/NOT-EXISTS form would self-join the fact
    // twice (4 joins); the rewrite allows only l⋈o and ⋈supplier,
    // with the per-order counts coming from Windows over the
    // CONTRACTED (order, supplier) frame
    val p = plan("q21_sole_late_supplier")
    val joins = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)".r
      .findAllIn(p).size
    assert(joins <= 2, s"expected <=2 joins (no self-joins), got $joins:\n$p")
    assert(p.contains("Window"), s"per-order counts must be windowed:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-100 must be a distributed TakeOrdered:\n$p")
    // probe 14: the l⋈o join is pinned to SMJ so the fact crosses
    // exactly one exchange — the (order, supplier) contraction and the
    // per-order window must both run IN PLACE on the join's
    // hash(l_orderkey) partitioning, never re-exchanging the fact
    assert(p.contains("SortMergeJoin"),
      s"l⋈o must be SMJ so downstream runs on its partitioning:\n$p")
    assert("hashpartitioning\\(l_orderkey#\\d+, l_suppkey".r
      .findFirstIn(p).isEmpty,
      s"contraction must reuse the join partitioning, not re-exchange:\n$p")
  }

  test("Q19 pushes each side's disjunction below the join into its scan") {
    // the OR-of-ANDs lives IN the join condition so Catalyst extracts
    // the per-side implications: the brand/size disjunction must reach
    // the part scan and the quantity disjunction the lineitem scan
    val p = plan("q19_discounted_revenue")
    assert("PushedFilters:[^\\]]*p_brand".r.findFirstIn(p).isDefined,
      s"brand disjunction must push into the part scan:\n$p")
    assert("PushedFilters:[^\\]]*l_quantity".r.findFirstIn(p).isDefined,
      s"quantity disjunction must push into the lineitem scan:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"Q19 must stay an equi join with residuals:\n$p")
  }

  test("tfidf and quality-lm aggregate without Expand") {
    // both df aggregates are the distinct-then-count / single-pass
    // shapes — a count(DISTINCT) Expand here would multiply the
    // word-exploded corpus stream (the #95 trade, refused)
    Seq("q_tfidf_terms", "q_quality_lm").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Expand"), s"$q must not Expand the word stream")
    }
    // the per-source top-10 prunes map-side before its exchange
    assert(plan("q_tfidf_terms").contains("WindowGroupLimit"),
      "tfidf top-k must prune via WindowGroupLimit")
  }

  test("bloom contamination probes map-side, before the confirm join") {
    // the sketch probe must be a Filter on the corpus-shingle side —
    // rows drop BEFORE any exchange or join, the whole point of the
    // prefilter; the exact confirm join still exists downstream
    val p = plan("q_contamination_bloom")
    // (prettyName of BloomFilterMightContain is "might_contain")
    assert(p.contains("Filter might_contain("),
      "prefilter expression missing from the executed plan")
    val probeAt = p.indexOf("Filter might_contain(")
    val joinAt = p.lastIndexOf("HashJoin")
    assert(joinAt >= 0, "confirm join missing")
    assert(probeAt > joinAt,
      // executedPlan prints top-down: a LARGER index = deeper in the
      // tree = earlier in dataflow; the probe must sit below the join
      "bloom probe must run below (before) the confirm join")
  }

  test("passage chunking is a map-side explode: no shuffle, no join") {
    // the row-level core (what a writer runs at 100 TB — the gated
    // query only adds a presentation sort) must be a stateless
    // scan→project→explode pipeline: any Exchange or Join here would
    // mean the fan-out stopped being embarrassingly parallel
    val core = graft.api.Graft.chunkPassages(
      Tables.documents(spark, sf), "doc_id", "text", 64, 48)
    val p = core.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"chunking must not shuffle:\n$p")
    assert(!p.contains("Join"), s"chunking must not join:\n$p")
    assert(p.contains("Generate explode"), s"explode missing:\n$p")
    // and the gated query adds exactly the presentation sort on top
    val pg = plan("q_chunk_passages")
    assert("Exchange".r.findAllIn(pg).size == 1,
      s"gated chunking should shuffle once (the sort only):\n$pg")
  }

  test("chunk dedup: one fingerprint exchange, no join, chunk text pruned pre-shuffle") {
    val p = plan("q_chunk_dedup")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 1,
      s"chunk dedup must shuffle exactly once, on the fingerprint:\n$p")
    assert(!p.contains("Join"), s"chunk dedup must not join:\n$p")
    // what crosses the wire is (ids + fp) — the reassembled chunk
    // text must be consumed map-side by the md5 and never partition
    val exAt = p.indexOf("Exchange hashpartitioning")
    assert(exAt >= 0 && !p.substring(exAt, p.indexOf("]", exAt) + 1)
      .contains("chunk_text"),
      s"chunk_text leaked into the shuffle key/schema:\n$p")
  }

  test("training manifest: survivor frame cached once, small sides broadcast") {
    // the persisted survivor/pack frame serves BOTH consumers (the mix
    // fit's normalizer and the cell aggregate) — without it the whole
    // funnel+window chain re-executes; labels/keepers/epochs are
    // cluster- or source-grain and must never shuffle the corpus side
    val p = plan("q_training_manifest")
    assert(p.contains("InMemoryTableScan"),
      s"survivor frame must be reused via cache:\n$p")
    assert(!p.contains("CartesianProduct"), s"manifest planned a cartesian:\n$p")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).size
    assert(broadcasts >= 3,
      s"labels/keepers/epochs must broadcast, got $broadcasts:\n$p")
    spark.catalog.clearCache()
  }

  test("blocklist battery is pure map work: no join, no extra exchange") {
    // #193 — the C4 word gate must run at scan speed: the word list is
    // a literal inside the codegen'd filter, so there is nothing to
    // join or broadcast; the only exchanges are the rate readout's
    // source contraction / the per-doc gate's presentation sort
    Seq("q_blocklist_rules", "q_blocklist_rate").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Join"), s"$q planned a join:\n$p")
      val exchanges = "Exchange".r.findAllIn(p).size
      assert(exchanges <= 2, s"$q over-exchanged ($exchanges):\n$p")
    }
  }

  // ("n-gram langid: profiles broadcast" was superseded in r17 by the
  // stronger "langid-ngram classify side never shuffles the corpus"
  // pin: the profile fan-out is now a deliberate broadcast nest-loop
  // over langs×1 map rows, not an equi-join against a gram frame.)

  test("IVF probe and recall joins broadcast the query-bounded side (r21)") {
    // #31/#170/#182/#205/#208/#211/#184 — the probe list is
    // NQueries × nprobe rows and every recall/population frame is
    // TopK × NQueries (or k) rows; before r21 these joins planned as
    // SortMergeJoins from unknown post-window stats, shuffling the
    // corpus-scale store by cell to meet a 20-row probe frame. The
    // query-bounded side must broadcast (guide §3.1); the corpus
    // never shuffle-joins in this family.
    Seq("q_ann_ivf", "q_ann_recall", "q_ann_ivf_sq", "q_ann_ivf_sq_cell",
      "q_ann_ivf_sq_recall", "q_ann_pq_recall", "q_coreset_kcenter")
      .foreach { q =>
        val p = plan(q)
        assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
          s"$q: corpus-sized shuffle join crept back in:\n$p")
        spark.catalog.clearCache()
      }
  }

  test("residual IVFADC recall: broadcast-only composition, corpus never shuffle-joins") {
    // #191 — centroids, seed codebook, probe list and partial tables
    // are all ≤√n-scale and broadcast; the corpus-side joins must
    // never be shuffle joins (the encode is one aggregate exchange)
    val p = plan("q_ann_ivfpq_recall")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"corpus-sized join crept into the IVFADC gate:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"IVFADC gate planned a real cartesian:\n$p")
  }

  test("quality classifier: scoring is a map-side fold over the cached vectors (r21)") {
    // #195/#197 — the SERVED plan after the r21 collected-vector
    // rework: the fitted weights ride as a dims+1 array LITERAL into
    // a map-side fold over the persisted per-doc feature vectors (no
    // weights join, no per-doc contraction exchange), the cached
    // feature frame built for the fit must be REUSED for the final
    // scoring (the oracle MATERIALIZEs the same feat CTE), the
    // readout tail joins are broadcast (never a corpus shuffle), and
    // nothing may cartesian. Token hashing stays the codegen'd
    // poly_hash scalar (visible in the label/feature subtrees).
    Seq("q_quality_classifier", "q_classifier_calibration").foreach { q =>
      val p = plan(q)
      assert(p.contains("InMemoryTableScan"),
        s"$q: the fit's feature-vector frame must be reused via cache:\n$p")
      assert(p.contains("BroadcastHashJoin"),
        s"$q: the readout tail must broadcast-join the scores:\n$p")
      assert(!p.contains("SortMergeJoin"),
        s"$q: no corpus-sized shuffle join belongs in the served plan:\n$p")
      assert(p.toLowerCase.contains("poly_hash"),
        s"$q: token hashing must be the codegen'd poly_hash expression:\n$p")
      assert(!p.contains("CartesianProduct"),
        s"$q planned a real cartesian:\n$p")
      spark.catalog.clearCache()
    }
  }

  test("cms gate: two exchanges total, sketch broadcasts, hashing is codegen'd") {
    // #202 — the exact side contracts once on the word and the sketch
    // side once on (d, bucket); the estimate join must BROADCAST the
    // depth×width sketch (never shuffle the top-terms frame against
    // it), and the depth-salted hashing must be the codegen'd
    // poly_hash scalar. Two hash exchanges is the whole query.
    val p = plan("q_term_counts_cms")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles == 2, s"expected 2 hash exchanges, got $shuffles:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the sketch must broadcast into the estimate join:\n$p")
    assert(p.toLowerCase.contains("poly_hash"),
      s"bucket hashing must be the codegen'd poly_hash expression:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin") &&
      !p.contains("CartesianProduct"),
      s"corpus-sized join crept into the CMS gate:\n$p")
  }

  test("sq gate: dim-bounded bounds contraction, broadcast serving, codegen'd dot") {
    // #200 — the per-dimension min/max is the only corpus-grain
    // contraction (plus its 1-row array fold): two hash exchanges;
    // the query set rides a broadcast cross (the intended
    // BroadcastNestedLoopJoin, 10 rows), scoring via the codegen'd
    // dot_product, and nothing corpus-sized ever shuffle-joins.
    val p = plan("q_ann_sq")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles == 2, s"expected 2 hash exchanges, got $shuffles:\n$p")
    assert(p.toLowerCase.contains("dot_product"),
      s"SQ scoring must be the codegen'd dot fold:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin") &&
      !p.contains("CartesianProduct"),
      s"corpus-sized join crept into the SQ gate:\n$p")
  }

  test("rerank gate: broadcast-only composition, corpus never shuffle-joins") {
    // #199 — the #191 broadcast discipline extended through the exact
    // tail: shortlist, probe list, centroid and partial tables all
    // broadcast; the corpus side is scans + aggregate exchanges only.
    val p = plan("q_ann_rerank")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin") &&
      !p.contains("CartesianProduct"),
      s"corpus-sized join crept into the rerank gate:\n$p")
    assert(p.toLowerCase.contains("dot_product"),
      s"the exact tail must score via the codegen'd dot fold:\n$p")
  }
}
