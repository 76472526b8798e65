package graft

/** Plan-shape regression tests: the scale properties the engine promises
  * (pushdown, broadcast, top-k heaps, partial aggregation) asserted
  * against the optimized physical plans, so a refactor that silently
  * degrades a plan to a full shuffle/sort fails CI — the local proxy for
  * "would this still work at 100 TB".
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.executedPlan.toString()
  }

  test("filters and projections reach the parquet scan (proj_filter)") {
    val p = plan("proj_filter")
    assert(p.contains("PushedFilters: [IsNotNull(value)"), p)
    assert(p.contains("ReadSchema: struct<event_id:bigint,event_type:string,value:double>"), p)
  }

  test("dimension joins broadcast instead of shuffling the fact side") {
    assert(plan("join_broadcast").contains("BroadcastHashJoin"))
    val semi = plan("join_semi")
    assert(semi.contains("BroadcastHashJoin") && semi.contains("LeftSemi"))
    assert(!plan("join_broadcast").contains("SortMergeJoin"))
  }

  test("global top-k plans as TakeOrderedAndProject, never a full sort") {
    val p = plan("sort_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("brute-force kNN is a single scan + top-k heap (no shuffle)") {
    val p = plan("vec_knn")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("hash aggregation runs partial then final (map-side combine)") {
    val p = plan("agg_hash")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("the relay hot path is shuffle-free (narrow, executor-parallel)") {
    val relayed = SparkEntry.entry(spark)
    val p = relayed.queryExecution.executedPlan.toString()
    assert(!p.contains("Exchange"), p)
  }

  test("vec_near_dup is a hash-partitioned blocked join, not an all-pairs NLJ") {
    val p = plan("vec_near_dup")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("batch-probe kNN: broadcast probes, partial top-k before the shuffle") {
    val p = plan("vec_knn_batch")
    // the probe table broadcasts against one corpus pass
    assert(p.contains("BroadcastExchange"), p)
    // bounded top-k aggregation runs partial (map-side, pre-shuffle) then
    // final — the shuffle carries ≤ partitions × probes × k rows
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p)
    // no per-probe window: the only exchange after the corpus scan is the
    // tiny post-partial-agg one on probe_id (plus the broadcast)
    assert(!p.contains("Window"), p)
  }

  test("simhash pair generation equi-joins on bands, never doc×doc") {
    val p = plan("doc_dedup_simhash_pairs")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("int8 quantization is a narrow projection — no hash shuffle") {
    val p = plan("vec_quantize")
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("full-outer join stays an equi-join on the coalesced key") {
    val p = plan("join_outer")
    assert(p.contains("FullOuter"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("stream-static enrichment broadcasts the dim; events never shuffle pre-join") {
    val p = plan("cdc_enrich")
    assert(p.contains("BroadcastHashJoin"), p)
    // the one allowed exchange is the final presentation sort; the join
    // input must not hash-shuffle the event side
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("PQ encode is a narrow zero-shuffle projection over the corpus") {
    val cb = graft.similarity.ProductQuantizer.fit(
      Tables.table(spark, sfDir, "embeddings"), "vec_id", "embedding",
      m = 8, ksub = 16, iters = 1, dim = 64)
    val p = graft.similarity.ProductQuantizer.encode(
        Tables.table(spark, sfDir, "embeddings"), "vec_id", "embedding", cb)
      .queryExecution.executedPlan.toString()
    assert(!p.contains("Exchange"), p)
  }

  test("phash pair generation equi-joins on (band, chunk), never image×image") {
    val p = plan("mm_phash_pairs")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("salted join spreads the fact side without degenerating the plan") {
    val p = plan("join_salted")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // final aggregation still combines map-side
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("repetition scoring aggregates with map-side combine") {
    val p = plan("text_repetition")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("decontamination broadcasts the eval index, never corpus×corpus") {
    val p = plan("doc_contamination")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("sequence packing shuffles once on the shard key (plus output sort)") {
    val p = plan("doc_pack")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
    assert(p.contains("Window"), p)
  }

  test("OHLC downsample is one aggregation pass — no window operator") {
    val p = plan("ts_downsample")
    assert(!p.contains("Window"), p)
    assert("HashAggregate|ObjectHashAggregate|SortAggregate".r.findAllIn(p).nonEmpty, p)
  }

  test("multi-way join: dims broadcast, date filter pushes into the orders scan") {
    val p = plan("join_multiway")
    // nation and region ride as broadcasts — they never shuffle
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the o_orderdate range reaches the parquet scan as a pushed filter
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate)"), p)
    // no join input is exchanged twice on the same key: with every join an
    // equi-join, each fact input shuffles at most once per join step —
    // 6 hash exchanges (3 shuffle joins × 2 inputs) + 1 for the final agg
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 7, p)
  }

  test("bloom-pruned join probes with the native codegen expression, not a UDF") {
    val p = plan("join_bloom")
    assert(p.contains("might_contain"), p)
    assert(!p.contains("UDF"), p)
  }

  test("cdc_merge_apply joins on the key — no nested-loop, no cartesian") {
    val p = plan("cdc_merge_apply")
    assert(p.contains("FullOuter"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("doc_mix_sample broadcasts the derived rates; the corpus never sort-merges") {
    val p = plan("doc_mix_sample")
    // the 5-row counts⋈weights table and the 1-row total broadcast back;
    // the corpus-side membership test must NOT be a shuffled join
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("funnel and retention shuffle only on the user key") {
    Seq("ts_funnel", "ts_retention").foreach { q =>
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q: $p")
      assert(!p.contains("CartesianProduct"), s"$q: $p")
      // every hash exchange is keyed on user_id (the stage chain's one
      // co-located partitioning) or on a post-join grouping of the
      // already-reduced table — never on a raw event-level column
      val exchanges = "Exchange hashpartitioning\\(([a-z_#0-9]+)"
        .r.findAllMatchIn(p).map(_.group(1)).toSeq
      assert(exchanges.exists(_.startsWith("user_id")), s"$q: $p")
      exchanges.foreach(k =>
        assert(k.startsWith("user_id") || k.startsWith("_groupingexpression")
          || k.startsWith("cohort") || k.startsWith("stage"),
          s"$q shuffles on $k:\n$p"))
    }
  }

  test("weighted sampling is a zero-shuffle top-k heap over one narrow scan") {
    val p = plan("doc_sample_weighted")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("heavy hitters: candidate set broadcasts; token agg is partial-then-final") {
    val p = plan("text_heavy_hitters")
    assert(p.contains("BroadcastHashJoin"), p)
    // the recount must combine map-side: partial_count before the shuffle
    assert(p.contains("partial_count") || p.contains("partial, [count"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("z-score flags broadcast the 5-row stats — the events scan never shuffles") {
    val p = plan("ts_zscore")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("sliding distinct: corpus collapses map-side before the single-partition window") {
    val p = plan("ts_sliding_distinct")
    // the collect_set agg must combine on the map side (partial before the
    // shuffle) so the one hash exchange carries hourly SETS, not raw events
    assert(p.contains("partial_collect_set") || p.contains("partial, [collect_set"), p)
    // exactly one event-level shuffle: the hourly groupBy; the window's
    // Exchange SinglePartition sits above it, over the compact series only
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(p.contains("Window"), p)
  }

  test("SCD2 history: change-detect and versioning share ONE key shuffle") {
    val p = plan("cdc_scd2")
    // lag (change detection) and lead (valid_to) both window on user_id —
    // the planner must reuse the partitioning, not exchange twice
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert("Window".r.findAllIn(p).size >= 2, p)
  }

  test("chunking is a map-only pass: explode in-row, zero shuffle") {
    val p = plan("doc_chunk")
    assert(p.contains("Generate explode"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("co-occurrence pairs generate in-row; counts combine map-side") {
    val p = plan("text_cooccur")
    // no positional self-join: the only joins are on the counted aggs
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_count") || p.contains("partial, [count"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("weighted median: cumulative + total windows share one group shuffle") {
    val p = plan("agg_weighted_median")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(p.contains("Window"), p)
  }

  test("OHLC candles: both windows and the agg share ONE bucket shuffle") {
    val p = plan("ts_ohlc")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert("Window".r.findAllIn(p).size >= 2, p)
  }

  test("rel_q3 composite: filters pushed, no cartesian, top-10 as a heap") {
    val p = plan("rel_q3")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    // the segment filter must reach the customer scan
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"), p)
    assert(p.contains("GreaterThan(l_shipdate,"), p)
  }

  test("bucketed weighted median: group frames broadcast, no full-corpus join shuffle") {
    val p = plan("agg_weighted_median_bucketed")
    // bounds/cut/prefix are one-row-per-group frames: every corpus-side
    // join must be a broadcast, never a shuffled join of the fact table
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("stream-stream batch twin joins on the key — no nested-loop, no cartesian") {
    for (q <- Seq("cdc_stream_enrich", "cdc_stream_enrich_outer")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
        s"$q:\n$p")
    }
  }

  test("learned-IVF kNN prunes the partitioned corpus statically (nprobe=2)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    // the declared query's own index (memo-shared with vec_knn_ivf_learned),
    // probed at nprobe=2: the scan must carry centroid_id under
    // PartitionFilters and list only 2 of the 8 partition directories —
    // the "IVF = partition pruning at 100 TB" claim, as a plan property
    val res = graft.queries.VectorQueries.ivfLearnedKnn(
      spark, sfDir, k = 5, nprobe = 2)
    res.collect()
    val executed = res.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = executed.collectLeaves().collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty, executed.toString)
    assert(scans.head.toString.contains("PartitionFilters: [centroid_id"),
      scans.head.toString)
    assert(scans.head.selectedPartitions.partitionCount === 2,
      s"expected 2 pruned partitions, scanned ${scans.head.selectedPartitions.partitionCount}")
  }

  test("rel_q17 de-correlates the scalar subquery into broadcast joins") {
    val p = plan("rel_q17")
    // both the brand-part semi filter and the per-part threshold join
    // must broadcast — the lineitem fact is never shuffle-partitioned
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("EqualTo(p_brand,Brand#13)"), p)
  }

  test("rel_q15: date filter pushed to the scan, max joined as broadcast") {
    val p = plan("rel_q15")
    assert(p.contains("GreaterThanOrEqual(l_shipdate,"), p)
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("graph edge ARTIFACT build is in-row (no position self-join)") {
    // ONE aggregation keyed by l_orderkey builds baskets; pairs explode
    // in-row — there must be no join at all upstream of the pair table
    val build = graft.queries.GraphQueries.edgeBuildPlanFor(spark, sfDir)
    val p = build.queryExecution.analyzed.toString()
    assert(!p.contains("Join"), p)
    assert(p.toLowerCase.contains("explode"), p)
  }

  test("graph query path reads the durable edge artifact, never rebuilds pairs") {
    // the served edge frame's lineage starts at the artifact parquet:
    // no Generate (in-row pair build) and no lineitem scan on any query
    val edges = graft.queries.GraphQueries.edgesFor(spark, sfDir)
    val p = edges.queryExecution.analyzed.toString()
    assert(!p.toLowerCase.contains("explode"), p)
    assert(!p.contains("lineitem"), p)
    // the scan's file location is the artifact root (the plan string
    // elides paths — read them off the relation's FileIndex)
    val locs = edges.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            f.location.rootPaths.mkString(",")
          case other => other.toString
        }
    }
    assert(locs.nonEmpty && locs.forall(_.contains("graft_edges")), locs)
  }

  test("graph pagerank iterations reuse the pinned edge partitioning") {
    val p = plan("graph_pagerank")
    // the persisted, src-partitioned edge list surfaces as InMemory
    // scans; the per-iteration rank joins must not re-shuffle it
    assert(p.contains("InMemoryTableScan"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("doc_skyline: frontier via group-max + broadcast, never an all-pairs join") {
    val p = plan("doc_skyline")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    // the per-q group max must partial-aggregate before shuffling
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("join_interval: sweep-line count — no self-join of the fact at all") {
    val p = plan("join_interval")
    // count-only output must never enumerate pairs: no join of the
    // endpoint stream against itself — the only join is the BROADCAST
    // of the tiny per-bucket prefix frame — and the rank windows
    // partition by (event_type, bucket), never one global per-type sort
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert("Window".r.findAllIn(p).size >= 2, p)
    assert(p.contains("hashpartitioning(event_type") , p)
  }

  test("join_interval_pairs: bucket blocking turns the theta join into an equi join") {
    val p = plan("join_interval_pairs")
    // the O(n²) inequality join must NOT appear — blocking makes it a
    // plain hash-partitioned equi join on (event_type, bucket). Since
    // r15's occupancy guard, the bucket explosion lives in the lazily
    // checkpointed bucket frame (probe + both join sides share ONE
    // materialization), so this plan reads it back as an ExistingRDD
    // scan instead of re-deriving the explode per side.
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    assert(p.contains("Scan ExistingRDD"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), p)
  }

  test("rel_q18: survivor set broadcasts — orders and customer never shuffle") {
    val p = plan("rel_q18")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("SortMergeJoin"), p)
    // the per-order rollup partial-aggregates before its one shuffle
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("ts_markov/ts_paths: lag windows sort inside ONE user_id shuffle") {
    for (q <- Seq("ts_markov", "ts_paths")) {
      val p = plan(q)
      assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size == 1, s"$q\n$p")
    }
  }

  test("agg_corr_matrix/profile_table: one fact scan feeding one global agg") {
    for (q <- Seq("agg_corr_matrix", "profile_table")) {
      val p = plan(q)
      assert("Scan parquet".r.findAllIn(p).size == 1, s"$q\n$p")
      assert(p.contains("Exchange SinglePartition"), s"$q\n$p")
    }
  }

  test("vec_mips: single scan + top-k heap, codegen'd dot product, no shuffle") {
    val p = plan("vec_mips")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(p.contains("dot_product("), p)
  }

  test("join_dpp: the fact's partition filter derives from the broadcast at runtime") {
    val p = plan("join_dpp")
    assert(p.contains("dynamicpruning"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("graph triangles: canonical orientation joins, no cartesian") {
    val p = plan("graph_triangles")
    // the final 1-row × 1-row scalar combine is a broadcast cross join
    // (fine); the edge-closing adjacency join must be a hash equi-join
    // and nothing may degrade to an unpartitioned cartesian. Since r17
    // the orientation (degree) joins sit upstream of the checkpointed
    // adjacency frame, so only the closing join is visible here — its
    // own shape is pinned by the r17 plan artifacts (plans/r17/).
    assert(!p.contains("CartesianProduct"), p)
    assert("(ShuffledHashJoin|SortMergeJoin|BroadcastHashJoin)".r.findAllIn(p).size >= 1, p)
  }

  test("cdc_incr_agg: deltas come from ONE window pass + in-row explode") {
    val p = plan("cdc_incr_agg")
    // one lag window (both old-image columns share it), one Generate —
    // NOT a union of two scans/window passes
    assert("Window".r.findAllIn(p).size == 1, p)
    assert(p.contains("Generate"), p)
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
  }

  test("ts_cusum: mean + running-sum windows share one user_id shuffle") {
    val p = plan("ts_cusum")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size == 1, p)
  }

  test("win_deciles: rank + count windows and the rollup share one exchange") {
    val p = plan("win_deciles")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("doc_dedup_sorted: neighbor pairing is window-local — no join at all") {
    val p = plan("doc_dedup_sorted")
    assert(!p.contains("Join"), p)
    assert(p.contains("Window"), p)
  }

  test("rel_q5/rel_q7: dim chains broadcast; no cartesian anywhere") {
    for (q <- Seq("rel_q5", "rel_q7")) {
      val p = plan(q)
      assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, s"$q\n$p")
      assert(!p.contains("CartesianProduct"), s"$q\n$p")
    }
  }

  test("rel_q21: semi and anti both key on the reused orderkey exchange") {
    val p = plan("rel_q21")
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("basket_pairs: in-row pair generation — no join anywhere") {
    val p = plan("basket_pairs")
    assert(!p.contains("Join"), p)
    assert(p.contains("Generate"), p) // the in-row pair explode
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("rel_q6: pure scan — predicates pushed, no join, no key shuffle") {
    val p = plan("rel_q6")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p)
    assert(!p.contains("Join"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("ts_trend: the compact series broadcasts into the pair stage") {
    val p = plan("ts_trend")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("ts_xcorr/ts_ewma: one fact scan collapsing to a compact series") {
    for (q <- Seq("ts_xcorr", "ts_ewma")) {
      val p = plan(q)
      assert("Scan parquet".r.findAllIn(p).size == 1, s"$q\n$p")
      assert(!p.contains("Join"), s"$q\n$p")
    }
  }

  test("text_bpe_encode: vocab broadcasts back onto the token stream") {
    val p = plan("text_bpe_encode")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("cdc_pit_enrich: point-in-time semantics WITHOUT an interval join") {
    val p = plan("cdc_pit_enrich")
    assert(!p.contains("Join"), p) // union + last-non-null, one key window
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size <= 2, p)
  }

  test("mm_resize: narrow decode+pool projection — no join, no key shuffle") {
    val p = plan("mm_resize")
    assert(!p.contains("Join"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("rel_q8: four-dim join tree stays broadcast; facts shuffle at most twice") {
    val p = plan("rel_q8")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("rel_q13: zero-order customers survive the outer join") {
    val p = plan("rel_q13")
    assert(p.contains("LeftOuter") || p.contains("RightOuter"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("text_clean_html: narrow projection — no join, no key shuffle, 2-col scan") {
    val p = plan("text_clean_html")
    assert(!p.contains("Join"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("doc_dedup_url: one scan into a partial-then-final hash agg, no join") {
    val p = plan("doc_dedup_url")
    assert(!p.contains("Join"), p)
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("ts_seasonal: one fact collapse, profile broadcasts back (no SMJ)") {
    val p = plan("ts_seasonal")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // the fact table shuffles once (hourly collapse); the profile agg
    // and its broadcast run on the compact series
    assert("Scan parquet".r.findAllIn(p).size <= 2, p)
  }

  test("ts_forecast_ols: single fact scan; the 5-row fit self-join broadcasts") {
    val p = plan("ts_forecast_ols")
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("text_winnow: in-row fingerprinting — no join, no key shuffle") {
    val p = plan("text_winnow")
    assert(!p.contains("Join"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("doc_despan: one postings join on shingle, never doc×doc") {
    val p = plan("doc_despan")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("doc_dedup_lines: line-keyed equi-joins only — never doc×doc") {
    // (a size-based broadcast of the tiny-SF frequency table would be
    // legitimate planner behavior, so only the join STRUCTURE is pinned)
    val p = plan("doc_dedup_lines")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("text_bm25: term filter before tf agg, broadcast stats, top-k heap") {
    val p = plan("text_bm25")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p) // the 1-row stats side broadcasts
  }

  test("vec_semdedup pairs only within cluster buckets (no all-pairs plan)") {
    val p = plan("vec_semdedup")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("vec_index_append serves through static partition pruning") {
    // the appended layout reads like the rebuilt index: the routed
    // centroid_id literals land in PartitionFilters, so a pruned probe
    // lists only its nprobe directories before a row deserializes
    val p = plan("vec_index_append")
    assert(p.contains("PartitionFilters"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("mm_keyframes stays narrow until the tiny per-video aggregate") {
    val p = plan("mm_keyframes")
    // one partial+final agg pair over the parsed sync table; no join
    assert(!p.contains("Join"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("doc_ppl_buckets broadcasts the tercile thresholds back") {
    val p = plan("doc_ppl_buckets")
    assert(p.contains("BroadcastExchange"), p)
    // the threshold subtree may plan a buffered percentile here: the
    // fixture's per-doc frame is under exactPercentiles' counted
    // 256k-value cap (r17 shortcut); the beyond-cap bucketed path is
    // pinned branch-equal in WeightedQuantileSpec
  }

  test("pipeline_curate reads the corpus twice, not once per stage") {
    val p = plan("pipeline_curate")
    // scan 1: quality signals + fingerprint + window keeper (fused);
    // scan 2: the shingle explode; scan 3: the pruned 20-doc eval side.
    // A groupBy+rejoin keeper or unfused stages would add scans.
    assert("Scan parquet".r.findAllIn(p).size == 3, p)
  }

  test("layout_zorder_eval builds both manifests from ONE corpus scan") {
    val p = plan("layout_zorder_eval")
    // the in-row explode forks the cell frame into the two layout
    // manifests; a per-layout aggregation branch would re-scan events
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
  }

  test("exact percentiles buffer ONLY under the counted cap") {
    // Since r17 exactPercentiles takes a counted split: within
    // MaxBufferedValues total rows, one buffered percentile aggregation
    // (bit-identical, spec-pinned); beyond it — and for callers that
    // opt out because their input is structurally past the bound — the
    // bucketed rank selection, which must NEVER plan the whole-group
    // ObjectHashAggregate buffer (the one OOM-shaped operator at 100 TB
    // group sizes).
    // ts_trend's quadratic slope multiset opts out (bufferedCap = 0):
    // the bucketed path must hold at every scale.
    val pTrend = plan("ts_trend")
    assert(!pTrend.contains("ObjectHashAggregate"), pTrend)
    assert(!pTrend.contains("percentile"), pTrend)
    // agg_median's fixture input sits under the cap: the shortcut must
    // actually FIRE (a silent fall-through to the 10-job bucketed path
    // on small inputs is the regression this pin catches)
    val pMed = plan("agg_median")
    assert(pMed.contains("ObjectHashAggregate"), pMed)
  }

  test("assembly decisions broadcast domain stats; the corpus never sort-merges") {
    // mixture, upsample, and shard planning join the corpus only against
    // |domains|-row broadcast frames — a SortMergeJoin here would mean the
    // whole corpus shuffles to be *planned*
    for (q <- Seq("doc_mix_tokens", "doc_upsample", "doc_shard_plan")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q\n$p")
      assert(!p.contains("SortMergeJoin"), s"$q\n$p")
    }
  }

  test("doc_pack_emit shuffles the token rows once (window partitioning reused)") {
    val p = plan("doc_pack_emit")
    // the shard column is materialized before the window precisely so the
    // agg's (source, shard, bin) clustering is satisfied by the window's
    // (source, shard) hashpartitioning — one data shuffle, not two
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("doc_pack_emit_ids inherits the single-exchange emission plan") {
    val p = plan("doc_pack_emit_ids")
    // same packPlan co-partitioning proof: each token id crosses exactly
    // one exchange on its way to the bin reducer
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("doc_pack_eval stays on the packPlan partitioning end-to-end") {
    val p = plan("doc_pack_eval")
    // bins agg reuses the window's (source, shard) partitioning; the
    // per-source rollup is the only extra exchange and it carries the
    // OUTPUT-sized bins frame, not corpus rows
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, p)
  }

  test("filtered ANN pushes the predicate into the scan before the top-k heap") {
    val p = plan("vec_knn_filtered")
    assert(p.contains("PushedFilters: [IsNotNull(label), EqualTo(label,3)]"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("routed filtered ANN composes partition pruning with the pushed predicate") {
    val p = plan("vec_knn_ivf_filtered")
    assert(p.contains("PartitionFilters"), p)
    assert(p.contains("PushedFilters: [IsNotNull(label), EqualTo(label,3)]"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("doc_mix_tokens_exact broadcasts the bucket classification; no sort-merge") {
    val p = plan("doc_mix_tokens_exact")
    // the |langs|×64 bucket classification broadcasts back onto the
    // corpus; only the cut bucket's subset reaches a window
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("doc_split is a zero-shuffle projection") {
    val p = plan("doc_split")
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Window"), p)
  }

  test("doc_shuffle_index ranks within range buckets, never one global window") {
    val p = plan("doc_shuffle_index")
    // the corpus-sized window is partitioned by the 64-way range bucket;
    // the offsets join broadcasts the 64-row frame back
    // the combined substring pins the ROW_NUMBER window's own spec to
    // bkt-partitioning — asserting the two fragments separately could
    // false-pass on the 64-row offsets window (ORDER BY bkt) while the
    // ranking degraded to a global window
    assert(p.contains("Window [row_number() windowspecdefinition(bkt"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("doc_curriculum ranks within phase-major buckets, never one global window") {
    val p = plan("doc_curriculum")
    assert(p.contains("Window [row_number() windowspecdefinition(bkt"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("rel_q2 decorrelates the min-cost subquery — no per-row rescan") {
    val p = plan("rel_q2")
    // the correlated scalar subquery becomes ONE grouped min joined back
    // by broadcast equality; a surviving correlation would show up as a
    // nested-loop / cartesian rescan of partsupp
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("rel_q16's NOT IN plans as a broadcast LEFT ANTI hash join") {
    val p = plan("rel_q16")
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("rel_q20's nested IN subqueries decorrelate to hash semi-joins") {
    val p = plan("rel_q20")
    // the correlated availqty > 0.5*sum(shipped) becomes one grouped agg
    // joined on the composite key; the supplier membership is a broadcast
    // LEFT SEMI — no nested loop anywhere
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
