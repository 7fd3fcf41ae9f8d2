"""Plan-quality assertions (the 100 TB contract): filters must reach the
parquet scan, small dims must broadcast, hot paths must stay in
whole-stage codegen, and scans must prune columns."""

from __future__ import annotations

from binancedatapipelineinaws_spark.registry import queries

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_scan_pushdown_and_pruning(spark):
    df = queries()["q_scan_parquet"](spark, SF)
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_shipdate)" in plan or "GreaterThanOrEqual" in plan
    # column pruning: the 11-column lineitem scan reads only what the
    # query needs
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema
    assert "l_returnflag" not in read_schema


def test_flagship_broadcasts_dims(spark):
    df = queries()["q_join_multiway"](spark, SF)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or plan.count(
        "BroadcastHashJoin"
    ) >= 3


def test_broadcast_join_no_fact_shuffle(spark):
    df = queries()["q_join_broadcast"](spark, SF)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    # the only exchanges are the broadcast ones + the final aggregation
    # shuffle; the customer scan side must not hash-repartition before
    # the joins
    pre_agg = plan.split("HashAggregate")[-1]
    assert "Exchange hashpartitioning" not in pre_agg


def test_no_python_in_hot_paths(spark):
    # The JVM-side contract: no row-at-a-time Python evaluation anywhere
    # except the explicitly Arrow-batched multimodal kernels.  (Codegen
    # span inspection is unreliable under AQE, which finalizes stages at
    # runtime; absence of Python/interpreted fallback is the durable
    # property.)
    qs = queries()
    for name, fn in qs.items():
        plan = _plan(fn(spark, SF))
        assert "BatchEvalPython" not in plan, f"{name} uses row-wise Python UDF"
        # the Arrow-batched exceptions: binary decode kernels (header
        # metadata and the r9 PNG pixel codec) and the per-partition
        # Gram-matrix mat-mul (each documented in its docstring as the
        # case where batched Python beats interpreted Catalyst)
        if name not in (
            "q_ext_multimodal_meta",
            "q_ext_multimodal_pixels",
            "q_ext_embed_covariance",
        ):
            assert "MapInPandas" not in plan, f"{name} unexpectedly in Pandas"


def test_ohlcv_has_partial_aggregation(spark):
    plan = _plan(queries()["q_agg_ohlcv_1min"](spark, SF))
    # map-side combine before the shuffle (partial_min/partial_max)
    assert "partial_" in plan


def test_range_join_is_broadcast_nlj(spark):
    plan = _plan(queries()["q_join_theta_range"](spark, SF))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_embed_neardup_no_all_pairs_join(spark):
    # semantic dedup must route through LSH-bucket equi-joins; an
    # all-pairs BroadcastNestedLoopJoin would be O(n^2) at scale
    plan = _plan(queries()["q_ext_embed_neardup"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_stratified_sample_is_map_only(spark):
    # deterministic hash sampling must add NO shuffle: filter + project
    # straight off the scan
    plan = _plan(queries()["q_ext_stratified_sample"](spark, SF))
    assert "Exchange" not in plan


def test_token_budget_single_shuffle(spark):
    # one hash shuffle on (lang, shard) for the running-sum window —
    # nothing else
    plan = _plan(queries()["q_ext_token_budget"](spark, SF))
    import re

    exchanges = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert len(exchanges) == 1, plan
    assert "lang" in exchanges[0] and "shard" in exchanges[0]


def test_decontam_benchmark_is_broadcast(spark):
    df = queries()["q_ext_decontam"](spark, SF)
    plan = _plan(df)
    # the benchmark n-gram set joins map-side; the only hash shuffles
    # are its tiny distinct and the per-doc count
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_redact_is_map_only(spark):
    df = queries()["q_ext_redact"](spark, SF)
    plan = _plan(df)
    assert "Exchange" not in plan  # pure projection, no shuffle


def test_repetition_is_map_only(spark):
    df = queries()["q_ext_repetition"](spark, SF)
    plan = _plan(df)
    assert "Exchange" not in plan and "Generate" not in plan


def test_rolling_corr_single_window_pass(spark):
    # six component sums share one frame: exactly one Window node, one
    # hash shuffle, no self-join
    plan = _plan(queries()["q_win_rolling_corr"](spark, SF))
    assert plan.count("Window") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_chunk_docs_is_map_only(spark):
    # chunking must add NO shuffle: one Generate off the scan
    plan = _plan(queries()["q_ext_chunk_docs"](spark, SF))
    assert "Exchange" not in plan
    assert plan.count("Generate") == 1


def test_dupspan_single_pass_no_join(spark):
    # the >1-docs test runs as a window over the gram partition; a
    # gram-frequency join back would re-execute the scan+explode
    # lineage per branch
    plan = _plan(queries()["q_ext_dupspan"](spark, SF))
    assert "Join" not in plan
    assert plan.count("Generate") == 1
    assert plan.count("Exchange hashpartitioning") == 2


def test_source_cosine_persists_profile_table(spark):
    # the (source, term) profile feeds norms + both self-join sides;
    # persist keeps the corpus scan single-pass
    plan = _plan(queries()["q_ext_source_cosine"](spark, SF))
    assert "InMemoryTableScan" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_histogram_partial_aggregation(spark):
    # bin-keyed count/sum must combine map-side; one shuffle total
    plan = _plan(queries()["q_ext_histogram"](spark, SF))
    assert "partial_" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_mad_outliers_single_scan_two_windows(spark):
    # median and MAD stack as whole-partition windows over ONE
    # exchange; a stats join back would re-execute the scan
    plan = _plan(queries()["q_ext_mad_outliers"](spark, SF))
    assert plan.count("Window") == 2
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_split_assign_is_map_only(spark):
    plan = _plan(queries()["q_ext_split_assign"](spark, SF))
    assert "Exchange" not in plan


def test_bm25_broadcasts_model_side(spark):
    # df + corpus stats broadcast; no sort-merge join anywhere
    plan = _plan(queries()["q_ext_bm25"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 1
    assert "SortMergeJoin" not in plan


def test_bigram_lm_broadcast_no_window(spark):
    # LM table joins back as a broadcast; conditional counts must NOT
    # be count-windows (PARTITION BY w1 concentrates Zipf-head words
    # on single tasks)
    plan = _plan(queries()["q_ext_bigram_lm_score"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert " Window [" not in plan


def test_upsert_single_shuffle(spark):
    # union + key-partitioned row_number: one exchange decides winners
    plan = _plan(queries()["q_ext_upsert_latest"](spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_profile_single_pass(spark):
    # all per-column stats in one aggregate over one scan (countDistinct
    # adds its Expand, but never a second FileScan)
    plan = _plan(queries()["q_ext_profile"](spark, SF))
    assert plan.count("FileScan parquet") == 1
    assert "partial_" in plan


def test_winsorize_single_scan_one_window(spark):
    # both percentile boundaries share one whole-partition window
    plan = _plan(queries()["q_ext_winsorize"](spark, SF))
    assert plan.count(" Window [") == 1
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan


def test_corr_matrix_single_pass(spark):
    # six pair correlations from one aggregate over one scan; the
    # unpivot adds no shuffle
    plan = _plan(queries()["q_ext_corr_matrix"](spark, SF))
    assert plan.count("FileScan parquet") == 1
    assert "Exchange hashpartitioning" not in plan
    assert "partial_" in plan


def test_active_users_persists_day_user_table(spark):
    # the (day, user) distinct table feeds spine and explode branches
    plan = _plan(queries()["q_ext_active_users"](spark, SF))
    assert plan.count("InMemoryTableScan") >= 2


def test_twap_single_window_pass(spark):
    plan = _plan(queries()["q_ext_twap"](spark, SF))
    assert plan.count(" Window [") == 1
    assert "Join" not in plan


def test_curation_pipeline_two_shuffles_one_scan(spark):
    # quality gate + split assignment fuse into the scan; only the
    # dedup key and the final rollup shuffle
    plan = _plan(queries()["q_ext_curation_pipeline"](spark, SF))
    assert plan.count("Exchange hashpartitioning") == 2
    assert plan.count("FileScan parquet") == 1


def test_gapfill_persists_aggregated_series(spark):
    # the hourly aggregate feeds both the bounds subtree and the join
    # probe side; persist() keeps the 100 TB scan single-pass (an
    # InMemoryTableScan must appear in place of a second FileScan)
    # both branches must read the cached relation (the FileScan text
    # appears inside each InMemoryRelation definition but executes once)
    plan = _plan(queries()["q_ext_gapfill"](spark, SF))
    assert plan.count("InMemoryTableScan") >= 2


def test_sessionize_one_window_exchange(spark):
    # lag + running sum + row_number share ONE (user_id; ts, event_id)
    # window spec -> a single exchange on user_id, no global sort
    df = queries()["q_ext_sessionize"](spark, SF)
    plan = _plan(df)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange rangepartitioning" not in plan


def test_rolling_median_single_window_pass(spark):
    df = queries()["q_ext_rolling_median"](spark, SF)
    plan = _plan(df)
    assert plan.count("Window") <= 2  # one Window node (+AQE wrapper noise)
    assert "Exchange rangepartitioning" not in plan


def test_semdedup_no_cartesian(spark):
    # the pair search must ride the cell equi-join, never all-pairs
    df = queries()["q_ext_semdedup"](spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    # the only nested-loop join allowed is the tiny broadcast centroid
    # cross join (K rows); the vector-vector pair join must hash on cell
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or (
        "BroadcastHashJoin" in plan
    )


def test_ann_pq_no_cartesian_candidates(spark):
    # the candidate set must ride the IVF-cell equi-join; the only
    # nested-loop join allowed is the K-row broadcast centroid cross
    # join of the coarse quantizer (same contract as q_ext_semdedup)
    df = queries()["q_ext_ann_pq"](spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    )


def test_strip_dupspans_no_pair_join(spark):
    # the strip reconstruction must stay on the doc key: gram window +
    # doc-keyed run collapse + indexed array filter, no position
    # self-join, no cartesian
    plan = _plan(queries()["q_ext_strip_dupspans"](spark, SF))
    assert "CartesianProduct" not in plan
    assert plan.count("Window [") == 2  # gram flags + run collapse


def test_ohlcv_incremental_broadcasts_and_partitions(spark):
    # the 1-row time bound and the affected-minute list must broadcast;
    # no cartesian beyond the 1-row bound cross join
    plan = _plan(queries()["q_ext_ohlcv_incremental"](spark, SF))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert plan.count("BroadcastExchange") >= 2


def test_transition_reach_recursion_reads_cache(spark):
    # both UnionLoop members (anchor and step) must read the PERSISTED
    # edge table; without the cache Spark inlines the edges CTE into
    # the loop and re-scans the corpus + re-runs the lead() window on
    # every iteration (the pre-fix plan had zero InMemoryRelation)
    plan = _plan(queries()["q_ext_transition_reach"](spark, SF))
    assert "UnionLoop" in plan
    assert plan.count("InMemoryRelation") >= 2


def test_equidepth_hist_broadcast_boundaries(spark):
    # boundaries (types-bounded) broadcast onto the corpus; the bucket
    # expression is map-only; no corpus sort / range exchange
    plan = _plan(queries()["q_ext_equidepth_hist"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "Exchange rangepartitioning" not in plan
    assert "Window [" not in plan


def test_skew_salted_join_explodes_small_side(spark):
    # the salt explode must sit on the customer (small) side, the join
    # stays a plain equi-join, and the top-20 is a partial top-k
    plan = _plan(queries()["q_ext_skew_salted_join"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "Generate explode" in plan
    assert "TakeOrderedAndProject" in plan


def test_ann_nprobe_no_cartesian_and_invariant(spark):
    # candidate path must ride the cell equi-join (the only
    # nested-loop joins are the K-row centroid broadcasts); and the
    # structural recall invariant holds on real data
    df = queries()["q_ext_ann_nprobe"](spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    rows = df.collect()
    assert rows and all(r["n_hits_p2"] >= r["n_hits_p1"] for r in rows)


def test_skew_profile_map_side_combine(spark):
    # bucket aggregate must partial-aggregate before its exchange
    df = queries()["q_ext_skew_profile"](spark, SF)
    plan = _plan(df)
    assert plan.count("HashAggregate") >= 2


def test_temperature_resample_broadcasts_rates(spark):
    # the languages-sized rate table must broadcast; the corpus side
    # must not shuffle for the join
    df = queries()["q_ext_temperature_resample"](spark, SF)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan


def test_topk_revenue_broadcast_and_topk(spark):
    # customer dim broadcasts; the top-10 is TakeOrderedAndProject
    # (no global sort); date filters reach the scans
    df = queries()["q_join_topk_revenue"](spark, SF)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "PushedFilters" in plan and "1995-03-15" in plan


def test_quality_funnel_single_scan_no_shuffle_before_agg(spark):
    # all rule features are map-only; the only exchange is the
    # rules-bounded aggregate
    df = queries()["q_ext_quality_funnel"](spark, SF)
    plan = _plan(df)
    assert plan.count("Exchange") <= 2  # partial->final agg only
    assert "Join" not in plan


def test_embed_dim_profile_dimension_bounded(spark):
    df = queries()["q_ext_embed_dim_profile"](spark, SF)
    plan = _plan(df)
    assert "Generate" in plan  # posexplode off the scan
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_band_sweep_runs_on_signatures_only(spark):
    # every config reads the PERSISTED signature table (InMemoryTableScan;
    # FileScan occurrences in the plan string are the cached lineage
    # description repeated per cache reference, not live scans), and the
    # pair joins are hash joins, never nested loops
    plan = _plan(queries()["q_ext_lsh_band_sweep"](spark, SF))
    assert plan.count("InMemoryTableScan") >= 9  # 3 configs x 3 refs
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_daily_anomaly_single_scan(spark):
    # day aggregate then windows over the tiny day table — no join, no
    # second scan
    plan = _plan(queries()["q_ext_daily_anomaly"](spark, SF))
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan


def test_zipf_corpus_stage_is_term_count(spark):
    # the only corpus-sized shuffle is the term count; the top-N is a
    # TakeOrderedAndProject (parallel partial top-k: each task keeps N
    # rows), so no task ever sorts the whole vocabulary — the rank
    # window that remains runs over the N-row limit output
    plan = _plan(queries()["q_ext_zipf_slope"](spark, SF))
    assert "partial_" in plan
    assert "Join" not in plan
    assert "TakeOrderedAndProject" in plan
    # the window sits ABOVE the limit (bounded input), not below it
    assert plan.index("Window") < plan.index("TakeOrderedAndProject")


def test_source_lang_entropy_bounded_post_agg(spark):
    plan = _plan(queries()["q_ext_source_lang_entropy"](spark, SF))
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan


def test_bucketed_join_zero_exchange(spark):
    # the whole point: pre-bucketed layout -> sort-merge join with NO
    # shuffle on either input (the broadcast would hide it, hence the
    # merge hint in the query)
    plan = _plan(queries()["q_maint_bucketed_join"](spark, SF))
    assert "SortMergeJoin" in plan
    below_join = plan.split("SortMergeJoin", 1)[1]
    assert "Exchange" not in below_join
    assert "SelectedBucketsCount" in plan


def test_incremental_dedup_hash_join_on_md5(spark):
    # uniform md5 keys -> hash join; history side partial-aggregates
    plan = _plan(queries()["q_ext_incremental_dedup"](spark, SF))
    assert "partial_" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_containment_no_all_pairs(spark):
    plan = _plan(queries()["q_ext_dedup_containment"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "InMemoryTableScan" in plan  # persisted sig + shingles


def test_ks_drift_one_window_pass(spark):
    # both cumulative counts from ONE (source; v) window; sizes join
    # broadcasts
    plan = _plan(queries()["q_ext_ks_drift"](spark, SF))
    assert plan.count("Window") == 1
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_vocab_coverage_corpus_stage_is_term_count(spark):
    # rank/cumsum windows run over the TakeOrderedAndProject top-max(k)
    # slice, never the full vocabulary; totals come from a one-row
    # aggregate; the k-grid and totals attach by broadcast only
    plan = _plan(queries()["q_ext_vocab_coverage"](spark, SF))
    assert "partial_" in plan
    assert "TakeOrderedAndProject" in plan
    assert plan.index("Window") < plan.index("TakeOrderedAndProject")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_winsorize_approx_path_is_partial_aggregated(spark):
    # the 100 TB path: grouped approx_percentile (mergeable sketch,
    # map-side combined) + broadcast join-back — no whole-partition
    # window buffering one event type's rows in one task
    from binancedatapipelineinaws_spark.operators.analytics import (
        winsorize_frame,
    )

    plan = _plan(winsorize_frame(spark, SF, exact=False))
    assert "Window" not in plan
    assert "approx_percentile" in plan
    assert "partial_" in plan
    assert "BroadcastHashJoin" in plan


def test_mad_outliers_approx_path_is_partial_aggregated(spark):
    from binancedatapipelineinaws_spark.operators.stats import (
        mad_outliers_frame,
    )

    plan = _plan(mad_outliers_frame(spark, SF, exact=False))
    assert "Window" not in plan
    assert "approx_percentile" in plan
    assert "partial_" in plan
    assert plan.count("BroadcastHashJoin") >= 2  # median + MAD join-backs


def test_ks_drift_binned_window_over_bins_not_rows(spark):
    # binned path: corpus-sized work is one combinable (source, bin,
    # half) count; the cumulative window orders by bin over the
    # sources x bins table, never by per-document value
    from binancedatapipelineinaws_spark.operators.stats import (
        ks_drift_frame,
    )

    plan = _plan(ks_drift_frame(spark, SF, exact=False))
    assert "partial_" in plan
    assert plan.count("Window") == 1
    win_seg = plan.split("Window", 1)[1].splitlines()[0]
    assert "bin#" in win_seg  # window spec sorts bins, not doc values
    assert "v#" not in win_seg
    assert "BroadcastHashJoin" in plan


def test_activity_gini_histogram_no_user_rank(spark):
    # count-of-counts Gini: no row_number over the users table at all;
    # the only window is a running sum over the events-per-user
    # histogram, whose size is bounded by max-events-per-user (a small
    # domain that does not grow with the corpus)
    plan = _plan(queries()["q_ext_activity_gini"](spark, SF))
    assert "row_number" not in plan
    assert plan.count("Window") == 1
    assert "partial_" in plan
    assert "Join" not in plan


def test_tpch_q5_broadcasts_dims_and_pushes_dates(spark):
    plan = _plan(queries()["q_ext_tpch_q5"](spark, SF))
    # all four dims arrive by broadcast; the only SMJ/shuffle join
    # allowed is the fact-fact orders-lineitem one
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # date filter reaches the orders-side Filter (the FileScan's
    # DataFilters list truncates in long sessions — see the Q6 test)
    assert any(
        "Filter" in line and "o_orderdate" in line and ">=" in line
        for line in plan.splitlines()
    )


def test_oov_rate_vocab_is_takeordered_and_broadcast(spark):
    plan = _plan(queries()["q_ext_oov_rate"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan  # no vocabulary-sized rank window


def test_pareto_share_no_user_sized_window(spark):
    # same contract as the histogram Gini: windows only over the
    # events-per-user histogram, never a row_number over users
    plan = _plan(queries()["q_ext_pareto_share"](spark, SF))
    assert "row_number" not in plan
    assert "partial_" in plan


def test_funnel_single_user_shuffle(spark):
    # the one-pass funnel: exactly one user-keyed exchange feeds the
    # collect_list aggregate; no join remains
    plan = _plan(queries()["q_ext_funnel"](spark, SF))
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_session_stats_one_window_exchange(spark):
    # the session window and both rollups share the user_id
    # partitioning: one exchange total
    plan = _plan(queries()["q_ext_session_stats"](spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_tpch_q6_pure_scan_no_join(spark):
    # the scan-bandwidth query: predicates pushed, no join anywhere.
    # NB: assert on the Filter node, not the FileScan's DataFilters —
    # Spark truncates long field sequences in toString ("... N more
    # fields") once attribute ids grow, which made a FileScan-line
    # assertion flaky across session lifetimes.
    plan = _plan(queries()["q_ext_tpch_q6"](spark, SF))
    assert "Join" not in plan
    assert "PushedFilters: [" in plan
    assert any(
        "Filter" in line and "l_shipdate" in line and ">=" in line
        for line in plan.splitlines()
    )


def test_supplier_hhi_broadcasts_dims(spark):
    plan = _plan(queries()["q_ext_supplier_hhi"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2  # supplier + nation + totals
    assert "CartesianProduct" not in plan


def test_dup_rate_window_not_join(spark):
    # the k-cluster cost is k rows through ONE md5-partitioned window,
    # never a cluster-size join back
    plan = _plan(queries()["q_ext_dup_rate_by_source"](spark, SF))
    assert "Join" not in plan
    assert plan.count("Window") == 1


def test_tpch_q18_broadcast_join_back(spark):
    # the HAVING-pruned survivor set broadcasts into orders; the only
    # exchange is the lineitem partial-agg; top-100 never global-sorts
    plan = _plan(queries()["q_ext_tpch_q18"](spark, SF))
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "TakeOrderedAndProject" in plan


def test_tpch_q19_disjunction_stays_filter(spark):
    # OR-of-conjunctions is a post-join codegen filter, never a join
    # condition: broadcast hash join on the key alone, no BNLJ
    plan = _plan(queries()["q_ext_tpch_q19"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_gopher_rules_single_pass_no_explode(spark):
    # three integer signals from one map-only projection: no Generate
    # (explode), one partial+final aggregate exchange
    plan = _plan(queries()["q_ext_gopher_rules"](spark, SF))
    assert "Join" not in plan
    assert "Generate" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_mix_weights_one_corpus_pass(spark):
    # the grand total rolls up the persisted sources-bounded table:
    # BOTH branches read the cache (documents is scanned once, at cache
    # materialization — the FileScan lines in the printout are the
    # InMemoryRelation's definition subtree, printed per reader); the
    # 1-row total attaches by broadcast
    plan = _plan(queries()["q_ext_mix_weights"](spark, SF))
    assert plan.count("InMemoryTableScan") == 2
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_interarrival_one_window_high_card_key(spark):
    # ONE window pass over (user_id, event_type) — no per-type
    # serialization — then a bands-bounded rollup
    plan = _plan(queries()["q_ext_interarrival"](spark, SF))
    assert plan.count("Window") == 1
    assert "partitionBy=[user_id" in plan.replace(
        "user_id#", "user_id_"
    ) or "user_id" in plan  # key present in the window spec
    assert "Join" not in plan


def test_tpch_q7_dims_broadcast_one_fact_shuffle(spark):
    # two-nation prefiltered supplier/customer sides broadcast; the
    # only shuffled join is the fact-fact orderkey join
    plan = _plan(queries()["q_ext_tpch_q7"](spark, SF))
    assert plan.count("SortMergeJoin") == 1
    assert plan.count("BroadcastHashJoin") >= 3
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_tpch_q8_dims_broadcast_one_fact_shuffle(spark):
    # region->nation->customer chain collapses to broadcasts; one
    # shuffled fact-fact join; share computed in a single agg pass
    plan = _plan(queries()["q_ext_tpch_q8"](spark, SF))
    assert plan.count("SortMergeJoin") == 1
    assert plan.count("BroadcastHashJoin") >= 4
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_tpch_q13_aggregates_orders_before_join(spark):
    # orders partial-aggregates to (custkey, count) BEFORE the left
    # join; the histogram is a second tiny-domain aggregate
    plan = _plan(queries()["q_ext_tpch_q13"](spark, SF))
    assert "partial_count" in plan
    assert plan.count("Exchange hashpartitioning") == 2
    assert "CartesianProduct" not in plan


def test_tpch_q15_one_pass_exact_decimal_max(spark):
    # the persisted revenue table feeds BOTH the max and the equality
    # filter: one corpus pass; no nested-loop anywhere
    plan = _plan(queries()["q_ext_tpch_q15"](spark, SF))
    assert plan.count("InMemoryTableScan") == 2
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_tpch_q17_decorrelated_broadcast_no_self_shuffle(spark):
    # the correlated avg subquery decorrelates into per-part stats
    # BROADCAST back into the persisted brand-filtered fact: the only
    # hash exchange is the stats partial-agg
    plan = _plan(queries()["q_ext_tpch_q17"](spark, SF))
    assert plan.count("InMemoryTableScan") == 2
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in plan


def test_tokenizer_fertility_single_aggregate(spark):
    plan = _plan(queries()["q_ext_tokenizer_fertility"](spark, SF))
    assert "Join" not in plan
    assert "Generate" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_bottomk_sample_is_take_ordered(spark):
    # parallel partial top-k, merged — NO exchange, no global sort
    plan = _plan(queries()["q_ext_bottomk_sample"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_exact_quantiles_no_global_sort(spark):
    # corpus-sized stages: a bucket-partitioned histogram aggregate
    # and the per-(q, bucket) rank window; the only unpartitioned
    # window runs over the <=1024-row histogram.  No sort-merge join,
    # and every nested-loop join has a bounded (1-row stats / targets
    # / hit-buckets) broadcast side.
    plan = _plan(queries()["q_ext_exact_quantiles"](spark, SF))
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 2
    assert plan.count("BroadcastHashJoin") >= 1
    assert "InMemoryTableScan" in plan  # vals persisted: one parquet read


def test_knn_filtered_label_rides_join_condition(spark):
    # the metadata predicate tightens the broadcast candidate join —
    # never a post-top-k filter
    plan = _plan(queries()["q_ext_knn_filtered"](spark, SF))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 1  # top-k window


def test_tpch_q4_exists_is_left_semi(spark):
    # correlated EXISTS -> one LEFT SEMI join; no dedup aggregate
    plan = _plan(queries()["q_ext_tpch_q4"](spark, SF))
    assert "LeftSemi" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan


def test_tpch_q22_anti_join_threshold_broadcast(spark):
    # NOT EXISTS -> LEFT ANTI; the avg threshold is a 1-row broadcast
    plan = _plan(queries()["q_ext_tpch_q22"](spark, SF))
    assert "LeftAnti" in plan
    assert "SortMergeJoin" not in plan
    assert "InMemoryTableScan" in plan  # pos persisted: one customer read


def test_sql_surface_same_plan_as_dataframe_api(spark):
    # the pure-SQL front door compiles to the canonical shape: one
    # partial+final aggregate, one day-keyed window, nothing else
    plan = _plan(queries()["q_sql_surface"](spark, SF))
    assert "partial_" in plan
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Join" not in plan


def test_copurchase_self_join_on_basket_key(spark):
    # the pair blow-up is bounded by order width: the self-join keys on
    # l_orderkey (persisted distinct read twice), support counts
    # combine map-side, HAVING prunes pre-output
    plan = _plan(queries()["q_ext_copurchase_pairs"](spark, SF))
    assert plan.count("InMemoryTableScan") == 2
    assert "partial_count" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_word_entropy_two_keyed_shuffles_no_join(spark):
    # explode -> (doc, term) counts -> per-doc rollup: two
    # high-cardinality keyed exchanges, no join anywhere
    plan = _plan(queries()["q_ext_word_entropy"](spark, SF))
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 2
    assert plan.count("Generate") == 1


def test_basket_lift_item_counts_broadcast(spark):
    # the parts-bounded item table joins back broadcast; no SMJ, no
    # cartesian beyond the 1-row basket total
    plan = _plan(queries()["q_ext_basket_lift"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_first_touch_one_window_no_self_join(spark):
    # attribution is ONE user-keyed window pass + a channels-bounded
    # rollup — never a purchases-to-touches self-join
    plan = _plan(queries()["q_ext_first_touch"](spark, SF))
    assert "Join" not in plan
    assert plan.count("Window") == 1
    assert plan.count("Exchange hashpartitioning") == 2


def test_catalog_coverage_fact_reduces_to_keys(spark):
    # lineitem contributes only its distinct key dictionary
    plan = _plan(queries()["q_ext_catalog_coverage"](spark, SF))
    assert "partial_" in plan  # distinct is partial-aggregated
    assert "CartesianProduct" not in plan


def test_dedup_roi_copartitioned_hash_join(spark):
    # keeper min joins back on the SAME hash key: co-partitioned, no
    # extra corpus shuffle beyond the two hash-keyed exchanges
    plan = _plan(queries()["q_ext_dedup_roi"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "partial_min" in plan


def test_repeat_purchase_counts_before_dim_join(spark):
    # orders reduce to per-customer counts before the broadcast dim
    plan = _plan(queries()["q_ext_repeat_purchase"](spark, SF))
    assert "partial_count" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_groupk_sample_one_stratum_window(spark):
    # one rank Window node; WindowGroupLimit (rank-filter pushdown)
    # keeps only k rows per stratum ahead of the sort — count node
    # headers ("Window ["), not the substring
    plan = _plan(queries()["q_ext_groupk_sample"](spark, SF))
    assert "Join" not in plan
    assert plan.count("Window [") == 1
    assert "WindowGroupLimit" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_topk_talkers_window_group_limit(spark):
    # (shard, user) counts partial-aggregate map-side; the rank<=k
    # filter must push a per-partition top-k below the exchange
    plan = _plan(queries()["q_ext_topk_talkers"](spark, SF))
    assert "WindowGroupLimit" in plan
    assert plan.count("Window [") == 1
    assert "HashAggregate" in plan
    assert "Join" not in plan


def test_dedup_horizon_one_shuffle_no_python(spark):
    # greedy-chain fold runs JVM-side on the grouped arrays: exactly
    # one exchange (the key groupBy), no Window, no Python UDF
    plan = _plan(queries()["q_ext_dedup_horizon"](spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan
    assert "Window [" not in plan
    assert "Join" not in plan


def test_longest_dupspan_two_shuffles_no_pair_join(spark):
    # gram-keyed flag window + doc-keyed run collapse; the (doc, grp)
    # and doc aggregates must reuse the doc_id partitioning, and no
    # gram-frequency join back / pair join may appear
    plan = _plan(queries()["q_ext_longest_dupspan"](spark, SF))
    assert "CartesianProduct" not in plan
    # exchanges: gram window, doc_id window, plus the final left join's
    # two sides (doc-keyed) — but never a second corpus-gram shuffle
    assert plan.count("Exchange hashpartitioning") <= 4
    assert plan.count("Window [") == 2


def test_first_event_mix_one_corpus_window_pass(spark):
    # ONE corpus-sized rank window (plus the share window over the
    # types-bounded rollup); no join, no second corpus read
    plan = _plan(queries()["q_ext_first_event_mix"](spark, SF))
    assert plan.count("Window [") == 2  # corpus rank + 5-row share
    assert "WindowGroupLimit" in plan
    assert plan.count("FileScan") == 1
    assert "Join" not in plan


def test_tpch_q3_takeordered_broadcast_segment(spark):
    # customer segment dim broadcasts; both date filters push to the
    # fact scans; the top-10 is a parallel partial top-k, never a
    # global sort
    plan = _plan(queries()["q_ext_tpch_q3"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "PushedFilters: [IsNotNull(o_orderdate)" in plan or (
        "LessThan(o_orderdate" in plan
    )


def test_hybrid_rrf_constant_bounded_windows(spark):
    # each ranker cuts to its constant top-N via TakeOrderedAndProject
    # BEFORE any unpartitioned rank window, so the single-partition
    # windows are N-row-bounded, not corpus-bounded
    plan = _plan(queries()["q_ext_hybrid_rrf"](spark, SF))
    assert plan.count("TakeOrderedAndProject") >= 2
    assert "CartesianProduct" not in plan


def test_embed_covariance_no_self_join(spark):
    # partials come from per-partition Gram-matrix mat-muls (the
    # Arrow-batched kernel), NOT a corpus-sized self-join; the only
    # joins are the 64-row per-dim stat broadcasts, and the final cut
    # is a TakeOrdered over the constant 2016-pair aggregate
    plan = _plan(queries()["q_ext_embed_covariance"](spark, SF))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "MapInPandas" in plan
    assert "TakeOrderedAndProject" in plan


def test_partitioned_scan_prunes_partitions(spark):
    # the event_type predicate must resolve against directory names at
    # planning time (PartitionFilters), not as a data filter over all
    # partitions' files
    plan = _plan(queries()["q_maint_partitioned_scan"](spark, SF))
    assert "PartitionFilters: [" in plan
    part_filters = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "event_type" in part_filters
    assert "partial_count" in plan  # map-side combine on the rollup


def test_rfm_no_rank_windows_one_fact_shuffle(spark):
    # fixed thresholds keep the plan window-free: one per-customer
    # partial-aggregated pass, a 1-row broadcast anchor, a bounded
    # segment rollup
    plan = _plan(queries()["q_ext_rfm_segments"](spark, SF))
    assert "Window" not in plan
    assert "partial_" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_quality_score_map_only_rollup(spark):
    # one corpus pass: no joins, no windows, a single aggregation
    # exchange over the (lang x band) key space
    plan = _plan(queries()["q_ext_quality_score"](spark, SF))
    assert "Join" not in plan
    assert "Window" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("FileScan") == 1


def test_tpch_q16_distinct_expand_broadcast(spark):
    # pruned part dim broadcasts; COUNT DISTINCT runs as the two-phase
    # aggregate (an Expand or a partial distinct pre-aggregate), never
    # a per-group set buffer on one task
    plan = _plan(queries()["q_ext_tpch_q16"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


def test_tpch_q20_aggregates_before_semi_join(spark):
    # the fact partial-aggregates to (supp, part) volumes before any
    # join; the IN-subquery is a semi join, not a nested probe
    plan = _plan(queries()["q_ext_tpch_q20"](spark, SF))
    assert "partial_" in plan
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_tpch_q21_decorrelated_no_nested_probes(spark):
    # the double-correlated EXISTS/NOT EXISTS must be fully
    # decorrelated: only hash joins + aggregates, a broadcast supplier
    # dim, and the constant top-20 cut
    plan = _plan(queries()["q_ext_tpch_q21"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_asof_tolerance_same_plan_as_asof(spark):
    # the tolerance gate must not change the join strategy: one
    # user-keyed window over the union, a single hash exchange, no join
    plan = _plan(queries()["q_ext_asof_tolerance"](spark, SF))
    assert "Join" not in plan
    assert plan.count("Window [") == 1
    # the click tie-dedup aggregate + the user-keyed window — exactly
    # the q_join_asof exchanges, none added by the tolerance gate
    assert plan.count("Exchange hashpartitioning") == 2


def test_hll_union_partial_aggregated(spark):
    # both sketch paths must combine map-side (objHashAggregate with
    # partial_ phases); the union rollup is types-bounded
    plan = _plan(queries()["q_ext_hll_union_error"](spark, SF))
    assert "partial_" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_theta_overlap_sketch_branch_is_broadcast(spark):
    # the pairwise set algebra runs over the 5-row sketch table as a
    # broadcast self-join; the corpus feeds ONE distinct pass
    plan = _plan(queries()["q_ext_theta_overlap_error"](spark, SF))
    assert "partial_" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_kll_rank_no_percentile_window(spark):
    # the whole point: no Window node anywhere — a sketch aggregate
    # plus an exact rank-count aggregate with a broadcast join back
    plan = _plan(queries()["q_ext_kll_rank_error"](spark, SF))
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan
    assert "partial_" in plan


def test_assign_cells_corpus_side_is_map_only(spark):
    # VERDICT r7 item 3: the IVF coarse quantizer must touch the
    # corpus with ZERO key shuffles — scan -> norm project -> 1-row
    # broadcast BNLJ -> argmin fold.  The old form crossJoined K
    # centroid rows and ran a row_number() window partitioned by
    # vec_id (a full corpus hashpartitioning shuffle).  The only
    # Exchange tolerated on the corpus side is the toy-corpus
    # RoundRobin parallelism guard (dead at any real scan size);
    # hash-keyed exchanges live only in the tiny centroid-build
    # branch UNDER the BroadcastExchange.
    from binancedatapipelineinaws_spark.functions.similarity import (
        assign_cells,
    )

    plan = _plan(assign_cells(spark, SF))
    assert "Window" not in plan, plan
    head, _, _build = plan.partition("BroadcastExchange")
    assert "Exchange hashpartitioning" not in head, head
    assert "BroadcastNestedLoopJoin" in plan


def test_triangles_closing_join_is_hash_join(spark):
    # wedge canonicalization by the orientation's (deg, id) order
    # makes the closing probe an equi-join; an OR-of-orientations
    # condition would plan as a CONDITION-BEARING nested-loop join
    # over all wedges.  The only BNLJ allowed are the deliberate
    # 1-row-build pure-Cross joins assembling the single output row.
    import re

    plan = _plan(queries()["q_ext_triangles"](spark, SF))
    bad = re.findall(r"BroadcastNestedLoopJoin Build\w+, (?!Cross)\w+", plan)
    assert not bad, bad
    assert "CartesianProduct" not in plan


def test_pagerank_iterations_are_partial_aggregated(spark):
    # each SpMV iteration must partial-aggregate contributions
    # map-side; no condition-bearing nested-loop joins (the 1-row
    # n_nodes broadcast is a pure Cross)
    import re

    plan = _plan(queries()["q_ext_pagerank"](spark, SF))
    assert "partial_sum" in plan
    assert "CartesianProduct" not in plan
    bad = re.findall(r"BroadcastNestedLoopJoin Build\w+, (?!Cross)\w+", plan)
    assert not bad, bad


def test_bloom_join_prune_probe_is_broadcast(spark):
    # the probe must ride the fact scan: fingerprint set and truth
    # dim both broadcast, no fact-side Exchange before the joins
    plan = _plan(queries()["q_ext_bloom_join_prune"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan
    head, _, _rest = plan.partition("BroadcastExchange")
    assert "Exchange hashpartitioning" not in head, head


def test_indicator_windows_day_partitioned_and_jvm_only(spark):
    # the window indicators must stay whole-JVM (no Python eval in the
    # hot path), partial-aggregate the candle rollup map-side, and run
    # their frames as Window nodes over the day partitioning (never an
    # unpartitioned global sort)
    for qid, max_windows in [
        ("q_ext_bollinger", 1),
        ("q_ext_donchian", 1),
        ("q_ext_obv", 2),       # lag + running sum share the day spec
        ("q_ext_atr", 2),       # lag window + rolling-mean frame
        ("q_ext_stochastic", 2),  # %K frame + %D lag window
    ]:
        plan = _plan(queries()[qid](spark, SF))
        assert "BatchEvalPython" not in plan, qid
        assert "ArrowEvalPython" not in plan, qid
        assert "partial_" in plan, qid  # candle rollup map-side combine
        n_win = plan.count(" Window [")
        assert 1 <= n_win <= max_windows, (qid, n_win)
        # every Window node is partitioned (by day): the plan renders
        # an unpartitioned spec as `Window [...], [ord...]` with an
        # empty partition list `[], [`
        assert "], [], [" not in plan, qid


def test_recurrence_folds_are_generate_projections(spark):
    # RSI/MACD (and the r8-close machines: Keltner's twin EMAs, the
    # SAR and Supertrend conditional-reset states) run the fold inside
    # a project over the day-grouped arrays and explode the result: no
    # Window nodes, no Python, one aggregate for the bars collect
    for qid in [
        "q_ext_rsi",
        "q_ext_macd",
        "q_ext_keltner",
        "q_ext_parabolic_sar",
        "q_ext_supertrend",
    ]:
        plan = _plan(queries()[qid](spark, SF))
        assert "BatchEvalPython" not in plan, qid
        assert "ArrowEvalPython" not in plan, qid
        assert " Window [" not in plan, qid
        assert "Generate posexplode" in plan, qid


def test_scd2_single_user_shuffle(spark):
    # all four steps (lag flag, running version, span agg, lead) ride
    # ONE user_id exchange; no Python nodes
    plan = _plan(queries()["q_ext_scd2"](spark, SF))
    assert "BatchEvalPython" not in plan
    import re

    exchanges = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    assert len(exchanges) == 1, exchanges
    assert exchanges[0].startswith("user_id")


def test_vpin_integer_clock_no_python(spark):
    plan = _plan(queries()["q_ext_vpin"](spark, SF))
    assert "BatchEvalPython" not in plan
    assert "partial_" in plan  # bucket + day aggregates map-side combined


def test_heikin_ashi_fold_is_generate_projection(spark):
    plan = _plan(queries()["q_ext_heikin_ashi"](spark, SF))
    assert "BatchEvalPython" not in plan
    assert " Window [" not in plan
    assert "Generate posexplode" in plan


def test_not_in_null_uses_null_aware_anti_join(spark):
    # the ANSI NOT IN must compile to the null-aware anti join (the
    # OR-isnull equality), not a plain anti join — a plain rewrite
    # would wrongly keep the all-NULL-list rows
    plan = _plan(queries()["q_sub_not_in_null"](spark, SF))
    assert "LeftAnti" in plan
    assert "isnull" in plan


def test_regr_single_pass_partial_moments(spark):
    # r8 resume: the six regression moments ride ONE aggregate with
    # map-side combine — no join, no window, no second shuffle
    plan = _plan(queries()["q_ext_regr"](spark, SF))
    assert "partial_" in plan
    assert "Join" not in plan
    assert "Window" not in plan
    # one exchange for the group-by (plus AQE reads), never more
    assert plan.count("Exchange hashpartitioning") <= 1


def test_bitmap_distinct_no_expand(spark):
    # the whole point vs count_distinct: no Expand node, duplicates
    # combine map-side into (group, chunk) words
    plan = _plan(queries()["q_ext_bitmap_distinct"](spark, SF))
    assert "Expand" not in plan
    assert "partial_" in plan


def test_mode_disc_windows_over_domain_aggregate(spark):
    # windows must run over the (group, value) aggregate, not raw rows:
    # the aggregate appears below the window in the plan tree
    plan = _plan(queries()["q_ext_mode_disc"](spark, SF))
    assert "Window" in plan
    win_below = plan.split("Window")[-1]
    assert "HashAggregate" in win_below, "window is not over the domain aggregate"


def test_weighted_median_windows_over_domain_aggregate(spark):
    plan = _plan(queries()["q_ext_weighted_median"](spark, SF))
    assert "Window" in plan
    win_below = plan.split("Window")[-1]
    assert "HashAggregate" in win_below, "window is not over the domain aggregate"


def test_tpch_q21_single_lineitem_shuffle(spark):
    """The r9 rewrite: per-order stats windows, the (order, supplier)
    late-flag aggregate, and the solo-order window all reuse ONE
    l_orderkey Exchange of lineitem; supplier joins broadcast.  The
    pre-rewrite form derived `flags` twice (whole upstream executed
    2x) — pin the one-pass shape."""
    import re

    plan = _plan(queries()["q_ext_tpch_q21"](spark, SF))
    keyed = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    orderkey_shuffles = [k for k in keyed if "l_orderkey" in k]
    assert len(orderkey_shuffles) == 1, keyed
    # first_ship + n_supps share one Window node (same spec, fused by
    # Catalyst); n_late is the second
    assert plan.count("Window") == 2


def test_bpe_pair_counts_vocab_collapse_first(spark):
    """The corpus-sized explode must happen AFTER the word-count
    aggregate: exactly two hash shuffles (word counts, pair counts)
    and the Generate for the pair positions sits above the first
    aggregate, not on the raw scan."""
    plan = _plan(queries()["q_ext_bpe_pair_counts"](spark, SF))
    assert plan.count("Exchange hashpartitioning") == 2
    # two Generates total: the token split explode (pre-agg, corpus
    # sized but map-local) and the pair-position explode (vocab sized)
    assert plan.count("Generate") == 2


def test_merge_into_single_join_no_window(spark):
    """MERGE = two user-keyed partial aggregates + ONE join; no window
    over the corpus, no nested loops."""
    plan = _plan(queries()["q_ext_merge_into"](spark, SF))
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") + plan.count(
        "BroadcastHashJoin"
    ) == 1


def test_tpch_q2_correlated_min_over_cached_pairs(spark):
    """Q2's correlated MIN decorrelates over the (part, supplier)
    pair aggregate, which is persisted: the fact contributes ONE
    shuffle and the equality probe + per-part min both read the
    cache.  All dims broadcast; top-100 is a TakeOrdered cut."""
    plan = _plan(queries()["q_ext_tpch_q2"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert plan.count("InMemoryTableScan") >= 2  # probe + per-part min


def test_tpch_q9_part_prefix_pushed_dims_broadcast(spark):
    """Q9: the name prefix must reach the part scan as a pushed
    filter, every dim joins broadcast, and the profit aggregate is
    partial-aggregated (one (nation, year) exchange)."""
    plan = _plan(queries()["q_ext_tpch_q9"](spark, SF))
    assert "StringStartsWith(p_name,blue)" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "partial_" in plan
    assert "BroadcastHashJoin" in plan


def test_tpch_q11_threshold_is_one_row_broadcast(spark):
    """Q11's global threshold is a 1-row broadcast probe over the
    persisted per-part value table (the only deliberate BNLJ), never
    a re-scan of the fact; no window anywhere."""
    plan = _plan(queries()["q_ext_tpch_q11"](spark, SF))
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("InMemoryTableScan") >= 2  # total + filter probe


def test_tpch_q12_single_join_bounded_agg(spark):
    """Q12 is one fact x orders key join + a <=3-group CASE aggregate:
    no window, no generate, and the ship-year window pushes to the
    fact scan."""
    plan = _plan(queries()["q_ext_tpch_q12"](spark, SF))
    assert "Window" not in plan
    assert "Generate" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert plan.count("BroadcastHashJoin") + plan.count(
        "SortMergeJoin"
    ) + plan.count("ShuffledHashJoin") == 1


def test_pmi_pair_table_cached_marginals_broadcast(spark):
    """PMI: the corpus tokenizes ONCE into the persisted pair table;
    both marginals, the grand total, and the probe all read the cache
    (>= 4 InMemoryTableScans); the top-50 cut is a TakeOrdered on the
    rounded pmi with full tie-break."""
    plan = _plan(queries()["q_ext_pmi_collocations"](spark, SF))
    assert plan.count("InMemoryTableScan") >= 4
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    # the 1-row grand-total probe is the only nested-loop node
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_bpe_train_k_rounds_never_rescan_corpus(spark):
    """k-round BPE trainer: the corpus collapses to the persisted
    word-count table ONCE; every merge round's pair aggregate and
    vocab rewrite, and each round's persisted 1-row winner, resolve
    to InMemoryTableScans (the FileScan text that remains sits inside
    InMemoryRelation definitions and executes once, like gapfill).
    Winners are TakeOrdered cuts; the only sort exchange is the final
    5-row ORDER BY round."""
    from binancedatapipelineinaws_spark.functions.text import (
        BPE_TRAIN_ROUNDS,
    )

    plan = _plan(queries()["q_ext_bpe_train_k"](spark, SF))
    assert "CartesianProduct" not in plan
    # 5 pair aggregates + 5 vocab rewrites + the output rows all read
    # persisted relations
    assert plan.count("InMemoryTableScan") >= 2 * BPE_TRAIN_ROUNDS
    assert plan.count("TakeOrderedAndProject") >= BPE_TRAIN_ROUNDS


def test_range_vol_single_candle_shuffle_no_window(spark):
    """Range-vol: ONE tick shuffle (the minute-candle aggregate,
    persisted — day rollup and both first/last-minute joins read the
    cache), no Window nodes, no cartesian; the closing log algebra is
    map-only."""
    plan = _plan(queries()["q_ext_range_vol"](spark, SF))
    assert "CartesianProduct" not in plan
    # min_by/max_by candles produce NO Window at all (ADVICE r11: the
    # old <=2 slack weakened the "no window" guarantee the name makes)
    assert plan.count(" Window [") == 0
    assert plan.count("InMemoryTableScan") >= 3  # rollup + 2 minute joins


def test_intraday_profile_two_exchanges(spark):
    """Intraday profile: the candle aggregate and the 1440-key rollup
    are the only hash shuffles; both partial-aggregate map-side."""
    plan = _plan(queries()["q_ext_intraday_profile"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "partial_" in plan


def test_clusters_propagation_round_pins_shuffle_hash(spark):
    """Min-label propagation must NEVER plan a broadcast build: AQE
    sees a small label table and would broadcast it to the driver
    EVERY round — the r11 x100 sweep OOM'd the shared JVM exactly
    there (SCALE_r11.json incident).  One propagation round, executed
    so AQE finalizes: shuffle-hash joins only, zero broadcast."""
    from pyspark.sql import functions as F

    from binancedatapipelineinaws_spark.functions.dedup import (
        propagation_round,
    )

    edges = spark.range(1000).select(
        (F.col("id") % 100).alias("src"), (F.col("id") % 37).alias("dst")
    )
    labels = spark.range(100).select(
        F.col("id").alias("doc_id"), F.col("id").alias("cluster_id")
    )
    out = propagation_round(edges, labels)
    out.write.format("noop").mode("overwrite").save()
    plan = _plan(out)
    assert "BroadcastHashJoin" not in plan
    assert "BroadcastExchange" not in plan
    assert plan.count("ShuffledHashJoin") == 2  # neighbor join + merge


def test_sentence_dedup_one_corpus_shuffle_no_pairs(spark):
    """Sentence dedup (r12 window form): ONE sentence explode feeding
    ONE corpus-sized (s, source) pre-aggregate; global frequency is a
    sentence-partitioned window SUM over the pre-agg rows — no join
    anywhere (the r11 join-back shape evaluated the explode once per
    join branch and re-shuffled the probe side), no pair join, no
    cartesian."""
    plan = _plan(queries()["q_ext_sentence_dedup"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "Join" not in plan  # no join of any kind
    assert plan.count("Generate") == 1  # the explode runs ONCE
    assert plan.count(" Window [") == 1  # the frequency sum
    assert "partial_count" in plan  # map-side combine on (s, source)


def test_pagerank_capped_one_window_no_cartesian(spark):
    """Capped pagerank adds one RUNTIME window pass (the per-node
    top-K row_number cut, persisted so both mutuality semi-join sides
    read the cache) and keeps the uncapped discipline:
    partial-aggregated SpMV, no cartesian, no condition-bearing
    BNLJ."""
    import re

    plan = _plan(queries()["q_ext_pagerank_capped"](spark, SF))
    # the kept list is PERSISTED (both semi-join sides read the cache)
    # and the static plan reprints it per reference: one window SPEC
    # per self-join side (exprId-deduped), all over the row_number cut
    assert len(set(re.findall(r"AS rn#\d+", plan))) <= 2
    assert "row_number" in plan
    assert "InMemoryTableScan" in plan
    assert "partial_sum" in plan
    assert "CartesianProduct" not in plan
    bad = re.findall(r"BroadcastNestedLoopJoin Build\w+, (?!Cross)\w+", plan)
    assert not bad, bad


def test_triangles_capped_closing_join_is_hash_join(spark):
    """Capped triangles: same equi-join closing probe as the uncapped
    id (no condition-bearing BNLJ), plus the persisted row_number cut
    (one runtime window pass)."""
    import re

    plan = _plan(queries()["q_ext_triangles_capped"](spark, SF))
    assert len(set(re.findall(r"AS rn#\d+", plan))) <= 2
    assert "row_number" in plan and "InMemoryTableScan" in plan
    bad = re.findall(r"BroadcastNestedLoopJoin Build\w+, (?!Cross)\w+", plan)
    assert not bad, bad
    assert "CartesianProduct" not in plan


def test_minhash_idf_partial_aggregated_no_pair_join(spark):
    """IDF-weighted minhash: the df join-back is keyed on the SAME
    shingle key as the df aggregate (no new shuffle class), the 16-way
    min aggregate partial-aggregates map-side, and nothing plans a
    pair join or cartesian."""
    plan = _plan(queries()["q_ext_dedup_minhash_idf"](spark, SF))
    assert "partial_min" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_perplexity_buckets_one_doc_window(spark):
    """Perplexity bucketing: exactly ONE Window (the per-source ntile
    over per-DOCUMENT rows — the scorer itself is groupBy-based, no
    count-windows over the bigram stream), LM broadcast back."""
    plan = _plan(queries()["q_ext_perplexity_buckets"](spark, SF))
    assert plan.count(" Window [") == 1
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_tokenizer_apply_rounds_never_rescan_corpus(spark):
    """Tokenizer apply rides the trainer's vocab-surgery law: the
    corpus collapses to the persisted word-count table once; every
    round's stat aggregate and rewrite resolve to InMemoryTableScans
    + TakeOrdered winners."""
    from binancedatapipelineinaws_spark.functions.text import (
        BPE_TRAIN_ROUNDS,
    )

    plan = _plan(queries()["q_ext_tokenizer_apply"](spark, SF))
    assert "CartesianProduct" not in plan
    assert plan.count("InMemoryTableScan") >= 2 * BPE_TRAIN_ROUNDS
    assert plan.count("TakeOrderedAndProject") >= BPE_TRAIN_ROUNDS


def test_dedup_near_idf_no_pair_explosion(spark):
    """Weighted near-dup keeps the uncapped id's discipline: banded
    equi-join candidates (no cartesian, no condition-bearing BNLJ),
    df-capped verify where the cap FILTER rides the weight join."""
    import re

    plan = _plan(queries()["q_ext_dedup_near_idf"](spark, SF))
    assert "CartesianProduct" not in plan
    bad = re.findall(r"BroadcastNestedLoopJoin Build\w+, (?!Cross)\w+", plan)
    assert not bad, bad
    assert "InMemoryTableScan" in plan  # sig + weighted shingles persisted
