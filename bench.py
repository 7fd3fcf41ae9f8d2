"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

stdout is EXACTLY that one line, nothing else: the driver stores only
the last 2000 characters of stdout and parses the JSON out of that
window, so any extra stdout (or a JSON line longer than the window —
the r10 failure mode, BENCH_r10.json `parsed: null`) silently destroys
the round's performance record.  Per-query ids inside "queries" are
therefore printed WITHOUT their `q_` / `q_ext_` prefix (declared by
the embedded "key_note"; the mapping is collision-free and asserted),
and the line length is asserted < 1950 with a 3dp->2dp degrade step.
Human-readable per-query timings and the full-name results dict go to
stderr.

Headline set: one representative per operator family, weighted toward
the plans that matter at 100 TB (multiway join, OHLCV, windows, LSH
dedup, cosine top-k).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# r12 pruning: the driver's 2000-char stdout window caps the per-query
# dict at ~96 ids on the 1dp degrade rung.  To admit the iterative +
# r12 ids below, eight OVERHEAD-DOMINATED sf0.1 entries (map-only
# projections and single-shuffle aggregates measuring ~0.1-0.5 s of
# fixed Spark overhead, each family still covered by a heavier
# representative) were retired: agg_sum_avg_minmax, agg_approx_distinct
# (hll_union_error keeps the sketch path), join_inner (multiway/asof/
# tpch keep joins), win_running_sum (moving_avg/rolling_corr keep
# windows), sort_limit, scan_parquet (scan_orc keeps IO), text_stats
# (tfidf/gopher keep text), canonicalize_btcusdt (every candle id runs
# it).  Their correctness rows and x100 sweep rungs are unaffected.
HEADLINE = [
    "q_join_multiway",
    "q_agg_ohlcv_1min",
    "q_agg_rollup",
    "q_join_asof",
    "q_win_moving_avg",
    "q_ext_dedup_exact",
    "q_ext_dedup_near",
    "q_ext_dedup_simhash",
    "q_ext_cosine_knn",
    "q_ext_ann_ivf",
    "q_ext_ann_lsh",
    "q_ext_embed_neardup",
    "q_ext_repetition",
    "q_ext_decontam",
    "q_ext_kmeans",
    "q_ext_tfidf",
    "q_ext_funnel",
    "q_ext_dupspan",
    "q_ext_gapfill",
    "q_win_rolling_corr",
    "q_ext_source_cosine",
    "q_ext_curation_pipeline",
    "q_ext_semdedup",
    "q_ext_sessionize",
    "q_ext_ngram_novelty",
    # round-6 additions: the 6-table join classic, the TakeOrdered
    # vocab path, and the single-shuffle session rollup
    "q_ext_tpch_q5",
    "q_ext_oov_rate",
    "q_ext_session_stats",
    # round-6 batch 2: the aggregate-then-broadcast-join-back classic
    # and the one-pass structural quality gates
    "q_ext_tpch_q18",
    "q_ext_gopher_rules",
    # round-6 batch 3: the top-10-orders classic, hybrid lexical+vector
    # rank fusion, and the pair-exploded covariance screen
    "q_ext_tpch_q3",
    "q_ext_hybrid_rrf",
    "q_ext_embed_covariance",
    # round-6 batch 4: the COUNT DISTINCT and double-decorrelation
    # benchmarks, the RFM cube, and the tolerance as-of
    "q_ext_tpch_q16",
    "q_ext_tpch_q21",
    "q_ext_rfm_segments",
    "q_ext_asof_tolerance",
    # round-6 batch 5: the datasketches tier (the documented
    # approximate swaps, now first-class timed paths)
    "q_ext_hll_union_error",
    "q_ext_theta_overlap_error",
    "q_ext_kll_rank_error",
    # round-7: PQ-style ANN over int8 codes, the streaming kernels'
    # exact batch twins, and the run-length longest-span dedup signal
    "q_ext_ann_pq",
    "q_ext_topk_talkers",
    "q_ext_dedup_horizon",
    "q_ext_longest_dupspan",
    # round-8: the graph kernels (edge-partitioned SpMV + degree-
    # ordered triangles) and incremental join-view maintenance
    "q_ext_pagerank",
    "q_ext_triangles",
    "q_ext_join_view_refresh",
    # round-8 batch 2: struct-fold recurrences and session path mining
    "q_ext_holt_smoothing",
    "q_ext_cusum_drift",
    "q_ext_top_paths",
    # round-8 batch 3: the indicator family over the candle layer —
    # the fixed-point triple-EMA fold, the integer-moment band frame,
    # the tick-level per-side flow shuffle, and the SCD2 span build
    # (the biggest single-key window op in the registry)
    "q_ext_macd",
    "q_ext_bollinger",
    "q_ext_flow_imbalance",
    "q_ext_scd2",
    # round-8 batch 4: the volume-clock bucketing (a data-dependent
    # integer prefix-sum shuffle) and the decimal cumulative-ratio
    # window over the candle layer
    "q_ext_vpin",
    "q_ext_anchored_vwap",
    # round-8 resume batch: exact-moment regression aggregates, the
    # domain-table weighted median, the bitmap exact-distinct rung,
    # and the ORC round trip (write + scan timed together)
    "q_ext_regr",
    "q_ext_weighted_median",
    "q_ext_bitmap_distinct",
    "q_scan_orc",
    # r9 additions
    "q_ext_multimodal_pixels",
    "q_ext_bpe_pair_counts",
    "q_ext_merge_into",
    # r10 additions: the iterative BPE round, iterative-filter graph
    # peel, broadcast-range-join quantile calibration, and the two
    # candle-layer risk/impact aggregates
    "q_ext_bpe_apply_merge",
    "q_ext_kcore",
    "q_ext_quantile_norm",
    "q_ext_var_cvar",
    "q_ext_kyle_lambda",
    # r10 batch 2: the TPC-H completion set (correlated-MIN, 5-way
    # profit join, global-share threshold, CASE pivot) and the
    # single-pass PMI pair table
    "q_ext_tpch_q2",
    "q_ext_tpch_q9",
    "q_ext_tpch_q11",
    "q_ext_tpch_q12",
    "q_ext_pmi_collocations",
    # r11: the k-round tokenizer trainer (5 sequential vocab-bounded
    # merge rounds off one persisted word-count shuffle)
    "q_ext_bpe_train_k",
    # r11 batch 2: range-vol estimator trio + intraday profile off the
    # candle layer, the runs test, and sentence-level dedup accounting
    "q_ext_range_vol",
    "q_ext_intraday_profile",
    "q_ext_runs_test",
    "q_ext_sentence_dedup",
    # r12: now that timing is honest-cold, every ITERATIVE kernel is a
    # headline id (VERDICT r11 item 6) — min-label propagation, the
    # recursive-CTE reachability, and the incremental candle refresh
    "q_ext_dedup_clusters",
    "q_ext_transition_reach",
    "q_ext_ohlcv_incremental",
    # r12 batch 2: the new surface — densification-capped graph
    # kernels, weighted-minhash signatures, CCNet bucketing, and the
    # BPE apply curve
    "q_ext_pagerank_capped",
    "q_ext_triangles_capped",
    "q_ext_dedup_minhash_idf",
    "q_ext_dedup_near_idf",
    "q_ext_perplexity_buckets",
    "q_ext_tokenizer_apply",
]


def _calibrate() -> float:
    """Fixed-work single-core microbenchmark (pure numpy mat-mul), so
    per-round totals can be normalized for host speed: the same query
    set measured 17.6 s and 28.5 s across rounds on identical code and
    data purely from machine variance.  Report, don't guess."""
    import numpy as np

    rng = np.random.default_rng(0)
    a = rng.standard_normal((1200, 1200))
    t0 = time.perf_counter()
    for _ in range(8):
        a = a @ a / np.abs(a).max()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from binancedatapipelineinaws_spark.registry import queries
    from binancedatapipelineinaws_spark.session import get_spark

    spark = get_spark("bench")
    qs = queries()

    # the noop sink materializes EVERY output column (count() would let
    # Catalyst prune the projections away and under-measure)
    def run(name: str) -> float:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        # a few queries persist small intermediates (tpch q2/q11, PMI
        # marginals, cell assignments); drop them so cached tables
        # can't accumulate across an 81-query sweep and each timing is
        # self-contained (ADVICE r10 item 3)
        spark.catalog.clearCache()
        return dt

    # untimed warm-up pass: JIT + whole-stage-codegen compilation and
    # parquet footer caches; the timed passes then measure steady-state
    # throughput (the regime that matters for a long-lived cluster)
    for name in HEADLINE:
        run(name)

    # best-of-2 timed passes: this host is multi-tenant and a co-tenant
    # burst can triple a single measurement (observed 0.53 s vs 4.49 s
    # for the same query in back-to-back runs, with the single-core
    # calibration unchanged) — the min of two passes is the
    # steady-state number
    timings: dict[str, float] = {}
    for _ in range(2):
        for name in HEADLINE:
            t = round(run(name), 3)
            timings[name] = min(timings.get(name, t), t)
    for name in HEADLINE:
        print(f"# {name}: {timings[name]}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    result = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": {},
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "host_calib_sec": _calibrate(),
        "key_note": "ids lack their q_/q_ext_ prefix",
    }
    # full-name, full-precision record for humans and local tooling
    full = dict(result, queries=timings)
    full.pop("key_note")
    print(json.dumps(full), file=sys.stderr)
    print(compact_stdout_line(result, timings))


def _short(name: str) -> str:
    for prefix in ("q_ext_", "q_"):
        if name.startswith(prefix):
            return name[len(prefix):]
    return name


def compact_stdout_line(result: dict, timings: dict) -> str:
    """The ONE stdout line, guaranteed under the driver's capture
    window: collision-free stripped short ids, 3dp->2dp->1dp degrade,
    then the last-resort fallback (ADVICE r11 item 1) — NEVER abort
    before printing; an assert here would lose the round's perf
    record, the exact failure the degrade ladder guards against.
    Drops the optional key_note, then per-query timings entirely; a
    totals-only line is still a parseable perf record (full per-query
    numbers are on stderr either way)."""
    shorts = {_short(n): n for n in timings}
    assert len(shorts) == len(timings), "short-id collision in HEADLINE"
    result = dict(result)
    for ndigits in (3, 2, 1):
        result["queries"] = {
            s: round(timings[n], ndigits) for s, n in shorts.items()
        }
        line = json.dumps(result, separators=(",", ":"))
        if len(line) < 1950:
            return line
    result.pop("key_note", None)
    line = json.dumps(result, separators=(",", ":"))
    if len(line) >= 1950:
        result["queries"] = {}
        result["note"] = "per-query timings overflowed; see stderr"
        line = json.dumps(result, separators=(",", ":"))
    return line


if __name__ == "__main__":
    main()
