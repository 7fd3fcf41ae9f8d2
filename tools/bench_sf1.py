"""Scale pricing: run the most expensive headline queries at sf0.1 AND
the synthesized sf1 (tools/make_sf1.py, ~10x rows) and report the
wall-time ratio per query.  A clean plan shape should price ~linear in
rows (ratio ~10 with fixed overheads pulling it below); a ratio well
past ~15 flags a plan that is polynomial in practice despite a clean
.explain().  Results are recorded in SCALING.md per round.

Usage: python tools/bench_sf1.py [query ...]
       (expects .bench_sf1/ to exist; optional names restrict the run
       to a subset — used for supplementary pricing of late additions)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
# override with SPARK_GRAFT_SCALE_DIR to price against another corpus
# (e.g. .bench_sf10, the 100-replica build) — the printed ratio is
# then wall(that corpus)/wall(sf0.1)
SF1 = os.environ.get(
    "SPARK_GRAFT_SCALE_DIR",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_sf1",
    ),
)

# the r6 bench's five most expensive queries + the quadratic-sensitive
# dedup/ANN tiers + this round's additions
EXPENSIVE = [
    "q_ext_tpch_q21",
    "q_ext_tpch_q18",
    "q_ext_dedup_simhash",
    "q_ext_dedup_near",
    "q_ext_embed_neardup",
    "q_ext_semdedup",
    "q_ext_cosine_knn",
    "q_join_multiway",
    "q_ext_kmeans",
    "q_ext_dupspan",
    "q_ext_longest_dupspan",
    "q_ext_hybrid_rrf",
    # r7 additions with corpus-heavy plans
    "q_ext_strip_dupspans",
    "q_ext_trim_dupspan",
    "q_ext_equidepth_hist",
    "q_ext_ann_pq",
    "q_ext_ann_nprobe",
    "q_ext_topk_talkers",
    "q_ext_dedup_horizon",
    "q_ext_skew_salted_join",
    # r8 graph kernels (edge build is a basket self-join; wedge join
    # is the O(E^1.5)-bounded stage to watch) + join-view IVM
    "q_ext_pagerank",
    "q_ext_triangles",
    "q_ext_join_view_refresh",
    # r9 addition: the PNG codec gate (pure-Python codec inside the
    # Arrow kernel — the cost to watch is Python bytes/sec, not shuffle)
    "q_ext_multimodal_pixels",
    # r9 session additions: the tokenizer pair statistic (corpus-sized
    # token explode collapses to vocab — the collapse ratio is the
    # number to watch) and the CDC MERGE (one user-keyed join)
    "q_ext_bpe_pair_counts",
    "q_ext_merge_into",
    # r10 additions: the iterative BPE round (second vocab-table pass),
    # the persisted peel loop, the broadcast-range-join calibration,
    # and the two candle-layer aggregates
    "q_ext_bpe_apply_merge",
    "q_ext_kcore",
    "q_ext_quantile_norm",
    "q_ext_var_cvar",
    "q_ext_kyle_lambda",
    # r10 batch 2: the TPC-H completion set (the pair-dictionary
    # persist in Q2 and the fact x orders shuffle in Q9/Q12 are the
    # scale surfaces) and the PMI pair table (vocab^2-bounded)
    "q_ext_tpch_q2",
    "q_ext_tpch_q9",
    "q_ext_tpch_q11",
    "q_ext_tpch_q12",
    "q_ext_pmi_collocations",
    # r11: the k-round trainer (per-round cost is vocab-bounded, so
    # the x100 ratio should price ~flat after the word-count shuffle)
    "q_ext_bpe_train_k",
    # r11 batch 2: the sentence-frequency join-back is the corpus-
    # sized surface to watch (measured x5.6 at x100); the candle-layer
    # trio price with the tick shuffle (x1.8-2.8)
    "q_ext_sentence_dedup",
    "q_ext_range_vol",
    "q_ext_intraday_profile",
    "q_ext_runs_test",
]


def main() -> None:
    from binancedatapipelineinaws_spark.registry import queries
    from binancedatapipelineinaws_spark.session import get_spark

    spark = get_spark("bench_sf1")
    qs = queries()
    only = [n for n in sys.argv[1:] if n in qs]
    expensive = only or EXPENSIVE

    def run(name: str, sf_dir: str) -> float:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        # self-contained timings: drop persisted intermediates so a
        # cache hit from a prior pass can't flatter a ratio and cached
        # tables can't accumulate across the sweep (ADVICE r10 item 3)
        spark.catalog.clearCache()
        return dt

    out: dict[str, dict] = {}
    for sf_dir, key in ((SF01, "t01"), (SF1, "t1")):
        for name in expensive:  # warm-up pass
            run(name, sf_dir)
        for _ in range(2):  # best-of-2 (multi-tenant host)
            for name in expensive:
                t = round(run(name, sf_dir), 3)
                rec = out.setdefault(name, {})
                rec[key] = min(rec.get(key, t), t)
    for name, rec in out.items():
        rec["ratio"] = round(rec["t1"] / rec["t01"], 2)
        print(f"# {name}: {rec['t01']}s -> {rec['t1']}s  x{rec['ratio']}",
              file=sys.stderr)
    print(json.dumps({"metric": "sf1_scaling", "queries": out}))


if __name__ == "__main__":
    main()
