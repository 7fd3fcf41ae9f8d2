"""Property tests (SURVEY.md §5.3): structural invariants that hold for
any input, checked on the driver tables."""

from __future__ import annotations

from pyspark.sql import functions as F

from binancedatapipelineinaws_spark.canonical import btcusdt
from binancedatapipelineinaws_spark.registry import queries

SF = "/root/testdata/sf0.001"


def test_ohlcv_invariants(spark):
    df = queries()["q_agg_ohlcv_1min"](spark, SF)
    bad = df.filter(
        (F.col("low") > F.col("open"))
        | (F.col("low") > F.col("close"))
        | (F.col("high") < F.col("open"))
        | (F.col("high") < F.col("close"))
        | (F.col("volume") < 0)
        | (F.col("trades") <= 0)
    )
    assert bad.count() == 0
    # total trades across candles == total canonical rows
    total = df.agg(F.sum("trades")).first()[0]
    assert total == btcusdt(spark, SF).count()


def test_dedup_exact_partitions_rows(spark):
    df = queries()["q_ext_dedup_exact"](spark, SF)
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    agg = df.agg(F.sum("n_copies"), F.count("*")).first()
    assert agg[0] == n_docs  # copies partition the corpus
    # canonical docs are distinct
    assert df.select("canonical_doc").distinct().count() == agg[1]


def test_dedup_near_idempotent_and_symmetric(spark):
    df = queries()["q_ext_dedup_near"](spark, SF).cache()
    rows = df.collect()
    # well-formed: a < b, jaccard in (0, 1]
    for r in rows:
        assert r.doc_a < r.doc_b
        assert 0 < r.jaccard <= 1
    # idempotent: re-running yields the same pair set
    again = {(r.doc_a, r.doc_b) for r in queries()["q_ext_dedup_near"](spark, SF).collect()}
    assert {(r.doc_a, r.doc_b) for r in rows} == again


def test_window_sum_equals_groupby_sum(spark):
    run = queries()["q_win_running_sum"](spark, SF)
    # the max running value per user == the user's total
    w_total = run.groupBy("user_id").agg(
        F.max("running_value").alias("win_total")
    )
    ev = spark.read.parquet(f"{SF}/events.parquet")
    g_total = ev.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("g_total")
    )
    joined = w_total.join(g_total, "user_id")
    assert joined.filter(F.col("win_total") != F.col("g_total")).count() == 0


def test_knn_rank_contiguous_and_bounded(spark):
    df = queries()["q_ext_cosine_knn"](spark, SF)
    per_q = df.groupBy("query_id").agg(
        F.count("*").alias("k"),
        F.min("rank").alias("rmin"),
        F.max("rank").alias("rmax"),
        F.max("cos_sim").alias("cmax"),
    )
    for r in per_q.collect():
        assert r.k == r.rmax - r.rmin + 1 == 5
        assert r.rmin == 1
        assert r.cmax <= 1.0 + 1e-9


def test_canonicalization_lossy_semantics(spark):
    df = btcusdt(spark, SF)
    # price has <= 2dp, quantity <= 5dp, time at second granularity
    bad_price = df.filter(F.col("price") != F.round("price", 2))
    bad_qty = df.filter(F.col("quantity") != F.round("quantity", 5))
    sub_second = df.filter(F.date_trunc("second", "time") != F.col("time"))
    assert bad_price.count() == 0
    assert bad_qty.count() == 0
    assert sub_second.count() == 0
    assert df.filter(~F.col("maker").isin(0, 1)).count() == 0


def test_embed_neardup_planted_recall(spark):
    """Recall check the synthetic corpus can't provide (its max pairwise
    cos is ~0.51): plant strong near-duplicates, assert the banded-LSH
    pipeline returns exactly the pairs the exact all-pairs computation
    finds at the same threshold."""
    import numpy as np

    from binancedatapipelineinaws_spark.functions.similarity import (
        NEARDUP_COS,
        embed_neardup_pairs,
    )

    rng = np.random.default_rng(42)
    base = rng.standard_normal((50, 64))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, f"c{i % 5}", [float(x) for x in v]))
    # 10 planted near-copies: tiny additive noise => cos >= ~0.97
    for j in range(10):
        v = base[j] + 0.15 * rng.standard_normal(64)
        rows.append((100 + j, f"c{j % 5}", [float(x) for x in v]))
    emb = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<float>"
    )

    got = {
        (r.vec_a, r.vec_b)
        for r in embed_neardup_pairs(emb).collect()
    }

    # exact expectation from numpy (float32 inputs, double math — same
    # widening the engine does)
    mat = np.array([r[2] for r in rows], dtype=np.float32).astype(np.float64)
    ids = [r[0] for r in rows]
    nrm = np.linalg.norm(mat, axis=1)
    cos = (mat @ mat.T) / np.outer(nrm, nrm)
    expected = {
        (min(ids[i], ids[j]), max(ids[i], ids[j]))
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if cos[i, j] >= NEARDUP_COS
    }
    assert len(expected) >= 10  # the plants are really above threshold
    assert got == expected

    # every adaptive-ladder geometry must find the same planted pairs
    # (the rungs are chosen to hold banded recall >= 0.996 at the
    # cos-0.9 boundary; the plants sit well above it) — this pins the
    # r7 scale fix: wider signatures cut candidates, not results
    from binancedatapipelineinaws_spark.functions.similarity import (
        _BAND_LADDER,
        adaptive_band_geometry,
    )

    # ladder rungs plus a computed beyond-the-ladder geometry (2M)
    for bands, rows_per_band in [r[1:] for r in _BAND_LADDER] + [
        adaptive_band_geometry(2_000_000)
    ]:
        ladder_got = {
            (r.vec_a, r.vec_b)
            for r in embed_neardup_pairs(
                emb, bands=bands, rows_per_band=rows_per_band
            ).collect()
        }
        assert ladder_got == expected, (bands, rows_per_band)


def test_semdedup_bucketed_path_matches_exact(spark):
    """Force the blocked numpy-margin path (used above
    SEMDEDUP_EXACT_MAX distinct vectors) against the exact
    within-cell fold join on the same small corpus: per-cell
    pair/removal accounting must be identical (cells, counts, and
    zero-pair rows ride the same aggregates either way)."""
    import binancedatapipelineinaws_spark.functions.similarity as sim

    q = queries()["q_ext_semdedup"]
    exact = {tuple(r) for r in q(spark, SF).collect()}
    orig = sim.SEMDEDUP_EXACT_MAX
    sim.SEMDEDUP_EXACT_MAX = 0  # force the scale path at gate size
    try:
        bucketed = {tuple(r) for r in q(spark, SF).collect()}
    finally:
        sim.SEMDEDUP_EXACT_MAX = orig
    assert bucketed == exact


def test_semdedup_multiplicity_grouping_vs_naive(spark, tmp_path):
    """Byte-identical embeddings collapse to one representative before
    the pair join (r11); the pair/removal arithmetic over (m, ids)
    must reproduce the naive all-member-pairs computation exactly.
    Build a corpus where every vector appears 3x (multiplicities are
    real, self-cosine pairs qualify), recompute per-cell counts with
    a numpy brute force over the raw members, and check BOTH code
    paths against it."""
    import collections

    import numpy as np

    import binancedatapipelineinaws_spark.functions.similarity as sim

    base = spark.read.parquet(f"{SF}/embeddings.parquet")
    n = base.count()
    multi = (
        base.unionByName(base.withColumn("vec_id", F.col("vec_id") + n))
        .unionByName(base.withColumn("vec_id", F.col("vec_id") + 2 * n))
    )
    out = str(tmp_path / "corp")
    multi.write.parquet(out + "/embeddings.parquet")

    mem = (
        sim.assign_cells(spark, out)
        .select("cell", "vec_id", "embedding", "nrm")
        .collect()
    )
    bycell = collections.defaultdict(list)
    for r in mem:
        bycell[r.cell].append(
            (r.vec_id, np.array(r.embedding, dtype=np.float64), r.nrm)
        )
    expected = {}
    for cell, rows in sorted(bycell.items()):
        ids = np.array([x[0] for x in rows])
        emb = np.stack([x[1] for x in rows])
        nrm = np.array([x[2] for x in rows])
        cos = (emb @ emb.T) / np.outer(nrm, nrm)
        iu = np.triu_indices(len(rows), k=1)
        cs = cos[iu]
        # the corpus must not sit on the float boundary, or "naive"
        # itself would be summation-order-ambiguous
        assert (np.abs(cs - sim.SEMDEDUP_COS) > 1e-6).all()
        hit = cs >= sim.SEMDEDUP_COS
        dup_ids = {
            int(max(ids[i], ids[j]))
            for i, j in zip(iu[0][hit], iu[1][hit])
        }
        expected[cell] = (
            len(rows),
            int(hit.sum()),
            len(dup_ids),
            len(rows) - len(dup_ids),
        )
    assert any(v[1] > 0 for v in expected.values())  # pairs exist

    q = queries()["q_ext_semdedup"]
    got_exact = {
        r.cell: (r.n_vectors, r.n_pairs, r.n_removed, r.n_survivors)
        for r in q(spark, out).collect()
    }
    assert got_exact == expected
    orig = sim.SEMDEDUP_EXACT_MAX
    sim.SEMDEDUP_EXACT_MAX = 0  # force the blocked path too
    try:
        got_blocked = {
            r.cell: (r.n_vectors, r.n_pairs, r.n_removed, r.n_survivors)
            for r in q(spark, out).collect()
        }
    finally:
        sim.SEMDEDUP_EXACT_MAX = orig
    assert got_blocked == expected


def test_shingle_df_cap_removes_hot_key(spark):
    """Plant one shingle in every document and assert the capped rows
    exclude it (the verify-join's per-key fan-out stays bounded) while
    all other shingles survive."""
    from binancedatapipelineinaws_spark.functions.dedup import (
        capped_shingle_rows,
        shingle_rows_for,
    )

    docs = spark.createDataFrame(
        [(i, f"common boiler plate unique{i} word{i} tail{i}") for i in range(40)],
        "doc_id long, text string",
    )
    sh = shingle_rows_for(docs)
    capped = capped_shingle_rows(sh, cap=30)
    # "common_boiler_plate" appears in all 40 docs -> dropped
    hot_left = capped.filter(F.col("s") == "common_boiler_plate").count()
    assert hot_left == 0
    # everything rarer than the cap survives untouched
    assert capped.count() == sh.count() - 40


def test_stratified_sample_deterministic_and_rate_bounded(spark):
    from binancedatapipelineinaws_spark.functions.sampling import (
        DEFAULT_RATE_BP,
        SAMPLE_RATES_BP,
    )

    q = queries()["q_ext_stratified_sample"]
    a = {r.doc_id for r in q(spark, SF).collect()}
    b = {r.doc_id for r in q(spark, SF).collect()}
    assert a == b  # reruns identical (no seed, no partitioning effect)

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    totals = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept = {
        r.lang: r.n
        for r in q(spark, SF).groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, total in totals.items():
        rate = SAMPLE_RATES_BP.get(lang, DEFAULT_RATE_BP) / 10000
        # binomial bound: ~4 sigma
        import math

        sigma = math.sqrt(total * rate * (1 - rate))
        assert abs(kept.get(lang, 0) - total * rate) <= 4 * sigma + 1


def test_token_budget_respects_budget_and_order(spark):
    from binancedatapipelineinaws_spark.functions.sampling import (
        N_BUDGET_SHARDS,
        TOKEN_BUDGET,
    )

    rows = queries()["q_ext_token_budget"](spark, SF).collect()
    per_shard = TOKEN_BUDGET // N_BUDGET_SHARDS
    by_stratum: dict = {}
    for r in rows:
        assert r.cum_tokens <= per_shard
        by_stratum.setdefault((r.lang, r.shard), []).append(r)
    for rs in by_stratum.values():
        rs.sort(key=lambda r: r.cum_tokens)
        # kept docs are a prefix in quality order: ttr non-increasing
        ttrs = [r.ttr for r in rs]
        assert all(x >= y for x, y in zip(ttrs, ttrs[1:]))


def test_dedup_clusters_closure_invariants(spark):
    clusters = {
        r.doc_id: r.cluster_id
        for r in queries()["q_ext_dedup_clusters"](spark, SF).collect()
    }
    pairs = queries()["q_ext_dedup_near"](spark, SF).collect()
    # every near-dup pair lands in the same component
    for p in pairs:
        assert clusters[p.doc_a] == clusters[p.doc_b]
    # the cluster id is the component's minimum member
    members: dict = {}
    for doc, c in clusters.items():
        members.setdefault(c, []).append(doc)
    for c, docs in members.items():
        assert c == min(docs)
        assert len(docs) >= 2  # only clustered (paired) docs are labeled


def test_winnow_guarantee_shared_run_yields_shared_fp(spark):
    """Schleimer et al. guarantee: any two docs sharing a run of
    >= WINNOW_W + 2 words share at least one winnowed fingerprint."""
    from binancedatapipelineinaws_spark.functions.text import WINNOW_W, winnow_sketch

    run = " ".join(f"shared{i}" for i in range(WINNOW_W + 2))
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {run} gamma delta"),
            (2, f"omega {run} psi chi phi upsilon"),
            (3, "totally unrelated words none in common here at all"),
        ],
        "doc_id long, text string",
    )
    sk = winnow_sketch(docs)
    rows = sk.collect()
    fps = {}
    for r in rows:
        fps.setdefault(r.doc_id, set()).add(r.fp)
    assert fps[1] & fps[2], "shared run must yield a shared fingerprint"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])


def test_quarantine_partitions_corpus(spark):
    from binancedatapipelineinaws_spark.canonical import btcusdt

    rows = {r.reason: r for r in queries()["q_scan_tsv_quarantine"](spark, SF).collect()}
    n = btcusdt(spark, SF).count()
    assert set(rows) <= {"ok", "bad_price", "bad_qty"}
    assert sum(r.n for r in rows.values()) == n  # classification partitions rows
    assert rows["bad_price"].n > 0 and rows["bad_qty"].n > 0


def test_repetition_catches_planted_repeats(spark):
    from binancedatapipelineinaws_spark.functions.curation import q_ext_repetition

    # piggyback on the registered query via a temp-view-free check:
    # run the same logic on a planted corpus by swapping the loader
    docs = spark.createDataFrame(
        [
            (1, " ".join(["spam"] * 30)),                     # degenerate
            (2, " ".join(f"w{i}" for i in range(30))),         # all-unique
        ],
        "doc_id long, text string",
    )
    from binancedatapipelineinaws_spark.functions import curation as C
    import binancedatapipelineinaws_spark.functions.curation as mod

    orig = mod.load_table
    mod.load_table = lambda spark, sf_dir, name: docs
    try:
        rows = {r.doc_id: r for r in q_ext_repetition(spark, SF).collect()}
    finally:
        mod.load_table = orig
    assert rows[1].repetition_pass == 0 and rows[1].top_word_frac == 1.0
    assert rows[2].repetition_pass == 1 and rows[2].dup_2gram_frac == 0.0


def test_decontam_flags_verbatim_benchmark_copy(spark):
    from binancedatapipelineinaws_spark.functions.curation import BENCH_MOD
    import binancedatapipelineinaws_spark.functions.curation as mod

    base = " ".join(f"tok{i}" for i in range(40))
    docs = spark.createDataFrame(
        [
            (0, base),                                    # benchmark (0 % mod == 0)
            (1, base),                                    # verbatim leak
            (2, " ".join(f"other{i}" for i in range(40))),  # clean
        ],
        "doc_id long, text string",
    )
    orig = mod.load_table
    mod.load_table = lambda spark, sf_dir, name: docs
    try:
        rows = {r.doc_id: r for r in mod.q_ext_decontam(spark, SF).collect()}
    finally:
        mod.load_table = orig
    assert rows[1].contaminated == 1 and rows[1].contamination_frac == 1.0
    assert rows[2].contaminated == 0 and rows[2].n_contaminated == 0
    assert 0 not in rows  # benchmark docs are not scored


def test_redact_roundtrip_no_pii_left(spark):
    rows = queries()["q_ext_redact"](spark, SF).collect()
    emailed = [r for r in rows if r.doc_id % 13 == 0]
    numbered = [r for r in rows if r.doc_id % 17 == 0]
    assert emailed and all(r.n_emails >= 1 for r in emailed)
    assert numbered and all(r.n_longnums >= 1 for r in numbered)
    clean = [r for r in rows if r.doc_id % 13 and r.doc_id % 17]
    assert all(r.n_emails == 0 and r.n_longnums == 0 for r in clean)


def test_pack_sequences_stream_is_contiguous(spark):
    from binancedatapipelineinaws_spark.functions.sampling import SEQ_LEN

    rows = queries()["q_ext_pack_sequences"](spark, SF).collect()
    by_shard: dict = {}
    for r in rows:
        assert 0 <= r.start_offset < SEQ_LEN
        assert r.n_seqs_spanned >= 1
        by_shard.setdefault(r.shard, []).append(r)
    for rs in by_shard.values():
        rs.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in rs:  # each doc starts exactly where the previous ended
            assert r.start_seq == cum // SEQ_LEN
            assert r.start_offset == cum % SEQ_LEN
            cum += r.ws_tokens
            assert r.start_seq + r.n_seqs_spanned - 1 == (cum - 1) // SEQ_LEN


def test_quantize_codes_consistent_and_tight(spark):
    from binancedatapipelineinaws_spark.functions.similarity import Q_LEVELS

    rows = queries()["q_ext_quantize"](spark, SF).collect()
    assert len(rows) == spark.read.parquet(f"{SF}/embeddings.parquet").count()
    codes_seen = set()
    for r in rows:
        codes = [int(c) for c in r.qvec.split(",")]
        assert len(codes) == 64
        assert sum(codes) == r.checksum
        assert all(0 <= c < Q_LEVELS for c in codes)
        codes_seen.update(codes)
    # per-dim extremes hit both ends of the code range
    assert 0 in codes_seen and Q_LEVELS - 1 in codes_seen


def test_kmeans_matches_numpy_reimplementation(spark):
    """Independent oracle: the full quantize -> 2-round Lloyd chain
    recomputed in numpy must reproduce every assignment exactly."""
    import numpy as np

    from binancedatapipelineinaws_spark.functions.clustering import (
        KMEANS_ITERS,
        KMEANS_K,
    )
    from binancedatapipelineinaws_spark.functions.similarity import Q_LEVELS

    pdf = spark.read.parquet(f"{SF}/embeddings.parquet").orderBy("vec_id").toPandas()
    X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    mn, mx = X.min(axis=0), X.max(axis=0)
    q = np.clip(np.floor((X - mn) / (mx - mn) * Q_LEVELS), 0, Q_LEVELS - 1).astype(
        np.int64
    )
    s = q[:KMEANS_K].copy()
    c = np.ones(KMEANS_K, dtype=np.int64)
    ids = np.arange(KMEANS_K)  # original cluster ids of the live rows

    def assign_to(s, c):
        # d_k = ||c_k * x - s_k||^2 / c_k^2, exact ints then double divide
        num = ((c[:, None, None] * q[None, :, :] - s[:, None, :]) ** 2).sum(axis=2)
        d = num.astype(np.float64) / (c * c)[:, None]
        # argmin takes lowest index on ties (= lowest id: rows stay id-sorted)
        return d.argmin(axis=0)

    assign = assign_to(s, c)
    for _ in range(KMEANS_ITERS - 1):
        new_s = np.zeros_like(s)
        new_c = np.zeros_like(c)
        for k in range(len(ids)):
            members = q[assign == k]
            if len(members):
                new_s[k], new_c[k] = members.sum(axis=0), len(members)
        keep = new_c > 0
        s, c, ids = new_s[keep], new_c[keep], ids[keep]
        assign = assign_to(s, c)
    expected = {int(v): int(ids[a]) for v, a in zip(pdf["vec_id"], assign)}
    got = {
        r.vec_id: r.cluster
        for r in queries()["q_ext_kmeans"](spark, SF).collect()
    }
    assert got == expected


def test_zorder_interleave_roundtrip(spark):
    from binancedatapipelineinaws_spark.sources.maintenance import Z_BITS

    rows = queries()["q_ext_zorder"](spark, SF).collect()
    assert rows
    for r in rows[:200]:
        a = sum(((r.zvalue >> (2 * i)) & 1) << i for i in range(Z_BITS))
        b = sum(((r.zvalue >> (2 * i + 1)) & 1) << i for i in range(Z_BITS))
        assert (a, b) == (r.bucket_user, r.bucket_value)


def test_funnel_stages_ordered_and_monotone(spark):
    rows = queries()["q_ext_funnel"](spark, SF).collect()
    assert rows
    stages = {1: 0, 2: 0, 3: 0}
    for r in rows:
        stages[r.funnel_stage] += 1
        if r.funnel_stage >= 2:
            assert r.t_click > r.t_view
        else:
            assert r.t_click is None
        if r.funnel_stage == 3:
            assert r.t_purchase > r.t_click
        else:
            assert r.t_purchase is None


def test_funnel_partial_stages_null_safe(spark, tmp_path):
    """The driver corpus happens to contain only complete funnels, so
    the NULL stages never exercise the empty-array path — plant users
    who stall at every stage (plus an out-of-order click that must NOT
    count) and run the REAL query code over a staged events table.
    Under ANSI mode an element_at here would throw; F.get must not."""
    import datetime

    from pyspark.sql import functions as F

    t0 = datetime.datetime(2025, 1, 1, 0, 0, 0)

    def at(m):
        return t0 + datetime.timedelta(minutes=m)

    rows = [
        # user 1: view only -> stage 1
        (1, at(0), 1, "view", 1.0, "{}"),
        # user 2: view then click -> stage 2
        (2, at(0), 2, "view", 1.0, "{}"),
        (3, at(5), 2, "click", 1.0, "{}"),
        # user 3: full funnel -> stage 3
        (4, at(0), 3, "view", 1.0, "{}"),
        (5, at(5), 3, "click", 1.0, "{}"),
        (6, at(9), 3, "purchase", 1.0, "{}"),
        # user 4: click BEFORE the first view -> the click must not
        # count; stage 1
        (7, at(0), 4, "click", 1.0, "{}"),
        (8, at(5), 4, "view", 1.0, "{}"),
        # user 5: purchase before click -> stage 2 only
        (9, at(0), 5, "view", 1.0, "{}"),
        (10, at(2), 5, "purchase", 1.0, "{}"),
        (11, at(5), 5, "click", 1.0, "{}"),
        # user 6: never viewed -> absent from the funnel
        (12, at(0), 6, "click", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    out = {
        r["user_id"]: r
        for r in queries()["q_ext_funnel"](spark, str(tmp_path)).collect()
    }
    assert set(out) == {1, 2, 3, 4, 5}
    assert out[1]["funnel_stage"] == 1 and out[1]["t_click"] is None
    assert out[2]["funnel_stage"] == 2 and out[2]["t_purchase"] is None
    assert out[3]["funnel_stage"] == 3
    assert out[4]["funnel_stage"] == 1 and out[4]["t_click"] is None
    assert out[5]["funnel_stage"] == 2 and out[5]["t_purchase"] is None


def test_cohort_retention_week0_is_full(spark):
    rows = queries()["q_ext_cohort_retention"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.retention <= 1
        assert r.week_index >= 0
        if r.week_index == 0:  # everyone is active in their own first week
            assert r.n_active == r.cohort_size and r.retention == 1.0


def test_chunk_docs_reconstruction_and_coverage(spark):
    """Every token position is covered by >= 1 chunk; concatenating the
    stride-prefix of each chunk (plus the full final chunk) rebuilds
    the document exactly."""
    from binancedatapipelineinaws_spark.functions.corpus import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
    )
    from binancedatapipelineinaws_spark.tables import load_table

    chunks = queries()["q_ext_chunk_docs"](spark, SF).collect()
    docs = {
        r.doc_id: r.text.split(" ")
        for r in load_table(spark, SF, "documents").collect()
    }
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r.chunk_id)
        words = docs[doc_id]
        rebuilt: list[str] = []
        for r in rs:
            toks = r.chunk_text.split(" ")
            assert r.start_pos == r.chunk_id * CHUNK_STRIDE
            assert len(toks) == r.n_tokens <= CHUNK_SIZE
            assert toks == words[r.start_pos : r.start_pos + r.n_tokens]
            rebuilt = rebuilt[: r.start_pos] + toks
        assert rebuilt == words


def test_upsert_idempotent_and_complete(spark):
    """Upsert output has exactly one row per key; re-merging the
    result with the same updates changes nothing (idempotency)."""
    from binancedatapipelineinaws_spark.operators.cdc import UPSERT_EVERY

    out = queries()["q_ext_upsert_latest"](spark, SF)
    n_keys = out.select("o_orderkey").distinct().count()
    assert out.count() == n_keys
    corrected = out.filter(F.col("o_orderkey") % UPSERT_EVERY == 0)
    assert corrected.filter(F.col("version") != 1).count() == 0
    assert corrected.filter(F.col("o_orderstatus") != "P").count() == 0
    untouched = out.filter(F.col("o_orderkey") % UPSERT_EVERY != 0)
    assert untouched.filter(F.col("version") != 0).count() == 0


def test_gapfill_dense_spine_and_fill(spark):
    """The spine has no holes (consecutive hourly buckets per key), and
    `filled` is never null after the key's first observation."""
    rows = queries()["q_ext_gapfill"](spark, SF).collect()
    by_key: dict[str, list] = {}
    for r in rows:
        by_key.setdefault(r.event_type, []).append(r)
    for key, rs in by_key.items():
        rs.sort(key=lambda r: r.bucket)
        for a, b in zip(rs, rs[1:]):
            assert (b.bucket - a.bucket).total_seconds() == 3600, key
        assert rs[0].avg_value is not None  # bounds start at data
        assert all(r.filled is not None for r in rs)
        for r in rs:
            if r.was_gap == 0:
                assert r.filled == r.avg_value


def test_split_assign_partitions_and_proportions(spark):
    from binancedatapipelineinaws_spark.operators.stats import (
        SPLIT_TRAIN,
        SPLIT_VAL,
    )

    rows = queries()["q_ext_split_assign"](spark, SF).collect()
    n = len(rows)
    counts = {"train": 0, "val": 0, "test": 0}
    for r in rows:
        counts[r.split] += 1
    # every doc assigned exactly once; rough proportions (md5-uniform)
    assert sum(counts.values()) == n
    assert counts["train"] / n > (SPLIT_TRAIN / 100) * 0.8
    assert counts["val"] > 0 and counts["test"] > 0


def test_ann_recall_bounds_and_truth(spark):
    rows = queries()["q_ext_ann_recall"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_hits <= r.k
        assert abs(r.recall - r.n_hits / r.k) < 1e-9


def test_dupspan_planted_duplicate_saturates(spark):
    """Two docs sharing their full text must both report dup_frac 1.0
    relative to their shared grams."""
    from binancedatapipelineinaws_spark.functions.corpus import q_ext_dupspan

    rows = {r.doc_id: r for r in q_ext_dupspan(spark, SF).collect()}
    # the driver corpus plants exact/near duplicates: at least one doc
    # must show substantial duplicated coverage
    assert any(r.dup_frac >= 0.9 for r in rows.values())
    for r in rows.values():
        assert 0.0 <= r.dup_frac <= 1.0
        assert r.dup_grams <= r.n_grams


def test_event_transitions_rows_are_distributions(spark):
    rows = queries()["q_ext_event_transitions"](spark, SF).collect()
    assert rows
    by_prev: dict[str, float] = {}
    for r in rows:
        assert r.n > 0 and 0 < r.p <= 1
        by_prev[r.prev] = by_prev.get(r.prev, 0.0) + r.p
    for prev, total in by_prev.items():
        assert abs(total - 1.0) < 1e-4, (prev, total)


def test_winsorize_bounds_and_clip_rate(spark):
    rows = queries()["q_ext_winsorize"](spark, SF).collect()
    n_clip = sum(r.was_clipped for r in rows)
    # 5th/95th band clips ~10% of each group
    assert 0.02 < n_clip / len(rows) < 0.2
    for r in rows:
        if not r.was_clipped:
            assert abs(r.clipped - round(r.value, 6)) < 1e-9


def test_benford_shares_sum_to_one(spark):
    rows = queries()["q_ext_benford"](spark, SF).collect()
    assert {r.d for r in rows} <= set(range(1, 10))
    assert abs(sum(r.observed for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.benford for r in rows) - 1.0) < 1e-4


def test_corr_matrix_in_range(spark):
    rows = queries()["q_ext_corr_matrix"](spark, SF).collect()
    assert len(rows) == 6
    for r in rows:
        assert r.corr is None or -1.0 <= r.corr <= 1.0


def test_importance_sample_monotone_in_weight(spark):
    """A document can only be MORE likely kept as its weight rises:
    every kept doc shorter than an unkept doc must differ in hash
    bucket, and keep_bp must be nondecreasing in n_chars."""
    rows = queries()["q_ext_importance_sample"](spark, SF).collect()
    assert rows
    by_chars = sorted(rows, key=lambda r: r.n_chars)
    for a, b in zip(by_chars, by_chars[1:]):
        assert a.keep_bp <= b.keep_bp


def test_cms_error_guarantee(spark):
    r = queries()["q_ext_cms_error"](spark, SF).collect()[0]
    assert r.min_over >= 0  # CMS never underestimates
    assert r.n_exact <= r.n_terms


def test_upsert_stream_and_batch_agree_on_semantics(spark):
    """The batch upsert keeps exactly the corrected values for batch
    keys (spot-check against the raw table)."""
    from binancedatapipelineinaws_spark.operators.cdc import UPSERT_EVERY
    from binancedatapipelineinaws_spark.tables import load_table

    out = {
        r.o_orderkey: r
        for r in queries()["q_ext_upsert_latest"](spark, SF).collect()
    }
    base = {
        r.o_orderkey: r
        for r in load_table(spark, SF, "orders").collect()
    }
    assert set(out) == set(base)
    for k, r in out.items():
        if k % UPSERT_EVERY == 0:
            assert r.o_orderstatus == "P"
        else:
            assert r.o_totalprice == base[k].o_totalprice


def test_sessionize_invariants(spark):
    df = queries()["q_ext_sessionize"](spark, SF).cache()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    # every event labeled exactly once
    assert df.count() == ev.count()
    # session_idx starts at 1 and never exceeds the user's event count
    bad = df.filter(
        (F.col("session_idx") < 1)
        | (F.col("session_idx") > F.col("user_event_seq"))
    )
    assert bad.count() == 0
    # per-user: seq is dense 1..n (max == count) and sessions are
    # monotone in seq (checked via max(session_idx) == last session)
    per_user = df.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.max("user_event_seq").alias("max_seq"),
    )
    assert per_user.filter(F.col("n") != F.col("max_seq")).count() == 0


def test_semdedup_counts_partition(spark):
    df = queries()["q_ext_semdedup"](spark, SF).cache()
    n_vecs = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    agg = df.agg(F.sum("n_vectors"), F.sum("n_removed"), F.sum("n_survivors")).first()
    assert agg[0] == n_vecs  # cells partition the corpus
    assert agg[1] + agg[2] == n_vecs  # removed + survivors == all
    assert df.filter(F.col("n_removed") > F.col("n_pairs")).count() == 0


def test_ngram_novelty_invariants(spark):
    df = queries()["q_ext_ngram_novelty"](spark, SF).cache()
    assert df.filter(F.col("novel_grams") > F.col("n_grams")).count() == 0
    # the earliest document is by definition all-novel
    first = df.orderBy("doc_id").first()
    assert first["novel_grams"] == first["n_grams"]


def test_temperature_resample_keeps_rarest_whole(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rarest, n_rarest = (
        docs.groupBy("lang").count().orderBy("count", "lang").first()
    )
    kept = queries()["q_ext_temperature_resample"](spark, SF)
    # the rarest language's keep rate normalizes to 10000 bp == keep all
    assert kept.filter(F.col("lang") == rarest).count() == n_rarest
    # dominant languages are thinned, never inflated
    per_lang = kept.groupBy("lang").count()
    joined = per_lang.join(
        docs.groupBy("lang").agg(F.count("*").alias("total")), "lang"
    )
    assert joined.filter(F.col("count") > F.col("total")).count() == 0


def test_skew_profile_consistency(spark):
    row = queries()["q_ext_skew_profile"](spark, SF).first()
    ev_count = spark.read.parquet(f"{SF}/events.parquet").count()
    assert row["n_buckets"] >= 1
    assert row["min_cnt"] <= row["avg_cnt"] <= row["max_cnt"]
    assert row["skew_factor"] >= 1.0
    assert abs(row["avg_cnt"] * row["n_buckets"] - ev_count) < 1


def test_rolling_median_bounded_by_frame(spark):
    df = queries()["q_ext_rolling_median"](spark, SF)
    ev = spark.read.parquet(f"{SF}/events.parquet")
    lo, hi = ev.agg(F.min("value"), F.max("value")).first()
    bad = df.filter(
        (F.col("rolling_median") < lo - 1e-9)
        | (F.col("rolling_median") > hi + 1e-9)
    )
    assert bad.count() == 0


def test_quality_funnel_partitions_corpus(spark):
    df = queries()["q_ext_quality_funnel"](spark, SF)
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert df.agg(F.sum("n_docs")).first()[0] == n_docs


def test_topk_revenue_ordered_and_bounded(spark):
    rows = queries()["q_join_topk_revenue"](spark, SF).collect()
    assert len(rows) <= 10
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_embed_dim_profile_invariants(spark):
    df = queries()["q_ext_embed_dim_profile"](spark, SF).cache()
    assert df.count() == 64
    bad = df.filter(
        (F.col("std") < 0)
        | (F.col("min_v") > F.col("max_v"))
        | (F.col("mean") < F.col("min_v") - 1e-6)
        | (F.col("mean") > F.col("max_v") + 1e-6)
    )
    assert bad.count() == 0


def test_band_sweep_monotone_candidates(spark):
    # fewer, wider bands -> stricter AND within band -> fewer candidates
    rows = {
        (r["bands"], r["rows"]): r
        for r in queries()["q_ext_lsh_band_sweep"](spark, SF).collect()
    }
    assert rows[(2, 8)]["n_candidates"] <= rows[(4, 4)]["n_candidates"]
    assert rows[(4, 4)]["n_candidates"] <= rows[(8, 2)]["n_candidates"]
    for r in rows.values():
        assert 0 <= r["n_est_ge_half"] <= r["n_candidates"]


def test_daily_anomaly_zscores_center(spark):
    import math

    rows = queries()["q_ext_daily_anomaly"](spark, SF).collect()
    zs = [r["z"] for r in rows if r["z"] is not None]
    if zs:
        assert abs(sum(zs)) < 1e-3 * len(zs) + 1e-6  # z-scores sum ~0
        assert all(not math.isnan(z) for z in zs)


def test_zipf_slope_negative(spark):
    row = queries()["q_ext_zipf_slope"](spark, SF).first()
    assert row["slope"] < 0  # frequency decreases with rank, always
    assert row["n_ranks"] >= 1


def test_source_lang_entropy_bounds(spark):
    import math

    df = queries()["q_ext_source_lang_entropy"](spark, SF)
    bad = df.filter(
        (F.col("lang_entropy") < -1e-9)
        | (F.col("lang_entropy") > F.log(F.col("n_langs").cast("double")) + 1e-9)
    )
    assert bad.count() == 0


def test_containment_geq_jaccard(spark):
    # |A∩B|/min always dominates |A∩B|/|A∪B|
    df = queries()["q_ext_dedup_containment"](spark, SF)
    assert df.filter(F.col("containment") < F.col("jaccard") - 1e-9).count() == 0
    assert df.filter(
        (F.col("containment") < 0) | (F.col("containment") > 1 + 1e-9)
    ).count() == 0


def test_incremental_dedup_covers_batch(spark):
    df = queries()["q_ext_incremental_dedup"](spark, SF).cache()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_batch = docs.filter(F.col("doc_id") % 5 == 0).count()
    assert df.count() == n_batch
    # a dup's canonical must be a historical doc (never in the batch)
    assert df.filter(
        F.col("dup_of").isNotNull() & (F.col("dup_of") % 5 == 0)
    ).count() == 0


def test_bucketed_join_matches_plain_join(spark):
    # identical result to the unbucketed join of the same tables
    got = {
        r["o_orderpriority"]: (r["n_lineitems"], r["total_price"])
        for r in queries()["q_maint_bucketed_join"](spark, SF).collect()
    }
    o = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    want = {
        r["o_orderpriority"]: (r["n"], float(r["s"]))
        for r in o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("s"),
        )
        .collect()
    }
    assert got == want


def test_ks_drift_bounds(spark):
    df = queries()["q_ext_ks_drift"](spark, SF)
    bad = df.filter(
        F.col("ks_stat").isNotNull()
        & ((F.col("ks_stat") < -1e-9) | (F.col("ks_stat") > 1 + 1e-9))
    )
    assert bad.count() == 0
    # identical halves would give 0; distinct samples give > 0 a.s.
    assert df.filter(F.col("ks_stat").isNotNull()).count() > 0


def test_vocab_coverage_monotone(spark):
    rows = {r["top_k"]: r for r in queries()["q_ext_vocab_coverage"](spark, SF).collect()}
    ks = sorted(rows)
    for a, b in zip(ks, ks[1:]):
        assert rows[a]["token_coverage"] <= rows[b]["token_coverage"] + 1e-9
    for r in rows.values():
        assert 0 <= r["token_coverage"] <= 1 + 1e-9


def test_len_bands_ordered(spark):
    df = queries()["q_ext_len_bands_by_lang"](spark, SF)
    bad = df.filter(
        (F.col("p10") > F.col("p50")) | (F.col("p50") > F.col("p90"))
    )
    assert bad.count() == 0


def test_dup_cluster_sizes_partition_corpus(spark):
    df = queries()["q_ext_dup_cluster_sizes"](spark, SF)
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert df.agg(F.sum("n_docs")).first()[0] == n_docs


def test_hapax_fraction_bounds(spark):
    df = queries()["q_ext_hapax_fraction"](spark, SF)
    assert df.filter(F.col("n_hapax") > F.col("n_tokens")).count() == 0
    assert df.filter(
        (F.col("hapax_frac") < 0) | (F.col("hapax_frac") > 1)
    ).count() == 0


def test_activity_gini_bounds(spark):
    row = queries()["q_ext_activity_gini"](spark, SF).first()
    assert 0 <= row["gini"] < 1
    ev = spark.read.parquet(f"{SF}/events.parquet")
    assert row["n_events"] == ev.count()
    assert row["n_users"] == ev.select("user_id").distinct().count()


def test_winsorize_approx_close_to_exact(spark):
    # the sketch path must agree with the exact path on which rows get
    # clipped up to the approx_percentile rank tolerance; at sf0.001
    # with accuracy 10k the boundaries land on (nearly) the same order
    # statistics, so disagreement is a small fraction of rows
    from binancedatapipelineinaws_spark.operators.analytics import (
        winsorize_frame,
    )

    exact = winsorize_frame(spark, SF, exact=True).select(
        "event_id", "was_clipped"
    )
    approx = winsorize_frame(spark, SF, exact=False).select(
        F.col("event_id").alias("event_id_a"),
        F.col("was_clipped").alias("was_clipped_a"),
    )
    joined = exact.join(
        approx, F.col("event_id") == F.col("event_id_a"), "full"
    )
    n = joined.count()
    assert joined.filter(F.col("event_id_a").isNull()).count() == 0
    disagree = joined.filter(
        F.col("was_clipped") != F.col("was_clipped_a")
    ).count()
    assert disagree / n < 0.01


def test_mad_outliers_approx_flags_superset_tolerance(spark):
    from binancedatapipelineinaws_spark.operators.stats import (
        mad_outliers_frame,
    )

    exact_ids = {
        r["event_id"]
        for r in mad_outliers_frame(spark, SF, exact=True)
        .select("event_id")
        .collect()
    }
    approx_ids = {
        r["event_id"]
        for r in mad_outliers_frame(spark, SF, exact=False)
        .select("event_id")
        .collect()
    }
    # symmetric difference bounded: sketch medians shift the threshold
    # by at most the rank tolerance, flipping only borderline rows
    denom = max(1, len(exact_ids | approx_ids))
    assert len(exact_ids ^ approx_ids) / denom < 0.05


def test_ks_drift_binned_lower_bounds_exact(spark):
    # the binned statistic samples the CDF gap at bin edges: it can
    # only UNDERSTATE the exact supremum, and with 256 bins over the
    # test range it should be close
    from binancedatapipelineinaws_spark.operators.stats import (
        ks_drift_frame,
    )

    exact = {
        r["source"]: r["ks_stat"]
        for r in ks_drift_frame(spark, SF, exact=True).collect()
    }
    binned = {
        r["source"]: r["ks_stat"]
        for r in ks_drift_frame(spark, SF, exact=False).collect()
    }
    assert set(binned) == set(exact)
    for src, ks in exact.items():
        if ks is None:
            assert binned[src] is None
            continue
        assert binned[src] <= ks + 1e-9
        assert binned[src] >= ks - 0.08


def _png_bytes(w: int, h: int) -> bytes:
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    chunk = (
        struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    )
    return b"\x89PNG\r\n\x1a\n" + chunk


def _bmp_bytes(w: int, h: int) -> bytes:
    import struct

    header = b"BM" + struct.pack("<IHHI", 26 + 40, 0, 0, 54)
    dib = struct.pack("<IiiHH", 40, w, -h, 1, 24) + b"\x00" * 20
    return header + dib


def _jpeg_bytes(w: int, h: int) -> bytes:
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 3) + b"\x00\x00"
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def test_image_header_parser_real_formats_and_ascii_rejection():
    from binancedatapipelineinaws_spark.functions.multimodal import (
        parse_image_header,
    )

    assert parse_image_header(_png_bytes(640, 480)) == ("png", 640, 480)
    assert parse_image_header(_bmp_bytes(31, 17)) == ("bmp", 31, 17)
    assert parse_image_header(_jpeg_bytes(1920, 1080)) == (
        "jpeg",
        1920,
        1080,
    )
    # ASCII text must NEVER parse — including text that begins with the
    # BMP magic letters (the strict DIB-size check rejects it), which
    # is what keeps the text-corpus oracle on the fake branch
    assert parse_image_header(b"the quick brown fox" * 3) is None
    assert parse_image_header(b"BM deposits rose 4% quarter on quarter") is None
    assert parse_image_header(b"GIF89a looks like an image but is text") is None
    assert parse_image_header(b"") is None


def test_multimodal_meta_reports_real_dims_through_spark(spark):
    # the done-criterion from the r5 verdict: synthesized PNG/BMP/JPEG
    # bytes flow through the SAME Arrow-batched mapInPandas kernel the
    # registered query uses and come out with their true dimensions,
    # while a text blob still gets the md5 fake
    import hashlib

    from binancedatapipelineinaws_spark.functions.multimodal import (
        META_SCHEMA,
        make_extract_meta_kernel,
    )

    text = b"plain old document text, no magic anywhere"
    blobs = [
        (1, bytearray(_png_bytes(800, 600))),
        (2, bytearray(_bmp_bytes(64, 32))),
        (3, bytearray(_jpeg_bytes(320, 240))),
        (4, bytearray(text)),
    ]
    df = spark.createDataFrame(blobs, "doc_id long, blob binary")
    out = {
        r["doc_id"]: r
        for r in df.mapInPandas(
            make_extract_meta_kernel(), schema=META_SCHEMA
        ).collect()
    }
    assert (out[1]["img_format"], out[1]["fake_width"], out[1]["fake_height"]) \
        == ("png", 800, 600)
    assert (out[2]["img_format"], out[2]["fake_width"], out[2]["fake_height"]) \
        == ("bmp", 64, 32)
    assert (out[3]["img_format"], out[3]["fake_width"], out[3]["fake_height"]) \
        == ("jpeg", 320, 240)
    h = hashlib.md5(text).hexdigest()
    assert out[4]["img_format"] is None
    assert out[4]["fake_width"] == int(h[:8], 16) % 1920
    assert out[4]["fake_height"] == int(h[8:16], 16) % 1080
    assert out[4]["content_md5"] == h


def test_png_codec_roundtrip_all_filters_and_channels():
    # random images across channel counts and odd sizes; the encoder
    # cycles filters 0-4 per scanline, so >= 5-row images exercise
    # every unfilter branch (Sub/Up/Average/Paeth included)
    import random

    from binancedatapipelineinaws_spark.functions.multimodal import (
        png_decode,
        png_encode,
    )

    rng = random.Random(99)
    for ch in (1, 3, 4):
        for w, h in ((1, 1), (16, 7), (3, 12), (40, 5)):
            px = bytes(rng.randrange(256) for _ in range(w * h * ch))
            got = png_decode(png_encode(px, w, h, channels=ch))
            assert got[:3] == (w, h, ch)
            assert bytes(got[3]) == px
    # constant and gradient images (filter edge cases: zero deltas,
    # monotone rows where Average/Paeth predictions saturate)
    for px in (bytes(48 * 5), bytes(i % 256 for i in range(48 * 5))):
        assert bytes(png_decode(png_encode(px, 16, 5))[3]) == px


def test_decode_image_dispatch_and_bmp():
    import struct

    from binancedatapipelineinaws_spark.functions.multimodal import (
        bmp_decode,
        decode_image,
    )

    # hand-built 2x2 24-bit BMP, bottom-up rows padded to 4 bytes:
    # stored row order is (bottom) then (top), BGR within pixel
    top = [(255, 0, 0), (0, 255, 0)]  # RGB of the TOP row
    bot = [(0, 0, 255), (7, 8, 9)]
    rowsize = 8  # 2*3 padded to 4-byte multiple
    pix = b""
    for row in (bot, top):  # bottom-up storage
        for r, g, b in row:
            pix += bytes((b, g, r))
        pix += b"\x00" * (rowsize - 6)
    hdr = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(pix), 0, 0, 0, 0)
    )
    w, h, ch, out = bmp_decode(hdr + pix)
    assert (w, h, ch) == (2, 2, 3)
    assert bytes(out) == bytes(v for p in top + bot for v in p)
    assert decode_image(hdr + pix)[:3] == (2, 2, 3)
    import pytest

    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0 jpeg needs a dct codec")
    with pytest.raises(ValueError):
        decode_image(b"plain text")


def test_frame_seq_empty_blob_emits_no_rows(spark):
    # ADVICE r8: F.sequence(0, n_frames - 1) on a zero-length blob
    # auto-steps DOWN to [0, -1] and emits two phantom frame rows
    # (frame_idx=-1, negative n_bytes) where the oracle's range(0) is
    # empty.  _frame_seq must yield an empty array for n_frames == 0
    # and the plain ascending sequence otherwise.
    from binancedatapipelineinaws_spark.functions.multimodal import (
        _frame_seq,
    )
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(1, ""), (2, "x" * 256), (3, "y" * 300)], "doc_id long, text string"
    )
    n_frames = F.ceil(F.length("text") / 256.0).cast("long")
    out = (
        df.select("doc_id", F.explode(_frame_seq(n_frames)).alias("fi"))
        .orderBy("doc_id", "fi")
        .collect()
    )
    assert [(r["doc_id"], r["fi"]) for r in out] == [(2, 0), (3, 0), (3, 1)]


# --- value bounds for the four rows-only queries (the driver gate can
# only count their rows; these are the only value checks they can get) --


def test_approx_distinct_within_hll_error(spark):
    """Since the r8 envelope conversion the HLL accuracy check lives
    INSIDE the gated query (TRUE-pinned flags); this test re-derives
    the exact cardinalities independently and asserts the flags hold
    and the exact columns match — a regression here means either the
    sketch fell out of envelope or the gate's exact side drifted."""
    rows = {
        r["l_returnflag"]: r
        for r in queries()["q_agg_approx_distinct"](spark, SF).collect()
    }
    exact = {
        r["l_returnflag"]: r
        for r in spark.read.parquet(f"{SF}/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
        )
        .collect()
    }
    assert set(rows) == set(exact)
    for flag, a in rows.items():
        assert a["exact_parts"] == exact[flag]["n_parts"]
        assert a["exact_supps"] == exact[flag]["n_supps"]
        assert a["parts_within_bound"] is True
        assert a["supps_within_bound"] is True


def test_approx_percentiles_within_rank_tolerance(spark):
    """Since the r8 envelope conversion the rank-tolerance check lives
    INSIDE the gated query (value must sit between the exact p+-0.01
    quantiles, TRUE-pinned); this test independently re-derives the
    exact quantiles via q_agg_percentiles and asserts the flags hold
    and the exact columns agree between the two queries."""
    rows = {
        r["l_returnflag"]: r
        for r in queries()["q_agg_approx_percentiles"](spark, SF).collect()
    }
    exact = {
        r["l_returnflag"]: r
        for r in queries()["q_agg_percentiles"](spark, SF).collect()
    }
    assert set(rows) == set(exact)
    for flag, a in rows.items():
        for acol, ecol in (
            ("p50_exact", "p50"),
            ("p95_exact", "p95"),
            ("p99_exact", "p99"),
        ):
            assert a[acol] == exact[flag][ecol], (flag, acol)
        assert a["p50_in_band"] is True
        assert a["p95_in_band"] is True
        assert a["p99_in_band"] is True


def test_hash_native_constant_vectors(spark):
    """The r8 envelope conversion moved raw hash values out of the
    gated output (they are invariants-only there), so the golden
    vectors are pinned against the SAME expressions the query uses,
    evaluated directly — a seed or encoding regression still cannot
    slip through.  The query-level contract (cardinality + TRUE
    flags) is asserted on top."""
    import zlib

    hashed = {
        r["c_name"]: r
        for r in spark.read.parquet(f"{SF}/customer.parquet")
        .select(
            "c_name",
            F.xxhash64("c_name").alias("xx64"),
            F.hash("c_name").alias("mm3"),
            F.crc32(F.col("c_name").cast("binary")).alias("crc"),
        )
        .collect()
    }
    # crc32: independently recomputed with zlib (same polynomial)
    for name, row in hashed.items():
        assert row["crc"] == zlib.crc32(name.encode())
    # xxhash64/murmur3: Spark's published seed-42 implementations,
    # pinned against precomputed vectors
    golden = {
        "Customer#000000001": (5289279398613631133, -947655689),
        "Customer#000000002": (-5385866796556993174, 1908694569),
    }
    checked = 0
    for name, (xx, mm) in golden.items():
        if name in hashed:  # present at every SF for TPC-H-ish data
            assert hashed[name]["xx64"] == xx
            assert hashed[name]["mm3"] == mm
            checked += 1
    assert checked > 0
    (row,) = queries()["q_fn_hash_native"](spark, SF).collect()
    assert row["n_names"] == len(hashed)
    assert row["xx64_injective"] is True
    assert row["murmur3_nearly_injective"] is True
    assert row["crc32_in_range"] is True


def test_json_struct_roundtrip_golden(spark):
    """The r8 envelope conversion replaced the raw to_json /
    schema_of_json text outputs with TRUE-pinned invariants, so the
    golden JSON formatting is pinned against the same expressions
    directly; the query-level contract (typed k + round-trip flags)
    is asserted against an independent Python parse."""
    import json

    # golden: Spark's to_json formatting and schema_of_json inference
    (g,) = (
        spark.range(1)
        .select(
            F.to_json(F.from_json(F.lit('{"k": 7}'), "k INT")).alias("j"),
            F.schema_of_json(F.lit('{"k": 1}')).alias("s"),
        )
        .collect()
    )
    assert g["j"] == json.dumps({"k": 7}, separators=(",", ":"))
    assert g["s"] == "STRUCT<k: BIGINT>"

    out = {
        r["event_id"]: r
        for r in queries()["q_fn_json_struct"](spark, SF).collect()
    }
    props = {
        r["event_id"]: r["props"]
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .select("event_id", "props")
        .collect()
    }
    assert len(out) == len(props)
    checked = 0
    for eid, row in out.items():
        assert row["roundtrip_ok"] is True
        assert row["schema_has_k"] is True
        src = props[eid]
        k = None
        if src:
            try:
                parsed = json.loads(src)
                k = parsed.get("k") if isinstance(parsed, dict) else None
            except ValueError:
                k = None
        if isinstance(k, int):
            assert row["k"] == k
            checked += 1
        else:
            assert row["k"] is None
    assert checked > 0  # the corpus must actually exercise the happy path


def _quantile_fixture(spark, tmp_path, values):
    """Write a minimal events.parquet carrying `values` and return the
    sf_dir; exercises q_ext_exact_quantiles end-to-end on crafted
    distributions the driver tables can't produce."""
    import datetime

    rows = [
        (
            i,
            datetime.datetime(2024, 1, 1, 0, 0, i % 60),
            i % 7,
            "view",
            float(v),
            "{}",
        )
        for i, v in enumerate(values)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


def _expected_quantiles(values):
    # value at 1-based rank ceil(q*n), the query's declared definition
    s = sorted(values)
    n = len(s)
    return {
        q: s[(num * n + den - 1) // den - 1]
        for q, num, den in [(0.25, 1, 4), (0.5, 1, 2), (0.9, 9, 10)]
    }


def test_exact_quantiles_constant_column(spark, tmp_path):
    # vmin == vmax: the degenerate single-bucket path
    sf = _quantile_fixture(spark, tmp_path, [42.0] * 37)
    got = {
        r["q"]: r["q_value"]
        for r in queries()["q_ext_exact_quantiles"](spark, sf).collect()
    }
    assert got == {0.25: 42.0, 0.5: 42.0, 0.9: 42.0}


def test_exact_quantiles_heavy_ties_and_skew(spark, tmp_path):
    # two-value distribution: ties span bucket boundaries; ranks must
    # still select the exact order-statistic value
    values = [1.0] * 70 + [2.0] * 30
    sf = _quantile_fixture(spark, tmp_path, values)
    got = {
        r["q"]: r["q_value"]
        for r in queries()["q_ext_exact_quantiles"](spark, sf).collect()
    }
    assert got == _expected_quantiles(values)


def test_exact_quantiles_single_row(spark, tmp_path):
    sf = _quantile_fixture(spark, tmp_path, [7.5])
    rows = queries()["q_ext_exact_quantiles"](spark, sf).collect()
    assert len(rows) == 3
    assert {r["q_value"] for r in rows} == {7.5}
    assert {r["rank"] for r in rows} == {1}


# --- integer-reformulation equivalence (hypothesis) -------------------------
# Several queries replace float thresholds with integer cross-
# multiplications so no engine's float math can flip a row.  These
# prove the rewrites equal their real-number definitions for ALL
# inputs, not just the driver tables.

from fractions import Fraction  # noqa: E402
import math  # noqa: E402

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=300, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=10**12),
    q=st.sampled_from([(1, 4), (1, 2), (9, 10), (99, 100), (1, 1000)]),
)
def test_integer_rank_equals_ceil_qn(n, q):
    # q_ext_exact_quantiles: (num*n + den - 1) div den == ceil(q*n),
    # computed in exact rationals (not floats, whose rounding is the
    # bug being avoided)
    num, den = q
    assert (num * n + den - 1) // den == math.ceil(Fraction(num, den) * n)


@settings(max_examples=300, deadline=None)
@given(
    n_words=st.integers(min_value=1, max_value=10**9),
    n_wchars=st.integers(min_value=0, max_value=10**12),
    n_stop=st.integers(min_value=0, max_value=10**9),
)
def test_gopher_cross_multiplication_equals_ratio_bounds(
    n_words, n_wchars, n_stop
):
    # q_ext_gopher_rules: 3 <= n_wchars/n_words <= 6 as integer
    # compares; n_stop/n_words >= 1/50 likewise
    exact_wlen = 3 <= Fraction(n_wchars, n_words) <= 6
    int_wlen = (n_wchars >= 3 * n_words) and (n_wchars <= 6 * n_words)
    assert int_wlen == exact_wlen
    exact_stop = Fraction(n_stop, n_words) >= Fraction(1, 50)
    assert (50 * n_stop >= n_words) == exact_stop


@settings(max_examples=300, deadline=None)
@given(
    qty=st.integers(min_value=1, max_value=50),
    sum_qty=st.integers(min_value=1, max_value=10**9),
    cnt=st.integers(min_value=1, max_value=10**7),
)
def test_q17_threshold_rewrite_equals_avg_fraction(qty, sum_qty, cnt):
    # q_ext_tpch_q17: qty < 0.2 * (sum/cnt)  <=>  5*qty*cnt < sum
    exact = Fraction(qty) < Fraction(1, 5) * Fraction(sum_qty, cnt)
    assert (5 * qty * cnt < sum_qty) == exact


def test_first_touch_partitions_all_purchases(spark):
    # every purchase is attributed to exactly one channel (or 'none')
    df = queries()["q_ext_first_touch"](spark, SF)
    total = df.agg(F.sum("n_purchases")).first()[0]
    ev = spark.read.parquet(f"{SF}/events.parquet")
    assert total == ev.filter(F.col("event_type") == "purchase").count()


def test_groupk_sample_exactly_k_per_stratum(spark):
    from binancedatapipelineinaws_spark.functions.sampling import GROUPK_N

    df = queries()["q_ext_groupk_sample"](spark, SF)
    sizes = {
        r["lang"]: r["n"]
        for r in df.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    lang_sizes = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, n in sizes.items():
        assert n == min(GROUPK_N, lang_sizes[lang])
    assert set(sizes) == set(lang_sizes)  # no stratum dropped


def test_rfm_segments_partition_customers(spark):
    """Every customer with at least one order lands in exactly one RFM
    segment: segment counts sum to the distinct-customer count, scores
    stay in {1,2,3}, and monetary means are positive."""
    df = queries()["q_ext_rfm_segments"](spark, SF).cache()
    n_cust = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    total = df.agg(F.sum("n_customers")).first()[0]
    assert total == n_cust
    bad = df.filter(
        ~F.col("r_score").isin(1, 2, 3)
        | ~F.col("f_score").isin(1, 2, 3)
        | ~F.col("m_score").isin(1, 2, 3)
        | (F.col("avg_monetary") <= 0)
        | (F.col("n_customers") <= 0)
    )
    assert bad.count() == 0


def test_quality_score_bands_partition_docs(spark):
    """(lang, band) cells partition the corpus, and band means respect
    the band ordering within every language (high > mid > low)."""
    df = queries()["q_ext_quality_score"](spark, SF).cache()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert df.agg(F.sum("n_docs")).first()[0] == n_docs
    rows = {(r.lang, r.band): r.avg_score for r in df.collect()}
    for lang in {k[0] for k in rows}:
        hi = rows.get((lang, "high"))
        mid = rows.get((lang, "mid"))
        lo = rows.get((lang, "low"))
        if hi is not None and mid is not None:
            assert hi > mid
        if mid is not None and lo is not None:
            assert mid > lo


def test_hybrid_rrf_fused_ranks_consistent(spark):
    """RRF output: at most 2*N rows, every rank within 1..N and unique
    per ranker, and the fused score equals the closed form of its
    ranks (recomputed driver-side)."""
    from binancedatapipelineinaws_spark.functions.retrieval import (
        RRF_K,
        RRF_TOP_N,
    )

    rows = queries()["q_ext_hybrid_rrf"](spark, SF).collect()
    assert 0 < len(rows) <= 2 * RRF_TOP_N
    lex = [r.lex_rank for r in rows if r.lex_rank is not None]
    sem = [r.sem_rank for r in rows if r.sem_rank is not None]
    assert len(set(lex)) == len(lex) and all(1 <= r <= RRF_TOP_N for r in lex)
    assert len(set(sem)) == len(sem) and all(1 <= r <= RRF_TOP_N for r in sem)
    for r in rows:
        want = (1.0 / (RRF_K + r.lex_rank) if r.lex_rank else 0.0) + (
            1.0 / (RRF_K + r.sem_rank) if r.sem_rank else 0.0
        )
        assert abs(r.rrf - want) < 1e-6


def test_embed_covariance_matches_numpy(spark):
    """The distributed Gram-matrix covariance must equal a straight
    numpy covariance of the floor-quantized vectors (rtol from the
    6-dp output round) — partition scheduling must not change values."""
    import numpy as np

    from binancedatapipelineinaws_spark.functions.similarity import (
        COV_SCALE,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    x = np.stack([r.embedding for r in emb.select("embedding").collect()])
    q = np.floor(x.astype(np.float64) * COV_SCALE)
    n = q.shape[0]
    mean = q.sum(axis=0) / n
    cov_full = (q.T @ q) / n - np.outer(mean, mean)
    cov_full /= float(COV_SCALE) ** 2
    got = queries()["q_ext_embed_covariance"](spark, SF).collect()
    assert len(got) > 0
    for r in got:
        assert r.n == n
        assert abs(r.cov - cov_full[r.dim_i, r.dim_j]) < 5e-6
    # the top-k really is the top: no remaining pair beats the last row
    kept = {(r.dim_i, r.dim_j) for r in got}
    floor_abs = min(abs(r.cov) for r in got)
    iu, ju = np.triu_indices(cov_full.shape[0], k=1)
    rest = [
        abs(cov_full[i, j])
        for i, j in zip(iu, ju)
        if (int(i), int(j)) not in kept
    ]
    assert max(rest) <= floor_abs + 5e-6


def test_tpch_q21_solo_late_supplier_is_exclusive(spark):
    """Recompute the Q21 invariant driver-side: every counted wait
    belongs to an order where EXACTLY one supplier was late, so no two
    suppliers can be counted for the same order — total numwait equals
    the number of qualifying orders."""
    import pyspark.sql.functions as SF_

    total = (
        queries()["q_ext_tpch_q21"](spark, SF)
        .agg(SF_.sum("numwait"))
        .first()[0]
    )
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet").filter(
        SF_.col("o_orderstatus") == "F"
    )
    ms = li.groupBy("l_orderkey").agg(
        SF_.min("l_shipdate").alias("m0"),
        SF_.count_distinct("l_suppkey").alias("ns"),
    )
    flags = (
        li.join(ms.filter("ns > 1"), "l_orderkey")
        .join(
            orders,
            SF_.col("l_orderkey") == SF_.col("o_orderkey"),
            "left_semi",
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            SF_.max(
                SF_.when(
                    SF_.col("l_shipdate")
                    > SF_.col("m0") + SF_.expr("INTERVAL 30 DAYS"),
                    1,
                ).otherwise(0)
            ).alias("late")
        )
    )
    solo_orders = (
        flags.groupBy("l_orderkey")
        .agg(SF_.sum("late").alias("nl"))
        .filter("nl = 1")
        .count()
    )
    # top-20 cut can drop tail suppliers; the UNCUT total equals the
    # qualifying-order count, and the cut total can never exceed it
    assert total <= solo_orders


def test_asof_tolerance_partitions_purchases(spark):
    """Every purchase appears exactly once; rows outside tolerance
    carry NULL match columns; rows inside agree with the plain as-of
    join's match."""
    df = queries()["q_ext_asof_tolerance"](spark, SF).cache()
    n_purchases = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert df.count() == n_purchases
    assert df.select("purchase_id").distinct().count() == n_purchases
    bad_out = df.filter(
        ~F.col("within_tol")
        & (F.col("click_id").isNotNull() | F.col("age_s").isNotNull())
    )
    assert bad_out.count() == 0
    bad_in = df.filter(
        F.col("within_tol")
        & (
            F.col("click_id").isNull()
            | (F.col("age_s") < 0)
            | (F.col("age_s") > 3600)
        )
    )
    assert bad_in.count() == 0
    # inside tolerance, the match must equal the untolerated as-of match
    plain = queries()["q_join_asof"](spark, SF).select(
        "purchase_id", F.col("last_click_id").alias("plain_click")
    )
    j = df.filter(F.col("within_tol")).join(plain, "purchase_id")
    assert j.filter(F.col("click_id") != F.col("plain_click")).count() == 0


def test_ewma_tail_cap_matches_full_fold(spark, tmp_path):
    """A user with MORE than EWMA_TAIL events exercises the truncation
    branch: the capped fold must agree with the full-history fold to
    well under the 6-dp round (the documented decay bound), and with
    a direct Python recomputation of the capped fold exactly."""
    import datetime

    from binancedatapipelineinaws_spark.operators.analytics import (
        EWMA_ALPHA,
        EWMA_TAIL,
    )
    from binancedatapipelineinaws_spark.registry import queries

    n = EWMA_TAIL + 88
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (
            i,
            t0 + datetime.timedelta(seconds=i),
            7,
            "view",
            float(((i * 37) % 1000) / 7.0),
            "{}",
        )
        for i in range(n)
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {
        r.user_id: (r.n_events, r.ewma)
        for r in queries()["q_ext_ewma"](spark, str(tmp_path)).collect()
    }
    assert got[7][0] == n
    vals = [float(((i * 37) % 1000) / 7.0) for i in range(n)]
    capped = vals[-EWMA_TAIL:]
    acc = capped[0]
    for x in capped[1:]:
        acc = EWMA_ALPHA * x + (1 - EWMA_ALPHA) * acc
    assert got[7][1] == round(acc, 6)
    full = vals[0]
    for x in vals[1:]:
        full = EWMA_ALPHA * x + (1 - EWMA_ALPHA) * full
    assert abs(full - acc) < 1e-12  # decay bound: cap is invisible
    # the ORACLE's list_slice branch must agree on the same fixture
    import duckdb

    from binancedatapipelineinaws_spark.registry import all_specs

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{tmp_path}/events.parquet/*.parquet')"
    )
    duck = con.sql(all_specs()["q_ext_ewma"].oracle).fetchall()
    assert {(r[0], r[1], r[2]) for r in duck} == {
        (7, n, round(acc, 6))
    }


def test_dedup_horizon_matches_greedy_replay(spark):
    """q_ext_dedup_horizon's fold must equal an independent imperative
    greedy replay (keep iff > HORIZON_S after the previous KEPT event)
    for every key — including tied floored-seconds, where the
    (sec, event_id) order decides the chain."""
    from binancedatapipelineinaws_spark.functions.dedup import HORIZON_S

    got = {
        (r["user_id"], r["event_type"]): r["kept_ids"]
        for r in queries()["q_ext_dedup_horizon"](spark, SF).collect()
    }
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select(
            "user_id",
            "event_type",
            "event_id",
            F.unix_timestamp(
                F.col("ts").cast("timestamp")
            ).alias("sec"),
        )
        .collect()
    )
    byday = {}
    for r in ev:
        byday.setdefault((r["user_id"], r["event_type"]), []).append(
            (r["sec"], r["event_id"])
        )
    assert set(byday) == set(got)
    for key, rows in byday.items():
        kept, last = [], None
        for sec, eid in sorted(rows):
            if last is None or sec > last + HORIZON_S:
                kept.append(eid)
                last = sec
        assert got[key] == ",".join(str(e) for e in kept), key


def test_dedup_horizon_first_events_always_kept(spark):
    """The first event of every key starts its chain: n_kept >= 1 and
    the first kept id is the key's earliest (sec, event_id) event —
    the invariant that also ties the streaming dropDuplicates path
    (which always keeps first occurrences) to this batch twin."""
    df = queries()["q_ext_dedup_horizon"](spark, SF)
    assert df.filter(F.col("n_kept") < 1).count() == 0
    assert df.filter(F.col("n_kept") > F.col("n_events")).count() == 0


def test_longest_dupspan_planted_verbatim_block(spark, tmp_path):
    """Run-length correctness on a crafted corpus: two docs share one
    44-token verbatim block plus one isolated shared 5-gram far away.
    The longest span must measure the block (44 tokens = 40 grams),
    not the scattered gram, and a doc with no shared grams reports 0."""
    block = " ".join(f"blk{i}" for i in range(44))
    iso = "iso0 iso1 iso2 iso3 iso4"
    docs = spark.createDataFrame(
        [
            (0, f"a0 a1 a2 a3 a4 a5 {block} a6 a7 a8 a9 a10 {iso} a11"),
            (1, f"b0 b1 b2 b3 b4 b5 b6 {block} b7 b8 b9 {iso} b10 b11"),
            (2, "c0 c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11"),
        ],
        "doc_id long, text string",
    ).withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("t")
    ).withColumn("n_chars", F.length("text"))
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {
        r["doc_id"]: (r["longest_run_grams"], r["longest_span_tokens"])
        for r in queries()["q_ext_longest_dupspan"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got[0] == (40, 44)  # the 44-token block = 40 5-gram run
    assert got[1] == (40, 44)
    assert got[2] == (0, 0)


def test_trim_dupspan_removes_planted_block(spark, tmp_path):
    """Trim must cut exactly the planted 44-token block (verified by
    reconstructing the expected text in Python and comparing md5) and
    leave the clean doc untouched."""
    import hashlib

    block = " ".join(f"blk{i}" for i in range(44))
    texts = {
        0: f"a0 a1 a2 a3 a4 a5 {block} a6 a7 a8 a9 a10 a11",
        1: f"b0 b1 b2 b3 b4 b5 b6 {block} b7 b8 b9 b10 b11",
        2: "c0 c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11",
    }
    docs = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    ).withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("t")
    ).withColumn("n_chars", F.length("text"))
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {
        r["doc_id"]: r
        for r in queries()["q_ext_trim_dupspan"](
            spark, str(tmp_path)
        ).collect()
    }

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    w0 = texts[0].split(" ")
    exp0 = " ".join(w0[:6] + w0[6 + 44:])
    assert got[0]["n_removed"] == 44
    assert got[0]["trimmed_md5"] == md5(exp0)
    w1 = texts[1].split(" ")
    exp1 = " ".join(w1[:7] + w1[7 + 44:])
    assert got[1]["n_removed"] == 44
    assert got[1]["trimmed_md5"] == md5(exp1)
    assert got[2]["n_removed"] == 0
    assert got[2]["trimmed_md5"] == md5(texts[2])


def test_strip_dupspans_threshold_and_multi_span(spark, tmp_path):
    """Only spans >= STRIP_MIN_TOKENS are removed; two qualifying
    blocks in one doc are BOTH removed; a sub-threshold 44-token block
    survives."""
    import hashlib

    big1 = " ".join(f"x{i}" for i in range(55))
    big2 = " ".join(f"y{i}" for i in range(60))
    small = " ".join(f"s{i}" for i in range(44))
    texts = {
        0: f"a0 a1 {big1} a2 a3 a4 a5 a6 {big2} a7 a8",
        1: f"b0 b1 b2 {big1} b3 {big2} b4 b5 b6 b7",
        2: f"c0 c1 {small} c2 c3",
        3: f"d0 d1 d2 {small} d3",
        4: "e0 e1 e2 e3 e4 e5 e6 e7",
    }
    docs = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    ).withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("t")
    ).withColumn("n_chars", F.length("text"))
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {
        r["doc_id"]: r
        for r in queries()["q_ext_strip_dupspans"](
            spark, str(tmp_path)
        ).collect()
    }

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    # doc 0: both big blocks stripped, connectors survive
    assert got[0]["n_removed"] == 55 + 60
    assert got[0]["stripped_md5"] == md5(
        "a0 a1 a2 a3 a4 a5 a6 a7 a8"
    )
    assert got[1]["n_removed"] == 55 + 60
    assert got[1]["stripped_md5"] == md5("b0 b1 b2 b3 b4 b5 b6 b7")
    # 44-token shared block is below the 50-token minimum: untouched
    assert got[2]["n_removed"] == 0
    assert got[2]["stripped_md5"] == md5(texts[2])
    assert got[4]["n_removed"] == 0


def test_ohlcv_incremental_branches_partition_minutes(spark):
    """The refresh's two branches must PARTITION the candle table:
    every minute comes from exactly one of (kept history rollup,
    recomputed affected set), and the union equals the direct full
    rollup row-for-row (the oracle proves values; this pins the
    mechanism)."""
    inc = queries()["q_ext_ohlcv_incremental"](spark, SF)
    full = queries()["q_agg_ohlcv_1min"](spark, SF)
    assert inc.count() == full.count()
    assert inc.select("minute_start").distinct().count() == inc.count()
    assert inc.exceptAll(full).count() == 0
    assert full.exceptAll(inc).count() == 0


# --- r7 algorithmic cores (hypothesis) ---------------------------------------
# The greedy horizon fold and the run-length collapse are encodings of
# imperative algorithms into engine folds/windows; these prove the
# ENCODINGS equal their imperative definitions for ALL inputs, not
# just the driver tables (the same discipline as the integer-
# reformulation proofs above).


@settings(max_examples=300, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5000),  # epoch seconds
            st.integers(min_value=0, max_value=10**6),  # event id
        ),
        min_size=1,
        max_size=60,
        unique=True,
    ),
    horizon=st.sampled_from([0, 1, 7, 600]),
)
def test_horizon_fold_encoding_equals_greedy_replay(evs, horizon):
    # q_ext_dedup_horizon encodes greedy within-horizon dedup as a
    # fold over a flat [sec, id, sec, id, ...] array with
    # acc[len - 1] = last kept second; replay the EXACT fold the
    # engines run and compare with the straightforward greedy scan —
    # including tied seconds, where (sec, id) order decides the chain
    pairs = sorted(evs)
    # the engine fold: init = first pair, then concat-if-beyond-horizon
    acc = [pairs[0][0], pairs[0][1]]
    for sec, eid in pairs[1:]:
        if sec > acc[-2] + horizon:
            acc += [sec, eid]
    fold_kept = [acc[2 * i + 1] for i in range(len(acc) // 2)]
    # the imperative definition
    kept, last = [], None
    for sec, eid in pairs:
        if last is None or sec > last + horizon:
            kept.append(eid)
            last = sec
    assert fold_kept == kept


@settings(max_examples=300, deadline=None)
@given(
    dup_positions=st.sets(
        st.integers(min_value=0, max_value=200), min_size=0, max_size=80
    )
)
def test_runlength_collapse_equals_maximal_runs(dup_positions):
    # q_ext_longest_dupspan / trim / strip key runs on j - rank(j):
    # constant exactly within a maximal run of consecutive positions.
    # Group by that key and compare (length, start) multisets against
    # an imperative maximal-run scan.
    ps = sorted(dup_positions)
    groups: dict[int, list[int]] = {}
    for rank, j in enumerate(ps, start=1):
        groups.setdefault(j - rank, []).append(j)
    got = sorted((len(v), min(v)) for v in groups.values())
    runs, i = [], 0
    while i < len(ps):
        k = i
        while k + 1 < len(ps) and ps[k + 1] == ps[k] + 1:
            k += 1
        runs.append((k - i + 1, ps[i]))
        i = k + 1
    assert got == sorted(runs)


def test_band_ladder_holds_recall_at_threshold():
    # every adaptive_band_geometry rung must keep banded collision
    # probability >= 0.99 for a pair AT the cos-0.9 near-dup threshold
    # (pairs above the threshold collide with higher probability)
    import math

    from binancedatapipelineinaws_spark.functions.similarity import (
        _BAND_LADDER,
        NEARDUP_COS,
        adaptive_band_geometry,
    )

    p_bit = 1 - math.acos(NEARDUP_COS) / math.pi
    rungs = [r[1:] for r in _BAND_LADDER] + [
        adaptive_band_geometry(n) for n in (2_000_000, 1_000_000_000)
    ]
    for bands, rows in rungs:
        p_collide = 1 - (1 - p_bit**rows) ** bands
        assert p_collide >= 0.99, (bands, rows, p_collide)


def test_equidepth_hist_invariants(spark):
    """Buckets partition each type's rows: counts sum to the type's
    row count, bucket ids stay in [1, 10], lo <= hi inside each
    bucket, and bucket value ranges are non-overlapping in bucket
    order (hi of bucket k <= lo of bucket k+2's predecessor chain is
    implied by lo/hi monotonicity across ascending buckets)."""
    df = queries()["q_ext_equidepth_hist"](spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    totals = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    by_type: dict = {}
    for r in df:
        assert 1 <= r["bucket"] <= 10
        assert r["lo"] <= r["hi"]
        by_type.setdefault(r["event_type"], []).append(r)
    assert set(by_type) == set(totals)
    for t, rows in by_type.items():
        assert sum(r["n"] for r in rows) == totals[t]
        rows.sort(key=lambda r: r["bucket"])
        for a, b in zip(rows, rows[1:]):
            assert a["hi"] <= b["lo"] or abs(a["hi"] - b["lo"]) < 1e-9


def test_kll_rank_gate_margin_sweep(spark):
    """VERDICT r7 item 6: the q_ext_kll_rank_error TRUE-pins ride a
    RANDOMIZED sketch, so sweep the gate's exact check over 10
    distribution x size shapes — including the adversarial ones (heavy
    ties, sorted input, constant blocks) — and require the
    sketch-attributable rank error to clear the 0.03 gate with at
    least a 4x margin.  Tie blocks are measured interval-style
    ([rank_lt, rank_le] distance to target), mirroring the query's
    tie-aware flag, so only genuine sketch error counts."""
    import numpy as np

    from binancedatapipelineinaws_spark.operators.scaling import (
        KLL_QUANTILES,
        KLL_RANK_EPS,
        KLL_SKETCH_K,
    )

    rng = np.random.default_rng(8)
    shapes = [
        rng.uniform(0, 1, 1_000),
        rng.standard_normal(5_000),
        rng.exponential(1.0, 20_000),
        rng.lognormal(0.0, 2.0, 50_000),
        np.sort(rng.standard_normal(30_000)),          # worst-case order
        rng.integers(0, 50, 20_000).astype(float),     # heavy ties
        rng.integers(0, 5, 10_000).astype(float),      # 5-value ties
        np.repeat(rng.standard_normal(300), 100),      # constant blocks
        np.concatenate([np.zeros(5_000), rng.standard_normal(5_000)]),
        rng.standard_normal(100_000),
    ]
    worst = 0.0
    for xs in shapes:
        df = spark.createDataFrame(
            [(float(v),) for v in xs], "value double"
        )
        row = df.agg(
            *[
                F.expr(
                    "kll_sketch_get_quantile_double("
                    f"kll_sketch_agg_double(value, {KLL_SKETCH_K}), {p})"
                ).alias(f"q{i}")
                for i, p in enumerate(KLL_QUANTILES)
            ]
        ).first()
        for i, p in enumerate(KLL_QUANTILES):
            v = row[f"q{i}"]
            lo = (xs < v).mean()
            hi = (xs <= v).mean()
            # distance from target to the answer's rank interval
            err = max(lo - p, p - hi, 0.0)
            worst = max(worst, err)
    assert worst <= KLL_RANK_EPS / 4, (
        f"sketch rank error {worst:.4f} within 4x of the "
        f"{KLL_RANK_EPS} gate — widen the gate or raise k"
    )


def _copurchase_edges(spark):
    """Independent (pure-Python) edge derivation for the graph tests:
    co-purchase part pairs with support >= 2, symmetrized."""
    from collections import defaultdict

    rows = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    baskets = defaultdict(set)
    for r in rows:
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    support = defaultdict(int)
    for parts in baskets.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                support[(a, b)] += 1
    adj = defaultdict(set)
    for (a, b), n in support.items():
        if n >= 2:
            adj[a].add(b)
            adj[b].add(a)
    return adj


def test_pagerank_matches_python_reimplementation(spark):
    """The gated oracle is a DuckDB twin of the same algorithm; this
    pins the SEMANTICS against a from-scratch Python fixed-point
    PageRank (same integer arithmetic), so a shared mis-translation
    in both SQL dialects cannot hide."""
    adj = _copurchase_edges(spark)
    SCALE = 1_000_000_000_000
    n = len(adj)
    pr = {v: SCALE // n for v in adj}
    for _ in range(3):
        contrib = {v: pr[v] // len(adj[v]) for v in adj}
        inc = {v: sum(contrib[u] for u in adj[v]) for v in adj}
        pr = {
            v: (15 * SCALE) // (100 * n) + (85 * inc[v]) // 100
            for v in adj
        }
    got = {
        r["part"]: (r["deg"], r["pr_scaled"])
        for r in queries()["q_ext_pagerank"](spark, SF).collect()
    }
    assert set(got) == set(adj)
    for v in adj:
        assert got[v] == (len(adj[v]), pr[v]), v
    # mass conservation: total rank stays within the truncation loss
    # bound (each node loses < deg + 2 units per iteration)
    total = sum(p for _, p in got.values())
    assert 0 < SCALE - total < 10 * sum(len(a) for a in adj.values())


def test_triangles_matches_python_reimplementation(spark):
    adj = _copurchase_edges(spark)
    tri = 0
    for v, nbrs in adj.items():
        for a in nbrs:
            if a <= v:
                continue
            for b in nbrs:
                if b <= a:
                    continue
                if b in adj[a]:
                    tri += 1
    wedges = sum(d * (d - 1) // 2 for d in map(len, adj.values()))
    (row,) = queries()["q_ext_triangles"](spark, SF).collect()
    assert row["n_nodes"] == len(adj)
    assert row["n_edges"] == sum(len(a) for a in adj.values()) // 2
    assert row["n_triangles"] == tri
    assert row["n_wedges"] == wedges
    assert 3 * row["n_triangles"] <= row["n_wedges"]


def test_holt_smoothing_matches_python_recurrence(spark):
    """From-scratch Python Holt recurrence over each user's sorted
    values must reproduce the gated query at 6 dp — pins the
    semantics independently of both SQL dialects (the DuckDB oracle
    needed a recursive-CTE workaround for list_reduce's in-place
    struct-field update, so an independent check matters here)."""
    from collections import defaultdict

    from binancedatapipelineinaws_spark.operators.analytics import (
        HOLT_ALPHA,
        HOLT_BETA,
        HOLT_TAIL,
    )

    rows = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    series = defaultdict(list)
    for r in rows:
        series[r["user_id"]].append((r["ts"], r["event_id"], float(r["value"])))
    got = {
        r["user_id"]: r
        for r in queries()["q_ext_holt_smoothing"](spark, SF).collect()
    }
    assert set(got) == set(series)
    for uid, evs in series.items():
        xs = [v for _, _, v in sorted(evs)][-HOLT_TAIL:]
        if len(xs) == 1:
            level, trend = xs[0], 0.0
        else:
            level, trend = xs[0], xs[1] - xs[0]
            for x in xs[2:]:
                nl = HOLT_ALPHA * x + (1 - HOLT_ALPHA) * (level + trend)
                trend = HOLT_BETA * (nl - level) + (1 - HOLT_BETA) * trend
                level = nl
        g = got[uid]
        assert g["n_events"] == len(evs)
        assert abs(g["level"] - round(level, 6)) < 1e-9, uid
        assert abs(g["trend"] - round(trend, 6)) < 1e-9, uid
        assert abs(g["forecast_1"] - round(level + trend, 6)) < 1e-9, uid


def test_cusum_drift_matches_python_recurrence(spark):
    """From-scratch Python CUSUM over each type's daily-mean series
    must reproduce the gated query EXACTLY — the state runs on the
    1e-9 integer z-grid, so the comparison is integer equality, not
    tolerance (the float draft flipped a 6-dp rounding boundary at
    sf1; this pin would catch any such drift at test scale too)."""
    import math
    from collections import defaultdict
    from decimal import Decimal

    from binancedatapipelineinaws_spark.operators.timeseries import (
        CUSUM_H_NANO,
        CUSUM_NANO,
        CUSUM_SLACK_NANO,
    )

    rows = (
        spark.read.parquet(f"{SF}/events.parquet")
        .selectExpr(
            "event_type",
            "CAST(ts AS DATE) AS day",
            "CAST(CAST(value AS DECIMAL(18,6)) AS STRING) AS v6",
        )
        .collect()
    )
    acc = defaultdict(lambda: [Decimal(0), 0])
    for r in rows:
        a = acc[(r["event_type"], r["day"])]
        a[0] += Decimal(r["v6"])
        a[1] += 1
    series = defaultdict(list)
    for (et, day), (s, n) in acc.items():
        series[et].append((day, float(s) / n))
    got = {
        r["event_type"]: r
        for r in queries()["q_ext_cusum_drift"](spark, SF).collect()
    }
    assert set(got) == set(series)
    for et, pts in series.items():
        xs = [m for _, m in sorted(pts)]
        n = len(xs)
        mu = 0.0
        for x in xs:
            mu += x
        mu /= n
        var = 0.0
        for x in xs:
            var += (x - mu) * (x - mu)
        sigma = math.sqrt(var / n)
        sp = sn = 0
        alarms = 0
        for x in xs:
            zi = math.floor((x - mu) / sigma * CUSUM_NANO)
            sp = max(0, sp + zi - CUSUM_SLACK_NANO)
            sn = max(0, sn - zi - CUSUM_SLACK_NANO)
            if sp > CUSUM_H_NANO or sn > CUSUM_H_NANO:
                alarms += 1
                sp = sn = 0
        g = got[et]
        assert g["n_days"] == n
        assert abs(g["mu"] - round(mu, 6)) < 1e-9, et
        assert abs(g["sigma"] - round(sigma, 6)) < 1e-9, et
        assert g["cusum_pos_nano"] == sp, et
        assert g["cusum_neg_nano"] == sn, et
        assert g["n_alarms"] == alarms, et


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division (toward zero) — Spark `div` /
    DuckDB `//` semantics; Python's // floors, so negatives differ."""
    q = abs(a) // b
    return q if a >= 0 else -q


def _candles_cents(spark, sf):
    """Minute candles in exact cents from the canonical tick table,
    rebuilt in plain Python as the independent semantics pin."""
    from collections import defaultdict

    rows = btcusdt(spark, sf).collect()
    by_min = defaultdict(list)
    for r in rows:
        m = r["time"].replace(second=0, microsecond=0)
        by_min[m].append(
            (r["time"], r["bid"], round(r["price"] * 100), round(r["quantity"] * 100000))
        )
    out = {}
    for m, ticks in by_min.items():
        ticks.sort(key=lambda t: (t[0], t[1]))
        out[m] = {
            "open": ticks[0][2],
            "high": max(t[2] for t in ticks),
            "low": min(t[2] for t in ticks),
            "close": ticks[-1][2],
            "vol": sum(t[3] for t in ticks),
        }
    return out


def test_rsi_matches_python_fixed_point_recurrence(spark):
    """From-scratch Python replay of the BIGINT fixed-point Wilder
    recurrence must reproduce q_ext_rsi EXACTLY (integer state, so the
    comparison is equality on the 5-dp grid, not tolerance) — pins the
    semantics independently of both SQL dialects and of the FMA issue
    that sank the double form."""
    from collections import defaultdict

    from binancedatapipelineinaws_spark.operators.indicators import (
        RSI_N,
        _RSI_FP,
    )

    candles = _candles_cents(spark, SF)
    days = defaultdict(list)
    for m in sorted(candles):
        days[m.date()].append((m, candles[m]["close"]))
    expected = {}
    for day, bars in days.items():
        if len(bars) < RSI_N + 1:
            continue
        xs = [c for _, c in bars]
        gains = [max(xs[j] - xs[j - 1], 0) for j in range(1, len(xs))]
        losses = [max(xs[j - 1] - xs[j], 0) for j in range(1, len(xs))]
        ag = _tdiv(sum(gains[:RSI_N]) * _RSI_FP, RSI_N)
        al = _tdiv(sum(losses[:RSI_N]) * _RSI_FP, RSI_N)
        for i in range(RSI_N, len(xs)):
            if i > RSI_N:
                ag = _tdiv(ag * (RSI_N - 1) + gains[i - 1] * _RSI_FP, RSI_N)
                al = _tdiv(al * (RSI_N - 1) + losses[i - 1] * _RSI_FP, RSI_N)
            tot = ag + al
            rsi = (
                None
                if tot == 0
                else _tdiv(20000000 * ag + tot, 2 * tot) / 100000.0
            )
            expected[bars[i][0]] = rsi
    got = {
        r["minute_start"]: r["rsi"]
        for r in queries()["q_ext_rsi"](spark, SF).collect()
    }
    assert set(got) == set(expected)
    assert got == expected  # exact: integer state both sides


def test_macd_matches_python_fixed_point_recurrence(spark):
    """Python replay of the cents x 1e9 EMA machine must reproduce
    q_ext_macd exactly (see RSI twin)."""
    from collections import defaultdict

    candles = _candles_cents(spark, SF)
    days = defaultdict(list)
    for m in sorted(candles):
        days[m.date()].append((m, candles[m]["close"]))

    def q6(a):
        return _tdiv(a + (50000 if a >= 0 else -50000), 100000) / 1000000.0

    expected = {}
    for day, bars in days.items():
        e12 = e26 = bars[0][1] * 1_000_000_000
        sig = 0
        expected[bars[0][0]] = (0.0, 0.0, 0.0)
        for m, c in bars[1:]:
            x = c * 1_000_000_000
            e12 = _tdiv(2 * x + 11 * e12, 13)
            e26 = _tdiv(2 * x + 25 * e26, 27)
            line = e12 - e26
            sig = _tdiv(line + 4 * sig, 5)
            expected[m] = (q6(line), q6(sig), q6(line - sig))
    got = {
        r["minute_start"]: (r["macd"], r["signal"], r["histogram"])
        for r in queries()["q_ext_macd"](spark, SF).collect()
    }
    assert got == expected


def test_bollinger_matches_python_moments(spark):
    """Naive per-window Python mean/stddev over the cents series must
    match the component-sum form within the 6-dp grid."""
    import math
    from collections import defaultdict

    from binancedatapipelineinaws_spark.operators.indicators import (
        BOLL_K,
        BOLL_N,
    )

    candles = _candles_cents(spark, SF)
    days = defaultdict(list)
    for m in sorted(candles):
        days[m.date()].append((m, candles[m]["close"]))
    got = {
        r["minute_start"]: r
        for r in queries()["q_ext_bollinger"](spark, SF).collect()
    }
    n_expected = 0
    for day, bars in days.items():
        for i in range(len(bars)):
            w = [c for _, c in bars[max(0, i - BOLL_N + 1) : i + 1]]
            if len(w) < 2:
                continue
            n_expected += 1
            mu = sum(w) / len(w)
            sd = math.sqrt(
                sum((x - mu) ** 2 for x in w) / (len(w) - 1)
            )
            g = got[bars[i][0]]
            assert g["n"] == len(w)
            assert abs(g["sma"] - mu / 100.0) < 1e-6
            assert abs(g["upper_band"] - (mu + BOLL_K * sd) / 100.0) < 1e-5
            assert abs(g["lower_band"] - (mu - BOLL_K * sd) / 100.0) < 1e-5
    assert len(got) == n_expected


def test_obv_matches_python_prefix_sums(spark):
    """OBV is an exact integer machine: Python prefix sums over signed
    minute volumes must equal obv_u exactly."""
    from collections import defaultdict

    candles = _candles_cents(spark, SF)
    days = defaultdict(list)
    for m in sorted(candles):
        days[m.date()].append((m, candles[m]))
    got = {
        r["minute_start"]: r
        for r in queries()["q_ext_obv"](spark, SF).collect()
    }
    for day, bars in days.items():
        obv = 0
        prev = None
        for m, c in bars:
            d = 0 if prev is None else (c["close"] > prev) - (c["close"] < prev)
            obv += d * c["vol"]
            prev = c["close"]
            assert got[m]["direction"] == d
            assert got[m]["obv_u"] == obv
    assert len(got) == sum(len(b) for b in days.values())


def test_stochastic_atr_donchian_invariants(spark):
    """Cross-indicator invariants on the shared candle layer:
    %K in [0, 100] (or NULL), ATR >= the bar's own high-low range
    divided by the window only when.. (ATR is a mean of TRs, each >=
    that bar's high-low, so ATR >= 0 and true_range >= 0), Donchian
    flags consistent with their channel."""
    st = queries()["q_ext_stochastic"](spark, SF)
    bad_k = st.filter(
        F.col("pct_k").isNotNull()
        & ((F.col("pct_k") < 0) | (F.col("pct_k") > 100))
    )
    assert bad_k.count() == 0

    atr = queries()["q_ext_atr"](spark, SF)
    assert atr.filter(
        (F.col("true_range") < 0) | (F.col("atr") < 0)
    ).count() == 0

    don = queries()["q_ext_donchian"](spark, SF)
    bad = don.filter(
        (F.col("upper_ch") < F.col("lower_ch"))
        | ((F.col("breakout_up") == 1) & (F.col("close") <= F.col("upper_ch")))
        | ((F.col("breakout_down") == 1) & (F.col("close") >= F.col("lower_ch")))
    )
    assert bad.count() == 0


def test_flow_imbalance_partitions_candle_volume(spark):
    """Per-minute buy+sell legs must partition the candle volume and
    trade count exactly (integer equality), and the imbalance must lie
    in [-1, 1]."""
    fi = queries()["q_ext_flow_imbalance"](spark, SF)
    candles = _candles_cents(spark, SF)
    rows = fi.collect()
    assert len(rows) == len(candles)
    for r in rows:
        c = candles[r["minute_start"]]
        assert r["buy_u"] + r["sell_u"] == c["vol"]
        assert r["imbalance"] is None or -1.0 <= r["imbalance"] <= 1.0


def test_roll_spread_matches_python_cov(spark):
    """Python replay of the per-day delta autocovariance (exact integer
    component sums, then the same closing algebra) must match."""
    from collections import defaultdict

    candles = _candles_cents(spark, SF)
    days = defaultdict(list)
    for m in sorted(candles):
        days[m.date()].append(candles[m]["close"])
    got = {
        r["day"].date(): r
        for r in queries()["q_ext_roll_spread"](spark, SF).collect()
    }
    for day, closes in days.items():
        deltas = [b - a for a, b in zip(closes, closes[1:])]
        pairs = list(zip(deltas[1:], deltas[:-1]))
        if len(pairs) < 2:
            assert day not in got
            continue
        n = len(pairs)
        sx = float(sum(x for x, _ in pairs))
        sy = float(sum(y for _, y in pairs))
        sxy = float(sum(x * y for x, y in pairs))
        cov = (sxy - sx * sy / n) / (n - 1)
        g = got[day]
        assert g["n_pairs"] == n
        assert abs(g["autocov"] - round(cov, 6)) < 1e-9
        if cov < 0:
            assert abs(
                g["roll_spread"] - round(2 * (-cov) ** 0.5 / 100.0, 6)
            ) < 1e-9
        else:
            assert g["roll_spread"] is None


def test_amihud_dollar_volume_exact_decimal(spark):
    """Day dollar volume must equal the exact Decimal replay over the
    canonical ticks, and the illiquidity ratio must be non-negative."""
    from collections import defaultdict
    from decimal import Decimal

    rows = btcusdt(spark, SF).collect()
    dv = defaultdict(Decimal)
    for r in rows:
        day = r["time"].date()
        dv[day] += Decimal(f"{r['price']:.2f}") * Decimal(
            f"{r['quantity']:.5f}"
        )
    got = {
        r["day"].date(): r
        for r in queries()["q_ext_amihud"](spark, SF).collect()
    }
    assert set(got) == set(dv)
    for day, vol in dv.items():
        g = got[day]
        assert abs(g["dollar_vol"] - round(float(vol), 2)) < 1e-6
        assert g["amihud_x1e9"] is None or g["amihud_x1e9"] >= 0


def test_scd2_spans_partition_events_and_tile_time(spark):
    """SCD2 invariants: span n_events sum to the event count per user,
    versions are 1..K dense, spans tile the timeline (each valid_to
    equals the next span's valid_from), exactly one open span per
    user, and consecutive spans never share an event_type (else they
    would be one run)."""
    from collections import defaultdict

    df = queries()["q_ext_scd2"](spark, SF)
    rows = df.collect()
    ev_counts = {
        r["user_id"]: r["n"]
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(r)
    assert set(by_user) == set(ev_counts)
    for uid, spans in by_user.items():
        spans.sort(key=lambda r: r["version"])
        assert [s["version"] for s in spans] == list(
            range(1, len(spans) + 1)
        )
        assert sum(s["n_events"] for s in spans) == ev_counts[uid]
        assert sum(s["is_current"] for s in spans) == 1
        assert spans[-1]["is_current"] == 1
        for a, b in zip(spans, spans[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["event_type"] != b["event_type"]
            assert a["valid_from"] <= a["valid_to"]


def test_readability_counts_match_python(spark):
    """Python replay of the word/sentence/syllable counts and the
    Flesch formula over the raw text."""
    import re

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    got = {
        r["doc_id"]: r
        for r in queries()["q_ext_readability"](spark, SF).collect()
    }
    assert set(got) == set(docs)
    for doc_id, text in docs.items():
        words = len(text.split(" "))
        sentences = max(len(re.findall(r"[.!?]+", text)), 1)
        syllables = len(re.findall(r"[aeiouy]+", text))
        flesch = 206.835 - 1.015 * (words / sentences) - 84.6 * (
            syllables / words
        )
        g = got[doc_id]
        assert g["words"] == words
        assert g["sentences"] == sentences
        assert g["syllables"] == syllables
        assert abs(g["flesch"] - round(flesch, 4)) < 1e-9
        want_band = (
            "easy"
            if flesch >= 70
            else "standard" if flesch >= 50 else "difficult"
        )
        assert g["band"] == want_band


def test_vpin_matches_python_volume_clock(spark):
    """Python replay of the exact volume clock: bucket by starting
    cumulative volume, integer buy/sell legs, one closing ratio."""
    from collections import defaultdict

    from binancedatapipelineinaws_spark.operators.indicators import (
        VPIN_BUCKET_U,
    )

    rows = btcusdt(spark, SF).collect()
    by_day = defaultdict(list)
    for r in rows:
        by_day[r["time"].date()].append(
            (r["time"], r["bid"], round(r["quantity"] * 100000), r["maker"])
        )
    got = {
        r["day"].date(): r
        for r in queries()["q_ext_vpin"](spark, SF).collect()
    }
    assert set(got) == set(by_day)
    for day, ticks in by_day.items():
        ticks.sort(key=lambda t: (t[0], t[1]))
        cum = 0
        buckets = defaultdict(lambda: [0, 0])
        for _, _, qty_u, maker in ticks:
            b = buckets[cum // VPIN_BUCKET_U]
            b[0 if maker == 0 else 1] += qty_u
            cum += qty_u
        n = len(buckets)
        vol = sum(b + s for b, s in buckets.values())
        sum_abs = sum(abs(b - s) for b, s in buckets.values())
        g = got[day]
        assert g["n_buckets"] == n
        assert g["vol_u"] == vol
        assert abs(g["vpin"] - round(sum_abs / vol, 6)) < 1e-9


def test_heikin_ashi_matches_python_fixed_point(spark):
    """Python replay of the cents x 1e6 Heikin-Ashi machine must match
    exactly (integer state both sides)."""
    from collections import defaultdict

    candles = _candles_cents(spark, SF)
    days = defaultdict(list)
    for m in sorted(candles):
        days[m.date()].append((m, candles[m]))
    got = {
        r["minute_start"]: r
        for r in queries()["q_ext_heikin_ashi"](spark, SF).collect()
    }

    def q6(a):
        return _tdiv(a + 50, 100) / 1e6

    n_rows = 0
    for day, bars in days.items():
        ho = hc = None
        for i, (m, c) in enumerate(bars):
            o, h, l, cl = (
                c["open"] * 1_000_000,
                c["high"] * 1_000_000,
                c["low"] * 1_000_000,
                c["close"] * 1_000_000,
            )
            if i == 0:
                ho = _tdiv(c["open"] * 1_000_000 + c["close"] * 1_000_000, 2)
            else:
                ho = _tdiv(ho + hc, 2)
            hc = _tdiv(o + h + l + cl, 4)
            g = got[m]
            n_rows += 1
            assert g["ha_open"] == q6(ho), m
            assert g["ha_close"] == q6(hc), m
            assert g["ha_high"] == q6(max(h, ho, hc)), m
            assert g["ha_low"] == q6(min(l, ho, hc)), m
    assert len(got) == n_rows


def test_jsonl_quarantine_classes_partition_lines(spark):
    """The three reason classes must partition the canonical row count
    with counts matching the injection rules."""
    from binancedatapipelineinaws_spark.sources.jsonl import (
        JSONL_CHOP_MOD,
        JSONL_TYPE_MOD,
    )

    base = btcusdt(spark, SF).collect()
    want = {"malformed_json": 0, "bad_price_type": 0, "ok": 0}
    for r in base:
        if r["bid"] % JSONL_CHOP_MOD == 3:
            want["malformed_json"] += 1
        elif r["bid"] % JSONL_TYPE_MOD == 5:
            want["bad_price_type"] += 1
        else:
            want["ok"] += 1
    got = {
        r["reason"]: r["n"]
        for r in queries()["q_scan_jsonl_quarantine"](spark, SF).collect()
    }
    assert got == {k: v for k, v in want.items() if v > 0}
    assert sum(got.values()) == len(base)


def test_anchored_vwap_matches_decimal_replay(spark):
    """Python Decimal replay of the day-cumulative pv/v ratio; the
    final row of each day must also equal the day's total VWAP."""
    from collections import defaultdict
    from decimal import Decimal

    rows = btcusdt(spark, SF).collect()
    by_min = defaultdict(lambda: [Decimal(0), Decimal(0)])
    for r in rows:
        m = r["time"].replace(second=0, microsecond=0)
        p = Decimal(f"{r['price']:.2f}")
        q = Decimal(f"{r['quantity']:.5f}")
        by_min[m][0] += p * q
        by_min[m][1] += q
    got = {
        r["minute_start"]: r["avwap"]
        for r in queries()["q_ext_anchored_vwap"](spark, SF).collect()
    }
    assert set(got) == set(by_min)
    days = defaultdict(list)
    for m in sorted(by_min):
        days[m.date()].append(m)
    for day, ms in days.items():
        cpv, cv = Decimal(0), Decimal(0)
        for m in ms:
            cpv += by_min[m][0]
            cv += by_min[m][1]
            assert abs(got[m] - round(float(cpv) / float(cv), 6)) < 1e-9


def test_analyze_stats_matches_direct_queries(spark):
    """Each stats row must match an independently computed aggregate."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    got = {
        r["column_name"]: r
        for r in queries()["q_maint_analyze_stats"](spark, SF).collect()
    }
    assert set(got) == {
        "l_orderkey",
        "l_suppkey",
        "l_returnflag",
        "l_shipdate",
    }
    for col in got:
        want_ndv = li.select(col).distinct().count()
        want_nulls = li.filter(F.col(col).isNull()).count()
        assert got[col]["ndv"] == want_ndv, col
        assert got[col]["null_count"] == want_nulls, col
        c = (
            F.col(col).cast("date") if col == "l_shipdate" else F.col(col)
        )
        mn, mx = li.agg(F.min(c), F.max(c)).first()
        assert got[col]["min_s"] == str(mn), col
        assert got[col]["max_s"] == str(mx), col


def test_mfi_matches_integer_replay(spark):
    """MFI's decimal window sums and half-up grid quantization must
    equal a from-scratch Python integer replay EXACTLY (every value
    lands on the 1e-5 grid; no float tolerance)."""
    from collections import defaultdict

    from binancedatapipelineinaws_spark.operators.indicators import MFI_N

    candles = _candles_cents(spark, SF)
    days = defaultdict(list)
    for m in sorted(candles):
        days[m.date()].append((m, candles[m]))
    got = {
        r["minute_start"]: r["mfi"]
        for r in queries()["q_ext_mfi"](spark, SF).collect()
    }
    n_expected = 0
    for day, bars in days.items():
        flows = []  # (pos, neg) per bar; None = no prior bar
        prev = None
        for m, c in bars:
            tp3 = c["high"] + c["low"] + c["close"]
            if prev is None:
                flows.append(None)
            else:
                f = tp3 * c["vol"]
                flows.append(
                    (f if tp3 > prev else 0, f if tp3 < prev else 0)
                )
            prev = tp3
            i = len(flows) - 1
            w = [
                fl
                for fl in flows[max(0, i - MFI_N + 1) : i + 1]
                if fl is not None
            ]
            if len(w) < MFI_N:
                continue
            n_expected += 1
            pf = sum(p for p, _ in w)
            nf = sum(n for _, n in w)
            if pf + nf == 0:
                assert got[m] is None
            else:
                # operands nonnegative: Python // == truncating div
                mfi5 = (20000000 * pf + (pf + nf)) // (2 * (pf + nf))
                assert got[m] == mfi5 / 100000.0, m
    assert len(got) == n_expected


def test_chaikin_ad_matches_integer_replay(spark):
    """Chaikin A/D's quantize-first CLV and integer running sum must
    equal a from-scratch Python replay exactly (truncation toward
    zero on negative CLVs included)."""
    from collections import defaultdict

    candles = _candles_cents(spark, SF)
    days = defaultdict(list)
    for m in sorted(candles):
        days[m.date()].append((m, candles[m]))
    got = {
        r["minute_start"]: r
        for r in queries()["q_ext_chaikin_ad"](spark, SF).collect()
    }

    def tdiv(a, b):
        # truncation toward zero, matching Spark div / DuckDB //
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    saw_negative = False
    for day, bars in days.items():
        ad = 0
        for m, c in bars:
            rng = c["high"] - c["low"]
            clv_q6 = (
                0
                if rng == 0
                else tdiv(
                    (2 * c["close"] - c["high"] - c["low"]) * 1000000, rng
                )
            )
            saw_negative = saw_negative or clv_q6 < 0
            mfv_q = clv_q6 * c["vol"]
            ad += mfv_q
            g = got[m]
            assert g["clv"] == clv_q6 / 1000000.0, m
            assert g["mfv"] == mfv_q / 100000000000.0, m
            assert g["ad_q"] == ad, m
    assert saw_negative  # the truncation-direction branch was exercised
    assert len(got) == sum(len(b) for b in days.values())


def test_ichimoku_matches_integer_replay(spark):
    """Ichimoku's frame midlines and +/-26-bar displacements must
    equal a from-scratch Python integer replay exactly (single IEEE
    divisions by exact constants — no tolerance)."""
    from collections import defaultdict

    from binancedatapipelineinaws_spark.operators.indicators import (
        ICHI_K,
        ICHI_S,
        ICHI_T,
    )

    candles = _candles_cents(spark, SF)
    days = defaultdict(list)
    for m in sorted(candles):
        days[m.date()].append((m, candles[m]))
    got = {
        r["minute_start"]: r
        for r in queries()["q_ext_ichimoku"](spark, SF).collect()
    }

    def mid2(bars, i, n):
        if i + 1 < n:
            return None
        w = bars[i - n + 1 : i + 1]
        return max(c["high"] for _, c in w) + min(c["low"] for _, c in w)

    for day, bars in days.items():
        for i, (m, c) in enumerate(bars):
            t2, k2 = mid2(bars, i, ICHI_T), mid2(bars, i, ICHI_K)
            g = got[m]
            assert g["tenkan"] == (None if t2 is None else t2 / 200.0), m
            assert g["kijun"] == (None if k2 is None else k2 / 200.0), m
            j = i - ICHI_K
            if j < 0:
                assert g["senkou_a"] is None and g["senkou_b"] is None
            else:
                ta, ka = mid2(bars, j, ICHI_T), mid2(bars, j, ICHI_K)
                sa = (
                    None
                    if ta is None or ka is None
                    else (ta + ka) / 400.0
                )
                s2 = mid2(bars, j, ICHI_S)
                assert g["senkou_a"] == sa, m
                assert g["senkou_b"] == (
                    None if s2 is None else s2 / 200.0
                ), m
            fwd = i + ICHI_K
            want_ch = (
                bars[fwd][1]["close"] / 100.0 if fwd < len(bars) else None
            )
            assert g["chikou"] == want_ch, m
    assert len(got) == sum(len(b) for b in days.values())


def test_keltner_matches_integer_replay(spark):
    """Keltner's two fixed-point EMA machines must equal a from-scratch
    Python integer replay exactly, including the half-away-from-zero
    grid quantization (truncating div == Python tdiv on nonneg)."""
    from collections import defaultdict

    FP = 1_000_000_000

    candles = _candles_cents(spark, SF)
    days = defaultdict(list)
    for m in sorted(candles):
        days[m.date()].append((m, candles[m]))
    got = {
        r["minute_start"]: r
        for r in queries()["q_ext_keltner"](spark, SF).collect()
    }

    def tdiv(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    def q3(s):
        return tdiv(s + (150000 if s >= 0 else -150000), 300000) / 1e6

    for day, bars in days.items():
        mid = atr = None
        prev_close = None
        for m, c in bars:
            tp3 = c["high"] + c["low"] + c["close"]
            if mid is None:
                mid = tp3 * FP
                atr = (c["high"] - c["low"]) * FP
            else:
                tr = max(
                    c["high"] - c["low"],
                    abs(c["high"] - prev_close),
                    abs(c["low"] - prev_close),
                )
                mid = tdiv(2 * tp3 * FP + 19 * mid, 21)
                atr = tdiv(2 * tr * FP + 9 * atr, 11)
            prev_close = c["close"]
            g = got[m]
            assert g["middle"] == q3(mid), m
            assert g["upper_band"] == q3(mid + 6 * atr), m
            assert g["lower_band"] == q3(mid - 6 * atr), m
    assert len(got) == sum(len(b) for b in days.values())


def test_parabolic_sar_matches_integer_replay(spark):
    """The 4-field SAR state machine (accelerating pursuit, two-bar
    clamp, trend flip with af reset) must equal a from-scratch Python
    integer replay exactly, and the corpus must exercise both flip
    directions and the af cap."""
    from collections import defaultdict

    FP = 1_000_000_000

    candles = _candles_cents(spark, SF)
    days = defaultdict(list)
    for m in sorted(candles):
        days[m.date()].append((m, candles[m]))
    got = {
        r["minute_start"]: r
        for r in queries()["q_ext_parabolic_sar"](spark, SF).collect()
    }

    def tdiv(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    def q6(s):
        return tdiv(s + (50000 if s >= 0 else -50000), 100000) / 1e6

    flips = set()
    max_k = 1
    n_expected = 0
    for day, bars in days.items():
        if len(bars) < 2:
            continue
        hs = [c["high"] for _, c in bars]
        ls = [c["low"] for _, c in bars]
        cs = [c["close"] for _, c in bars]
        t = 1 if cs[1] >= cs[0] else -1
        sar = (ls[0] if t == 1 else hs[0]) * FP
        ep = hs[0] if t == 1 else ls[0]
        k = 1
        for i in range(1, len(bars)):  # 0-based bar i (= bar i+1)
            raw = tdiv((50 - k) * sar + k * ep * FP, 50)
            lpp = ls[max(i - 2, 0)]
            hpp = hs[max(i - 2, 0)]
            if t == 1:
                clamped = min(raw, ls[i - 1] * FP, lpp * FP)
                flip = ls[i] * FP < clamped
            else:
                clamped = max(raw, hs[i - 1] * FP, hpp * FP)
                flip = hs[i] * FP > clamped
            if flip:
                flips.add(t)
                sar = ep * FP
                ep = ls[i] if t == 1 else hs[i]
                t, k = -t, 1
            else:
                if t == 1:
                    if hs[i] > ep:
                        k = min(k + 1, 10)
                    ep = max(ep, hs[i])
                else:
                    if ls[i] < ep:
                        k = min(k + 1, 10)
                    ep = min(ep, ls[i])
                max_k = max(max_k, k)
                sar = clamped
            n_expected += 1
            g = got[bars[i][0]]
            assert g["trend"] == t, bars[i][0]
            assert g["sar"] == q6(sar), bars[i][0]
    assert flips == {1, -1}  # both flip directions exercised
    assert max_k >= 3  # the acceleration ratchet was exercised
    assert len(got) == n_expected


def test_supertrend_matches_integer_replay(spark):
    """Supertrend's conditional band carry, ATR recurrence, and trend
    flips must equal a from-scratch Python integer replay exactly;
    the corpus must exercise both flip directions and band carries."""
    from collections import defaultdict

    FP = 1_000_000_000

    candles = _candles_cents(spark, SF)
    days = defaultdict(list)
    for m in sorted(candles):
        days[m.date()].append((m, candles[m]))
    got = {
        r["minute_start"]: r
        for r in queries()["q_ext_supertrend"](spark, SF).collect()
    }

    def tdiv(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    def q2(s):
        return tdiv(s + (100000 if s >= 0 else -100000), 200000) / 1e6

    trends = set()
    carried = False
    n_expected = 0
    for day, bars in days.items():
        if len(bars) < 2:
            continue
        hs = [c["high"] for _, c in bars]
        ls = [c["low"] for _, c in bars]
        cs = [c["close"] for _, c in bars]
        atr = (hs[0] - ls[0]) * FP
        fub = (hs[0] + ls[0]) * FP + 6 * atr
        flb = (hs[0] + ls[0]) * FP - 6 * atr
        t = 1
        for i in range(1, len(bars)):
            tr = max(
                hs[i] - ls[i], abs(hs[i] - cs[i - 1]), abs(ls[i] - cs[i - 1])
            )
            atr = tdiv(9 * atr + tr * FP, 10)
            bub = (hs[i] + ls[i]) * FP + 6 * atr
            blb = (hs[i] + ls[i]) * FP - 6 * atr
            if bub < fub or cs[i - 1] * 2 * FP > fub:
                fub = bub
            else:
                carried = True
            if blb > flb or cs[i - 1] * 2 * FP < flb:
                flb = blb
            else:
                carried = True
            if cs[i] * 2 * FP > fub:
                t = 1
            elif cs[i] * 2 * FP < flb:
                t = -1
            trends.add(t)
            n_expected += 1
            g = got[bars[i][0]]
            assert g["trend"] == t, bars[i][0]
            assert g["supertrend"] == q2(flb if t == 1 else fub), bars[i][0]
    assert trends == {1, -1}  # both trend states reached
    assert carried  # the band-carry branch was exercised
    assert len(got) == n_expected


def test_parabolic_sar_fold_on_adversarial_days(spark):
    """Run the exact engine fold (_SAR_FOLD) over crafted + seeded-
    random synthetic days — flat days, two-bar days, monotone runs,
    alternating whipsaws, tied extremes — and compare every step
    against the Python replay.  One Spark call for all days."""
    import random

    from pyspark.sql import functions as F

    from binancedatapipelineinaws_spark.operators.indicators import (
        _SAR_FOLD,
    )

    FP = 1_000_000_000

    def tdiv(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    def q6(s):
        return tdiv(s + (50000 if s >= 0 else -50000), 100000) / 1e6

    def replay(hs, ls, cs):
        t = 1 if cs[1] >= cs[0] else -1
        sar = (ls[0] if t == 1 else hs[0]) * FP
        ep = hs[0] if t == 1 else ls[0]
        k = 1
        out = []
        for i in range(1, len(hs)):
            raw = tdiv((50 - k) * sar + k * ep * FP, 50)
            lpp, hpp = ls[max(i - 2, 0)], hs[max(i - 2, 0)]
            if t == 1:
                clamped = min(raw, ls[i - 1] * FP, lpp * FP)
                flip = ls[i] * FP < clamped
            else:
                clamped = max(raw, hs[i - 1] * FP, hpp * FP)
                flip = hs[i] * FP > clamped
            if flip:
                sar = ep * FP
                ep = ls[i] if t == 1 else hs[i]
                t, k = -t, 1
            else:
                if t == 1:
                    if hs[i] > ep:
                        k = min(k + 1, 10)
                    ep = max(ep, hs[i])
                else:
                    if ls[i] < ep:
                        k = min(k + 1, 10)
                    ep = min(ep, ls[i])
                sar = clamped
            out.append((t, q6(sar)))
        return out

    rng = random.Random(20260815)
    days = []
    # crafted edges
    days.append([(100, 100, 100)] * 5)  # dead-flat day
    days.append([(105, 95, 100), (106, 96, 97)])  # two bars, down seed
    days.append([(100 + i, 90 + i, 95 + i) for i in range(40)])  # up run
    days.append([(200 - i, 190 - i, 195 - i) for i in range(40)])  # down
    days.append(
        [(110, 90, 100 + (7 if i % 2 else -7)) for i in range(30)]
    )  # whipsaw with tied extremes
    # seeded random walks with occasional flat bars
    for _ in range(40):
        n = rng.randint(2, 60)
        c = rng.randint(90, 110)
        bars = []
        for _ in range(n):
            c += rng.randint(-6, 6)
            if rng.random() < 0.15:
                bars.append((c, c, c))  # flat bar
            else:
                h = c + rng.randint(0, 5)
                l = c - rng.randint(0, 5)
                bars.append((h, l, c))
        days.append(bars)

    rows = [
        (
            i,
            [b[0] for b in bars],
            [b[1] for b in bars],
            [b[2] for b in bars],
            list(range(len(bars))),
        )
        for i, bars in enumerate(days)
    ]
    df = spark.createDataFrame(
        rows, "day_id long, hs array<long>, ls array<long>,"
        " cs array<long>, ms array<long>"
    )
    got_rows = (
        df.select(
            "day_id", F.posexplode(F.expr(_SAR_FOLD)).alias("pos", "s")
        )
        .select("day_id", "pos", "s.t", "s.sar")
        .collect()
    )
    got = {}
    for r in got_rows:
        got.setdefault(r["day_id"], {})[r["pos"]] = (r["t"], q6(r["sar"]))
    for i, bars in enumerate(days):
        hs = [b[0] for b in bars]
        ls = [b[1] for b in bars]
        cs = [b[2] for b in bars]
        want = replay(hs, ls, cs)
        steps = got.get(i, {})
        assert len(steps) == len(want), i
        for pos, exp in enumerate(want):
            assert steps[pos] == exp, (i, pos, steps[pos], exp)


def test_regr_matches_numpy_polyfit(spark):
    """q_ext_regr's exact-moment slope/intercept/r2 vs numpy's float
    least squares on the same rows (r8 resume batch)."""
    import numpy as np

    rows = queries()["q_ext_regr"](spark, SF).collect()
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .toPandas()
    )
    for r in rows:
        g = li[li.l_returnflag == r.l_returnflag]
        x = g.l_quantity.to_numpy(dtype=float)
        y = np.round(g.l_extendedprice.to_numpy(dtype=float) * 100)
        slope, intercept = np.polyfit(x, y, 1)
        assert abs(r.slope_cents - slope) <= 1e-6 * max(1.0, abs(slope))
        assert abs(r.intercept_cents - intercept) <= 1e-6 * max(
            1.0, abs(intercept)
        )
        corr = np.corrcoef(x, y)[0, 1]
        assert abs(r.r2 - corr * corr) <= 1e-9
        assert r.n_rows == len(g)


def test_mode_disc_invariants(spark):
    """Mode is the most frequent value (smallest on ties); the discrete
    median is a stored value with cumulative count >= half on both
    sides."""
    rows = queries()["q_ext_mode_disc"](spark, SF).collect()
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_returnflag", "l_quantity")
        .toPandas()
    )
    for r in rows:
        qty = li[li.l_returnflag == r.l_returnflag].l_quantity.astype(int)
        counts = qty.value_counts()
        top = counts.max()
        assert r.mode_count == top
        assert r.mode_qty == min(v for v, c in counts.items() if c == top)
        n = len(qty)
        assert (qty <= r.median_disc_qty).sum() * 2 >= n
        assert (qty >= r.median_disc_qty).sum() * 2 >= n
        assert r.median_disc_qty in set(qty)


def test_weighted_median_invariants(spark):
    """The weighted median is a stored price with >= half the total
    quantity on each side."""
    rows = queries()["q_ext_weighted_median"](spark, SF).collect()
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .toPandas()
    )
    for r in rows:
        g = li[li.l_returnflag == r.l_returnflag]
        w = g.l_quantity.astype(int)
        tot = w.sum()
        assert r.total_qty == tot
        below = w[g.l_extendedprice <= r.weighted_median_price].sum()
        above = w[g.l_extendedprice >= r.weighted_median_price].sum()
        assert 2 * below >= tot
        assert 2 * above >= tot
        assert (g.l_extendedprice == r.weighted_median_price).any()


def test_bitmap_distinct_equals_count_distinct(spark):
    """The bitmap path is EXACT: equals count_distinct on the same
    scan for every group."""
    bm = {
        r.l_returnflag: (r.n_distinct_parts, r.n_rows)
        for r in queries()["q_ext_bitmap_distinct"](spark, SF).collect()
    }
    naive = {
        r.l_returnflag: (r.nd, r.n)
        for r in spark.read.parquet(f"{SF}/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("nd"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert bm == naive


def test_bpe_pair_counts_match_naive_token_explode(spark):
    """The vocab-collapsed pair statistic equals the naive per-token
    pair explode (the shape the operator avoids at scale) — the
    word-count weighting loses nothing."""
    out = {
        (r.a, r.b): r.pair_count
        for r in queries()["q_ext_bpe_pair_counts"](spark, SF).collect()
    }
    naive = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(
            F.explode(F.split(F.lower("text"), r"\s+")).alias("w")
        )
        .filter(F.length("w") >= 2)
        .select(
            F.explode(
                F.sequence(F.lit(1), F.length("w") - 1)
            ).alias("i"),
            "w",
        )
        .select(
            F.col("w").substr(F.col("i"), F.lit(1)).alias("a"),
            F.col("w").substr(F.col("i") + 1, F.lit(1)).alias("b"),
        )
        .groupBy("a", "b")
        .count()
    )
    naive_map = {(r.a, r.b): r["count"] for r in naive.collect()}
    for pair, cnt in out.items():
        assert naive_map[pair] == cnt
    # top-k really is the top: no unlisted pair beats the listed min
    if out:
        floor = min(out.values())
        better = [
            p
            for p, c in naive_map.items()
            if p not in out and c > floor
        ]
        assert not better, better


def test_merge_into_action_semantics(spark):
    """MERGE actions partition correctly: inserts have no target row,
    kept rows have no source row, tombstoned users are absent, and
    every total is the exact pre+post cent sum."""
    from binancedatapipelineinaws_spark.operators.cdc import MERGE_CUTOFF

    ev = spark.read.parquet(f"{SF}/events.parquet")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    cutoff = F.lit(MERGE_CUTOFF).cast("timestamp")
    pre = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("ts") < cutoff))
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum(cents).alias("c"))
    )
    post = (
        ev.filter(
            (F.col("ts") >= cutoff)
            & F.col("event_type").isin("purchase", "error")
        )
        .groupBy("user_id")
        .agg(
            F.count_if(F.col("event_type") == "purchase").alias("n"),
            F.coalesce(
                F.sum(F.when(F.col("event_type") == "purchase", cents)),
                F.lit(0).cast("long"),
            ).alias("c"),
            (
                F.count_if(F.col("event_type") == "error")
                > 2 * F.count_if(F.col("event_type") == "purchase")
            ).alias("tomb"),
        )
    )
    pre_m = {r.user_id: (r.n, r.c) for r in pre.collect()}
    post_m = {r.user_id: (r.n, r.c, r.tomb) for r in post.collect()}
    out = {
        r.user_id: (r.n_purchases, r.total_cents, r.action)
        for r in queries()["q_ext_merge_into"](spark, SF).collect()
    }
    for uid, (n, c, action) in out.items():
        p = pre_m.get(uid)
        s = post_m.get(uid)
        assert not (s and s[2]), f"tombstoned user {uid} survived"
        if action == "insert":
            assert p is None and s is not None and s[0] > 0
            assert (n, c) == (s[0], s[1])
        elif action == "kept":
            assert s is None and p is not None
            assert (n, c) == p
        else:
            assert p is not None and s is not None
            assert (n, c) == (p[0] + s[0], p[1] + s[1])
    # completeness: every non-tombstoned user with state appears
    expect = {
        uid
        for uid in set(pre_m) | set(post_m)
        if not (uid in post_m and post_m[uid][2])
        and (uid in pre_m or post_m[uid][0] > 0)
    }
    assert set(out) == expect


def test_kcore_matches_python_reimplementation(spark):
    """3 rounds of 3-core peeling, from scratch on the same edge
    derivation: node set and in-core degrees must match exactly."""
    adj = _copurchase_edges(spark)
    nodes = set(adj)
    for _ in range(3):
        kept = {v for v in nodes if sum(1 for u in adj[v] if u in nodes) >= 3}
        nodes = kept
    want = {
        v: sum(1 for u in adj[v] if u in nodes) for v in nodes
    }
    # drop nodes that lost every edge (the engine's edge-list form
    # has no row for them, matching "degree in the peeled subgraph")
    want = {v: d for v, d in want.items() if d > 0}
    got = {
        r["part"]: r["deg_in_core"]
        for r in queries()["q_ext_kcore"](spark, SF).collect()
    }
    assert got == want


def test_bpe_apply_merge_matches_python_reimplementation(spark):
    """Round-2 BPE pair counts from a from-scratch Python trainer:
    word counts -> round-1 winner -> greedy left-to-right merge ->
    round-2 counts.  Also pins two invariants: the applied merge is
    round 1's top pair, and the merged bigram never survives as an
    adjacent single-char pair."""
    import re
    from collections import Counter

    texts = [
        r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    ]
    words = Counter()
    for t in texts:
        for w in re.split(r"\s+", t.lower()):
            if len(w) >= 2:
                words[w] += 1
    pairs1 = Counter()
    for w, n in words.items():
        for i in range(len(w) - 1):
            pairs1[(w[i], w[i + 1])] += n
    (ma, mb), _ = min(pairs1.items(), key=lambda kv: (-kv[1], kv[0]))
    pairs2 = Counter()
    for w, n in words.items():
        syms = []
        i = 0
        while i < len(w):
            if i + 1 < len(w) and w[i] == ma and w[i + 1] == mb:
                syms.append(ma + mb)
                i += 2
            else:
                syms.append(w[i])
                i += 1
        for a, b in zip(syms, syms[1:]):
            pairs2[(a, b)] += n
    want = sorted(
        ((n, a, b) for (a, b), n in pairs2.items()),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:30]
    rows = queries()["q_ext_bpe_apply_merge"](spark, SF).collect()
    assert len(rows) == min(30, len(pairs2))
    for r in rows:
        assert (r["merge_a"], r["merge_b"]) == (ma, mb)
        # the merged bigram cannot survive as two adjacent 1-char syms
        assert not (r["a"] == ma and r["b"] == mb and len(ma + mb) == 2)
    got = [(r["pair_count"], r["a"], r["b"]) for r in rows]
    assert got == want


def test_quantile_norm_matches_python_reimplementation(spark):
    """Integer rank -> global order statistic mapping, re-derived in
    pure Python for every document."""
    rows = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "source", "n_chars")
        .collect()
    )
    g_sorted = sorted(r["n_chars"] for r in rows)
    ng = len(g_sorted)
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    want = {}
    for src, docs in by_src.items():
        docs.sort(key=lambda r: (r["n_chars"], r["doc_id"]))
        ns = len(docs)
        for rank, r in enumerate(docs, start=1):
            pos = (
                1 + ((rank - 1) * (ng - 1)) // (ns - 1)
                if ns > 1
                else 1 + (ng - 1) // 2
            )
            want[r["doc_id"]] = g_sorted[pos - 1]
    got = {
        r["doc_id"]: r["norm_chars"]
        for r in queries()["q_ext_quantile_norm"](spark, SF).collect()
    }
    assert got == want
    # calibration property: every source's normalized values span the
    # same global distribution, so min/max map inside the global range
    assert min(got.values()) >= g_sorted[0]
    assert max(got.values()) <= g_sorted[-1]


def _py_minute_closes(spark):
    """Per-minute last-trade close in cents from raw canonical ticks
    (tie-break (time, bid) — the q_agg_ohlcv_1min convention),
    plus each minute's net signed flow in 1e-5 units."""
    rows = btcusdt(spark, SF).collect()
    per_min = {}
    for r in rows:
        m = r["time"].replace(second=0, microsecond=0)
        key = (r["time"], r["bid"])
        pc = round(float(r["price"]) * 100)
        qu = round(float(r["quantity"]) * 100000)
        signed = qu if r["maker"] == 0 else -qu
        cur = per_min.get(m)
        if cur is None:
            per_min[m] = [key, pc, signed]
        else:
            if key > cur[0]:
                cur[0], cur[1] = key, pc
            cur[2] += signed
    return {m: (v[1], v[2]) for m, v in per_min.items()}


def test_var_cvar_matches_python_reimplementation(spark):
    closes = _py_minute_closes(spark)
    by_day = {}
    for m in sorted(closes):
        by_day.setdefault(m.date(), []).append(closes[m][0])
    want = {}
    for day, cs in by_day.items():
        dps = sorted(b - a for a, b in zip(cs, cs[1:]))
        if not dps:
            continue
        n = len(dps)
        k = (n + 19) // 20
        want[day] = (n, k, dps[k - 1], round(sum(dps[:k]) / k, 4) + 0.0)
    got = {
        r["day"].date(): (
            r["n_rets"],
            r["tail_k"],
            r["var_c"],
            r["cvar_c"],
        )
        for r in queries()["q_ext_var_cvar"](spark, SF).collect()
    }
    assert got == want


def test_kyle_lambda_matches_python_reimplementation(spark):
    import math

    closes = _py_minute_closes(spark)
    by_day = {}
    for m in sorted(closes):
        by_day.setdefault(m.date(), []).append(closes[m])
    want = {}
    for day, pairs in by_day.items():
        xs = [f for (_, f) in pairs[1:]]
        ys = [b[0] - a[0] for a, b in zip(pairs, pairs[1:])]
        n = len(ys)
        if n == 0:
            continue
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        dx, dy, num = n * sxx - sx * sx, n * syy - sy * sy, n * sxy - sx * sy
        lam = float(num) / float(dx) if dx else None
        r2 = (
            (float(num) / float(dx)) * (float(num) / float(dy))
            if dx and dy
            else None
        )
        want[day] = (n, lam, r2)
    got = {
        r["day"].date(): (r["n_mins"], r["kyle_lambda"], r["r2"])
        for r in queries()["q_ext_kyle_lambda"](spark, SF).collect()
    }
    assert set(got) == set(want)
    for day in want:
        assert got[day][0] == want[day][0]
        for gi, wi in zip(got[day][1:], want[day][1:]):
            if wi is None:
                assert gi is None
            else:
                assert math.isclose(gi, wi, rel_tol=1e-12), (day, gi, wi)


def test_adaptive_band_geometry_scaling_laws():
    """r10: beyond the ladder the LSH geometry must keep (a) per-band
    signature space >= ~8x the corpus (random-collision candidates
    linear in n — the old fixed (128, 20) ceiling went quadratic) and
    (b) candidate recall >= 0.996 at the cos-0.9 boundary; rungs at or
    below 1M vectors are pinned bit-for-bit (driver rows and the sf10
    ground-truth fixture depend on them)."""
    from binancedatapipelineinaws_spark.functions.similarity import (
        _P_BIT_09,
        adaptive_band_geometry,
    )

    # pinned rungs (existing driver rows / fixtures depend on these)
    assert adaptive_band_geometry(500) == (16, 8)
    assert adaptive_band_geometry(4_000) == (16, 8)
    assert adaptive_band_geometry(20_000) == (32, 12)
    assert adaptive_band_geometry(200_000) == (64, 16)
    assert adaptive_band_geometry(1_000_000) == (64, 16)

    prev_rows = 16
    for n in (2_000_000, 16_000_000, 128_000_000, 1_000_000_000):
        bands, rows = adaptive_band_geometry(n)
        assert rows >= prev_rows
        prev_rows = rows
        # (a) signature space at least 8x the corpus per band
        assert 2**rows >= 8 * n, (n, rows)
        # (b) recall at the threshold boundary holds the floor
        recall = 1 - (1 - _P_BIT_09**rows) ** bands
        assert recall >= 0.996, (n, bands, rows, recall)
        # sanity: geometry stays implementable (signature bits/vector)
        assert bands * rows < 40_000, (n, bands, rows)


def test_pmi_collocations_match_naive(spark):
    """Every listed collocation's count and pmi equal the naive
    bigram-explode recomputation, the support floor is respected, and
    no unlisted pair strictly beats the listed minimum pmi."""
    import math

    from binancedatapipelineinaws_spark.functions.text import (
        PMI_MIN_PAIR_COUNT,
    )

    rows = queries()["q_ext_pmi_collocations"](spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    c12: dict[tuple[str, str], int] = {}
    for r in docs:
        w = r.text.split(" ")
        for a, b in zip(w, w[1:]):
            c12[(a, b)] = c12.get((a, b), 0) + 1
    c1: dict[str, int] = {}
    c2: dict[str, int] = {}
    for (a, b), c in c12.items():
        c1[a] = c1.get(a, 0) + c
        c2[b] = c2.get(b, 0) + c
    n = sum(c12.values())

    def pmi(a, b):
        return round(
            math.log(c12[(a, b)] * float(n) / (c1[a] * c2[b])), 6
        )

    assert rows, "sf0.001 corpus should yield collocations"
    assert len(rows) <= 50
    for r in rows:
        assert r.pair_count == c12[(r.w1, r.w2)]
        assert r.pair_count >= PMI_MIN_PAIR_COUNT
        assert abs(r.pmi - pmi(r.w1, r.w2)) <= 1e-9
    listed = {(r.w1, r.w2) for r in rows}
    floor = min(r.pmi for r in rows)
    better = [
        p
        for p, c in c12.items()
        if c >= PMI_MIN_PAIR_COUNT
        and p not in listed
        and pmi(*p) > floor
    ]
    assert not better, better


def test_tpch_q2_min_cost_semantics(spark):
    """Every Q2 output row's supply cost is the true regional minimum
    for its part (naive recomputation), every emitted supplier
    actually achieves it, and ALL tying suppliers are emitted (within
    the top-100 cut)."""
    out = queries()["q_ext_tpch_q2"](spark, SF).collect()
    li = spark.read.parquet(f"{SF}/lineitem.parquet").collect()
    supp = {
        r.s_suppkey: r
        for r in spark.read.parquet(f"{SF}/supplier.parquet").collect()
    }
    nat = {
        r.n_nationkey: r
        for r in spark.read.parquet(f"{SF}/nation.parquet").collect()
    }
    reg = {
        r.r_regionkey: r.r_name
        for r in spark.read.parquet(f"{SF}/region.parquet").collect()
    }
    part = {
        r.p_partkey: r
        for r in spark.read.parquet(f"{SF}/part.parquet").collect()
    }
    eu = {
        k
        for k, s in supp.items()
        if reg[nat[s.s_nationkey].n_regionkey] == "EUROPE"
    }
    from collections import defaultdict
    from decimal import Decimal

    cost: dict[tuple[int, int], Decimal] = {}
    for r in li:
        if r.l_suppkey in eu:
            key = (r.l_partkey, r.l_suppkey)
            p = Decimal(str(r.l_extendedprice)).quantize(Decimal("0.01"))
            cost[key] = min(cost.get(key, p), p)
    best: dict[int, Decimal] = defaultdict(lambda: Decimal("Infinity"))
    for (pk, _), c in cost.items():
        best[pk] = min(best[pk], c)
    expected = sorted(
        (
            (
                -supp[sk].s_acctbal,
                nat[supp[sk].s_nationkey].n_name,
                supp[sk].s_name,
                pk,
            )
            for (pk, sk), c in cost.items()
            if c == best[pk] and part[pk].p_type == "LARGE"
        ),
    )[:100]
    got = sorted(
        (-r.s_acctbal, r.n_name, r.s_name, r.p_partkey) for r in out
    )
    assert got == expected
    for r in out:
        assert abs(r.supplycost - float(best[r.p_partkey])) <= 1e-6


def test_tpch_q11_threshold_set_semantics(spark):
    """Q11's survivor set equals the naive share computation at the
    oracle SF (non-trivial there: the NATION_7 value table is dense
    enough to clear the share floor)."""
    from decimal import Decimal

    # derived from the suite-wide SF base path so the test follows any
    # testdata relocation (ADVICE r10 item 4)
    sf = SF.replace("sf0.001", "sf0.01")
    out = {
        r.p_partkey: r.part_value
        for r in queries()["q_ext_tpch_q11"](spark, sf).collect()
    }
    supp = spark.read.parquet(f"{sf}/supplier.parquet").collect()
    nat = {
        r.n_nationkey: r.n_name
        for r in spark.read.parquet(f"{sf}/nation.parquet").collect()
    }
    keys = {
        s.s_suppkey for s in supp if nat[s.s_nationkey] == "NATION_7"
    }
    vals: dict[int, Decimal] = {}
    for r in spark.read.parquet(f"{sf}/lineitem.parquet").collect():
        if r.l_suppkey in keys:
            v = Decimal(str(r.l_extendedprice)).quantize(
                Decimal("0.01")
            ) * (
                1 - Decimal(str(r.l_discount)).quantize(Decimal("0.01"))
            )
            vals[r.l_partkey] = vals.get(r.l_partkey, Decimal(0)) + v
    total = sum(vals.values())
    expected = {
        pk: v for pk, v in vals.items() if v > total * Decimal("0.001")
    }
    assert out, "sf0.01 should clear the share floor for some parts"
    assert set(out) == set(expected)
    for pk, v in expected.items():
        assert abs(out[pk] - float(v)) <= 1e-6


def test_tpch_q12_bands_partition_the_window(spark):
    """The three lag bands partition the ship-year lines exactly:
    high+low across bands equals the joined row count, and the band
    edges follow the <=30 / <=60 day boundaries."""
    import datetime

    out = {
        r.ship_speed: (r.high_line_count, r.low_line_count)
        for r in queries()["q_ext_tpch_q12"](spark, SF).collect()
    }
    orders = {
        r.o_orderkey: r
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect()
    }
    naive: dict[str, list[int]] = {}
    n_window = 0
    for r in spark.read.parquet(f"{SF}/lineitem.parquet").collect():
        if not (
            datetime.datetime(1997, 1, 1)
            <= r.l_shipdate
            < datetime.datetime(1998, 1, 1)
        ):
            continue
        o = orders[r.l_orderkey]
        n_window += 1
        lag = r.l_shipdate - o.o_orderdate
        band = (
            "FAST"
            if lag <= datetime.timedelta(days=30)
            else "MEDIUM"
            if lag <= datetime.timedelta(days=60)
            else "SLOW"
        )
        hi = o.o_orderpriority in ("1-URGENT", "2-HIGH")
        rec = naive.setdefault(band, [0, 0])
        rec[0 if hi else 1] += 1
    assert out == {b: (h, l) for b, (h, l) in naive.items()}
    assert sum(h + l for h, l in out.values()) == n_window


def test_tpch_q9_profit_additivity(spark):
    """Summing Q9's (nation, year) cells reproduces the ungrouped
    corpus-wide profit (exact decimal recomputation), and every cell
    key is a real (nation, order-year) combination."""
    from decimal import Decimal

    rows = queries()["q_ext_tpch_q9"](spark, SF).collect()
    part = {
        r.p_partkey: r
        for r in spark.read.parquet(f"{SF}/part.parquet").collect()
    }
    supp = {
        r.s_suppkey: r
        for r in spark.read.parquet(f"{SF}/supplier.parquet").collect()
    }
    nat = {
        r.n_nationkey: r.n_name
        for r in spark.read.parquet(f"{SF}/nation.parquet").collect()
    }
    orders = {
        r.o_orderkey: r
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect()
    }
    D = lambda x: Decimal(str(x)).quantize(Decimal("0.01"))  # noqa: E731
    total = Decimal(0)
    keys = set()
    for r in spark.read.parquet(f"{SF}/lineitem.parquet").collect():
        p = part.get(r.l_partkey)
        if p is None or not p.p_name.startswith("blue"):
            continue
        profit = D(r.l_extendedprice) * (1 - D(r.l_discount)) - D(
            p.p_retailprice
        ) * D(r.l_quantity) * Decimal("0.8")
        total += profit
        keys.add(
            (
                nat[supp[r.l_suppkey].s_nationkey],
                orders[r.l_orderkey].o_orderdate.year,
            )
        )
    got_total = sum(Decimal(str(r.sum_profit)) for r in rows)
    assert abs(got_total - total) <= Decimal("0.000_02") * len(rows)
    assert {(r.nation, r.o_year) for r in rows} == keys


def test_bpe_train_k_matches_naive_trainer(spark):
    """The unrolled k-round trainer must reproduce a straight Python
    BPE loop over the same word counts: same winner each round under
    the (count desc, raw a, raw b) order (markers compared as their
    chr codes, exactly the engines' binary collation), same greedy
    left-to-right merges, same expanded merge table."""
    import collections
    import re

    from binancedatapipelineinaws_spark.functions.text import (
        BPE_TRAIN_ROUNDS,
    )

    wc: collections.Counter = collections.Counter()
    for r in spark.read.parquet(f"{SF}/documents.parquet").select(
        "text"
    ).collect():
        for w in re.split(r"\s+", r.text.lower()):
            if len(w) >= 2:
                wc[w] += 1
    words = dict(wc)
    merges = []
    for rnd in range(1, BPE_TRAIN_ROUNDS + 1):
        pc: collections.Counter = collections.Counter()
        for w, n in words.items():
            for i in range(len(w) - 1):
                pc[(w[i], w[i + 1])] += n
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, c))
        nxt: collections.Counter = collections.Counter()
        for w, n in words.items():
            nxt[w.replace(a + b, chr(rnd))] += n
        words = dict(nxt)
    exp: dict = {}
    expected = []
    for rnd, (a, b, c) in enumerate(merges, start=1):
        ea, eb = exp.get(a, a), exp.get(b, b)
        exp[chr(rnd)] = ea + eb
        expected.append((rnd, ea, eb, ea + eb, c))
    got = [
        tuple(r)
        for r in queries()["q_ext_bpe_train_k"](spark, SF).collect()
    ]
    assert got == expected


def test_range_vol_ohlc_and_estimator_invariants(spark):
    rows = queries()["q_ext_range_vol"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.low_c <= min(r.open_c, r.close_c)
        assert r.high_c >= max(r.open_c, r.close_c)
        for est in (r.parkinson, r.garman_klass, r.rogers_satchell):
            assert est >= 0.0
        # Parkinson and GK share the range term; GK subtracts a
        # non-negative body correction, so GK <= Parkinson... only
        # when the 0.5 vs 1/(4ln2) scale difference allows; instead
        # pin the hard bound: every estimator <= the full range term
        import math

        hl = math.log(r.high_c / r.low_c)
        assert r.parkinson <= hl + 1e-9
        assert r.garman_klass <= hl + 1e-9


def test_intraday_profile_partition_and_grid(spark):
    df = queries()["q_ext_intraday_profile"](spark, SF).cache()
    rows = df.collect()
    assert 0 < len(rows) <= 1440
    n_candles = sum(r.n_days for r in rows)
    import pyspark.sql.functions as SF_

    from binancedatapipelineinaws_spark.operators.indicators import (
        _candles_c,
    )

    assert n_candles == _candles_c(spark, SF).count()
    for r in rows:
        assert 0 <= r.minute_of_day <= 1439
        # 4-dp grid: scaled values are integral
        for v in (r.avg_volume, r.avg_abs_move, r.avg_trades):
            assert abs(v * 10000 - round(v * 10000)) < 1e-6


def test_runs_test_count_invariants(spark):
    rows = queries()["q_ext_runs_test"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r.runs <= r.n_up + r.n_down
        # at least two runs whenever both directions occur
        assert r.runs >= 2


def test_sentence_dedup_count_invariants(spark):
    rows = queries()["q_ext_sentence_dedup"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_distinct <= r.n_sentences
        assert 0 <= r.n_duplicated <= r.n_sentences
        assert 0.0 <= r.dup_ratio <= 1.0


def test_semdedup_blocked_path_with_empty_hash_blocks(spark):
    """Regression (r11): hash block assignment can leave a block
    empty, producing one-sided applyInPandas groups.  Diagonal
    detection must go by the (bi, bj) KEY — emptiness-based detection
    either crashed np.stack (empty bi) or double-counted a block's
    internal pairs (empty bj read as diagonal).  BLOCK=1 makes empty
    slots and every group shape (diagonal, one-sided, cross)
    guaranteed at gate scale; the result must equal the exact path
    bit-for-bit."""
    import binancedatapipelineinaws_spark.functions.similarity as sim

    q = queries()["q_ext_semdedup"]
    exact = {tuple(r) for r in q(spark, SF).collect()}
    om, ob = sim.SEMDEDUP_EXACT_MAX, sim.SEMDEDUP_BLOCK
    sim.SEMDEDUP_EXACT_MAX = 0
    sim.SEMDEDUP_BLOCK = 1
    try:
        got = {tuple(r) for r in q(spark, SF).collect()}
    finally:
        sim.SEMDEDUP_EXACT_MAX = om
        sim.SEMDEDUP_BLOCK = ob
    assert got == exact


def _copurchase_capped_adj(spark):
    """Independent (pure-Python) mutual top-K capped adjacency for the
    r12 densification-regime graph tests: support >= 2 pairs, each
    node keeps its GRAPH_CAP_K strongest neighbors by (support DESC,
    neighbor ASC), an edge survives only if both endpoints kept it."""
    from collections import defaultdict

    from binancedatapipelineinaws_spark.operators.graph import GRAPH_CAP_K

    rows = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    baskets = defaultdict(set)
    for r in rows:
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    support = defaultdict(int)
    for parts in baskets.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                support[(a, b)] += 1
    nbrs = defaultdict(list)
    for (a, b), n in support.items():
        if n >= 2:
            nbrs[a].append((b, n))
            nbrs[b].append((a, n))
    kept = set()
    for v, ns in nbrs.items():
        ns.sort(key=lambda t: (-t[1], t[0]))
        for b, _ in ns[:GRAPH_CAP_K]:
            kept.add((v, b))
    adj = defaultdict(set)
    for a, b in kept:
        if (b, a) in kept:
            adj[a].add(b)
    return adj


def test_pagerank_capped_matches_python_reimplementation(spark):
    """Same from-scratch fixed-point PageRank as the uncapped test,
    over the independently-derived mutual top-K graph — pins both the
    cap semantics and the kernel against a shared SQL mis-translation.
    Also asserts the hard degree bound the cap exists for."""
    from binancedatapipelineinaws_spark.operators.graph import GRAPH_CAP_K

    adj = _copurchase_capped_adj(spark)
    assert adj and max(len(a) for a in adj.values()) <= GRAPH_CAP_K
    SCALE = 1_000_000_000_000
    n = len(adj)
    pr = {v: SCALE // n for v in adj}
    for _ in range(3):
        contrib = {v: pr[v] // len(adj[v]) for v in adj}
        inc = {v: sum(contrib[u] for u in adj[v]) for v in adj}
        pr = {
            v: (15 * SCALE) // (100 * n) + (85 * inc[v]) // 100
            for v in adj
        }
    got = {
        r["part"]: (r["deg"], r["pr_scaled"])
        for r in queries()["q_ext_pagerank_capped"](spark, SF).collect()
    }
    assert set(got) == set(adj)
    for v in adj:
        assert got[v] == (len(adj[v]), pr[v]), v


def test_triangles_capped_matches_python_reimplementation(spark):
    from binancedatapipelineinaws_spark.operators.graph import GRAPH_CAP_K

    adj = _copurchase_capped_adj(spark)
    tri = 0
    for v, nbrs in adj.items():
        for a in nbrs:
            if a <= v:
                continue
            for b in nbrs:
                if b <= a:
                    continue
                if b in adj[a]:
                    tri += 1
    wedges = sum(d * (d - 1) // 2 for d in map(len, adj.values()))
    (row,) = queries()["q_ext_triangles_capped"](spark, SF).collect()
    assert row["n_nodes"] == len(adj)
    assert row["n_edges"] == sum(len(a) for a in adj.values()) // 2
    assert row["n_triangles"] == tri
    assert row["n_wedges"] == wedges
    # the bound the cap buys: wedges <= N * C(K, 2)
    k = GRAPH_CAP_K
    assert row["n_wedges"] <= row["n_nodes"] * k * (k - 1) // 2


def test_minhash_idf_matches_python_reimplementation(spark):
    """Full IDF-weighted signature table recomputed from scratch in
    Python (md5 hex32, rarity bands, multiset expansion, 16
    permutations) — pins the construction independently of both SQL
    dialects."""
    import hashlib
    from collections import defaultdict

    from binancedatapipelineinaws_spark.functions.dedup import (
        IDF_DF_MID,
        IDF_DF_RARE,
        IDF_W_MID,
        IDF_W_RARE,
        MINHASH_A,
        MINHASH_B,
        MINHASH_P,
        N_HASHES,
    )

    def hex32(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    doc_sh = {}
    dfreq = defaultdict(int)
    for r in docs:
        words = r.text.split(" ")
        sh = list(dict.fromkeys(
            "_".join(words[i : i + 3]) for i in range(len(words) - 2)
        ))
        doc_sh[r.doc_id] = sh
        for s in sh:
            dfreq[s] += 1

    def weight(df: int) -> int:
        if df <= IDF_DF_RARE:
            return IDF_W_RARE
        if df <= IDF_DF_MID:
            return IDF_W_MID
        return 1

    expected = {}
    for doc_id, sh in doc_sh.items():
        if not sh:
            continue
        xs = [
            hex32(f"{s}~{rep}")
            for s in sh
            for rep in range(1, weight(dfreq[s]) + 1)
        ]
        expected[doc_id] = tuple(
            min((x * MINHASH_A[j] + MINHASH_B[j]) % MINHASH_P for x in xs)
            for j in range(N_HASHES)
        )
    got = {
        r["doc_id"]: tuple(r[f"h{j}"] for j in range(N_HASHES))
        for r in queries()["q_ext_dedup_minhash_idf"](spark, SF).collect()
    }
    assert got == expected


def test_perplexity_buckets_matches_python_reimplementation(spark):
    """Bigram-LM scores + per-source ntile bucketing recomputed from
    scratch: same LM MLE, same 6dp rounding, same (score DESC, doc_id)
    total order, same ntile fill rule (first n%3 buckets get the extra
    row)."""
    import math
    from collections import Counter, defaultdict

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source", "text"
    ).collect()
    c12: Counter = Counter()
    doc_bg = {}
    for r in docs:
        w = r.text.split(" ")
        bgs = [(w[i], w[i + 1]) for i in range(len(w) - 1)]
        doc_bg[r.doc_id] = bgs
        c12.update(bgs)
    c1: Counter = Counter()
    for (w1, _), c in c12.items():
        c1[w1] += c
    by_source = defaultdict(list)
    src_of = {r.doc_id: r.source for r in docs}
    for doc_id, bgs in doc_bg.items():
        if not bgs:
            continue
        s = round(
            sum(math.log(c12[b] / c1[b[0]]) for b in bgs) / len(bgs), 6
        )
        by_source[src_of[doc_id]].append((s, doc_id))
    expected = {}
    for source, scored in by_source.items():
        scored.sort(key=lambda t: (-t[0], t[1]))
        n, b = len(scored), 3
        sizes = [n // b + (1 if i < n % b else 0) for i in range(b)]
        pos = 0
        for i, name in enumerate(["head", "middle", "tail"]):
            chunk = scored[pos : pos + sizes[i]]
            pos += sizes[i]
            if not chunk:
                continue
            micro = sum(round(s * 1_000_000) for s, _ in chunk)
            expected[(source, name)] = (
                len(chunk),
                round(micro / 1_000_000 / len(chunk), 6),
            )
    got = {
        (r.source, r.bucket): (r.n_docs, r.avg_lm_score)
        for r in queries()["q_ext_perplexity_buckets"](spark, SF).collect()
    }
    assert set(got) == set(expected)
    for k, (n, avg) in expected.items():
        assert got[k][0] == n, k
        assert abs(got[k][1] - avg) <= 2e-6, (k, got[k][1], avg)


def test_tokenizer_apply_matches_naive_curve(spark):
    """The compression curve must reproduce a straight Python BPE
    apply loop: same winners (the trainer test pins those), same
    per-round sum(len(w) * n), same 1e-6 floor-division grid."""
    import collections
    import re

    from binancedatapipelineinaws_spark.functions.text import (
        BPE_TRAIN_ROUNDS,
    )

    wc: collections.Counter = collections.Counter()
    for r in spark.read.parquet(f"{SF}/documents.parquet").select(
        "text"
    ).collect():
        for w in re.split(r"\s+", r.text.lower()):
            if len(w) >= 2:
                wc[w] += 1
    words = dict(wc)
    total_words = sum(words.values())

    def curve_point(rnd: int) -> tuple:
        toks = sum(len(w) * n for w, n in words.items())
        return (rnd, toks, (toks * 1_000_000 // total_words) / 1_000_000)

    expected = [curve_point(0)]
    for rnd in range(1, BPE_TRAIN_ROUNDS + 1):
        pc: collections.Counter = collections.Counter()
        for w, n in words.items():
            for i in range(len(w) - 1):
                pc[(w[i], w[i + 1])] += n
        (a, b), _ = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        nxt: collections.Counter = collections.Counter()
        for w, n in words.items():
            nxt[w.replace(a + b, chr(rnd))] += n
        words = dict(nxt)
        expected.append(curve_point(rnd))
    got = [
        tuple(r)
        for r in queries()["q_ext_tokenizer_apply"](spark, SF).collect()
    ]
    assert got == expected


def test_dedup_near_idf_matches_python_reimplementation(spark):
    """End-to-end weighted near-dup recompute from scratch: idf
    signatures, band keys (md5 of the '_'-joined hash strings),
    bucket candidates, df-capped weighted-Jaccard verify, threshold.
    Pins candidate generation AND the weighted verify independently
    of both SQL dialects."""
    import hashlib
    from collections import defaultdict

    from binancedatapipelineinaws_spark.functions.dedup import (
        IDF_DF_MID,
        IDF_DF_RARE,
        IDF_W_MID,
        IDF_W_RARE,
        JACCARD_THRESHOLD,
        MINHASH_A,
        MINHASH_B,
        MINHASH_P,
        N_BANDS,
        N_HASHES,
        ROWS_PER_BAND,
        SHINGLE_DF_CAP,
    )

    def hex32(t: str) -> int:
        return int(hashlib.md5(t.encode()).hexdigest()[:8], 16)

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    doc_sh = {}
    dfreq = defaultdict(int)
    for r in docs:
        words = r.text.split(" ")
        sh = list(dict.fromkeys(
            "_".join(words[i : i + 3]) for i in range(len(words) - 2)
        ))
        doc_sh[r.doc_id] = sh
        for s in sh:
            dfreq[s] += 1

    def weight(df: int) -> int:
        if df <= IDF_DF_RARE:
            return IDF_W_RARE
        if df <= IDF_DF_MID:
            return IDF_W_MID
        return 1

    sigs = {}
    for doc_id, sh in doc_sh.items():
        if not sh:
            continue
        xs = [
            hex32(f"{s}~{rep}")
            for s in sh
            for rep in range(1, weight(dfreq[s]) + 1)
        ]
        sigs[doc_id] = [
            min((x * MINHASH_A[j] + MINHASH_B[j]) % MINHASH_P for x in xs)
            for j in range(N_HASHES)
        ]
    buckets = defaultdict(set)
    for doc_id, h in sigs.items():
        for j in range(N_BANDS):
            key = hashlib.md5(
                "_".join(
                    str(h[j * ROWS_PER_BAND + k])
                    for k in range(ROWS_PER_BAND)
                ).encode()
            ).hexdigest()
            buckets[(j, key)].add(doc_id)
    cand = set()
    for members in buckets.values():
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1 :]:
                cand.add((a, b))
    wset = {
        d: {s: weight(dfreq[s]) for s in sh if dfreq[s] <= SHINGLE_DF_CAP}
        for d, sh in doc_sh.items()
    }
    expected = {}
    for a, b in cand:
        wi = sum(w for s, w in wset[a].items() if s in wset[b])
        union = sum(wset[a].values()) + sum(wset[b].values()) - wi
        if union and wi / union >= JACCARD_THRESHOLD:
            expected[(a, b)] = round(wi / union, 6)
    got = {
        (r.doc_a, r.doc_b): r.wjaccard
        for r in queries()["q_ext_dedup_near_idf"](spark, SF).collect()
    }
    assert got == expected
