"""Similarity search over `embeddings` (array<float>, 64-dim) —
BASELINE.json north-star ops.

Float-parity discipline: dot products are sequential left-folds
(`F.aggregate` in Spark, `list_reduce` in DuckDB) so both engines add in
the same order — float32 inputs widen exactly to double, products and
ordered sums are then bit-identical.  Results are additionally rounded
to 6 dp as a guard.

Scale notes (100 TB): brute-force top-k is the correctness baseline —
one broadcast of the query set, map-side partial top-k per partition,
driver merge (TakeOrderedAndProject shape).  The LSH variant buckets
vectors by signed random-hyperplane projections so candidate sets are
~1/2^planes of the corpus; REPOSE/Odyssey-style pruning (PAPERS.md) is
the published extension of the same idea.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from binancedatapipelineinaws_spark.registry import register
from binancedatapipelineinaws_spark.session import prepare
from binancedatapipelineinaws_spark.tables import load_table

DIM = 64
N_QUERY = 20  # vec_id < 20 are the query vectors
TOP_K = 5
N_PLANES = 6


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic addition order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def duck_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0, list_transform(range({DIM}), "
        f"i -> CAST({a}[i + 1] AS DOUBLE) * CAST({b}[i + 1] AS DOUBLE))), "
        f"(x, y) -> x + y)"
    )


_DUCK_COS = (
    f"({duck_dot('q.embedding', 'c.embedding')} / "
    f"(sqrt({duck_dot('q.embedding', 'q.embedding')}) * "
    f"sqrt({duck_dot('c.embedding', 'c.embedding')})))"
)


@register(
    "q_ext_cosine_knn",
    oracle=f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_DUCK_COS} AS cos_sim
  FROM embeddings q JOIN embeddings c ON q.vec_id < {N_QUERY}
   AND c.vec_id != q.vec_id
), ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, round(cos_sim, 6) AS cos_sim
FROM ranked WHERE rank <= {TOP_K}
""",
)
def q_ext_cosine_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast the query set against the
    corpus, per-partition scoring, windowed top-k.  Norms are
    precomputed once per vector (a map-side projection), not per pair —
    at n_query queries that's 2*n_query-fold less fold work."""
    prepare(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    q = F.broadcast(
        emb.filter(F.col("vec_id") < N_QUERY).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            norm(F.col("embedding")).alias("q_nrm"),
        )
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        norm(F.col("embedding")).alias("c_nrm"),
    )
    cos = dot(F.col("q_emb"), F.col("c_emb")) / (
        F.col("q_nrm") * F.col("c_nrm")
    )
    scored = (
        c.join(q, F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cos.alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", F.round("cos_sim", 6).alias("cos_sim"))
    )


# --- LSH-bucketed ANN --------------------------------------------------------
# Hyperplane p has deterministic ±1 weights per dimension: sign of bit 0
# of the first md5 word of "p_d".  bucket(v) = bitmap of sign(w_p · v).
# The weights are evaluated at PLAN-BUILD time (Python md5) and inlined
# as literals in BOTH engines, so the per-row work is a 6x64 mat-vec —
# the round-1 version recomputed 384 md5 calls per row inside the scan.


def _hyperplane_matrix(n_planes: int) -> list[list[float]]:
    """Deterministic +-1 weights, sign = low bit of md5(f"{p}_{d}") —
    the hex32 family, evaluated in Python at plan-build time instead of
    per row."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"{p}_{d}".encode()).hexdigest()[:8], 16) & 1
            else -1.0
            for d in range(DIM)
        ]
        for p in range(n_planes)
    ]


def lsh_bucket(emb: Column) -> Column:
    """LSH bucket id: sequential-fold projections over literal weights,
    deterministic in both engines."""
    W = _hyperplane_matrix(N_PLANES)
    bucket = F.lit(0)
    for p in range(N_PLANES):
        w = F.array(*[F.lit(x) for x in W[p]])
        proj = F.aggregate(
            F.zip_with(w, emb, lambda x, y: x * y.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(0)
    return bucket.cast("long")


def _duck_bucket(vec: str) -> str:
    W = _hyperplane_matrix(N_PLANES)
    parts = []
    for p in range(N_PLANES):
        w_list = "[" + ", ".join(str(x) for x in W[p]) + "]"
        proj = (
            f"list_reduce(list_prepend(0.0, list_transform(range({DIM}), "
            f"d -> ({w_list})[d + 1] * CAST({vec}[d + 1] AS DOUBLE))), "
            f"(x, y) -> x + y)"
        )
        parts.append(f"(CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(parts) + ")"


@register(
    "q_ext_ann_lsh",
    oracle=f"""
WITH bucketed AS (
  SELECT vec_id, embedding, {_duck_bucket("embedding")} AS bucket
  FROM embeddings
), cand AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         q.bucket AS bucket, {_DUCK_COS} AS cos_sim
  FROM bucketed q JOIN bucketed c
    ON q.bucket = c.bucket AND q.vec_id < {N_QUERY} AND c.vec_id != q.vec_id
), ranked AS (
  SELECT query_id, neighbor_id, bucket, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM cand
)
SELECT query_id, neighbor_id, bucket, rank, round(cos_sim, 6) AS cos_sim
FROM ranked WHERE rank <= {TOP_K}
""",
)
def q_ext_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via random-hyperplane LSH: bucket once (map-only), compare
    only same-bucket pairs, exact-cosine rerank of the candidates."""
    prepare(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    bucketed = emb.select(
        "vec_id",
        "embedding",
        lsh_bucket(F.col("embedding")).alias("bucket"),
        norm(F.col("embedding")).alias("nrm"),
    )
    q = bucketed.filter(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket"),
        F.col("nrm").alias("q_nrm"),
    )
    c = bucketed.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("bucket").alias("c_bucket"),
        F.col("nrm").alias("c_nrm"),
    )
    cos = dot(F.col("q_emb"), F.col("c_emb")) / (
        F.col("q_nrm") * F.col("c_nrm")
    )
    cand = (
        q.join(
            c,
            (F.col("bucket") == F.col("c_bucket"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .select("query_id", "neighbor_id", "bucket", cos.alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id", "neighbor_id", "bucket", "rank",
            F.round("cos_sim", 6).alias("cos_sim"),
        )
    )


@register(
    "q_ext_ann_multiprobe",
    oracle=f"""
WITH bucketed AS (
  SELECT vec_id, embedding, {_duck_bucket("embedding")} AS bucket
  FROM embeddings
), cand AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_DUCK_COS} AS cos_sim
  FROM bucketed q JOIN bucketed c
    ON bit_count(xor(q.bucket, c.bucket)) <= 1
   AND q.vec_id < {N_QUERY} AND c.vec_id != q.vec_id
), ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM cand
)
SELECT query_id, neighbor_id, rank, round(cos_sim, 6) AS cos_sim
FROM ranked WHERE rank <= {TOP_K}
""",
)
def q_ext_ann_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN (Lv et al., VLDB 2007): each query probes its
    own bucket plus every bucket at Hamming distance 1 (one flipped
    hyperplane sign — the most likely places a near neighbor fell), so
    recall rises steeply for ~(n_planes+1)x the candidate work.  The
    probe set is a map-side explode of the QUERY side only (corpus rows
    stay single-bucket), and each (query, candidate) pair matches at
    most one probe, so the equi-join needs no dedup."""
    prepare(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    bucketed = emb.select(
        "vec_id",
        "embedding",
        lsh_bucket(F.col("embedding")).alias("bucket"),
        norm(F.col("embedding")).alias("nrm"),
    )
    probes = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(1 << p) for p in range(N_PLANES)],
    )
    q = (
        bucketed.filter(F.col("vec_id") < N_QUERY)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
            F.explode(probes).alias("probe_bucket"),
        )
    )
    c = bucketed.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("bucket").alias("c_bucket"),
        F.col("nrm").alias("c_nrm"),
    )
    cos = dot(F.col("q_emb"), F.col("c_emb")) / (
        F.col("q_nrm") * F.col("c_nrm")
    )
    cand = q.join(
        c,
        (F.col("probe_bucket") == F.col("c_bucket"))
        & (F.col("neighbor_id") != F.col("query_id")),
    ).select("query_id", "neighbor_id", cos.alias("cos_sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id", "neighbor_id", "rank",
            F.round("cos_sim", 6).alias("cos_sim"),
        )
    )


@register(
    "q_ext_ann_recall",
    oracle=f"""
WITH ex_scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_DUCK_COS} AS cos_sim
  FROM embeddings q JOIN embeddings c ON q.vec_id < {N_QUERY}
   AND c.vec_id != q.vec_id
), ex_ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM ex_scored
), exact_k AS (
  SELECT query_id, neighbor_id FROM ex_ranked WHERE rank <= {TOP_K}
), bucketed AS (
  SELECT vec_id, embedding, {_duck_bucket("embedding")} AS bucket
  FROM embeddings
), lsh_cand AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_DUCK_COS} AS cos_sim
  FROM bucketed q JOIN bucketed c
    ON q.bucket = c.bucket AND q.vec_id < {N_QUERY} AND c.vec_id != q.vec_id
), lsh_ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM lsh_cand
), lsh_k AS (
  SELECT query_id, neighbor_id FROM lsh_ranked WHERE rank <= {TOP_K}
), hits AS (
  SELECT e.query_id, count(*) AS n_hits
  FROM exact_k e JOIN lsh_k l
    ON e.query_id = l.query_id AND e.neighbor_id = l.neighbor_id
  GROUP BY 1
), denom AS (SELECT query_id, count(*) AS k FROM exact_k GROUP BY 1)
SELECT d.query_id, d.k, coalesce(h.n_hits, 0) AS n_hits,
       round(coalesce(h.n_hits, 0) / CAST(d.k AS DOUBLE), 6) AS recall
FROM denom d LEFT JOIN hits h ON d.query_id = h.query_id
""",
)
def q_ext_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{TOP_K} of the single-probe LSH ANN against brute-force
    ground truth, per query — the evaluation harness as a first-class
    oracle-checked query, so an index-parameter change (N_PLANES, probe
    count) shows its recall cost in the same gate that checks
    correctness.

    Both pipelines are the registered operators re-invoked (same plans,
    same tie-breaking); the comparison itself is a tiny (n_query x k)
    semi-join + rollup, so the eval adds nothing to the scale profile
    of the underlying searches.

    Expected values on the driver corpus: near ZERO.  The synthetic
    embeddings are isotropic (no cluster structure except a few planted
    near-dup pairs), so a true top-5 neighbor sits at cos ~0.5 and
    co-buckets under 6 hyperplanes with p ~0.1 — which is precisely
    what this harness is for: it quantifies that single-probe LSH needs
    the multi-probe variant (q_ext_ann_multiprobe) or IVF on
    structure-less data, as a number inside the correctness gate rather
    than a surprise in production."""
    prepare(spark)
    exact_k = q_ext_cosine_knn(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    lsh_k = q_ext_ann_lsh(spark, sf_dir).select("query_id", "neighbor_id")
    hits = (
        exact_k.join(lsh_k, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hits"))
    )
    denom = exact_k.groupBy("query_id").agg(F.count("*").alias("k"))
    return denom.join(hits, "query_id", "left").select(
        "query_id",
        "k",
        F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
        F.round(
            F.coalesce("n_hits", F.lit(0)) / F.col("k").cast("double"), 6
        ).alias("recall"),
    )


# --- banded hyperplane LSH for embedding near-dup ---------------------------
# NEARDUP_BANDS bands of NEARDUP_ROWS sign-bits each.  A pair at
# cos >= 0.9 agrees on one hyperplane with p = 1 - acos(0.9)/pi ~ 0.857,
# so it shares at least one full 8-bit band with
# p = 1 - (1 - 0.857^8)^16 ~ 0.996; everything below the threshold is
# pruned ~256x per band.  Weights are computed at PLAN-BUILD time (same
# md5-low-bit family as _plane_weight) and inlined as literals, so the
# scan is a plain 128x64 mat-vec per row — no per-row hashing.
#
# Scale notes (100 TB): signature explode is map-only (16 rows/vector of
# (band, sig) ids only — vectors are NOT carried through the explode);
# the candidate join is an equi-join on (band, sig); the exact verify
# re-joins vectors by id.  Band signature width should grow with corpus
# size (rows_per_band 16-20 at web scale => 65k-1M buckets/band) to keep
# bucket sizes bounded; the knobs are function arguments for that reason.

NEARDUP_BANDS = 16
NEARDUP_ROWS = 8
NEARDUP_COS = 0.9

# Band-geometry ladder (r7 sf1 pricing, SCALING.md batch 12): with the
# (16 bands x 8 bits) geometry fixed, a 10x corpus put ~79 vectors in
# the average 256-value band bucket (max 5024) and candidate pairs grew
# x438 — the quadratic-in-bucket blowup the docstring warned about.
# Signature width must grow with the corpus so buckets stay bounded;
# bands grow alongside to HOLD recall at the cos-0.9 boundary
# (p_bit ~ 0.857): (8,16)->0.996, (12,32)->0.996, (16,64)->0.996,
# (20,128)->0.997.  The ladder is keyed on the parquet row count (a
# footer-only job) so the plan is deterministic for a given corpus;
# the <=4000 rung reproduces the original geometry bit-for-bit, which
# keeps every existing driver row and test at sf<=0.1 unchanged.
_BAND_LADDER = ((4_000, 16, 8), (64_000, 32, 12), (1_000_000, 64, 16))
# p_bit at the cos-0.9 boundary: 1 - acos(0.9)/pi (hyperplane LSH)
_P_BIT_09 = 0.8564379625561782
_RECALL_MISS = 0.004  # hold >= 0.996 candidate recall at cos 0.9


def adaptive_band_geometry(n_vectors: int) -> tuple[int, int]:
    """(bands, rows_per_band) for a corpus of `n_vectors`.

    Beyond the ladder's last rung the geometry is COMPUTED, not
    capped: rows_per_band tracks log2(n) + 3 so the per-band signature
    space stays ~8x the corpus and random birthday-collision
    candidates stay LINEAR in n (a fixed ceiling goes quadratic: the
    r10 x1000 drill measured 7.2e8 candidate slots for 2M unrelated
    vectors at the old (128, 20) ceiling — bands x n^2 / 2^(rows+1),
    which at 1e9 vectors would be 6e13); bands then grow to hold the
    0.996 candidate recall at the cos-0.9 boundary
    (1 - (1 - p_bit^rows)^bands >= 0.996).  Signature cost therefore
    grows ~log-linearly with the corpus — the honest hyperplane-LSH
    cost curve.  Near-threshold (cos ~0.8) grey-zone density remains
    a DATA property no geometry prunes sharply (the amplification
    s-curve is not steep enough between 0.8 and 0.9); a corpus dense
    in 0.8-cliques needs cluster-partitioning first (the q_ext_semdedup
    shape), not wider LSH."""
    for cap, bands, rows in _BAND_LADDER:
        if n_vectors <= cap:
            return bands, rows
    import math

    rows = math.ceil(math.log2(n_vectors)) + 3
    p_band = _P_BIT_09**rows
    bands = math.ceil(math.log(_RECALL_MISS) / math.log(1.0 - p_band))
    return bands, rows


def banded_signatures(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = NEARDUP_BANDS,
    rows_per_band: int = NEARDUP_ROWS,
) -> DataFrame:
    """(id, band, sig) rows: `bands` LSH band signatures per vector.

    The projection is a per-row (bands*rows_per_band) x DIM mat-vec —
    exactly the shape where Catalyst's interpreted higher-order-function
    fold loses to an Arrow-batched numpy matmul by ~10x, so this is one
    of the deliberate Pandas-UDF hot paths (SURVEY §2.9).  Signatures
    only steer candidate generation; the exact-cosine verify stays on
    the fold-based JVM path that the oracle mirrors."""
    W = np.array(
        _hyperplane_matrix(bands * rows_per_band), dtype=np.float64
    ).T  # DIM x planes
    pow2 = 1 << np.arange(rows_per_band, dtype=np.int64)

    @F.pandas_udf("array<long>")
    def band_sigs(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)  # B x DIM
        bits = (mat @ W) > 0  # B x planes
        sigs = bits.reshape(len(mat), bands, rows_per_band) @ pow2
        return pd.Series(list(sigs))

    return df.select(
        id_col, F.posexplode(band_sigs(F.col(vec_col))).alias("band", "sig")
    )


def embed_neardup_pairs(
    emb: DataFrame,
    threshold: float = NEARDUP_COS,
    bands: int | None = None,
    rows_per_band: int | None = None,
    n_vectors: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs (cos >= threshold) from an (vec_id, label,
    embedding) frame: banded-LSH candidates -> exact-cosine verify.
    Never materializes all pairs — the only non-key join is gone.
    Band geometry defaults to `adaptive_band_geometry` of the corpus
    row count so bucket sizes stay bounded as the corpus grows.  The
    two knobs are coupled (bands hold recall for a given width), so a
    partial override is an error, not a silent ladder fallback.

    ``n_vectors``: the corpus row count used to pick band geometry.
    When omitted it is taken from ``emb.count()`` — a parquet-footer
    job ONLY if ``emb`` is a raw scan; a caller passing a
    derived/filtered frame should supply the count (or an estimate —
    geometry rungs are order-of-magnitude) rather than silently
    executing its full lineage one extra time (ADVICE.md r7)."""
    if (bands is None) != (rows_per_band is None):
        raise ValueError(
            "bands and rows_per_band must be overridden together"
        )
    if bands is None:
        if n_vectors is None:
            n_vectors = emb.count()
        bands, rows_per_band = adaptive_band_geometry(n_vectors)
    emb = emb.select(
        "vec_id", "label", "embedding", norm(F.col("embedding")).alias("nrm")
    )
    sigs = banded_signatures(
        emb, bands=bands, rows_per_band=rows_per_band
    )
    a = sigs.select(F.col("vec_id").alias("vec_a"), "band", "sig")
    b = sigs.select(F.col("vec_id").alias("vec_b"), "band", "sig")
    cand = (
        a.join(b, ["band", "sig"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    ea = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("label").alias("label_a"),
        F.col("embedding").alias("a_emb"),
        F.col("nrm").alias("a_nrm"),
    )
    eb = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("label").alias("label_b"),
        F.col("embedding").alias("b_emb"),
        F.col("nrm").alias("b_nrm"),
    )
    cos = dot(F.col("a_emb"), F.col("b_emb")) / (
        F.col("a_nrm") * F.col("b_nrm")
    )
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .withColumn("cos_sim_raw", cos)
        .filter(F.col("cos_sim_raw") >= threshold)
        .select(
            "vec_a", "vec_b", "label_a", "label_b",
            F.round("cos_sim_raw", 6).alias("cos_sim"),
        )
    )


@register(
    "q_ext_embed_neardup",
    oracle=f"""
SELECT q.vec_id AS vec_a, c.vec_id AS vec_b, q.label AS label_a,
       c.label AS label_b, round({_DUCK_COS}, 6) AS cos_sim
FROM embeddings q JOIN embeddings c ON q.vec_id < c.vec_id
WHERE {_DUCK_COS} >= 0.9
""",
)
def q_ext_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos >= 0.9) — the
    semantic-dedup tier for training pipelines.  The oracle stays the
    all-pairs formulation; the Spark plan routes through banded-LSH
    buckets (equi-joins only — no BroadcastNestedLoopJoin), with recall
    exercised by the planted-near-dup test in tests/test_properties.py
    (the synthetic corpus itself has no pair above cos 0.52).

    ORACLE CONSTRAINT (ADVICE.md r7): the oracle is the exact
    all-pairs join at every size, but above the adaptive ladder's
    first rung (4000 vectors) the Spark path's banded-LSH candidates
    have recall ~0.996 at the threshold — on a corpus that large
    containing genuine near-threshold pairs the comparison can fail
    by construction (a missed pair, not a wrong value).
    tools/check_oracle.py knows this bound and SKIPs with a notice
    instead of reporting a false FAIL."""
    prepare(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    # footer-only count of the raw scan picks the band geometry
    return embed_neardup_pairs(emb, n_vectors=emb.count())


# --- IVF (inverted-file) ANN -------------------------------------------------
# Coarse quantizer: centroid per `label` cell (exact-decimal means so
# both engines compute identical centroids), assign each vector to its
# nearest centroid, then search only within the query's cell with
# nprobe=1.  At 100 TB: centroids are a broadcast table; the cell
# assignment is map-only; each query scans corpus/n_cells vectors.

_DUCK_CENTROIDS = f"""
exploded AS (
  SELECT label, d, CAST(embedding[d + 1] AS DECIMAL(18,9)) AS v
  FROM embeddings, LATERAL (SELECT unnest(range({DIM})) AS d) t
),
centroids AS (
  SELECT label, d, CAST(sum(v) AS DOUBLE) / count(*) AS c
  FROM exploded GROUP BY label, d
),
centroid_vecs AS (
  SELECT label, list(c ORDER BY d) AS cvec FROM centroids GROUP BY label
)
"""


def centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell centroids via exact-decimal dimension sums (bit-identical
    across engines and partial-agg schedules)."""
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode("embedding").alias("d", "v_raw")
    ).select("label", "d", F.col("v_raw").cast("decimal(18,9)").alias("v"))
    per_dim = exploded.groupBy("label", "d").agg(
        (F.sum("v").cast("double") / F.count("*")).alias("c")
    )
    return (
        per_dim.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("d", "c"))).alias("dc"))
        .select(
            "label",
            F.transform(F.col("dc"), lambda x: x.getField("c")).alias("cvec"),
        )
    )


def assign_cells(
    spark: SparkSession, sf_dir: str, persist: bool = False
) -> DataFrame:
    """(vec_id, embedding, nrm, cell): nearest-centroid IVF cell
    assignment — broadcast K-row centroids, map-only cosine argmin
    with the (desc cent_sim, label) tie-break every oracle replays
    bit-for-bit.  THE single copy of the coarse quantizer shared by
    q_ext_ann_ivf / q_ext_semdedup / q_ext_ann_pq / q_ext_ann_nprobe
    (whose nprobe>1 QUERY-side probe list is deliberately a separate
    20-row inline crossJoin, not a corpus-wide variant of this); a
    tie-break or persist change here changes all of them together
    with their oracles."""
    emb = load_table(spark, sf_dir, "embeddings")
    # ALL K centroids packed into ONE broadcast row (label-ascending
    # array of struct(label, cvec, c_nrm)) so the nearest-centroid
    # argmin is a map-only array fold over the corpus — zero Exchange
    # on the corpus side.  The r7 form crossJoined K broadcast rows
    # and picked the argmin with a row_number() window partitioned by
    # vec_id: a corpus x K row inflation plus a full corpus shuffle
    # just to select a per-row minimum (VERDICT r7 item 3).  The fold
    # keeps strictly-greater comparison over the label-sorted array,
    # which replays the window's (desc cent_sim, label) tie-break
    # bit-for-bit: first maximum encountered = smallest label.
    cents_row = F.broadcast(
        centroids(spark, sf_dir)
        .select("label", "cvec", norm(F.col("cvec")).alias("c_nrm"))
        .groupBy()
        .agg(
            F.array_sort(
                F.collect_list(F.struct("label", "cvec", "c_nrm"))
            ).alias("cents")
        )
    )
    e = emb.select(
        "vec_id", "embedding", norm(F.col("embedding")).alias("nrm")
    )
    # Toy-corpus parallelism guard: at bench scale the whole table is
    # ONE parquet split, and since this path is now exchange-free the
    # cached assignment would stay single-partition — serializing the
    # interpreted-cosine pair joins every consumer runs downstream
    # (measured: semdedup's pair stage 0.54 s on 8 partitions vs
    # 2.0-3.0 s on 1; the r7 window shuffle had been providing this
    # parallelism by accident).  At any real corpus size the scan has
    # >= defaultParallelism splits and this branch is dead — the plan
    # stays map-only where it matters.
    par = spark.sparkContext.defaultParallelism
    if e.rdd.getNumPartitions() < par:
        e = e.repartition(par)

    def cos_vc(x):
        return dot(F.col("embedding"), x.getField("cvec")) / (
            F.col("nrm") * x.getField("c_nrm")
        )

    # K dot products per row (same FLOPs as the old joined form),
    # then a K-step constant fold — no row inflation, no window.
    scored = F.transform(
        F.col("cents"),
        lambda x: F.struct(
            cos_vc(x).alias("sim"), x.getField("label").alias("cell")
        ),
    )
    best = F.aggregate(
        scored,
        F.struct(
            F.lit(float("-inf")).alias("sim"),
            F.lit(None).cast("int").alias("cell"),
        ),
        lambda acc, x: F.when(
            x.getField("sim") > acc.getField("sim"), x
        ).otherwise(acc),
    )
    out = e.crossJoin(cents_row).select(
        "vec_id", "embedding", "nrm", best.getField("cell").alias("cell")
    )
    return out.persist() if persist else out


_DUCK_DOT_VC = (
    f"list_reduce(list_prepend(0.0, list_transform(range({DIM}), "
    f"i -> CAST(e.embedding[i + 1] AS DOUBLE) * cv.cvec[i + 1])), "
    f"(x, y) -> x + y)"
)
_DUCK_NORM_V = (
    f"sqrt(list_reduce(list_prepend(0.0, list_transform(range({DIM}), "
    f"i -> CAST(e.embedding[i + 1] AS DOUBLE) * CAST(e.embedding[i + 1] AS DOUBLE))), "
    f"(x, y) -> x + y))"
)
_DUCK_NORM_C = (
    f"sqrt(list_reduce(list_prepend(0.0, list_transform(range({DIM}), "
    f"i -> cv.cvec[i + 1] * cv.cvec[i + 1])), (x, y) -> x + y))"
)


@register(
    "q_ext_ann_ivf",
    oracle="WITH "
    + _DUCK_CENTROIDS
    + f""",
assigned AS (
  SELECT e.vec_id, e.embedding, cv.label AS cell,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY {_DUCK_DOT_VC} / ({_DUCK_NORM_V} * {_DUCK_NORM_C}) DESC,
                    cv.label) AS rn
  FROM embeddings e CROSS JOIN centroid_vecs cv
),
cells AS (SELECT vec_id, embedding, cell FROM assigned WHERE rn = 1),
cand AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.cell,
         {_DUCK_COS.replace("q.embedding", "q.embedding").replace("c.embedding", "c.embedding")} AS cos_sim
  FROM cells q JOIN cells c
    ON q.cell = c.cell AND q.vec_id < {N_QUERY} AND c.vec_id != q.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cell, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM cand
)
SELECT query_id, neighbor_id, cell, rank, round(cos_sim, 6) AS cos_sim
FROM ranked WHERE rank <= {TOP_K}
""",
)
def q_ext_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: nearest-centroid cell assignment (nprobe=1, the shared
    `assign_cells` coarse quantizer), exact cosine rerank within the
    cell."""
    prepare(spark)
    assigned = assign_cells(spark, sf_dir)
    q = assigned.filter(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        "cell",
    )
    c = assigned.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
        F.col("cell").alias("c_cell"),
    )
    cos = dot(F.col("q_emb"), F.col("c_emb")) / (
        F.col("q_nrm") * F.col("c_nrm")
    )
    cand = q.join(
        c,
        (F.col("cell") == F.col("c_cell"))
        & (F.col("neighbor_id") != F.col("query_id")),
    ).select("query_id", "neighbor_id", "cell", cos.alias("cos_sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id", "neighbor_id", "cell", "rank",
            F.round("cos_sim", 6).alias("cos_sim"),
        )
    )


# --- scalar quantization -----------------------------------------------------
# int8-style compression of the embedding column: per-dimension global
# [min, max] ranges (one tiny 64-group aggregate), broadcast as two
# 64-element arrays, then a map-only projection quantizes every vector
# to 256 levels.  At 100 TB this cuts ANN-candidate memory 4x and the
# stats side stays a single broadcast row no matter the corpus size.
# Outputs are integer-only (joined string + checksum) so the driver's
# canonicalizer and value-hash are exact.

Q_LEVELS = 256

# shared DuckDB CTE chain ending in quant(vec_id, q BIGINT[]) — reused
# by the k-means oracle (functions/clustering.py)
DUCK_QUANT_CTE = f"""
dims AS (
  SELECT i,
         min(embedding[i + 1]) AS mn,
         max(embedding[i + 1]) AS mx
  FROM embeddings, range({DIM}) t(i)
  GROUP BY i
), stats AS (
  SELECT list(mn ORDER BY i) AS mins, list(mx ORDER BY i) AS maxs FROM dims
), quant AS (
  SELECT vec_id,
         list_transform(range({DIM}),
           i -> CAST(least({Q_LEVELS - 1}, greatest(0,
                  floor((CAST(embedding[i + 1] AS DOUBLE) - CAST(mins[i + 1] AS DOUBLE))
                        / (CAST(maxs[i + 1] AS DOUBLE) - CAST(mins[i + 1] AS DOUBLE))
                        * {Q_LEVELS}.0))) AS BIGINT)) AS q
  FROM embeddings, stats
)"""


def quantized_codes(emb: DataFrame) -> DataFrame:
    """(vec_id, q array<long>): {Q_LEVELS}-level scalar-quantized codes.
    Plan: posexplode -> {DIM}-group partial aggregate -> 1-row stats
    collected into arrays -> broadcast cross join -> map-only codes."""
    dims = (
        emb.select(F.posexplode("embedding").alias("i", "x"))
        .groupBy("i")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    )
    stats = dims.groupBy().agg(
        F.array_sort(F.collect_list(F.struct("i", "mn"))).alias("mins_s"),
        F.array_sort(F.collect_list(F.struct("i", "mx"))).alias("maxs_s"),
    ).select(
        F.transform("mins_s", lambda s: s["mn"]).alias("mins"),
        F.transform("maxs_s", lambda s: s["mx"]).alias("maxs"),
    )
    mins, maxs = F.col("mins"), F.col("maxs")
    q = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda i: F.least(
            F.lit(Q_LEVELS - 1),
            F.greatest(
                F.lit(0),
                F.floor(
                    (
                        F.element_at(F.col("embedding"), i + 1).cast("double")
                        - F.element_at(mins, i + 1).cast("double")
                    )
                    / (
                        F.element_at(maxs, i + 1).cast("double")
                        - F.element_at(mins, i + 1).cast("double")
                    )
                    * float(Q_LEVELS)
                ),
            ),
        ).cast("long"),
    )
    return emb.join(F.broadcast(stats)).select("vec_id", q.alias("q"))


@register(
    "q_ext_quantize",
    oracle="WITH "
    + DUCK_QUANT_CTE
    + """
SELECT vec_id,
       list_aggregate(q, 'string_agg', ',') AS qvec,
       -- BIGINT: DuckDB list_sum over ints is HUGEINT -> pandas
       -- float64, which hash-mismatches Spark's bigint in the driver
       CAST(list_sum(q) AS BIGINT) AS checksum
FROM quant
""",
)
def q_ext_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar quantization of embeddings to {Q_LEVELS} levels with
    per-dimension global ranges.  Plan: posexplode -> 64-group partial
    aggregate -> 1-row stats collected into arrays -> broadcast cross
    join -> map-only quantize.  Both engines fold float32 inputs to
    double before the identical (x-mn)/(mx-mn)*LEVELS floor, so the
    integer codes are exact."""
    prepare(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    return quantized_codes(emb).select(
        "vec_id",
        F.array_join(F.col("q"), ",").alias("qvec"),
        F.aggregate(
            F.col("q"), F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("checksum"),
    )


# --- semantic dedup (SemDeDup) ----------------------------------------------
# Cluster-then-compare semantic deduplication (Abbas et al. 2023,
# "SemDeDup"): k-means-style cells bound the pair search, then exact
# cosine inside each cell marks semantic duplicates; the keeper is the
# lowest vec_id of each pair (the same survivor rule as the text tiers,
# functions/dedup.py).  At 100 TB the pair join is an equi-join on the
# cell id — sum over cells of n_c^2 comparisons instead of n^2, and the
# centroid table stays a broadcast no matter the corpus size.

SEMDEDUP_COS = 0.9  # duplicate threshold (matches NEARDUP_COS)
# Above this many DISTINCT vectors the within-cell pair join switches
# from the pure-JVM fold join (n_c^2 per cell through Catalyst's
# interpreted higher-order aggregate — quadratic once cell count
# stops growing; the r7 sf1 pricing measured x26 wall time at x10
# rows with the 10 fixed label cells) to the blocked numpy-margin
# path (_blocked_cell_pairs): dgemm cosines over block pairs with a
# 1e-6 decision margin, grey-zone pairs re-verified by the exact JVM
# fold — EXACT at every scale, unlike the r7-r10 banded-LSH candidate
# generator it replaces (recall 0.996, and a very-near-dup-dense
# corpus collided each true pair in ~27 bands before the distinct;
# the r10 x100 pricing measured x23.95 wall mostly in that shuffle).
# The rung is counted over the MULTIPLICITY-GROUPED representatives
# (r11: byte-identical vectors collapse to one rep before any pair
# join — their pairs are pure arithmetic), so every gate-scale corpus
# (<= 4000 distinct vectors) takes the zero-Python path bit-for-bit.
SEMDEDUP_EXACT_MAX = 4_000
# reps per brute-force block: one applyInPandas task multiplies a
# <=1024x64 block against a <=1024x64 block (131 MFLOP of dgemm, ~ms)
SEMDEDUP_BLOCK = 1_024
# numpy (pairwise-summation) and the sequential JVM/DuckDB fold of a
# 64-term float64 dot product agree to ~1e-11 relative; any pair
# whose numpy cosine is further than this from the threshold is
# decided identically by both, and the handful inside the margin go
# through the exact fold — so the blocked path's output is
# bit-identical to fold-everywhere on ANY corpus.
SEMDEDUP_MARGIN = 1e-6


def _blocked_cell_pairs(groups: DataFrame, threshold: float) -> DataFrame:
    """(cell, keep_gid, dup_gid, m_a, m_b) for every within-cell rep
    pair with cosine >= `threshold`, computed by blocked brute force:

    reps get a hash block id within their cell (ceil(n_c / BLOCK)
    blocks), every unordered block pair (bi <= bj) becomes ONE
    applyInPandas group holding both blocks' rows, and the kernel
    emits pairs from a dgemm cosine matrix.  Each rep ships ~n_blocks
    copies (N * n_c / BLOCK rows total — the same quadratic-in-cell
    law as the compute, /1024), and each unordered pair lands in
    exactly one group, so no distinct is needed.  Pairs inside the
    SEMDEDUP_MARGIN grey zone are re-verified with the exact JVM fold
    (same expression the oracle replays), keeping the result
    bit-identical to fold-everywhere; pairs outside it are provably
    decided the same way by numpy and the fold (see SEMDEDUP_MARGIN).
    NaN cosines (zero vectors) fail every compare in both kernels."""
    thr, margin = float(threshold), SEMDEDUP_MARGIN
    sizes = groups.groupBy("cell").agg(F.count("*").alias("cn"))
    slim = (
        groups.join(F.broadcast(sizes), "cell")
        .withColumn(
            "nb",
            F.ceil(F.col("cn") / F.lit(SEMDEDUP_BLOCK)).cast("int"),
        )
        .withColumn(
            "blk", F.pmod(F.xxhash64("gid"), F.col("nb")).cast("int")
        )
        .select("cell", "gid", "m", "embedding", "nrm", "nb", "blk")
    )
    a_side = slim.select(
        "cell",
        F.col("blk").alias("bi"),
        F.explode(F.expr("sequence(blk, nb - 1)")).alias("bj"),
        F.lit(0).alias("side"),
        "gid",
        "m",
        "embedding",
        "nrm",
    )
    b_side = slim.filter(F.col("blk") > 0).select(
        "cell",
        F.explode(F.expr("sequence(0, blk - 1)")).alias("bi"),
        F.col("blk").alias("bj"),
        F.lit(1).alias("side"),
        "gid",
        "m",
        "embedding",
        "nrm",
    )

    empty = pd.DataFrame(
        {
            "cell": np.array([], dtype=np.int64),
            "keep_gid": np.array([], dtype=np.int64),
            "dup_gid": np.array([], dtype=np.int64),
            "m_a": np.array([], dtype=np.int64),
            "m_b": np.array([], dtype=np.int64),
            "grey": np.array([], dtype=bool),
        }
    )

    def verify(pdf: pd.DataFrame) -> pd.DataFrame:
        a = pdf[pdf["side"] == 0]
        b = pdf[pdf["side"] == 1]
        # diagonal by KEY, never by emptiness: a hash-empty block on
        # either side leaves a one-sided group, and treating it as
        # diagonal would re-emit the other block's internal pairs
        # (double count); np.stack would throw on the empty side
        diagonal = pdf["bi"].iloc[0] == pdf["bj"].iloc[0]
        if len(a) == 0 or (not diagonal and len(b) == 0):
            return empty
        if diagonal:
            b = a
        ea = np.stack(a["embedding"].to_numpy()).astype(np.float64)
        eb = np.stack(b["embedding"].to_numpy()).astype(np.float64)
        ga = a["gid"].to_numpy()
        gb = b["gid"].to_numpy()
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = (ea @ eb.T) / np.outer(
                a["nrm"].to_numpy(), b["nrm"].to_numpy()
            )
        with np.errstate(invalid="ignore"):
            hit = cos >= thr - margin
        if diagonal:
            # one triangle only; orientation fixed below by gid
            hit &= ga[:, None] < gb[None, :]
        ii, jj = np.nonzero(hit)
        cs = cos[ii, jj]
        ka, kb = ga[ii], gb[jj]
        return pd.DataFrame(
            {
                "cell": pdf["cell"].iloc[0],
                "keep_gid": np.minimum(ka, kb),
                "dup_gid": np.maximum(ka, kb),
                "m_a": a["m"].to_numpy()[ii],
                "m_b": b["m"].to_numpy()[jj],
                "grey": np.abs(cs - thr) <= margin,
            }
        )

    return (
        a_side.unionByName(b_side)
        .groupBy("cell", "bi", "bj")
        .applyInPandas(
            verify,
            "cell bigint, keep_gid bigint, dup_gid bigint, "
            "m_a bigint, m_b bigint, grey boolean",
        )
    )

_DUCK_COS_AB = (
    f"({duck_dot('a.embedding', 'b.embedding')} / "
    f"(sqrt({duck_dot('a.embedding', 'a.embedding')}) * "
    f"sqrt({duck_dot('b.embedding', 'b.embedding')})))"
)


@register(
    "q_ext_semdedup",
    oracle="WITH "
    + _DUCK_CENTROIDS
    + f""",
assigned AS (
  SELECT e.vec_id, e.embedding, cv.label AS cell,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY {_DUCK_DOT_VC} / ({_DUCK_NORM_V} * {_DUCK_NORM_C}) DESC,
                    cv.label) AS rn
  FROM embeddings e CROSS JOIN centroid_vecs cv
),
cells AS (SELECT vec_id, embedding, cell FROM assigned WHERE rn = 1),
pairs AS (
  SELECT a.cell, a.vec_id AS keep_id, b.vec_id AS dup_id
  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE {_DUCK_COS_AB} >= {SEMDEDUP_COS}
),
cell_stats AS (SELECT cell, count(*) AS n_vectors FROM cells GROUP BY cell),
pair_stats AS (
  SELECT cell, count(*) AS n_pairs, count(DISTINCT dup_id) AS n_removed
  FROM pairs GROUP BY cell
)
SELECT cs.cell,
       cs.n_vectors,
       CAST(coalesce(ps.n_pairs, 0) AS BIGINT) AS n_pairs,
       CAST(coalesce(ps.n_removed, 0) AS BIGINT) AS n_removed,
       CAST(cs.n_vectors - coalesce(ps.n_removed, 0) AS BIGINT) AS n_survivors
FROM cell_stats cs LEFT JOIN pair_stats ps USING (cell)
""",
)
def q_ext_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup accounting per cluster cell: vectors, duplicate
    pairs (cosine >= {SEMDEDUP_COS} within the cell), vectors removed
    (higher vec_id of any pair), and survivors.

    Plan (r11, VERDICT r10 item 2): broadcast K-row centroids ->
    map-only nearest-cell argmin (reusing q_ext_ann_ivf's assignment)
    -> MULTIPLICITY GROUPING: byte-identical embeddings collapse to
    one representative per (cell, vector) with (m copies, sorted
    member ids) — identical vectors always land in the same cell, so
    this is lossless -> PERSISTED rep table -> cell-keyed rep
    self-join (never all-pairs, and never over copies) -> pair and
    removal counts recovered arithmetically:

      * within a rep group all C(m,2) member pairs share ONE cosine
        (the self-cosine, same fold as any pair) — count them without
        materializing;
      * a qualifying rep pair (a, b) contributes m_a * m_b member
        pairs;
      * member v is removed iff a qualifying neighbour with a smaller
        id exists: any non-minimal member of a self-qualifying group,
        plus members above the smallest adjacent rep id (adj_min) —
        an O(groups) fold over the sorted id lists, no member joins.

    The oracle replays the identical fold-ordered float math over raw
    member pairs in DuckDB; both formulations count the same set, so
    the result is bit-identical on ANY corpus.  On the x100 replica
    corpus this turns the 200k-row within-cell join into a 2k-rep one
    (r10 pricing: x23.95 wall at x100 rows; see SCALING.md r11).

    Above SEMDEDUP_EXACT_MAX DISTINCT vectors the rep pair join
    switches to the blocked numpy-margin brute force
    (_blocked_cell_pairs) — still EXACT: pairs more than 1e-6 from
    the threshold are provably decided identically by dgemm and the
    fold, and the grey sliver re-runs the gate path's JVM fold.  This
    replaced the r7-r10 banded-LSH candidate generator (recall 0.996,
    and ~27 redundant band collisions per true pair on a
    near-dup-dense corpus — the r10 x23.95 pricing outlier), so the
    scale path no longer loses pairs; tools/check_oracle.py still
    verifies large corpora against precomputed exact fixtures because
    the DUCKDB side's n^2 join is what stops scaling, not this
    plan."""
    prepare(spark)
    cells = assign_cells(spark, sf_dir)
    # one representative per distinct (cell, vector); persisted: the
    # rep self-join below would otherwise re-run the grouping twice
    groups = (
        cells.groupBy("cell", "embedding")
        .agg(
            F.min("vec_id").alias("gid"),
            F.count("*").cast("long").alias("m"),
            F.sort_array(F.collect_list("vec_id")).alias("ids"),
        )
        .withColumn("nrm", norm(F.col("embedding")))
        .persist()
    )
    # the rep count picks the code path AND materializes the persist
    # exactly once (both downstream consumers then hit the cache)
    n_rep = groups.count()
    a = groups.select(
        F.col("cell"),
        F.col("gid").alias("keep_gid"),
        F.col("m").alias("m_a"),
        F.col("embedding").alias("a_emb"),
        F.col("nrm").alias("a_nrm"),
    )
    b = groups.select(
        F.col("cell").alias("b_cell"),
        F.col("gid").alias("dup_gid"),
        F.col("m").alias("m_b"),
        F.col("embedding").alias("b_emb"),
        F.col("nrm").alias("b_nrm"),
    )
    cos_ab = dot(F.col("a_emb"), F.col("b_emb")) / (
        F.col("a_nrm") * F.col("b_nrm")
    )
    if n_rep <= SEMDEDUP_EXACT_MAX:
        # gate-scale path: zero-Python within-cell fold join
        qpairs = (
            a.join(
                b,
                (F.col("cell") == F.col("b_cell"))
                & (F.col("keep_gid") < F.col("dup_gid")),
            )
            .filter(cos_ab >= F.lit(SEMDEDUP_COS))
            .select("cell", "keep_gid", "dup_gid", "m_a", "m_b")
        )
    else:
        # scale path: blocked numpy-margin brute force within cells
        # (exact — see _blocked_cell_pairs); the grey sliver inside
        # the margin re-runs the same JVM fold the gate path uses
        blocked = _blocked_cell_pairs(groups, SEMDEDUP_COS)
        ge = groups.select("gid", "embedding", "nrm")
        grey_ok = (
            blocked.filter(F.col("grey"))
            .join(
                ge.select(
                    F.col("gid").alias("keep_gid"),
                    F.col("embedding").alias("a_emb"),
                    F.col("nrm").alias("a_nrm"),
                ),
                "keep_gid",
            )
            .join(
                ge.select(
                    F.col("gid").alias("dup_gid"),
                    F.col("embedding").alias("b_emb"),
                    F.col("nrm").alias("b_nrm"),
                ),
                "dup_gid",
            )
            .filter(cos_ab >= F.lit(SEMDEDUP_COS))
            .select("cell", "keep_gid", "dup_gid", "m_a", "m_b")
        )
        qpairs = (
            blocked.filter(~F.col("grey"))
            .select("cell", "keep_gid", "dup_gid", "m_a", "m_b")
            .unionByName(grey_ok)
        )
    # member pairs contributed by qualifying cross-group rep pairs
    cross = qpairs.groupBy("cell").agg(
        F.sum(F.col("m_a") * F.col("m_b")).cast("long").alias("cross_pairs")
    )
    # smallest adjacent rep id per group (both directions of each pair)
    adj = (
        qpairs.select(
            F.col("keep_gid").alias("gid"), F.col("dup_gid").alias("other")
        )
        .union(
            qpairs.select(
                F.col("dup_gid").alias("gid"),
                F.col("keep_gid").alias("other"),
            )
        )
        .groupBy("gid")
        .agg(F.min("other").alias("adj_min"))
    )
    # self-cosine: the one cosine every within-group member pair
    # shares — same fold as the pair path, so a zero vector (NaN)
    # disqualifies its group's internal pairs in both engines
    self_q = (
        dot(F.col("embedding"), F.col("embedding"))
        / (F.col("nrm") * F.col("nrm"))
    ) >= F.lit(SEMDEDUP_COS)
    gstats = groups.join(adj, "gid", "left").select(
        "cell",
        "gid",
        "m",
        "ids",
        "adj_min",
        self_q.alias("self_q"),
    )
    # member v removed iff some qualifying neighbour has a smaller id:
    # self-qualifying groups remove every non-minimal member (plus the
    # minimum when a smaller adjacent rep exists); otherwise only
    # members above adj_min fall (filter() drops elements whose
    # predicate is NULL, so no adjacency -> 0 removed)
    removed = F.when(
        F.col("self_q"),
        (F.col("m") - 1)
        + F.when(F.col("adj_min") < F.col("gid"), 1).otherwise(0),
    ).otherwise(
        F.coalesce(
            F.size(F.filter(F.col("ids"), lambda v: v > F.col("adj_min"))),
            F.lit(0),
        )
    )
    within = F.when(
        F.col("self_q"), F.expr("(m * (m - 1)) div 2")
    ).otherwise(F.lit(0))
    per_cell = gstats.groupBy("cell").agg(
        F.sum("m").cast("long").alias("n_vectors"),
        F.sum(within).cast("long").alias("within_pairs"),
        F.sum(removed).cast("long").alias("n_removed"),
    )
    return per_cell.join(cross, "cell", "left").select(
        "cell",
        "n_vectors",
        (
            F.col("within_pairs")
            + F.coalesce(F.col("cross_pairs"), F.lit(0))
        )
        .cast("long")
        .alias("n_pairs"),
        F.col("n_removed").cast("long").alias("n_removed"),
        (F.col("n_vectors") - F.col("n_removed"))
        .cast("long")
        .alias("n_survivors"),
    )


# --- per-dimension embedding profile ----------------------------------------
# The QA step before whitening / quantization / ANN indexing: per-dim
# mean, population std, and range over the whole corpus.  A dead
# dimension (std ~ 0) or a runaway one (range >> others) breaks
# distance metrics silently; this is the 64-row report that catches it.
# Sums run in exact decimal (order-independent, bit-identical across
# partial-agg schedules and engines), like `centroids()`.


@register(
    "q_ext_embed_dim_profile",
    oracle=f"""
WITH exploded AS (
  SELECT d, CAST(embedding[d + 1] AS DOUBLE) AS v,
         CAST(embedding[d + 1] AS DECIMAL(18,9)) AS vd
  FROM embeddings, LATERAL (SELECT unnest(range({DIM})) AS d) t
)
SELECT CAST(d AS BIGINT) AS dim,
       count(*) AS n,
       round(CAST(sum(vd) AS DOUBLE) / count(*), 6) AS mean,
       round(sqrt(greatest(
         CAST(sum(vd * vd) AS DOUBLE) / count(*)
         - (CAST(sum(vd) AS DOUBLE) / count(*))
           * (CAST(sum(vd) AS DOUBLE) / count(*)), 0)), 6) AS std,
       round(min(v), 6) AS min_v,
       round(max(v), 6) AS max_v
FROM exploded GROUP BY d
""",
)
def q_ext_embed_dim_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension corpus profile of the embedding column: mean,
    population std (from exact-decimal component sums), min, max — the
    {DIM}-row diagnostic run before any whitening, quantization
    (q_ext_quantize uses the same ranges), or index build.

    Plan: posexplode -> ONE {DIM}-group partial-aggregated pass; output
    is dimension-bounded regardless of corpus size.  The decimal sums
    make mean/std bit-identical across engines and partial-agg
    schedules; the E[x^2]-E[x]^2 cancellation is guarded by greatest(0)
    in both engines."""
    prepare(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(F.posexplode("embedding").alias("d", "v_raw")).select(
        "d",
        F.col("v_raw").cast("double").alias("v"),
        F.col("v_raw").cast("decimal(18,9)").alias("vd"),
    )
    n = F.count("*")
    sx = F.sum("vd").cast("double")
    sxx = F.sum(F.col("vd") * F.col("vd")).cast("double")
    mean = sx / n
    var = F.greatest(sxx / n - mean * mean, F.lit(0.0))
    return ex.groupBy(F.col("d").cast("long").alias("dim")).agg(
        n.alias("n"),
        F.round(mean, 6).alias("mean"),
        F.round(F.sqrt(var), 6).alias("std"),
        F.round(F.min("v"), 6).alias("min_v"),
        F.round(F.max("v"), 6).alias("max_v"),
    )


# --- per-label centroid geometry ---------------------------------------------


@register(
    "q_ext_label_centroids",
    oracle=f"""
WITH exploded AS (
  SELECT label, d, CAST(embedding[d + 1] AS DECIMAL(18,9)) AS vd
  FROM embeddings, LATERAL (SELECT unnest(range({DIM})) AS d) t
),
cells AS (
  SELECT label, d, sum(vd) AS sd, CAST(sum(vd) AS DOUBLE) AS s,
         count(*) AS n_l
  FROM exploded GROUP BY label, d
),
gctr AS (
  -- exact decimal partials re-aggregate associatively, so the global
  -- mean is bit-identical however the labels partition the sum
  SELECT d, CAST(sum(sd) AS DOUBLE) / CAST(sum(n_l) AS BIGINT) AS g
  FROM cells GROUP BY d
),
per AS (
  SELECT c.label,
         CAST(max(c.n_l) AS BIGINT) AS n_vecs,
         sum((c.s / c.n_l) * (c.s / c.n_l)) AS norm2,
         sum((c.s / c.n_l - g.g) * (c.s / c.n_l - g.g)) AS d2
  FROM cells c JOIN gctr g ON c.d = g.d
  GROUP BY c.label
)
SELECT CAST(label AS BIGINT) AS label, n_vecs,
       round(sqrt(norm2), 6) AS centroid_norm,
       round(sqrt(d2), 6) AS dist_to_global
FROM per
""",
)
def q_ext_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid geometry: each label's mean embedding norm
    and its distance to the global centroid — the class-separation
    diagnostic read before trusting labels for stratified sampling or
    a classifier probe (labels whose centroids collapse onto the
    global mean carry no signal; far-out centroids flag label leakage
    or batch effects).

    Plan: ONE posexplode pass partial-aggregated to (label, dim) cells
    (exact decimal component sums, the embed_dim_profile discipline);
    the global centroid is the dims-bounded rollup of the same cells,
    broadcast back; everything after the first aggregate is bounded by
    labels x dims, independent of corpus size."""
    prepare(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label", F.posexplode("embedding").alias("d", "v_raw")
    ).select(
        "label", "d", F.col("v_raw").cast("decimal(18,9)").alias("vd")
    )
    cells = ex.groupBy("label", "d").agg(
        F.sum("vd").alias("sd"),
        F.sum("vd").cast("double").alias("s"),
        F.count("*").alias("n_l"),
    )
    glob = cells.groupBy("d").agg(
        (F.sum("sd").cast("double") / F.sum("n_l")).alias("g")
    )
    m = F.col("s") / F.col("n_l")
    per = (
        cells.join(F.broadcast(glob), "d")
        .groupBy("label")
        .agg(
            F.max("n_l").cast("long").alias("n_vecs"),
            F.sum(m * m).alias("norm2"),
            F.sum((m - F.col("g")) * (m - F.col("g"))).alias("d2"),
        )
    )
    return per.select(
        F.col("label").cast("long").alias("label"),
        "n_vecs",
        F.round(F.sqrt("norm2"), 6).alias("centroid_norm"),
        F.round(F.sqrt("d2"), 6).alias("dist_to_global"),
    )


# --- vector-norm outliers ----------------------------------------------------


@register(
    "q_ext_norm_outliers",
    oracle="""
WITH norms AS (
  -- EXACT integer norm^2 on a 1e-6 component grid: the float dot
  -- differed by an ulp between the engines' list folds (FMA
  -- contraction) and one perturbed sf10 vector sat exactly on a 9-dp
  -- round boundary.  Quantized components square and sum exactly
  -- (|c| <= ~5e5, 64 dims -> << int64), so sqrt sees identical
  -- doubles.  Widths: c^2 <= 2.5e11 x 64 = 1.6e13.
  SELECT vec_id,
         CAST(round(sqrt(CAST(list_sum(list_transform(embedding,
                x -> CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)
                     * CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)))
              AS DOUBLE)) / 1000000.0, 9)
              AS DECIMAL(18,9)) AS nrm
  FROM embeddings
),
stats AS (
  -- decimal norms sum exactly, so mean/std are schedule-independent
  SELECT CAST(sum(nrm) AS DOUBLE) / count(*) AS mu,
         sqrt(greatest(
           CAST(sum(nrm * nrm) AS DOUBLE) / count(*)
           - (CAST(sum(nrm) AS DOUBLE) / count(*))
             * (CAST(sum(nrm) AS DOUBLE) / count(*)), 0)) AS sd
  FROM norms
)
SELECT n.vec_id,
       round(CAST(n.nrm AS DOUBLE), 6) AS nrm,
       round((CAST(n.nrm AS DOUBLE) - s.mu) / nullif(s.sd, 0), 6) AS z,
       CASE WHEN abs((CAST(n.nrm AS DOUBLE) - s.mu) / nullif(s.sd, 0)) > 3
            THEN 1 ELSE 0 END AS is_outlier
FROM norms n CROSS JOIN stats s
""",
)
def q_ext_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-norm z-scores and 3-sigma outlier flags: truncated or
    corrupt vectors land near zero norm, doubled/unnormalized batches
    far above — the 30-second sanity check before any cosine-based
    operator (a degenerate norm poisons every similarity it touches).

    Plan: map-only EXACT-integer norms (components quantized to a
    1e-6 grid, squared and summed in int64 — both engines sqrt the
    identical double; the float fold differed by an FMA ulp at the
    sf10 drill), rounded to 9 dp and summed as exact decimals so
    mean/std are partial-agg-schedule independent; the 1-row stats
    table attaches by broadcast — corpus-sized work is one projection
    + one combinable aggregate."""
    prepare(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    qcomp = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * 1000000, 0).cast("long"),
    )
    norm2 = F.aggregate(
        qcomp,
        F.lit(0).cast("long"),
        lambda acc, c: acc + c * c,
    )
    norms = emb.select(
        "vec_id",
        F.round(F.sqrt(norm2.cast("double")) / 1000000.0, 9)
        .cast("decimal(18,9)")
        .alias("nrm"),
    )
    n = F.count("*")
    s1 = F.sum("nrm").cast("double")
    s2 = F.sum(F.col("nrm") * F.col("nrm")).cast("double")
    mu = s1 / n
    stats = norms.agg(
        mu.alias("mu"),
        F.sqrt(F.greatest(s2 / n - mu * mu, F.lit(0.0))).alias("sd"),
    )
    z = (F.col("nrm").cast("double") - F.col("mu")) / F.expr(
        "nullif(sd, 0.0)"
    )
    return norms.crossJoin(F.broadcast(stats)).select(
        "vec_id",
        F.round(F.col("nrm").cast("double"), 6).alias("nrm"),
        F.round(z, 6).alias("z"),
        F.when(F.abs(z) > 3, 1).otherwise(0).alias("is_outlier"),
    )


# --- cosine-distribution calibration -----------------------------------------

CALIB_SAMPLE = 100  # vectors in the calibration sample (pairs = n(n-1)/2)
CALIB_BIN_W = 0.05  # histogram bin width over [-1, 1]


@register(
    "q_ext_cosine_calib",
    oracle=f"""
WITH pairs AS (
  SELECT round({_DUCK_COS}, 9) AS cos_sim
  FROM embeddings q JOIN embeddings c
    ON q.vec_id < c.vec_id AND c.vec_id < {CALIB_SAMPLE}
),
binned AS (
  SELECT least(greatest(CAST(floor((cos_sim + 1.0) / {CALIB_BIN_W})
                             AS BIGINT), 0),
               CAST(2.0 / {CALIB_BIN_W} AS BIGINT) - 1) AS bin
  FROM pairs
)
SELECT bin,
       -- CAST: DuckDB parses the literal as DECIMAL and would return a
       -- decimal bin_lo -> pandas object, hash-mismatching Spark's double
       round(CAST(-1.0 + bin * {CALIB_BIN_W} AS DOUBLE), 6) AS bin_lo,
       count(*) AS n_pairs,
       round(count(*) / CAST(sum(count(*)) OVER () AS DOUBLE), 6)
         AS frac
FROM binned GROUP BY bin
""",
)
def q_ext_cosine_calib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of pairwise cosine over a fixed {CALIB_SAMPLE}-vector
    sample — the background-similarity distribution a near-dup or
    semdedup threshold must clear (a 0.9 cutoff means nothing until
    you know where random pairs of YOUR corpus sit).

    Plan: the pair join is bounded by the sample constant
    ({CALIB_SAMPLE}^2/2 pairs, never corpus-sized — the sample side is
    a broadcast); cosines use the engine's sequential-fold dot (rounded
    to 9 dp before binning so the bin edge cannot flip between
    engines); output is bins-bounded with a share window over the tiny
    histogram."""
    prepare(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    sample = emb.filter(F.col("vec_id") < CALIB_SAMPLE).select(
        "vec_id", "embedding", norm(F.col("embedding")).alias("nrm")
    )
    a = sample.select(
        F.col("vec_id").alias("ida"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = sample.select(
        F.col("vec_id").alias("idb"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    cos = F.round(
        dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 9
    )
    n_bins = int(2.0 / CALIB_BIN_W)
    bin_col = F.least(
        F.greatest(
            F.floor((cos + 1.0) / CALIB_BIN_W).cast("long"), F.lit(0)
        ),
        F.lit(n_bins - 1),
    )
    pairs = a.join(F.broadcast(b), F.col("ida") < F.col("idb")).select(
        bin_col.alias("bin")
    )
    w = Window.partitionBy()
    return (
        pairs.groupBy("bin")
        .agg(F.count("*").alias("n_pairs"))
        .select(
            "bin",
            F.round(-1.0 + F.col("bin") * CALIB_BIN_W, 6).alias("bin_lo"),
            "n_pairs",
            F.round(
                F.col("n_pairs")
                / F.sum("n_pairs").over(w).cast("double"),
                6,
            ).alias("frac"),
        )
    )


@register(
    "q_ext_knn_filtered",
    oracle=f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label,
         {_DUCK_COS} AS cos_sim
  FROM embeddings q JOIN embeddings c ON q.vec_id < {N_QUERY}
   AND c.vec_id != q.vec_id AND c.label = q.label
), ranked AS (
  SELECT query_id, neighbor_id, label, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, label, rank, round(cos_sim, 6) AS cos_sim
FROM ranked WHERE rank <= {TOP_K}
""",
)
def q_ext_knn_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED vector search: top-k cosine neighbors restricted to the
    query's own label — the metadata-predicate ANN pattern every
    production vector store serves (and the positive-pair miner for
    contrastive training).  The filter composes INTO the candidate
    join (label equi-key tightens it), not as a post-k filter — a
    post-filter would return fewer than k survivors.

    Plan: the q_ext_cosine_knn shape with the label added to the join
    condition: broadcast queries, per-partition scoring of only
    same-label candidates, windowed top-k per query."""
    prepare(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    q = F.broadcast(
        emb.filter(F.col("vec_id") < N_QUERY).select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("q_label"),
            F.col("embedding").alias("q_emb"),
            norm(F.col("embedding")).alias("q_nrm"),
        )
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        "label",
        F.col("embedding").alias("c_emb"),
        norm(F.col("embedding")).alias("c_nrm"),
    )
    cos = dot(F.col("q_emb"), F.col("c_emb")) / (
        F.col("q_nrm") * F.col("c_nrm")
    )
    scored = c.join(
        q,
        (F.col("neighbor_id") != F.col("query_id"))
        & (F.col("label") == F.col("q_label")),
    ).select("query_id", "neighbor_id", "label", cos.alias("cos_sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "label",
            "rank",
            F.round("cos_sim", 6).alias("cos_sim"),
        )
    )


# --- cross-dimension covariance screen ---------------------------------------

COV_TOP_PAIRS = 20
COV_SCALE = 1_000_000  # floor-quantization step: 1e-6 resolution


GRAM_PARTIALS_SCHEMA = "dim_i int, dim_j int, v long"


def gram_partials(batches):
    """Per-partition covariance partials: ONE int64 Gram mat-mul over
    the partition's floor-quantized vectors, emitted as a constant
    DIM*(DIM-1)/2 + DIM + 1 rows — upper-triangle products, per-dim
    sums, and the row count.  Module-level (not a closure) so the
    shuffle-volume contract is testable in isolation
    (tests/test_scaling.py)."""
    import numpy as np
    import pandas as pd

    g = np.zeros((DIM, DIM), dtype=np.int64)
    s1 = np.zeros(DIM, dtype=np.int64)
    n = 0
    for pdf in batches:
        if not len(pdf):
            continue
        x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        q = np.floor(x * COV_SCALE).astype(np.int64)
        g += q.T @ q
        s1 += q.sum(axis=0)
        n += q.shape[0]
    iu, ju = np.triu_indices(DIM, k=1)
    yield pd.DataFrame(
        {
            "dim_i": np.concatenate([iu, np.arange(DIM), [-1]]),
            "dim_j": np.concatenate([ju, np.full(DIM, -1), [-1]]),
            "v": np.concatenate([g[iu, ju], s1, [n]]),
        }
    )


@register(
    "q_ext_embed_covariance",
    oracle=f"""
WITH ex AS (
  -- floor() (not round): identical to-negative-infinity semantics in
  -- both engines, so the quantized integers match bit-for-bit
  SELECT vec_id, d,
         CAST(floor(CAST(embedding[d + 1] AS DOUBLE) * {COV_SCALE})
              AS BIGINT) AS qv
  FROM embeddings, LATERAL (SELECT unnest(range({DIM})) AS d) t
), s1 AS (
  SELECT d, CAST(sum(qv) AS BIGINT) AS sx, count(*) AS n FROM ex GROUP BY d
), s12 AS (
  SELECT a.d AS dim_i, b.d AS dim_j,
         CAST(sum(a.qv * b.qv) AS BIGINT) AS sxy
  FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.d < b.d
  GROUP BY a.d, b.d
), cov AS (
  SELECT CAST(dim_i AS BIGINT) AS dim_i, CAST(dim_j AS BIGINT) AS dim_j,
         si.n AS n,
         (CAST(sxy AS DOUBLE) / CAST(si.n AS DOUBLE)
          - (CAST(si.sx AS DOUBLE) / CAST(si.n AS DOUBLE))
            * (CAST(sj.sx AS DOUBLE) / CAST(sj.n AS DOUBLE)))
         / {float(COV_SCALE * COV_SCALE)} AS cov
  FROM s12
  JOIN s1 si ON si.d = dim_i
  JOIN s1 sj ON sj.d = dim_j
)
SELECT dim_i, dim_j, n, round(cov, 6) AS cov
FROM cov
ORDER BY abs(cov) DESC, dim_i, dim_j
LIMIT {COV_TOP_PAIRS}
""",
)
def q_ext_embed_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{COV_TOP_PAIRS} most-correlated embedding dimension pairs by
    |covariance| — the redundancy screen run before PCA/whitening or
    product quantization (two dimensions that co-vary strongly waste
    index bits and distort IVF cells).  Values are floor-quantized at
    {COV_SCALE}^-1 resolution so every sum is exact integer arithmetic
    — bit-identical across engines, partition schedules, and reruns (a
    float Gram matrix would drift with partition order).

    Plan: the textbook distributed covariance — each partition computes
    its LOCAL Gram matrix Q^T.Q with one numpy int64 mat-mul (an
    Arrow-batched `mapInPandas` kernel; 2016 interpreted Catalyst
    decimal products per row lose to one BLAS-shaped mat-mul by ~100x,
    the q_ext_embed_neardup precedent), emitting a constant 2081
    partial rows per partition; ONE {DIM}^2-bounded aggregate (partials
    upcast to DECIMAL(38,0) so even 10^6 partitions cannot overflow)
    then the constant-size top-k.  No self-join, no corpus-sized
    shuffle: the only data crossing the wire is partitions x 2081 longs.
    Per-partition exactness bound: |qv| <= {COV_SCALE}/2, so a partition
    of r rows sums to < r * {COV_SCALE}^2 / 4 — int64-safe to ~10^8 rows
    per partition, 100x above a 128 MB split."""
    prepare(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    partials = emb.select("embedding").mapInPandas(
        gram_partials, schema=GRAM_PARTIALS_SCHEMA
    )
    tot = partials.groupBy("dim_i", "dim_j").agg(
        F.sum(F.col("v").cast("decimal(38,0)")).alias("v")
    )
    # Finish: the aggregated frame is a CONSTANT 2081 rows, so the
    # whole covariance arithmetic collapses into one singleton-row
    # higher-order-function projection — no joins.  (The r7 form
    # routed it through three broadcast joins + a crossJoin; at bench
    # scale each broadcast build is its own Spark job, and ~0.45 s of
    # the query's 0.85 s was pure job-scheduling overhead on a
    # 2016-row frame — the q_ext_embed_covariance bench regression,
    # VERDICT r8 item 1.  At cluster scale the joins were free; the
    # HOF finish is free at every scale.)  Identical double
    # arithmetic, so values are bit-for-bit unchanged.
    one = tot.agg(
        F.collect_list(F.struct("dim_i", "dim_j", "v")).alias("cells")
    )
    cells = F.col("cells")
    n_dec = F.element_at(
        F.filter(cells, lambda x: x.getField("dim_i") == -1), 1
    ).getField("v")
    s_map = F.map_from_entries(
        F.transform(
            F.filter(
                cells,
                lambda x: (x.getField("dim_i") >= 0)
                & (x.getField("dim_j") == -1),
            ),
            lambda x: F.struct(
                x.getField("dim_i").alias("k"), x.getField("v").alias("v")
            ),
        )
    )
    finished = one.select(
        F.filter(cells, lambda x: x.getField("dim_j") >= 0).alias("pairs"),
        n_dec.cast("double").alias("n_d"),
        n_dec.cast("long").alias("n"),
        s_map.alias("s"),
    )

    def pair_cov(x):
        sx_i = F.element_at(F.col("s"), x.getField("dim_i"))
        sx_j = F.element_at(F.col("s"), x.getField("dim_j"))
        return (
            x.getField("v").cast("double") / F.col("n_d")
            - (sx_i.cast("double") / F.col("n_d"))
            * (sx_j.cast("double") / F.col("n_d"))
        ) / float(COV_SCALE * COV_SCALE)

    scored = finished.select(
        "n",
        F.explode(
            F.transform(
                F.col("pairs"),
                lambda x: F.struct(
                    x.getField("dim_i").cast("long").alias("dim_i"),
                    x.getField("dim_j").cast("long").alias("dim_j"),
                    pair_cov(x).alias("cov"),
                ),
            )
        ).alias("p"),
    )
    return (
        scored.select("p.dim_i", "p.dim_j", "n", "p.cov")
        .orderBy(F.abs("cov").desc(), "dim_i", "dim_j")
        .limit(COV_TOP_PAIRS)
        .select("dim_i", "dim_j", "n", F.round("cov", 6).alias("cov"))
    )


# --- product-quantization-style ANN over int8 codes --------------------------
# The 4x-memory-cut search actually run at 100 TB: IVF cells bound the
# candidate set (nprobe=1, same coarse quantizer as q_ext_ann_ivf) and
# the rerank inside the cell runs on the 256-level scalar-quantized
# codes from q_ext_quantize — the float vectors never enter the search.
# The gate is recall@k of the code-space ranking against the
# full-precision ranking over the SAME candidate set, isolating the
# quantization cost from the (separately gated, q_ext_ann_recall) cell
# coverage.  Code dots are exact: products and running sums stay
# integer-valued (< 64 * 255^2 ~ 4.2e6, far inside double's 2^53), so
# both engines rank identically regardless of fold schedule and the
# recall flag is hash-verifiable, not probabilistic.

# Floor on the MEAN recall across queries, pinned as a literal TRUE in
# the oracle (like the sketch gates): per-query recall is quantized to
# multiples of 1/k and noisy on isotropic data (observed per-query min
# 0.4 at sf0.01), but the 20-query mean (observed 0.80) is stable —
# a quantizer regression drops it and breaks the hash against TRUE.
PQ_RECALL_FLOOR = 0.5


@register(
    "q_ext_ann_pq",
    oracle="WITH "
    + _DUCK_CENTROIDS
    + ","
    + DUCK_QUANT_CTE
    + f""",
assigned AS (
  SELECT e.vec_id, e.embedding, cv.label AS cell,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY {_DUCK_DOT_VC} / ({_DUCK_NORM_V} * {_DUCK_NORM_C}) DESC,
                    cv.label) AS rn
  FROM embeddings e CROSS JOIN centroid_vecs cv
),
cells AS (SELECT vec_id, embedding, cell FROM assigned WHERE rn = 1),
cand AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_DUCK_COS} AS exact_cos
  FROM cells q JOIN cells c
    ON q.cell = c.cell AND q.vec_id < {N_QUERY} AND c.vec_id != q.vec_id
),
codecand AS (
  SELECT cand.query_id, cand.neighbor_id, cand.exact_cos,
         {duck_dot('qa.q', 'qb.q')}
           / (sqrt({duck_dot('qa.q', 'qa.q')})
              * sqrt({duck_dot('qb.q', 'qb.q')})) AS code_cos
  FROM cand
  JOIN quant qa ON qa.vec_id = cand.query_id
  JOIN quant qb ON qb.vec_id = cand.neighbor_id
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY exact_cos DESC, neighbor_id) AS r_exact,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY code_cos DESC, neighbor_id) AS r_pq
  FROM codecand
)
SELECT query_id,
       CAST(sum(CASE WHEN r_exact <= {TOP_K} THEN 1 ELSE 0 END) AS BIGINT)
         AS k,
       CAST(sum(CASE WHEN r_exact <= {TOP_K} AND r_pq <= {TOP_K}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       round(sum(CASE WHEN r_exact <= {TOP_K} AND r_pq <= {TOP_K}
                      THEN 1 ELSE 0 END)
             / CAST(sum(CASE WHEN r_exact <= {TOP_K} THEN 1 ELSE 0 END)
                    AS DOUBLE), 6) AS recall,
       TRUE AS corpus_recall_ok
FROM ranked GROUP BY query_id
""",
)
def q_ext_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-style ANN eval: within each query's IVF cell (nprobe=1),
    rank candidates by cosine over {Q_LEVELS}-level quantized codes
    and report recall@{TOP_K} against the full-precision ranking of
    the same candidates.  The oracle value-checks every per-query
    recall AND pins a literal TRUE for mean-recall >=
    {PQ_RECALL_FLOOR} — a quantizer regression breaks the hash both
    ways.

    Plan: broadcast K-row centroids -> map-only cell argmin (the
    q_ext_ann_ivf coarse quantizer) -> PERSISTED (vec_id, cell) table
    -> cell-keyed equi-join candidates -> code + float scores joined
    by id -> two windows over the same query-partitioned candidate
    frame -> per-query rollup.  At 100 TB only the code path runs in
    production (4x less candidate memory); the float rerank here is
    the eval harness, same as q_ext_ann_recall.

    RUNG LADDER (check_oracle.APPROX_RECALL_ABOVE): the mean-recall
    floor is a FIXED-GEOMETRY claim — verified exactly at gate scale
    (500 vectors, sf0.01) and at sf1 (20,000 vectors, three sweeps);
    at sf10 the same label-derived cells hold 100x more candidates and
    mean recall legitimately drops below the pinned literal, so the
    sweep SKIPs above the 20k rung rather than reporting a
    by-construction failure.  Both engines still COMPUTE identical
    per-query recalls there; the quantizer stays value-checked at
    every scale via q_ext_ann_nprobe's relative pins."""
    prepare(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    # persisted: queries and corpus both read it, as in q_ext_semdedup
    cells = assign_cells(spark, sf_dir, persist=True)
    codes = quantized_codes(emb)
    code_side = codes.select(
        "vec_id", "q", F.sqrt(dot(F.col("q"), F.col("q"))).alias("q_nrm")
    )
    qc = cells.filter(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_fnrm"),
        "cell",
    )
    cc = cells.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_fnrm"),
        F.col("cell").alias("c_cell"),
    )
    exact_cos = dot(F.col("q_emb"), F.col("c_emb")) / (
        F.col("q_fnrm") * F.col("c_fnrm")
    )
    cand = qc.join(
        cc,
        (F.col("cell") == F.col("c_cell"))
        & (F.col("neighbor_id") != F.col("query_id")),
    ).select("query_id", "neighbor_id", exact_cos.alias("exact_cos"))
    # only the query rows can match the broadcast: filter BEFORE the
    # broadcast so 20 rows ship, not the whole code table
    qa = code_side.filter(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qa"),
        F.col("q_nrm").alias("qa_nrm"),
    )
    qb = code_side.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("q").alias("qb"),
        F.col("q_nrm").alias("qb_nrm"),
    )
    code_cos = dot(F.col("qa"), F.col("qb")) / (
        F.col("qa_nrm") * F.col("qb_nrm")
    )
    scored = (
        cand.join(F.broadcast(qa), "query_id")
        .join(qb, "neighbor_id")
        .select("query_id", "neighbor_id", "exact_cos",
                code_cos.alias("code_cos"))
    )
    w_exact = Window.partitionBy("query_id").orderBy(
        F.col("exact_cos").desc(), F.col("neighbor_id")
    )
    w_pq = Window.partitionBy("query_id").orderBy(
        F.col("code_cos").desc(), F.col("neighbor_id")
    )
    ranked = scored.select(
        "query_id",
        F.row_number().over(w_exact).alias("r_exact"),
        F.row_number().over(w_pq).alias("r_pq"),
    )
    in_exact = F.when(F.col("r_exact") <= TOP_K, 1).otherwise(0)
    in_both = F.when(
        (F.col("r_exact") <= TOP_K) & (F.col("r_pq") <= TOP_K), 1
    ).otherwise(0)
    agg = ranked.groupBy("query_id").agg(
        F.sum(in_exact).cast("long").alias("k"),
        F.sum(in_both).cast("long").alias("n_hits"),
    )
    recall = F.col("n_hits") / F.col("k").cast("double")
    per_query = agg.select(
        "query_id",
        "k",
        "n_hits",
        F.round(recall, 6).alias("recall"),
    )
    # 1-row corpus gate broadcast back onto every row: mean recall
    # across queries must clear the floor (oracle pins literal TRUE)
    overall = F.broadcast(
        per_query.agg(
            (F.avg("recall") >= PQ_RECALL_FLOOR).alias("corpus_recall_ok")
        )
    )
    return per_query.crossJoin(overall)


# --- IVF nprobe ladder -------------------------------------------------------
# The recall-vs-cost knob of IVF search, priced inside the gate:
# nprobe=2 searches the query's two nearest cells instead of one.
# Enlarging the candidate set can only move the top-k TOWARD the true
# top-k (any true top-k member in the candidate set can be displaced
# only by other true top-k members), so recall_p2 >= recall_p1 is a
# structural invariant — pinned TRUE in the oracle: an implementation
# that breaks it breaks the hash.

ANN_NPROBE = 2


@register(
    "q_ext_ann_nprobe",
    oracle="WITH "
    + _DUCK_CENTROIDS
    + f""",
assigned AS (
  SELECT e.vec_id, e.embedding, cv.label AS cell,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY {_DUCK_DOT_VC} / ({_DUCK_NORM_V} * {_DUCK_NORM_C}) DESC,
                    cv.label) AS rn
  FROM embeddings e CROSS JOIN centroid_vecs cv
),
cells AS (SELECT vec_id, embedding, cell FROM assigned WHERE rn = 1),
probes AS (
  SELECT vec_id, embedding, cell, rn AS probe_rank
  FROM assigned WHERE rn <= {ANN_NPROBE} AND vec_id < {N_QUERY}
),
cand AS (
  SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id, p.probe_rank,
         {duck_dot('p.embedding', 'c.embedding')}
           / (sqrt({duck_dot('p.embedding', 'p.embedding')})
              * sqrt({duck_dot('c.embedding', 'c.embedding')})) AS cos_sim
  FROM probes p JOIN cells c
    ON c.cell = p.cell AND c.vec_id != p.vec_id
),
p1 AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id) AS r
  FROM cand WHERE probe_rank = 1
),
p2 AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id) AS r
  FROM cand
),
ex_scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_DUCK_COS} AS cos_sim
  FROM embeddings q JOIN embeddings c ON q.vec_id < {N_QUERY}
   AND c.vec_id != q.vec_id
),
ex_ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM ex_scored
),
exact_k AS (
  SELECT query_id, neighbor_id FROM ex_ranked WHERE rank <= {TOP_K}
),
h1 AS (
  SELECT e.query_id, count(*) AS n FROM exact_k e
  JOIN p1 ON p1.query_id = e.query_id
         AND p1.neighbor_id = e.neighbor_id AND p1.r <= {TOP_K}
  GROUP BY 1
),
h2 AS (
  SELECT e.query_id, count(*) AS n FROM exact_k e
  JOIN p2 ON p2.query_id = e.query_id
         AND p2.neighbor_id = e.neighbor_id AND p2.r <= {TOP_K}
  GROUP BY 1
),
denom AS (SELECT query_id, count(*) AS k FROM exact_k GROUP BY 1)
SELECT d.query_id, d.k,
       CAST(coalesce(h1.n, 0) AS BIGINT) AS n_hits_p1,
       round(coalesce(h1.n, 0) / CAST(d.k AS DOUBLE), 6) AS recall_p1,
       CAST(coalesce(h2.n, 0) AS BIGINT) AS n_hits_p2,
       round(coalesce(h2.n, 0) / CAST(d.k AS DOUBLE), 6) AS recall_p2,
       TRUE AS p2_not_worse
FROM denom d
LEFT JOIN h1 ON h1.query_id = d.query_id
LEFT JOIN h2 ON h2.query_id = d.query_id
""",
)
def q_ext_ann_nprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF nprobe ladder: recall@{TOP_K} vs exact brute-force ground
    truth at nprobe=1 and nprobe={ANN_NPROBE}, per query, with the
    structural invariant recall_p2 >= recall_p1 pinned as a literal
    TRUE — this is the number that tells a 100 TB deployment what a
    second probed cell buys before paying for it.

    Plan: corpus cells from the shared `assign_cells` quantizer
    (persisted — candidate join and nothing else reads it); the
    query-side probe list is a 20-row inline crossJoin with the
    broadcast centroids (NOT a second corpus-wide assignment pass);
    candidates ride the cell equi-join; both probe levels rank the
    same scored frame.  The exact baseline reuses q_ext_cosine_knn's
    registered plan."""
    prepare(spark)
    cells = assign_cells(spark, sf_dir, persist=True)
    emb = load_table(spark, sf_dir, "embeddings")
    cents = F.broadcast(
        centroids(spark, sf_dir).select(
            "label", "cvec", norm(F.col("cvec")).alias("c_nrm")
        )
    )
    qe = emb.filter(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        norm(F.col("embedding")).alias("q_nrm"),
    )
    cos_qc = dot(F.col("q_emb"), F.col("cvec")) / (
        F.col("q_nrm") * F.col("c_nrm")
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.desc("cent_sim"), F.col("label")
    )
    probes = (
        qe.crossJoin(cents)
        .select("query_id", "q_emb", "q_nrm", "label",
                cos_qc.alias("cent_sim"))
        .withColumn("probe_rank", F.row_number().over(w_probe))
        .filter(F.col("probe_rank") <= ANN_NPROBE)
        .select("query_id", "q_emb", "q_nrm",
                F.col("label").alias("cell"), "probe_rank")
    )
    c = cells.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm2"),
        F.col("cell").alias("c_cell"),
    )
    cos = dot(F.col("q_emb"), F.col("c_emb")) / (
        F.col("q_nrm") * F.col("c_nrm2")
    )
    cand = probes.join(
        c,
        (F.col("cell") == F.col("c_cell"))
        & (F.col("neighbor_id") != F.col("query_id")),
    ).select("query_id", "neighbor_id", "probe_rank", cos.alias("cos_sim"))
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    p1 = (
        cand.filter(F.col("probe_rank") == 1)
        .withColumn("r", F.row_number().over(w_rank))
        .filter(F.col("r") <= TOP_K)
        .select("query_id", "neighbor_id")
    )
    p2 = (
        cand.withColumn("r", F.row_number().over(w_rank))
        .filter(F.col("r") <= TOP_K)
        .select("query_id", "neighbor_id")
    )
    exact_k = q_ext_cosine_knn(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    h1 = (
        exact_k.join(p1, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").alias("n1"))
    )
    h2 = (
        exact_k.join(p2, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").alias("n2"))
    )
    denom = exact_k.groupBy("query_id").agg(F.count("*").alias("k"))
    n1 = F.coalesce("n1", F.lit(0)).cast("long")
    n2 = F.coalesce("n2", F.lit(0)).cast("long")
    return (
        denom.join(h1, "query_id", "left")
        .join(h2, "query_id", "left")
        .select(
            "query_id",
            "k",
            n1.alias("n_hits_p1"),
            F.round(n1 / F.col("k").cast("double"), 6).alias("recall_p1"),
            n2.alias("n_hits_p2"),
            F.round(n2 / F.col("k").cast("double"), 6).alias("recall_p2"),
            (n2 >= n1).alias("p2_not_worse"),
        )
    )
