"""Cross-validation of tools/make_recall_fixtures.py (r10): the numpy
ground-truth generator must agree with BOTH live engines at gate scale
(sf0.01, 500 vectors — small enough for the exact oracles to run), so
a drift in the generator can never silently re-baseline the big-corpus
fixture gate.  Each helper is checked against the corresponding Spark
path (and, transitively, the DuckDB oracle that q_ext_* parity already
pins against that Spark path)."""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

from make_recall_fixtures import (  # noqa: E402
    ann_pq_rows,
    assign,
    exact_centroids,
    load_embeddings,
    lsh_candidate_mask,
    quantize,
    threshold_pairs,
)

SF = "/root/testdata/sf0.01"


def _corpus():
    return load_embeddings(SF)


def test_assignment_matches_spark_assign_cells(spark):
    from binancedatapipelineinaws_spark.functions.similarity import (
        assign_cells,
    )

    vec_id, label, V = _corpus()
    labels, C = exact_centroids(label, V)
    cell, _, margin = assign(V.astype(np.float64), labels, C)
    assert margin > 0
    got = {
        r["vec_id"]: r["cell"]
        for r in assign_cells(spark, SF).select("vec_id", "cell").collect()
    }
    want = dict(zip(vec_id.tolist(), cell.tolist()))
    assert got == want


def test_threshold_pairs_match_registered_neardup(spark):
    from binancedatapipelineinaws_spark.registry import all_specs

    vec_id, label, V = _corpus()
    V64 = V.astype(np.float64)
    vn = np.linalg.norm(V64, axis=1)
    hits, max_cos, margin = threshold_pairs(vec_id, V64, vn)
    assert margin > 0
    want = sorted((a, b, round(c, 6)) for a, b, c in hits)
    got = sorted(
        (r["vec_a"], r["vec_b"], r["cos_sim"])
        for r in all_specs()["q_ext_embed_neardup"].fn(spark, SF).collect()
    )
    assert got == want


def test_quantize_matches_spark_codes(spark):
    from binancedatapipelineinaws_spark.functions.similarity import (
        quantized_codes,
    )
    from binancedatapipelineinaws_spark.tables import load_table

    vec_id, label, V = _corpus()
    Q = quantize(V)
    got = {
        r["vec_id"]: list(r["q"])
        for r in quantized_codes(
            load_table(spark, SF, "embeddings")
        ).collect()
    }
    want = {int(v): Q[i].tolist() for i, v in enumerate(vec_id)}
    assert got == want


def test_ann_pq_rows_match_registered_query(spark):
    from binancedatapipelineinaws_spark.registry import all_specs

    vec_id, label, V = _corpus()
    V64 = V.astype(np.float64)
    labels, C = exact_centroids(label, V)
    cell, vn, _ = assign(V64, labels, C)
    rows, gap, _mean = ann_pq_rows(vec_id, cell, V64, vn, quantize(V))
    assert gap > 0
    want = sorted(map(tuple, rows))
    got = sorted(
        (
            r["query_id"],
            r["k"],
            r["n_hits"],
            r["recall"],
            r["corpus_recall_ok"],
        )
        for r in all_specs()["q_ext_ann_pq"].fn(spark, SF).collect()
    )
    assert got == want


def test_lsh_candidate_mask_matches_spark_signatures(spark):
    """The candidate-mask replica must agree with the live pandas-UDF
    signature path on whether specific pairs share a band bucket."""
    from binancedatapipelineinaws_spark.functions.similarity import (
        adaptive_band_geometry,
        banded_signatures,
    )
    from binancedatapipelineinaws_spark.tables import load_table

    vec_id, label, V = _corpus()
    n = len(vec_id)
    bands, rows = adaptive_band_geometry(n)
    sigs = {}
    for r in banded_signatures(
        load_table(spark, SF, "embeddings"), bands=bands, rows_per_band=rows
    ).collect():
        sigs.setdefault(r["vec_id"], {})[r["band"]] = r["sig"]
    # probe a deterministic spread of pairs, near and far
    pair_idx = [(i, j) for i in range(0, n, 37) for j in (i + 1, i + 113) if j < n]
    mask, geom = lsh_candidate_mask(V, pair_idx, n)
    assert geom == (bands, rows)
    for (i, j), m in zip(pair_idx, mask):
        a, b = int(vec_id[i]), int(vec_id[j])
        live = any(sigs[a][bd] == sigs[b][bd] for bd in sigs[a])
        assert live == m, (a, b)
