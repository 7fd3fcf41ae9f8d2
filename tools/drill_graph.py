"""x1000 spot-drill for the three graph kernels (VERDICT r10 item 7):
q_ext_pagerank / q_ext_triangles / q_ext_kcore price flat at x100, but
.bench_sf10's replica scheme shifts BOTH l_orderkey and l_partkey per
replica — the co-purchase graph at x100 is 100 DISJOINT copies, so the
flat ratio proves the disjoint regime only.  This drill builds a
LINEITEM-ONLY corpus (the only table all three kernels read) at a
chosen replica count via ONE crossJoin plan (no 1000-way union), in
either regime:

- default (the make_sf1 scheme, "organic catalog growth"): replica i
  shifts orderkey AND partkey — nodes and edges both scale ~linearly,
  the plan's own scaling is what gets measured.
- --shared-parts ("fixed catalog densification"): replica i shifts
  ONLY the orderkey — 1000x more orders over the SAME part catalog.
  The co-purchase pair space saturates (every pair crosses the
  support-2 floor), degrees densify, and the wedge join's O(E^1.5)
  bound is driven by a DATA property, exactly like drill_emb's
  0.8-clique regime.  Use --count-only here: it prices the saturation
  analytically (edge count, degree moments, exact degree-ordered
  wedge count Sum C(d_fwd, 2)) WITHOUT materializing a wedge join.

Usage:
  python tools/drill_graph.py 1000                    # disjoint, timed
  python tools/drill_graph.py 1000 --shared-parts --count-only
  python tools/drill_graph.py 100 --keep              # keep the corpus
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

# base corpus: $SPARK_GRAFT_SF_DIR (the driver's own knob) or
# --src=PATH; hardcoding broke silently on testdata relocation
# (ADVICE r11 item 4)
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PR_MINSUP = 2  # mirror operators/graph.PR_MINSUP


def build_corpus(spark, reps: int, shared_parts: bool, out: str) -> None:
    li = spark.read.parquet(f"{SRC}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    k_ord = li.agg(F.max("l_orderkey")).first()[0] + 1
    k_part = li.agg(F.max("l_partkey")).first()[0] + 1
    rep = spark.range(reps).select(F.col("id").alias("rep"))
    scaled = li.crossJoin(rep).select(
        (F.col("l_orderkey") + F.col("rep") * k_ord).alias("l_orderkey"),
        (
            F.col("l_partkey")
            if shared_parts
            else F.col("l_partkey") + F.col("rep") * k_part
        ).alias("l_partkey"),
    )
    scaled.write.mode("overwrite").parquet(f"{out}/lineitem.parquet")


def graph_counts(spark, sf_dir: str, cap: int | None = None) -> dict:
    """Analytic pricing of the co-purchase graph: edges, degree
    moments, and the EXACT degree-ordered wedge count the triangle
    kernel would enumerate — all from aggregates, no wedge/pair join
    materialized.  With `cap`, prices the *_capped variants' graph
    instead (per-node top-cap neighbors by (sup DESC, dst), kept only
    when MUTUAL — mirrors operators/graph._copurchase_edges_capped)
    so the shared-parts densification rung can show the hard
    degree <= cap bound holding."""
    from pyspark.sql.window import Window

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    op = li.select("l_orderkey", "l_partkey").distinct()
    a = op.alias("a")
    b = op.alias("b")
    und = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"),
            F.col("b.l_partkey").alias("pb"),
        )
        .agg(F.count("*").alias("sup"))
        .filter(F.col("sup") >= PR_MINSUP)
        .persist()
    )
    if cap is not None:
        sym = und.select(
            F.col("pa").alias("src"), F.col("pb").alias("dst"), "sup"
        ).unionAll(
            und.select(
                F.col("pb").alias("src"), F.col("pa").alias("dst"), "sup"
            )
        )
        w = Window.partitionBy("src").orderBy(F.desc("sup"), F.asc("dst"))
        keptd = (
            sym.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= cap)
            .select("src", "dst")
        )
        rev = keptd.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
        mutual = keptd.join(rev, ["src", "dst"], "left_semi")
        und_new = (
            mutual.filter(F.col("src") < F.col("dst"))
            .select(F.col("src").alias("pa"), F.col("dst").alias("pb"))
            .persist()
        )
        und.unpersist()
        und = und_new
    n_und = und.count()
    deg = (
        und.select(F.col("pa").alias("p"))
        .unionAll(und.select(F.col("pb").alias("p")))
        .groupBy("p")
        .agg(F.count("*").alias("d"))
        .persist()
    )
    degs = deg.agg(
        F.count("*").alias("nodes"),
        F.max("d").alias("max_deg"),
        F.avg("d").alias("mean_deg"),
        F.sum(F.col("d") * F.col("d")).alias("sum_d2"),
    ).first()
    # degree-ordered orientation: edge (u, v) points from the lower
    # (deg, id) endpoint; forward degree d_fwd prices the wedge join
    du = deg.select(F.col("p").alias("pa"), F.col("d").alias("da"))
    dv = deg.select(F.col("p").alias("pb"), F.col("d").alias("db"))
    fwd = (
        und.join(du, "pa")
        .join(dv, "pb")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("pa") < F.col("pb"))),
                F.col("pa"),
            )
            .otherwise(F.col("pb"))
            .alias("lo")
        )
        .groupBy("lo")
        .agg(F.count("*").alias("df"))
    )
    wedges = fwd.agg(
        F.sum(F.expr("df * (df - 1) div 2")).alias("w")
    ).first()[0]
    und.unpersist()
    deg.unpersist()
    return {
        "und_edges": n_und,
        "nodes": degs["nodes"],
        "max_deg": degs["max_deg"],
        "mean_deg": round(degs["mean_deg"], 2),
        "sum_deg2": degs["sum_d2"],
        "ordered_wedges": wedges,
    }


def main() -> None:
    global SRC
    for arg in sys.argv[1:]:
        if arg.startswith("--src="):
            SRC = arg[len("--src="):]
    positional = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = int(positional[0]) if positional else 1000
    shared = "--shared-parts" in sys.argv
    count_only = "--count-only" in sys.argv
    keep = "--keep" in sys.argv
    out = os.path.join(
        REPO, f".drill_graph_x{reps}{'_shared' if shared else ''}"
    )
    from binancedatapipelineinaws_spark.registry import queries
    from binancedatapipelineinaws_spark.session import get_spark

    spark = get_spark("drill_graph")
    t0 = time.perf_counter()
    build_corpus(spark, reps, shared, out)
    res: dict = {
        "reps": reps,
        "shared_parts": shared,
        "build_sec": round(time.perf_counter() - t0, 1),
    }
    try:
        if count_only:
            cap = None
            if "--capped" in sys.argv:
                from binancedatapipelineinaws_spark.operators.graph import (
                    GRAPH_CAP_K,
                )

                cap = GRAPH_CAP_K
                res["cap"] = cap
            res["counts"] = graph_counts(spark, out, cap)
            res["counts_x1"] = graph_counts(spark, SRC, cap)
        else:
            qs = queries()
            for name in (
                "q_ext_pagerank",
                "q_ext_triangles",
                "q_ext_kcore",
            ):
                best = None
                for _ in range(2):
                    t0 = time.perf_counter()
                    qs[name](spark, out).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    spark.catalog.clearCache()
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                res[name] = round(best, 2)
    finally:
        if not keep:
            shutil.rmtree(out, ignore_errors=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
