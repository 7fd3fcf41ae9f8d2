"""x1000 spot-drill for the two candidate-volume-driven queries
(r9 verdict item 7): q_ext_semdedup and q_ext_embed_neardup are the
only registry entries whose growth exponent depends on the corpus
(candidate volume = near-threshold density x bucket geometry, not a
fixed plan shape).  This drill builds an EMBEDDINGS-ONLY corpus at a
chosen replica count (the two queries read nothing else), then either
TIMES both queries or COUNTS LSH candidate pairs analytically
(sum C(bucket,2) over band buckets — no pair join materialized).

The noise amplitude is a knob because it selects the scaling regime:
- --amp 0.16 (the make_sf1 scheme): every replica of a base vector
  lands at cos ~0.8 from every other replica — at x1000 that is 2000
  cliques of 1000 members in the LSH gray zone (p_band(0.8) = 0.0103
  at the (128, 20) ceiling -> 73% of intra-clique pairs become
  candidates).  The first x1000 run of this drill materialized that
  join and filled the 250 GB disk with shuffle spill: candidate
  volume is a DATA property, and a corpus with million-member
  0.8-cliques needs cluster-partitioning (the semdedup shape) before
  pairing, not wider LSH.  Use --count-only in this regime.
- --amp 0.45: replicas land at cos ~0.45 (organic growth — new data
  mostly unrelated to old), which measures the plan's own scaling
  with near-constant duplicate density.

Usage:
  python tools/drill_emb.py 100                  # time at x100
  python tools/drill_emb.py 1000 --count-only    # candidate counts
  python tools/drill_emb.py 1000 --amp 0.45      # organic-growth time
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"


def build(spark, reps: int, amp: float, out_dir: str) -> None:
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    stride = int(emb.agg(F.max("vec_id")).first()[0]) + 1
    r = emb.crossJoin(
        spark.range(reps).select(F.col("id").cast("int").alias("rep"))
    ).select(
        (F.col("vec_id") + F.col("rep").cast("long") * stride).alias(
            "vec_id"
        ),
        "rep",
        "embedding",
        "label",
    )

    # make_sf1's frac-sin full-rank hash noise, keyed on the SHIFTED
    # vec_id / dim / replica; replica 0 stays bit-identical to sf0.1
    def noise(x, d):
        t = (
            F.sin(
                F.col("vec_id") * 12.9898
                + d * 78.233
                + F.col("rep").cast("double") * 37.719
            )
            * 43758.5453
        )
        return (x + ((t - F.floor(t)) * 2 - 1) * amp).cast("float")

    r = r.select(
        "vec_id",
        F.when(F.col("rep") == 0, F.col("embedding"))
        .otherwise(F.transform("embedding", noise))
        .alias("embedding"),
        "label",
    )
    r.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")


def count_candidates(spark, sf_dir: str, n: int) -> dict:
    """LSH candidate-pair count at the adaptive geometry for `n`,
    via sum C(bucket, 2) over (band, sig) buckets — never a join."""
    from binancedatapipelineinaws_spark.functions.similarity import (
        adaptive_band_geometry,
        banded_signatures,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bands, rows = adaptive_band_geometry(n)
    sigs = banded_signatures(emb, bands=bands, rows_per_band=rows)
    agg = (
        sigs.groupBy("band", "sig")
        .agg(F.count("*").alias("c"))
        .agg(
            F.sum(F.expr("c * (c - 1) / 2")).cast("long").alias("cand"),
            F.max("c").alias("max_bucket"),
        )
        .first()
    )
    return {
        "geometry": [bands, rows],
        # per-band candidate slots; the pair join dedups across bands,
        # so this UPPER-BOUNDS the distinct candidate set it feeds
        "cand_slots": int(agg["cand"]),
        "max_bucket": int(agg["max_bucket"]),
    }


def main() -> None:
    args = sys.argv[1:]
    amp = 0.16
    if "--amp" in args:
        i = args.index("--amp")
        amp = float(args[i + 1])
        del args[i : i + 2]
    count_only = "--count-only" in args
    if count_only:
        args.remove("--count-only")
    reps = int(args[0])
    tag = f"{reps}" if amp == 0.16 else f"{reps}a{amp}"
    out_dir = os.path.join(REPO, f".bench_embx{tag}")
    from binancedatapipelineinaws_spark.registry import all_specs
    from binancedatapipelineinaws_spark.session import get_spark

    spark = get_spark("drill_emb")
    if not os.path.isdir(f"{out_dir}/embeddings.parquet"):
        t0 = time.perf_counter()
        build(spark, reps, amp, out_dir)
        print(f"built {out_dir} in {time.perf_counter() - t0:.1f}s")
    n = spark.read.parquet(f"{out_dir}/embeddings.parquet").count()

    res = {"replicas": reps, "amp": amp, "n_vectors": n}
    if count_only:
        res["candidates"] = count_candidates(spark, out_dir, n)
    else:
        specs = all_specs()
        for name in ("q_ext_embed_neardup", "q_ext_semdedup"):
            df = specs[name].fn(spark, out_dir)  # warm-up
            df.write.format("noop").mode("overwrite").save()
            t0 = time.perf_counter()
            out = specs[name].fn(spark, out_dir)
            out.write.format("noop").mode("overwrite").save()
            res[name] = round(time.perf_counter() - t0, 2)
            spark.catalog.clearCache()
    print(json.dumps(res))


if __name__ == "__main__":
    main()
