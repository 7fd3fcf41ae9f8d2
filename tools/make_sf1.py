"""Synthesize an sf1-scale bench dataset (~10x sf0.1) for scale
pricing — TESTDATA.md ships no sf1 and /root/testdata is read-only.

Ten key-shifted replicas of every scaling table, with referential
integrity preserved (each replica shifts fact AND dimension foreign
keys by the same stride) and the content columns perturbed so
data-dependent operators scale the way a real 10x corpus would:

- documents: replica i>0 suffixes EVERY word with the replica tag, so
  positional 5-grams and MinHash shingles never collide ACROSS
  replicas (without it, every doc gains 9 verbatim near-copies and
  LSH candidate volume grows ~100x — a data artifact, not a plan
  property).  Per-word suffixing preserves ALL within-replica
  duplicate structure bit-for-bit (two docs sharing a span still
  share it after the identical word-wise transform); an interspersed
  tag every k words would NOT — spans at offsets differing mod k get
  tags at different positions inside the block and vanish.
- embeddings: replica i>0 adds deterministic FULL-RANK hash noise
  (the frac-sin shader hash per (vec_id, dim, replica), amplitude
  0.16 against the unit-norm base vectors) pushing cross-replica
  cosine to ~0.8, below the 0.9 near-dup threshold, for the same
  reason.  A plain sin(vec_id + dim) shift will NOT do: those shift
  vectors span only the 2-D (sin d, cos d) subspace and, at any
  amplitude comparable to the signal, collapse every replica onto
  that plane — the first build of this dataset did exactly that and
  manufactured ~49M genuine near-dup pairs.
- region/nation: fixed-size dims, copied once (TPC-H scaling rule).

Usage: python tools/make_sf1.py [out_dir]   (default .bench_sf1/)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"
# 10 replicas ~= sf1.  SPARK_GRAFT_SF1_REPLICAS=100 builds the ~sf10
# corpus used for the 100x pricing drill (same tagging/noise scheme —
# word tags and the frac-sin hash are unique per replica at any count).
N_REPLICAS = int(os.environ.get("SPARK_GRAFT_SF1_REPLICAS", "10"))


def _stride(df: DataFrame, col: str) -> int:
    return int(df.agg(F.max(col)).first()[0]) + 1


def _replicate(df: DataFrame, shifts: dict[str, int], i: int) -> DataFrame:
    out = df
    for col, stride in shifts.items():
        out = out.withColumn(col, F.col(col) + F.lit(i * stride))
    return out


def _tag_words(text_col, tag):
    """Suffix every word with `tag`: no gram survives across replicas,
    while every within-replica shared span survives verbatim (both
    docs undergo the identical word-wise transform)."""
    words = F.split(text_col, " ")
    return F.array_join(
        F.transform(words, lambda w: F.concat(w, F.lit("_"), tag)), " "
    )


def _mk_noise(rep: int):
    """2-arg transform lambda adding frac-sin hash noise (uniform-ish
    in [-0.16, 0.16) per dim, full rank) for replica `rep`.  A factory,
    not a default arg: PySpark counts default parameters when choosing
    the lambda arity."""

    def _noise(x, d):
        t = (
            F.sin(
                F.col("vec_id") * 12.9898
                + d * 78.233
                + F.lit(rep * 37.719)
            )
            * 43758.5453
        )
        return (x + ((t - F.floor(t)) * 2 - 1) * 0.16).cast("float")

    return _noise


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_sf1",
    )
    from binancedatapipelineinaws_spark.session import get_spark

    spark = get_spark("make_sf1")
    rd = lambda t: spark.read.parquet(f"{SRC}/{t}.parquet")  # noqa: E731

    cust, supp, part, orders, li = (
        rd("customer"), rd("supplier"), rd("part"), rd("orders"),
        rd("lineitem"),
    )
    ev, docs, emb = rd("events"), rd("documents"), rd("embeddings")
    k_cust = _stride(cust, "c_custkey")
    k_supp = _stride(supp, "s_suppkey")
    k_part = _stride(part, "p_partkey")
    k_ord = _stride(orders, "o_orderkey")
    k_user = _stride(ev, "user_id")
    k_event = _stride(ev, "event_id")
    k_doc = _stride(docs, "doc_id")
    k_vec = _stride(emb, "vec_id")

    plans: dict[str, list[DataFrame]] = {t: [] for t in (
        "customer", "supplier", "part", "orders", "lineitem", "events",
        "documents", "embeddings",
    )}
    for i in range(N_REPLICAS):
        plans["customer"].append(_replicate(cust, {"c_custkey": k_cust}, i))
        plans["supplier"].append(_replicate(supp, {"s_suppkey": k_supp}, i))
        plans["part"].append(_replicate(part, {"p_partkey": k_part}, i))
        plans["orders"].append(
            _replicate(orders, {"o_orderkey": k_ord, "o_custkey": k_cust}, i)
        )
        plans["lineitem"].append(
            _replicate(
                li,
                {"l_orderkey": k_ord, "l_partkey": k_part,
                 "l_suppkey": k_supp},
                i,
            )
        )
        plans["events"].append(
            _replicate(ev, {"event_id": k_event, "user_id": k_user}, i)
        )
        d = _replicate(docs, {"doc_id": k_doc}, i)
        if i > 0:
            d = d.withColumn(
                "text", _tag_words(F.col("text"), F.lit(f"r{i}"))
            ).withColumn("n_chars", F.length("text").cast("long"))
        plans["documents"].append(d.select(docs.columns))
        e = _replicate(emb, {"vec_id": k_vec}, i)
        if i > 0:
            e = e.withColumn(
                "embedding", F.transform("embedding", _mk_noise(i))
            )
        plans["embeddings"].append(e.select(emb.columns))

    os.makedirs(out_dir, exist_ok=True)
    for t in ("region", "nation"):
        rd(t).write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
    for t, dfs in plans.items():
        u = dfs[0]
        for d in dfs[1:]:
            u = u.unionByName(d)
        u.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
        print(f"{t}: {spark.read.parquet(f'{out_dir}/{t}.parquet').count()} rows")


if __name__ == "__main__":
    main()
