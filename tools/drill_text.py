"""x10/x100/x1000 drill for the text-dedup ladder (VERDICT r11 item 5):
q_ext_dedup_near / q_ext_dedup_simhash / q_ext_sentence_dedup price
flat in the x100 sweep, but .bench_sf10's replica scheme gives every
replica DISJOINT text (doc_id and content both shift), so the measured
ratios prove the disjoint regime only — the banded-LSH geometry past
1M documents was still extrapolated.  This drill builds a
DOCUMENTS-ONLY corpus at a chosen replica count via ONE crossJoin plan
in either regime:

- default ("organic growth"): replica i suffixes EVERY word with its
  replica id — vocabularies are disjoint, shingles never collide
  across replicas, and the plan's own scaling (signature build, band
  bucketing, verify join) is what gets measured.
- --shared-texts ("boilerplate flood"): replica i shifts ONLY doc_id;
  text is byte-identical, so every document becomes a reps-way exact
  duplicate.  This regime is OUTPUT-quadratic for the near-dup pair
  ids by definition (C(reps, 2) true pairs per original doc) — the
  published pipeline answer is to run the EXACT tier first
  (q_ext_dedup_exact collapses byte-identical copies in one shuffle);
  the LSH tier's SHINGLE_DF_CAP additionally drops shingles whose df
  exceeds 1000, bounding the verify join when boilerplate slips
  through.  Use small reps here and read pair counts, not wall clock.

Usage:
  python tools/drill_text.py 100                  # organic, timed
  python tools/drill_text.py 1000 --once          # single timed pass
  python tools/drill_text.py 20 --shared-texts --counts
  python tools/drill_text.py 100 --keep           # keep the corpus
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

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

KERNELS = (
    "q_ext_dedup_near",
    "q_ext_dedup_simhash",
    "q_ext_sentence_dedup",
    "q_ext_dedup_minhash_idf",
)


def build_corpus(spark, reps: int, shared_texts: bool, out: str) -> None:
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    k_doc = docs.agg(F.max("doc_id")).first()[0] + 1
    rep = spark.range(reps).select(F.col("id").alias("rep"))
    text = (
        F.col("text")
        if shared_texts
        else F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda x: F.concat(
                    x, F.lit("r"), F.col("rep").cast("string")
                ),
            ),
            " ",
        )
    )
    scaled = docs.crossJoin(rep).select(
        (F.col("doc_id") + F.col("rep") * k_doc).alias("doc_id"),
        text.alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    scaled.write.mode("overwrite").parquet(f"{out}/documents.parquet")


def main() -> None:
    global SRC
    for arg in sys.argv[1:]:
        if arg.startswith("--src="):
            SRC = arg[len("--src="):]
    kernels = list(KERNELS)
    for arg in sys.argv[1:]:
        if arg.startswith("--only="):
            kernels = arg[len("--only="):].split(",")
    positional = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = int(positional[0]) if positional else 100
    shared = "--shared-texts" in sys.argv
    counts = "--counts" in sys.argv
    once = "--once" in sys.argv
    keep = "--keep" in sys.argv
    out = os.path.join(
        REPO, f".drill_text_x{reps}{'_shared' if shared else ''}"
    )
    from binancedatapipelineinaws_spark.registry import queries
    from binancedatapipelineinaws_spark.session import get_spark

    spark = get_spark("drill_text")
    t0 = time.perf_counter()
    build_corpus(spark, reps, shared, out)
    res: dict = {
        "reps": reps,
        "shared_texts": shared,
        "build_sec": round(time.perf_counter() - t0, 1),
    }
    qs = queries()
    try:
        for name in kernels:
            if counts:
                t0 = time.perf_counter()
                n = qs[name](spark, out).count()
                spark.catalog.clearCache()
                res[name] = {
                    "rows": n,
                    "sec": round(time.perf_counter() - t0, 2),
                }
            else:
                best = None
                for _ in range(1 if once else 2):
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
