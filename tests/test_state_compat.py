"""Checkpoint compatibility across CODE EVOLUTION (VERDICT r7 item 7):
a stateful streaming query must restart cleanly from a checkpoint
written by a PREVIOUS commit's kernels — the production upgrade path
(stop the job, deploy new code, resume on the same checkpoint) that
the reference's systemd `Restart=always` unit (ec2_setup.sh:18-32)
exercised only for identical code.

Mechanics: batch 1 runs through the stateful kernels AS OF the pinned
base commit (tests/fixtures/state_compat_base.txt — the previous
round's head, materialized via `git show` and imported as a throwaway
module), writing a real checkpoint (offsets + state store + state
schema files).  Batch 2 then restarts on that SAME checkpoint through
the CURRENT kernels.  The run must (a) not throw Spark's state-schema
incompatibility error and (b) produce exactly the final state of a
continuous current-code run over both batches.

When a kernel's state schema changes INTENTIONALLY, bump the pin to
the first commit of the new schema and record the migration decision
there — this test is the gate that makes that a decision instead of
an accident.
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_BASE_FILE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "fixtures",
    "state_compat_base.txt",
)
_STATEFUL_PATH = "binancedatapipelineinaws_spark/streaming/stateful.py"


def _base_stateful_module(tmp_path):
    """Import streaming/stateful.py as of the pinned base commit."""
    with open(_BASE_FILE) as fh:
        sha = fh.read().strip()
    try:
        src = subprocess.run(
            ["git", "show", f"{sha}:{_STATEFUL_PATH}"],
            cwd=REPO,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
    except (subprocess.CalledProcessError, OSError) as e:
        pytest.skip(f"base commit {sha[:9]} not reachable: {e}")
    path = tmp_path / "stateful_base.py"
    path.write_text(src)
    spec = importlib.util.spec_from_file_location(
        "stateful_compat_base", str(path)
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["stateful_compat_base"] = mod
    spec.loader.exec_module(mod)
    return mod


def _split_events(spark, tmp_path):
    """The events table as two time-contiguous batches (batch 2 is
    strictly later event time, like a real resumed ingest)."""
    from binancedatapipelineinaws_spark.tables import load_table

    import pyspark.sql.window as W

    ev = load_table(spark, SF, "events")
    w = W.Window.orderBy("ts", "event_id")
    n = ev.count()
    sliced = ev.withColumn("rn", F.row_number().over(w))
    b1 = sliced.filter(F.col("rn") <= n // 2).drop("rn")
    b2 = sliced.filter(F.col("rn") > n // 2).drop("rn")
    return b1, b2


def _run(spark, stream_builder, src, out, ckpt):
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    q = (
        stream_builder(stream)
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", out)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def _final_ewma(spark, out):
    import pyspark.sql.window as W

    snaps = spark.read.parquet(out)
    w = W.Window.partitionBy("user_id")
    return (
        snaps.withColumn("n_max", F.max("n_events").over(w))
        .filter(F.col("n_events") == F.col("n_max"))
        .select("user_id", "n_events", F.round("ewma", 6).alias("ewma"))
    )


def test_ewma_checkpoint_written_by_previous_commit_resumes(
    spark, tmp_path
):
    from binancedatapipelineinaws_spark.operators.analytics import (
        EWMA_ALPHA,
    )
    from binancedatapipelineinaws_spark.streaming import stateful as cur

    base = _base_stateful_module(tmp_path)
    b1, b2 = _split_events(spark, tmp_path)

    # upgrade path: batch 1 under the BASE commit's kernel
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    b1.write.mode("append").parquet(src)
    _run(spark, lambda s: base.ewma_stream(s, EWMA_ALPHA), src, out, ckpt)
    # deploy: batch 2 resumes the SAME checkpoint under CURRENT code
    b2.write.mode("append").parquet(src)
    _run(spark, lambda s: cur.ewma_stream(s, EWMA_ALPHA), src, out, ckpt)

    # continuous current-code reference
    src_c = str(tmp_path / "src_c")
    out_c = str(tmp_path / "out_c")
    b1.write.mode("append").parquet(src_c)
    b2.write.mode("append").parquet(src_c)
    _run(
        spark,
        lambda s: cur.ewma_stream(s, EWMA_ALPHA),
        src_c,
        out_c,
        str(tmp_path / "ckpt_c"),
    )

    got = _final_ewma(spark, out)
    want = _final_ewma(spark, out_c)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_sessionize_checkpoint_written_by_previous_commit_resumes(
    spark, tmp_path
):
    from binancedatapipelineinaws_spark.streaming import stateful as cur

    base = _base_stateful_module(tmp_path)
    b1, b2 = _split_events(spark, tmp_path)

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    b1.write.mode("append").parquet(src)
    _run(spark, base.sessionize_stream, src, out, ckpt)
    b2.write.mode("append").parquet(src)
    _run(spark, cur.sessionize_stream, src, out, ckpt)

    src_c = str(tmp_path / "src_c")
    out_c = str(tmp_path / "out_c")
    b1.write.mode("append").parquet(src_c)
    b2.write.mode("append").parquet(src_c)
    _run(spark, cur.sessionize_stream, src_c, out_c, str(tmp_path / "ckpt_c"))

    got = spark.read.parquet(out)
    want = spark.read.parquet(out_c)
    assert got.count() == want.count()
    cols = ["event_id", "user_id", "session_idx", "user_event_seq"]
    assert got.select(cols).exceptAll(want.select(cols)).count() == 0
    assert want.select(cols).exceptAll(got.select(cols)).count() == 0
