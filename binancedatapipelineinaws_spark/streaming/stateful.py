"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.8/§2.9): a per-key file-rotation detector that reproduces
the reference's upload-on-rotation semantics (main.py:36-47) as an
explicit state machine.

The reference keeps one mutable variable (`active_file_time`) and closes
a file whenever a trade lands in a different minute (main.py:38).  Here
the same logic is per-group state in the state store: for each symbol we
track the open minute bucket and its running (trades, volume); when a
tick for a LATER bucket arrives, the closed bucket is EMITTED — exactly
the reference's rotation event, but fault-tolerant (state survives
restarts via the checkpoint) and per-key parallel.

Kernels are closures (pickled by value) like every Python kernel in this
engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

ROTATION_SCHEMA = (
    "parameter string, minute_epoch_s long, trades long, volume double"
)
STATE_SCHEMA = "minute_epoch_s long, trades long, volume double"


def make_rotation_fn():
    def detect_rotation(key, pdfs, state):
        # state: (open minute bucket, trades, volume) for this symbol
        import pandas as pd

        (symbol,) = key
        if state.exists:
            open_min, trades, volume = state.get
        else:
            open_min, trades, volume = None, 0, 0.0
        closed: list[tuple[str, int, int, float]] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["minute_epoch_s", "bid"])
            for minute, grp in pdf.groupby("minute_epoch_s", sort=True):
                if open_min is None:
                    open_min = int(minute)
                elif minute > open_min:
                    # rotation: the open minute closes (main.py:38-43)
                    closed.append((symbol, open_min, trades, volume))
                    open_min, trades, volume = int(minute), 0, 0.0
                elif minute < open_min:
                    # late data: the reference would corrupt the closed
                    # file (main.py:44); we drop — documented divergence
                    continue
                trades += int(len(grp))
                volume += float(grp["quantity"].sum())
        state.update((open_min, trades, volume))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["parameter", "minute_epoch_s", "trades", "volume"],
            )

    return detect_rotation


def rotation_stream(canonical: DataFrame) -> DataFrame:
    """canonical tick stream -> stream of CLOSED minute buckets
    (the reference's per-minute upload events)."""
    from pyspark.sql import functions as F

    keyed = canonical.select(
        "parameter",
        "bid",
        "quantity",
        ((F.unix_timestamp("time") / 60).cast("long") * 60).alias(
            "minute_epoch_s"
        ),
    )
    return keyed.groupBy("parameter").applyInPandasWithState(
        make_rotation_fn(),
        outputStructType=ROTATION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
