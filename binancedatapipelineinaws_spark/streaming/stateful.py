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


# NOTE on chunking: `pdfs` yields one pandas chunk per Arrow batch; a
# key whose micro-batch exceeds arrow.maxRecordsPerBatch arrives as
# SEVERAL chunks whose composition depends on shuffle arrival order.
# Every kernel below therefore concatenates its chunks and sorts ONCE
# — a per-chunk sort would give sorted(chunk1)++sorted(chunk2), an
# order that varies run to run and breaks replay determinism for
# order-sensitive state.


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
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            batch = pd.concat(chunks).sort_values(["minute_epoch_s", "bid"])
            for minute, grp in batch.groupby("minute_epoch_s", sort=True):
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


# --- streaming sessionizer ---------------------------------------------------
# Event-level session labels as keyed state: the streaming counterpart
# of the batch gaps-and-islands query (operators/analytics.py
# q_ext_sessionize), holding (last event time, open session index,
# event seq) per user — O(1) state per key, like the rotation detector.

SESSIONIZE_SCHEMA = (
    "event_id long, user_id long, session_idx long, user_event_seq long"
)
SESSION_STATE_SCHEMA = "last_ts_s long, session_idx long, seq long"


def make_sessionize_fn(gap_s: int):
    def sessionize(key, pdfs, state):
        import pandas as pd

        (user_id,) = key
        if state.exists:
            last_ts, session_idx, seq = state.get
        else:
            last_ts, session_idx, seq = None, 0, 0
        out: list[tuple[int, int, int, int]] = []
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            # event-time order within the batch at FULL microsecond
            # precision — the batch query orders by (ts, event_id) with
            # sub-second ts, so sorting by a second-truncated ts here
            # could label same-second events in a different order.  The
            # gap test itself stays on floored seconds (matching
            # unix_timestamp in the batch query).  Across batches the
            # state carries the frontier (late events beyond it join
            # the open session — documented divergence, same policy as
            # the rotation detector's late-data drop)
            batch = pd.concat(chunks).sort_values(["ts_us", "event_id"])
            for ts_us, event_id in zip(batch["ts_us"], batch["event_id"]):
                ts_s = int(ts_us) // 1_000_000
                if last_ts is None or ts_s - last_ts > gap_s:
                    session_idx += 1
                seq += 1
                last_ts = ts_s
                out.append((int(event_id), int(user_id), session_idx, seq))
        state.update((last_ts, session_idx, seq))
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "event_id", "user_id", "session_idx", "user_event_seq"
                ],
            )

    return sessionize


def sessionize_stream(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """events stream (event_id, ts, user_id, ...) -> per-event session
    labels, keyed state per user."""
    from pyspark.sql import functions as F

    keyed = events.select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us")
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        make_sessionize_fn(gap_s),
        outputStructType=SESSIONIZE_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- cluster state-store sizing ---------------------------------------------

ROCKSDB_STATE_CONF = {
    # At 100 TB / billions of keys the default HDFS-backed state store
    # keeps every key's state in executor heap — the sessionizer's
    # per-user rows alone would OOM an executor.  RocksDB spills state
    # to local disk with bounded memory and makes checkpoints
    # incremental (changelog), so state size is bounded by disk, not
    # heap, and restore time by the changelog, not the full snapshot.
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    ),
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": (
        "true"
    ),
    # cap RocksDB block-cache + memtable memory per executor instead of
    # letting every loaded store grab its own default
    "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage": "true",
    "spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB": "2048",
}


def apply_rocksdb_state_conf(spark) -> None:
    """Opt a session into the RocksDB state store for the cluster path.
    Local replay tests keep the default provider (state row counts are
    asserted against distinct keys either way —
    tests/test_streaming.py::test_sessionizer_state_bounded_by_distinct_keys);
    on a real cluster call this BEFORE starting stateful queries: the
    provider is fixed per checkpoint location."""
    for k, v in ROCKSDB_STATE_CONF.items():
        spark.conf.set(k, v)


# --- streaming inter-arrival band counter ------------------------------------
# Streaming counterpart of the batch gap histogram
# (operators/analytics.py q_ext_interarrival): keyed on the
# high-cardinality (user_id, event_type), state is ONE long (the last
# floored-epoch second), each arriving event emits its gap band row.
# Bands are the same integer CASE edges as the batch query — no log(),
# no float thresholds, so a replayed stream reproduces the batch
# histogram exactly.

GAPBAND_SCHEMA = "event_type string, band string"
GAPBAND_STATE_SCHEMA = "last_ts_s long"

_GAP_EDGES = ((1, "00_lt1s"), (10, "01_1_9s"), (60, "02_10_59s"),
              (600, "03_1_9m"), (3600, "04_10_59m"))
_GAP_TOP = "05_ge1h"


def _band_of(gap_s: int) -> str:
    for edge, name in _GAP_EDGES:
        if gap_s < edge:
            return name
    return _GAP_TOP


def make_gapband_fn():
    def gapband(key, pdfs, state):
        import pandas as pd

        _user_id, event_type = key
        last_ts = state.get[0] if state.exists else None
        out: list[tuple[str, str]] = []
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            # full-precision in-batch order (the sessionizer
            # discipline); the gap itself is floored-epoch seconds,
            # matching unix_timestamp in the batch query
            batch = pd.concat(chunks).sort_values(["ts_us", "event_id"])
            for ts_us in batch["ts_us"]:
                ts_s = int(ts_us) // 1_000_000
                if last_ts is not None:
                    out.append((event_type, _band_of(ts_s - last_ts)))
                last_ts = ts_s
        state.update((last_ts,))
        if out:
            yield pd.DataFrame(out, columns=["event_type", "band"])

    return gapband


def gapband_stream(events: DataFrame) -> DataFrame:
    """events stream -> one (event_type, band) row per inter-arrival
    gap of that user's events of that type; a downstream rollup (or
    the consumer) counts per band.  State per key is a single long."""
    from pyspark.sql import functions as F

    keyed = events.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
    )
    return keyed.groupBy("user_id", "event_type").applyInPandasWithState(
        make_gapband_fn(),
        outputStructType=GAPBAND_SCHEMA,
        stateStructType=GAPBAND_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- streaming last-touch attribution ----------------------------------------
# Streaming counterpart of the batch attribution rollup
# (operators/analytics.py q_ext_first_touch): state per user is the
# single last-seen marketing channel; every purchase emits its
# attribution row at arrival time — the live conversion feed.

ATTRIB_SCHEMA = "event_id long, channel string"
ATTRIB_STATE_SCHEMA = "channel string"
_ATTRIB_CHANNELS = ("view", "click")


def make_attrib_fn():
    def attribute(key, pdfs, state):
        import pandas as pd

        channel = state.get[0] if state.exists else None
        out: list[tuple[int, str]] = []
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            batch = pd.concat(chunks).sort_values(["ts_us", "event_id"])
            for event_id, etype in zip(
                batch["event_id"], batch["event_type"]
            ):
                if etype == "purchase":
                    out.append(
                        (int(event_id), channel if channel else "none")
                    )
                if etype in _ATTRIB_CHANNELS:
                    channel = etype
        state.update((channel,))
        if out:
            yield pd.DataFrame(out, columns=["event_id", "channel"])

    return attribute


def attribution_stream(events: DataFrame) -> DataFrame:
    """events stream -> one (purchase event_id, channel) row per
    purchase, attributed to the user's most recent preceding
    view/click ('none' if untouched).  State per user: one string."""
    from pyspark.sql import functions as F

    keyed = events.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        make_attrib_fn(),
        outputStructType=ATTRIB_SCHEMA,
        stateStructType=ATTRIB_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- streaming heavy hitters (SpaceSaving) -----------------------------------
# Top talkers over an UNBOUNDED key domain with O(k) state: the
# SpaceSaving sketch (Metwally et al., public algorithm) per hash
# shard.  A counter set of size k per shard guarantees every item with
# true shard frequency > n_shard/k is tracked, and each estimate
# overshoots its true count by at most the recorded error term.  The
# state store holds N_SHARDS * k counters TOTAL, independent of how
# many distinct users ever appear — the bounded-state contract the
# exact per-key counters cannot make.

HH_K = 16  # counters per shard
HH_SHARDS = 8

HH_SCHEMA = (
    "shard long, item long, est long, err long, n_processed long"
)
HH_STATE_SCHEMA = (
    "items array<long>, counts array<long>, errs array<long>, n long"
)


def make_heavy_hitters_fn(k: int = HH_K):
    def heavy_hitters(key, pdfs, state):
        import pandas as pd

        (shard,) = key
        if state.exists:
            items, counts, errs, n = state.get
            items, counts, errs = list(items), list(counts), list(errs)
        else:
            items, counts, errs, n = [], [], [], 0
        pos = {it: i for i, it in enumerate(items)}
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            # deterministic in-batch order (the sessionizer discipline)
            batch = pd.concat(chunks).sort_values(["ts_us", "event_id"])
            for it in batch["item"]:
                it = int(it)
                n += 1
                i = pos.get(it)
                if i is not None:
                    counts[i] += 1
                elif len(items) < k:
                    pos[it] = len(items)
                    items.append(it)
                    counts.append(1)
                    errs.append(0)
                else:
                    # evict the min-count entry (ties: smallest item id,
                    # so replay order cannot change the victim)
                    j = min(
                        range(len(items)),
                        key=lambda x: (counts[x], items[x]),
                    )
                    del pos[items[j]]
                    pos[it] = j
                    errs[j] = counts[j]
                    counts[j] += 1
                    items[j] = it
        state.update((items, counts, errs, n))
        # snapshot every batch; consumers keep each shard's rows with
        # the highest n_processed (the final state)
        yield pd.DataFrame(
            {
                "shard": [int(shard)] * len(items),
                "item": items,
                "est": counts,
                "err": errs,
                "n_processed": [n] * len(items),
            }
        )

    return heavy_hitters


def heavy_hitters_stream(events: DataFrame, k: int = HH_K) -> DataFrame:
    """events stream -> per-shard SpaceSaving top-talker snapshots
    (item = user_id).  State per shard: k (item, count, err) counters
    — bounded regardless of the user-id domain."""
    from pyspark.sql import functions as F

    keyed = events.select(
        "event_id",
        F.col("user_id").alias("item"),
        (F.col("user_id") % HH_SHARDS).alias("shard"),
        F.unix_micros("ts").alias("ts_us"),
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        make_heavy_hitters_fn(k),
        outputStructType=HH_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- streaming EWMA (online recurrence) --------------------------------------
# The streaming twin of the oracle-gated batch fold (operators/
# analytics.py:q_ext_ewma): state per user is ONE double + a count —
# the O(1)-state form of the recurrence whose batch reference collects
# and folds the (capped) per-user sequence.  Parity: the batch cap at
# EWMA_TAIL events changes the value by < (1-a)^EWMA_TAIL ~ 4e-24 of
# the value range, invisible under the 6-dp round, so an in-order
# replay of this kernel must equal the batch query exactly after
# rounding (tests/test_streaming.py).

EWMA_SCHEMA = "user_id long, n_events long, ewma double"
EWMA_STATE_SCHEMA = "ewma double, n long"


def make_ewma_fn(alpha: float):
    def ewma_fn(key, pdfs, state):
        import pandas as pd

        (user_id,) = key
        if state.exists:
            ewma, n = state.get
        else:
            ewma, n = None, 0
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            # whole-batch sort at full microsecond precision — the
            # 63ebea5 determinism discipline (never per Arrow chunk)
            batch = pd.concat(chunks).sort_values(["ts_us", "event_id"])
            for v in batch["value"]:
                x = float(v)
                # identical expression shape to the batch fold:
                # a * x + (1 - a) * acc, same IEEE double ops/order
                ewma = x if ewma is None else alpha * x + (1 - alpha) * ewma
                n += 1
        state.update((ewma, n))
        # snapshot per batch; consumers keep each user's max-n row
        yield pd.DataFrame(
            {"user_id": [int(user_id)], "n_events": [n], "ewma": [ewma]}
        )

    return ewma_fn


def ewma_stream(events: DataFrame, alpha: float) -> DataFrame:
    """events stream -> per-user EWMA snapshots (one row per user per
    micro-batch; the max-n_events row per user is the final state)."""
    from pyspark.sql import functions as F

    keyed = events.select(
        "event_id",
        "user_id",
        F.col("value").cast("double").alias("value"),
        F.unix_micros("ts").alias("ts_us"),
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        make_ewma_fn(alpha),
        outputStructType=EWMA_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# The streaming twin of the oracle-gated Holt batch fold (operators/
# analytics.py:q_ext_holt_smoothing): state per user is (level, trend,
# count) — O(1), vs the batch reference's collect-and-fold of the
# (HOLT_TAIL-capped) sequence.  Parity: the batch cap changes values
# by < (1-beta)^HOLT_TAIL ~ 2e-14 of the value range, invisible under
# the 6-dp round, so an in-order replay of this kernel equals the
# batch query exactly after rounding (tests/test_streaming.py).

HOLT_SCHEMA = "user_id long, n_events long, level double, trend double"
HOLT_STATE_SCHEMA = "l double, b double, n long"


def make_holt_fn(alpha: float, beta: float):
    def holt_fn(key, pdfs, state):
        import pandas as pd

        (user_id,) = key
        if state.exists:
            level, trend, n = state.get
        else:
            level, trend, n = None, None, 0
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            # whole-batch sort at full microsecond precision — the
            # 63ebea5 determinism discipline (never per Arrow chunk)
            batch = pd.concat(chunks).sort_values(["ts_us", "event_id"])
            for v in batch["value"]:
                x = float(v)
                n += 1
                if n == 1:
                    level, trend = x, 0.0
                elif n == 2:
                    # init consumes x1 and x2: (l, b) = (x1, x2 - x1),
                    # the batch fold's initial state
                    trend = x - level
                else:
                    # identical expression shape to the batch fold
                    new_l = alpha * x + (1 - alpha) * (level + trend)
                    trend = beta * (new_l - level) + (1 - beta) * trend
                    level = new_l
        state.update((level, trend, n))
        yield pd.DataFrame(
            {
                "user_id": [int(user_id)],
                "n_events": [n],
                "level": [level],
                "trend": [trend],
            }
        )

    return holt_fn


def holt_stream(
    events: DataFrame, alpha: float, beta: float
) -> DataFrame:
    """events stream -> per-user Holt (level, trend) snapshots (one
    row per user per micro-batch; the max-n_events row per user is
    the final state)."""
    from pyspark.sql import functions as F

    keyed = events.select(
        "event_id",
        "user_id",
        F.col("value").cast("double").alias("value"),
        F.unix_micros("ts").alias("ts_us"),
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        make_holt_fn(alpha, beta),
        outputStructType=HOLT_SCHEMA,
        stateStructType=HOLT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# The streaming twin of the oracle-gated MACD batch fold (operators/
# indicators.py:q_ext_macd): state per session day is the BIGINT
# fixed-point (e12, e26, sig, n) machine — O(1), and EXACT: the batch
# fold is integer arithmetic (cents x 1e9, truncating division), so an
# in-order replay of this kernel equals the batch query bit-for-bit,
# no rounding tolerance (tests/test_streaming.py), a strictly stronger
# parity than the float Holt twin's 6-dp equality.

MACD_STREAM_SCHEMA = (
    "day date, n_bars long, macd double, signal double, histogram double"
)
MACD_STREAM_STATE_SCHEMA = "e12 long, e26 long, sig long, n long"


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division toward zero — Spark `div` / DuckDB
    `//` semantics (Python's // floors, which differs on negatives)."""
    q = abs(a) // b
    return q if a >= 0 else -q


def make_macd_fn():
    def macd_fn(key, pdfs, state):
        import pandas as pd

        (day,) = key
        if state.exists:
            e12, e26, sig, n = state.get
        else:
            e12, e26, sig, n = 0, 0, 0, 0
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            # whole-batch sort (the 63ebea5 determinism discipline)
            batch = pd.concat(chunks).sort_values("m")
            for c in batch["close_c"]:
                x = int(c) * 1_000_000_000
                n += 1
                if n == 1:
                    e12 = e26 = x
                    sig = 0
                else:
                    # identical integer machine to the batch fold
                    e12 = _tdiv(2 * x + 11 * e12, 13)
                    e26 = _tdiv(2 * x + 25 * e26, 27)
                    sig = _tdiv((e12 - e26) + 4 * sig, 5)
        state.update((e12, e26, sig, n))

        def q6(a: int) -> float:
            return _tdiv(a + (50000 if a >= 0 else -50000), 100000) / 1e6

        line = e12 - e26
        yield pd.DataFrame(
            {
                "day": [day],
                "n_bars": [n],
                "macd": [q6(line)],
                "signal": [q6(sig)],
                "histogram": [q6(line - sig)],
            }
        )

    return macd_fn


def macd_stream(candles: DataFrame) -> DataFrame:
    """Candle stream (m timestamp, close_c cents) -> per-day MACD
    snapshots (one row per day per micro-batch; the max-n_bars row per
    day is the final state)."""
    from pyspark.sql import functions as F

    keyed = candles.select(
        F.col("m").cast("timestamp").alias("m"),
        F.col("m").cast("date").alias("day"),
        F.col("close_c").cast("long").alias("close_c"),
    )
    return keyed.groupBy("day").applyInPandasWithState(
        make_macd_fn(),
        outputStructType=MACD_STREAM_SCHEMA,
        stateStructType=MACD_STREAM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# The streaming twin of the oracle-gated Parabolic SAR batch fold
# (operators/indicators.py:q_ext_parabolic_sar): the full conditional-
# reset machine — accelerating pursuit, two-prior-bar clamp, trend
# flips with af reset — as O(1) BIGINT state per session day.  Like
# macd_stream, the state is pure integer arithmetic, so an in-order
# replay equals the batch query BIT-EXACTLY (tests/test_streaming.py);
# the prior two bars' extremes ride along in the state, which is what
# lets a conditional-reset recurrence stream with O(1) memory at all.

SAR_STREAM_SCHEMA = "day date, n_bars long, trend int, sar double"
SAR_STREAM_STATE_SCHEMA = (
    "t long, sar long, ep long, k long, n long,"
    " hp long, lp long, hpp long, lpp long, c1 long"
)

_SAR_STREAM_FP = 1_000_000_000


def make_sar_fn():
    def sar_fn(key, pdfs, state):
        import pandas as pd

        FP = _SAR_STREAM_FP
        (day,) = key
        if state.exists:
            t, sar, ep, k, n, hp, lp, hpp, lpp, c1 = state.get
        else:
            t, sar, ep, k, n, hp, lp, hpp, lpp, c1 = (
                0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
            )
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            batch = pd.concat(chunks).sort_values("m")
            for h, l, c in zip(
                batch["high_c"], batch["low_c"], batch["close_c"]
            ):
                h, l, c = int(h), int(l), int(c)
                n += 1
                if n == 1:
                    hp = hpp = h
                    lp = lpp = l
                    c1 = c
                    continue
                if n == 2:
                    # seed from the first two closes (batch semantics)
                    t = 1 if c >= c1 else -1
                    sar = (lp if t == 1 else hp) * FP
                    ep = hp if t == 1 else lp
                    k = 1
                # one step of the batch machine (identical integers)
                raw = _tdiv((50 - k) * sar + k * ep * FP, 50)
                if t == 1:
                    clamped = min(raw, lp * FP, lpp * FP)
                    flip = l * FP < clamped
                else:
                    clamped = max(raw, hp * FP, hpp * FP)
                    flip = h * FP > clamped
                if flip:
                    sar = ep * FP
                    ep = l if t == 1 else h
                    t, k = -t, 1
                else:
                    if t == 1:
                        if h > ep:
                            k = min(k + 1, 10)
                        ep = max(ep, h)
                    else:
                        if l < ep:
                            k = min(k + 1, 10)
                        ep = min(ep, l)
                    sar = clamped
                hpp, lpp = hp, lp
                hp, lp = h, l
        state.update((t, sar, ep, k, n, hp, lp, hpp, lpp, c1))

        def q6(a: int) -> float:
            return _tdiv(a + (50000 if a >= 0 else -50000), 100000) / 1e6

        yield pd.DataFrame(
            {
                "day": [day],
                "n_bars": [n],
                "trend": [int(t)],
                "sar": [q6(sar)],
            }
        )

    return sar_fn


def sar_stream(candles: DataFrame) -> DataFrame:
    """Candle stream (m timestamp, high_c/low_c/close_c cents) ->
    per-day Parabolic SAR snapshots (one row per day per micro-batch;
    the max-n_bars row per day is the final state)."""
    from pyspark.sql import functions as F

    keyed = candles.select(
        F.col("m").cast("timestamp").alias("m"),
        F.col("m").cast("date").alias("day"),
        F.col("high_c").cast("long").alias("high_c"),
        F.col("low_c").cast("long").alias("low_c"),
        F.col("close_c").cast("long").alias("close_c"),
    )
    return keyed.groupBy("day").applyInPandasWithState(
        make_sar_fn(),
        outputStructType=SAR_STREAM_SCHEMA,
        stateStructType=SAR_STREAM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# The streaming twin of the oracle-gated Supertrend batch fold
# (operators/indicators.py:q_ext_supertrend): Wilder ATR recurrence +
# conditional band carry + trend flip as O(1) BIGINT state per day.
# Bit-exact vs the batch fold, like macd_stream / sar_stream; only the
# prior close rides along (the carry rule references it, not the prior
# extremes).

ST_STREAM_SCHEMA = "day date, n_bars long, trend int, supertrend double"
ST_STREAM_STATE_SCHEMA = (
    "atr long, fub long, flb long, t long, n long, cp long"
)


def make_supertrend_fn():
    def st_fn(key, pdfs, state):
        import pandas as pd

        FP = 1_000_000_000
        (day,) = key
        if state.exists:
            atr, fub, flb, t, n, cp = state.get
        else:
            atr, fub, flb, t, n, cp = 0, 0, 0, 0, 0, 0
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            batch = pd.concat(chunks).sort_values("m")
            for h, l, c in zip(
                batch["high_c"], batch["low_c"], batch["close_c"]
            ):
                h, l, c = int(h), int(l), int(c)
                n += 1
                if n == 1:
                    atr = (h - l) * FP
                    fub = (h + l) * FP + 6 * atr
                    flb = (h + l) * FP - 6 * atr
                    t = 1
                    cp = c
                    continue
                tr = max(h - l, abs(h - cp), abs(l - cp))
                atr = _tdiv(9 * atr + tr * FP, 10)
                bub = (h + l) * FP + 6 * atr
                blb = (h + l) * FP - 6 * atr
                if bub < fub or cp * 2 * FP > fub:
                    fub = bub
                if blb > flb or cp * 2 * FP < flb:
                    flb = blb
                if c * 2 * FP > fub:
                    t = 1
                elif c * 2 * FP < flb:
                    t = -1
                cp = c
        state.update((atr, fub, flb, t, n, cp))

        def q2(a: int) -> float:
            return _tdiv(a + (100000 if a >= 0 else -100000), 200000) / 1e6

        yield pd.DataFrame(
            {
                "day": [day],
                "n_bars": [n],
                "trend": [int(t)],
                "supertrend": [q2(flb if t == 1 else fub)],
            }
        )

    return st_fn


def supertrend_stream(candles: DataFrame) -> DataFrame:
    """Candle stream (m, high_c/low_c/close_c cents) -> per-day
    Supertrend snapshots (max-n_bars row per day = final state)."""
    from pyspark.sql import functions as F

    keyed = candles.select(
        F.col("m").cast("timestamp").alias("m"),
        F.col("m").cast("date").alias("day"),
        F.col("high_c").cast("long").alias("high_c"),
        F.col("low_c").cast("long").alias("low_c"),
        F.col("close_c").cast("long").alias("close_c"),
    )
    return keyed.groupBy("day").applyInPandasWithState(
        make_supertrend_fn(),
        outputStructType=ST_STREAM_SCHEMA,
        stateStructType=ST_STREAM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- sentence-frequency state (streaming twin of q_ext_sentence_dedup) ------
# The batch id computes per-source sentence-dedup accounting off a
# global sentence-frequency table; the streaming twin maintains that
# table AS STATE keyed by the normalized sentence, so each micro-batch
# of crawled documents updates corpus-wide duplicate knowledge without
# a recompute — the dropDuplicatesWithinWatermark shape generalized to
# carry per-source counts and the global total (needed because the
# batch statistic's "duplicated" predicate reads the GLOBAL frequency,
# not the per-source one).

SENTFREQ_SCHEMA = "s string, source string, cnt long, c_total long"
SENTFREQ_STATE_SCHEMA = "sources array<string>, counts array<long>"


def make_sentence_freq_fn():
    def sentence_freq(key, pdfs, state):
        import pandas as pd

        (s,) = key
        if state.exists:
            srcs, cnts = state.get
            counts = dict(zip(srcs, cnts))
        else:
            counts = {}
        for pdf in pdfs:
            for src in pdf["source"]:
                counts[src] = counts.get(src, 0) + 1
        keys = sorted(counts)
        state.update((keys, [counts[k] for k in keys]))
        total = sum(counts.values())
        # UPDATE semantics: re-emit every source row of this sentence
        # with the refreshed global total, so a downstream consumer's
        # latest row per (s, source) always carries a consistent
        # (cnt, c_total) pair
        yield pd.DataFrame(
            {
                "s": s,
                "source": keys,
                "cnt": [counts[k] for k in keys],
                "c_total": total,
            }
        )

    return sentence_freq


def sentence_freq_stream(docs: DataFrame, min_chars: int = 20) -> DataFrame:
    """documents stream (doc_id, source, text) -> per-(sentence,
    source) running counts + the sentence's global count.  The
    sentence explode is map-local exactly like the batch plan; the
    only shuffle is the state-store key (the normalized sentence) —
    the same ONE corpus-sized key the batch id shuffles on."""
    from pyspark.sql import functions as F

    sents = (
        docs.select(
            "source",
            F.explode(F.split(F.col("text"), r"[.!?]+")).alias("raw"),
        )
        .select(
            "source",
            F.trim(
                F.regexp_replace(F.lower(F.col("raw")), r"\s+", " ")
            ).alias("s"),
        )
        .filter(F.length("s") >= min_chars)
    )
    return sents.groupBy("s").applyInPandasWithState(
        make_sentence_freq_fn(),
        outputStructType=SENTFREQ_SCHEMA,
        stateStructType=SENTFREQ_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
