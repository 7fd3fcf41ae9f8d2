"""Technical-indicator operators over the canonical BTCUSDT candle
layer — the signal queries a consumer of the reference's 1-minute OHLCV
product (reference main.py:26-40, the minute-bucket rotation;
lambda_function.py:26, the Aurora table those candles load into) runs
next: Bollinger bands, Donchian channels, on-balance volume, average
true range, and the stochastic oscillator.  (The recurrence-based pair
— Wilder RSI and MACD — lives in this module too, below the window
family.)

Exactness discipline (the r7/r8 sf1-drill lessons, see
q_win_rolling_corr): every rolling sum runs over INTEGER-scaled values
— prices are exact 2-dp (cents, x100 BIGINT) and quantities exact 5-dp
(x1e5 BIGINT) after canonicalization — so window sums are
order-independent across Spark frame folds and DuckDB segment trees.
Doubles appear only in the CLOSING scalar algebra, where both engines
evaluate the identical expression tree.

Scale notes (100 TB):
- Everything below the candle aggregate runs on the calendar-bounded
  candle layer (minutes in range, not ticks), the same argument as
  q_ext_gapfill / q_ext_drawdown.
- All rolling windows are PARTITIONED BY day — intraday indicator
  semantics (state resets at the session boundary, standard for
  exchange data) AND parallelism: no single global ordered partition;
  a year of minutes is 365 independent 1440-row frames.
- The candle aggregate itself is one uniform-key shuffle (minute
  buckets), partial-aggregated map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from binancedatapipelineinaws_spark.canonical import BTCUSDT_CTE, btcusdt
from binancedatapipelineinaws_spark.registry import register
from binancedatapipelineinaws_spark.session import prepare

# ---------------------------------------------------------------------------
# shared integer-scaled candle layer
# ---------------------------------------------------------------------------

# DuckDB CTE chain: canonical ticks -> integer-scaled 1-minute candles
# (open/close tie-break identical to q_agg_ohlcv_1min's (time, bid)).
_CANDLES_CTE = (
    BTCUSDT_CTE
    + """
, pticks AS (
  SELECT date_trunc('minute', "time") AS m, "time", bid,
         CAST(round(price * 100, 0) AS BIGINT) AS price_c,
         CAST(round(quantity * 100000, 0) AS BIGINT) AS qty_u
  FROM btcusdt
), ranked AS (
  SELECT m, price_c, qty_u,
         row_number() OVER (PARTITION BY m ORDER BY "time", bid) AS rn_a,
         row_number() OVER (PARTITION BY m ORDER BY "time" DESC, bid DESC)
           AS rn_d
  FROM pticks
), candles AS (
  SELECT m, CAST(m AS DATE) AS day,
         max(CASE WHEN rn_a = 1 THEN price_c END) AS open_c,
         max(price_c) AS high_c,
         min(price_c) AS low_c,
         max(CASE WHEN rn_d = 1 THEN price_c END) AS close_c,
         CAST(sum(qty_u) AS BIGINT) AS vol_u,
         count(*) AS trades
  FROM ranked GROUP BY m
)
"""
)


def _candles_c(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-scaled 1-minute candles: prices in cents (x100 BIGINT),
    volume in 1e-5 units (x1e5 BIGINT), plus the session day — the
    exact-arithmetic substrate every indicator below rolls over."""
    btc = btcusdt(spark, sf_dir)
    key = F.struct(F.col("time"), F.col("bid"))
    pticks = btc.select(
        F.window("time", "1 minute").start.alias("m"),
        "time",
        "bid",
        F.round(F.col("price") * 100, 0).cast("long").alias("price_c"),
        F.round(F.col("quantity") * 100000, 0).cast("long").alias("qty_u"),
    )
    return (
        pticks.groupBy("m")
        .agg(
            F.min_by("price_c", F.struct("time", "bid")).alias("open_c"),
            F.max("price_c").alias("high_c"),
            F.min("price_c").alias("low_c"),
            F.max_by("price_c", F.struct("time", "bid")).alias("close_c"),
            F.sum("qty_u").alias("vol_u"),
            F.count("*").alias("trades"),
        )
        .withColumn("day", F.col("m").cast("date"))
    )


# ---------------------------------------------------------------------------
# Bollinger bands
# ---------------------------------------------------------------------------

BOLL_N = 20  # SMA window (rows)
BOLL_K = 2  # band half-width in sample stddevs


@register(
    "q_ext_bollinger",
    oracle="WITH "
    + _CANDLES_CTE
    + f"""
, w AS (
  SELECT m, close_c,
         count(*) OVER fr AS n,
         -- exact BIGINT window sums over cents (order-independent);
         -- max close_c ~ 1e7 cents -> sxx term 1e14 x 20 rows = 2e15,
         -- inside int64
         CAST(sum(close_c) OVER fr AS DOUBLE) AS sx,
         CAST(sum(close_c * close_c) OVER fr AS DOUBLE) AS sxx
  FROM candles
  WINDOW fr AS (PARTITION BY day ORDER BY m
                ROWS BETWEEN {BOLL_N - 1} PRECEDING AND CURRENT ROW)
)
SELECT m AS minute_start,
       round(close_c / 100.0, 2) AS close,
       CAST(n AS BIGINT) AS n,
       round(sx / n / 100.0, 6) AS sma,
       round((sx / n + {BOLL_K} * sqrt(greatest(n * sxx - sx * sx, 0)
                                       / (n * (n - 1)))) / 100.0, 6)
         AS upper_band,
       round((sx / n - {BOLL_K} * sqrt(greatest(n * sxx - sx * sx, 0)
                                       / (n * (n - 1)))) / 100.0, 6)
         AS lower_band
FROM w WHERE n > 1
""",
)
def q_ext_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands over the 1-minute closes: 20-row day-partitioned
    SMA +/- 2 sample standard deviations, computed from exact BIGINT
    component sums (n, Sx, Sxx) over ONE shared window frame — the
    q_win_rolling_corr discipline collapsed to a single series.  The
    warm-up edge keeps the conventional growing frame (band over however
    many rows exist), with n reported so consumers can mask; n=1 rows
    (undefined sample stddev) are dropped in both engines."""
    prepare(spark)
    c = _candles_c(spark, sf_dir)
    fr = (
        Window.partitionBy("day")
        .orderBy("m")
        .rowsBetween(-(BOLL_N - 1), 0)
    )
    n = F.count("*").over(fr)
    sx = F.sum("close_c").over(fr).cast("double")
    sxx = (
        F.sum(F.col("close_c") * F.col("close_c")).over(fr).cast("double")
    )
    sd = F.sqrt(
        F.greatest(n * sxx - sx * sx, F.lit(0.0)) / (n * (n - 1))
    )
    return (
        c.select(
            F.col("m").alias("minute_start"),
            F.round(F.col("close_c") / 100.0, 2).alias("close"),
            n.cast("long").alias("n"),
            F.round(sx / n / 100.0, 6).alias("sma"),
            F.round((sx / n + BOLL_K * sd) / 100.0, 6).alias("upper_band"),
            F.round((sx / n - BOLL_K * sd) / 100.0, 6).alias("lower_band"),
        )
        .filter(F.col("n") > 1)
    )


# ---------------------------------------------------------------------------
# Donchian channel breakouts
# ---------------------------------------------------------------------------

DON_N = 20  # lookback (prior rows, current bar excluded)


@register(
    "q_ext_donchian",
    oracle="WITH "
    + _CANDLES_CTE
    + f"""
, w AS (
  SELECT m, close_c,
         count(*) OVER fr AS n_prior,
         max(high_c) OVER fr AS hh,
         min(low_c) OVER fr AS ll
  FROM candles
  WINDOW fr AS (PARTITION BY day ORDER BY m
                ROWS BETWEEN {DON_N} PRECEDING AND 1 PRECEDING)
)
SELECT m AS minute_start,
       round(close_c / 100.0, 2) AS close,
       CAST(n_prior AS BIGINT) AS n_prior,
       round(hh / 100.0, 2) AS upper_ch,
       round(ll / 100.0, 2) AS lower_ch,
       round((hh + ll) / 200.0, 3) AS mid_ch,
       CASE WHEN close_c > hh THEN 1 ELSE 0 END AS breakout_up,
       CASE WHEN close_c < ll THEN 1 ELSE 0 END AS breakout_down
FROM w WHERE n_prior > 0
""",
)
def q_ext_donchian(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Donchian channel: rolling highest-high / lowest-low of the PRIOR
    20 bars (current bar excluded — the breakout test compares today's
    close against yesterday's channel, the turtle-trading rule), with
    integer breakout flags.  Pure integer min/max/compare — exact at
    any scale; the only doubles are the final /100 display divisions,
    the identical expression in both engines."""
    prepare(spark)
    c = _candles_c(spark, sf_dir)
    fr = Window.partitionBy("day").orderBy("m").rowsBetween(-DON_N, -1)
    n_prior = F.count("*").over(fr)
    hh = F.max("high_c").over(fr)
    ll = F.min("low_c").over(fr)
    return (
        c.select(
            F.col("m").alias("minute_start"),
            F.round(F.col("close_c") / 100.0, 2).alias("close"),
            n_prior.cast("long").alias("n_prior"),
            F.round(hh / 100.0, 2).alias("upper_ch"),
            F.round(ll / 100.0, 2).alias("lower_ch"),
            F.round((hh + ll) / 200.0, 3).alias("mid_ch"),
            F.when(F.col("close_c") > hh, 1).otherwise(0).alias("breakout_up"),
            F.when(F.col("close_c") < ll, 1).otherwise(0).alias(
                "breakout_down"
            ),
        )
        .filter(F.col("n_prior") > 0)
    )


# ---------------------------------------------------------------------------
# On-balance volume
# ---------------------------------------------------------------------------


@register(
    "q_ext_obv",
    oracle="WITH "
    + _CANDLES_CTE
    + """
, d AS (
  SELECT m, day, close_c, vol_u,
         CASE
           WHEN lag(close_c) OVER dw IS NULL THEN 0
           WHEN close_c > lag(close_c) OVER dw THEN 1
           WHEN close_c < lag(close_c) OVER dw THEN -1
           ELSE 0
         END AS direction
  FROM candles
  WINDOW dw AS (PARTITION BY day ORDER BY m)
)
SELECT m AS minute_start, direction,
       -- exact BIGINT running sum of signed 1e-5-unit volume
       CAST(sum(direction * vol_u) OVER (
              PARTITION BY day ORDER BY m
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS obv_u,
       round(CAST(sum(direction * vol_u) OVER (
              PARTITION BY day ORDER BY m
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) / 100000.0, 5) + 0.0 AS obv
FROM d
""",
)
def q_ext_obv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """On-balance volume per session day: cumulative signed minute
    volume, direction = sign of the close-to-close change (first bar of
    the day contributes 0).  The running sum is exact BIGINT over
    1e-5-unit volumes — order-independent — and the display double is
    one deterministic division (+0.0 canonicalizes the signed zero a
    negative-then-flat day can produce)."""
    prepare(spark)
    c = _candles_c(spark, sf_dir)
    dw = Window.partitionBy("day").orderBy("m")
    prev = F.lag("close_c").over(dw)
    direction = (
        F.when(prev.isNull(), 0)
        .when(F.col("close_c") > prev, 1)
        .when(F.col("close_c") < prev, -1)
        .otherwise(0)
    )
    d = c.select("m", "day", "vol_u", direction.alias("direction"))
    run = dw.rowsBetween(Window.unboundedPreceding, 0)
    obv_u = F.sum(F.col("direction") * F.col("vol_u")).over(run)
    return d.select(
        F.col("m").alias("minute_start"),
        "direction",
        obv_u.cast("long").alias("obv_u"),
        (F.round(obv_u.cast("double") / 100000.0, 5) + F.lit(0.0)).alias(
            "obv"
        ),
    )


# ---------------------------------------------------------------------------
# Average true range (SMA form)
# ---------------------------------------------------------------------------

ATR_N = 14


@register(
    "q_ext_atr",
    oracle="WITH "
    + _CANDLES_CTE
    + f"""
, tr AS (
  SELECT m, day,
         -- true range in cents: first bar of the day falls back to
         -- high-low (no prior close), the classic Wilder convention
         CASE
           WHEN lag(close_c) OVER dw IS NULL THEN high_c - low_c
           ELSE greatest(high_c - low_c,
                         abs(high_c - lag(close_c) OVER dw),
                         abs(low_c - lag(close_c) OVER dw))
         END AS tr_c
  FROM candles
  WINDOW dw AS (PARTITION BY day ORDER BY m)
)
SELECT m AS minute_start,
       round(tr_c / 100.0, 2) AS true_range,
       CAST(count(*) OVER fr AS BIGINT) AS n,
       round(CAST(sum(tr_c) OVER fr AS DOUBLE)
             / count(*) OVER fr / 100.0, 6) AS atr
FROM tr
WINDOW fr AS (PARTITION BY day ORDER BY m
              ROWS BETWEEN {ATR_N - 1} PRECEDING AND CURRENT ROW)
""",
)
def q_ext_atr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average true range (14-bar SMA form) per session day: true range
    in exact cents (greatest of high-low and the two gap terms against
    the prior close; first bar of the day = high-low), then a rolling
    integer-sum mean.  The Wilder-recurrence form is q_ext_rsi's
    machinery; the SMA form is the window-exact variant that
    parallelizes as a plain frame."""
    prepare(spark)
    c = _candles_c(spark, sf_dir)
    dw = Window.partitionBy("day").orderBy("m")
    prev = F.lag("close_c").over(dw)
    tr_c = F.when(
        prev.isNull(), F.col("high_c") - F.col("low_c")
    ).otherwise(
        F.greatest(
            F.col("high_c") - F.col("low_c"),
            F.abs(F.col("high_c") - prev),
            F.abs(F.col("low_c") - prev),
        )
    )
    tr = c.select("m", "day", tr_c.alias("tr_c"))
    fr = (
        Window.partitionBy("day")
        .orderBy("m")
        .rowsBetween(-(ATR_N - 1), 0)
    )
    n = F.count("*").over(fr)
    return tr.select(
        F.col("m").alias("minute_start"),
        F.round(F.col("tr_c") / 100.0, 2).alias("true_range"),
        n.cast("long").alias("n"),
        F.round(
            F.sum("tr_c").over(fr).cast("double") / n / 100.0, 6
        ).alias("atr"),
    )


# ---------------------------------------------------------------------------
# Stochastic oscillator
# ---------------------------------------------------------------------------

STOCH_N = 14  # %K lookback
STOCH_D = 3  # %D smoothing (explicit 3-term mean via lags)


@register(
    "q_ext_stochastic",
    oracle="WITH "
    + _CANDLES_CTE
    + f"""
, w AS (
  SELECT m, day, close_c,
         count(*) OVER fr AS n,
         max(high_c) OVER fr AS hh,
         min(low_c) OVER fr AS ll
  FROM candles
  WINDOW fr AS (PARTITION BY day ORDER BY m
                ROWS BETWEEN {STOCH_N - 1} PRECEDING AND CURRENT ROW)
), k AS (
  -- %K only once the lookback is full; flat 14-bar range -> NULL
  SELECT m, day, n,
         CASE WHEN n = {STOCH_N}
              THEN 100.0 * (close_c - ll) / nullif(hh - ll, 0) END AS pct_k
  FROM w
)
SELECT m AS minute_start, CAST(n AS BIGINT) AS n,
       round(pct_k, 5) AS pct_k,
       -- explicit {STOCH_D}-term mean via lags: a deterministic
       -- expression tree, not an engine-ordered window sum of doubles
       round((pct_k + lag(pct_k, 1) OVER dw + lag(pct_k, 2) OVER dw)
             / {STOCH_D}.0, 5) AS pct_d
FROM k
WINDOW dw AS (PARTITION BY day ORDER BY m)
""",
)
def q_ext_stochastic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stochastic oscillator per session day: %K = position of the
    close inside the trailing 14-bar high-low range (defined only once
    the lookback is full; NULL on a flat range), %D = 3-bar mean of %K
    written as an explicit lag sum — three doubles added in a fixed
    expression order, immune to the engine-ordered window-sum
    divergence the sf1 drill caught on double frames."""
    prepare(spark)
    c = _candles_c(spark, sf_dir)
    fr = (
        Window.partitionBy("day")
        .orderBy("m")
        .rowsBetween(-(STOCH_N - 1), 0)
    )
    n = F.count("*").over(fr)
    hh = F.max("high_c").over(fr)
    ll = F.min("low_c").over(fr)
    rng = hh - ll
    pct_k = F.when(
        n == STOCH_N,
        100.0
        * (F.col("close_c") - ll)
        / F.when(rng != 0, rng),
    )
    k = c.select(
        "m", "day", n.cast("long").alias("n"), pct_k.alias("pct_k")
    )
    dw = Window.partitionBy("day").orderBy("m")
    return k.select(
        F.col("m").alias("minute_start"),
        "n",
        F.round("pct_k", 5).alias("pct_k"),
        F.round(
            (
                F.col("pct_k")
                + F.lag("pct_k", 1).over(dw)
                + F.lag("pct_k", 2).over(dw)
            )
            / float(STOCH_D),
            5,
        ).alias("pct_d"),
    )
