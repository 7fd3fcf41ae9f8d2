"""Batch end-to-end lifecycle (the reference's EP1->EP2->EP3 flow in
one pass): wire-format TSV with injected corruption -> quarantine
split -> canonical parquet table -> 1-min OHLCV -> 5-min rollup, with
conservation asserted at every boundary.  The per-stage queries each
have their own oracle row; this test proves the COMPOSITION loses
nothing between stages."""

from __future__ import annotations

import pyspark.sql.types as T
from pyspark.sql import functions as F

from binancedatapipelineinaws_spark.canonical import (
    canonicalize_btcusdt,
    ticks,
)
from binancedatapipelineinaws_spark.operators._util import dec_sum

SF = "/root/testdata/sf0.001"


def test_wire_to_rollup_conserves_every_row(spark, tmp_path):
    wire_cols = [
        "trade_id",
        "symbol",
        "price_str",
        "qty_str",
        "trade_time_ms",
        "is_buyer_maker",
    ]
    # stage 0: wire TSV with a deterministic corrupted subset
    wire = ticks(spark, SF).select(
        "trade_id",
        "symbol",
        F.when(F.col("trade_id") % 97 == 0, "X9.9X")
        .otherwise(F.col("price_str"))
        .alias("price_str"),
        "qty_str",
        "trade_time_ms",
        "is_buyer_maker",
    )
    n_total = wire.count()
    n_bad = wire.filter(F.col("trade_id") % 97 == 0).count()
    assert n_bad > 0
    src = str(tmp_path / "wire_tsv")
    wire.write.option("sep", "\t").mode("overwrite").csv(src)

    # stage 1: raw scan + quarantine split (one pass, two tables)
    raw_schema = T.StructType(
        [T.StructField(c, T.StringType()) for c in wire_cols]
    )
    raw = spark.read.option("sep", "\t").schema(raw_schema).csv(src)
    ok = raw.filter(F.col("price_str").try_cast("double").isNotNull())
    quarantined = raw.filter(
        F.col("price_str").try_cast("double").isNull()
    )
    assert quarantined.count() == n_bad
    assert ok.count() + quarantined.count() == n_total

    # stage 2: canonicalize the clean stream into the parquet table
    typed = ok.select(
        F.col("trade_id").cast("long").alias("trade_id"),
        "symbol",
        "price_str",
        "qty_str",
        F.col("trade_time_ms").cast("long").alias("trade_time_ms"),
        F.col("is_buyer_maker").cast("boolean").alias("is_buyer_maker"),
    )
    table = str(tmp_path / "btcusdt")
    canonicalize_btcusdt(typed).write.mode("overwrite").parquet(table)
    canon = spark.read.parquet(table)
    assert canon.count() == n_total - n_bad

    # stage 3: 1-min OHLCV off the table (same expressions as the
    # registered query, driven by the pipeline's own output)
    order_key = F.struct(F.col("time"), F.col("bid"))
    m1 = (
        canon.groupBy(
            F.window("time", "1 minute").start.alias("minute_start")
        )
        .agg(
            F.min_by("price", order_key).alias("open"),
            F.max("price").alias("high"),
            F.min("price").alias("low"),
            F.max_by("price", order_key).alias("close"),
            dec_sum("quantity", 5).alias("volume"),
            F.count("*").alias("trades"),
        )
        .cache()
    )
    assert m1.agg(F.sum("trades")).first()[0] == canon.count()

    # stage 4: hierarchical 5-min rollup FROM the 1-min candles (never
    # re-reading the fact table) — trades/volume conserve exactly,
    # high/low nest, open/close come from the first/last child candle
    w5 = F.window("minute_start", "5 minutes").start.alias("m5")
    key = F.struct(F.col("minute_start"))
    m5 = m1.groupBy(w5).agg(
        F.min_by("open", key).alias("open"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.max_by("close", key).alias("close"),
        # child volumes are exact 5-dp decimals serialized as double;
        # re-cast before summing so conservation is exact, not float
        F.sum(F.col("volume").cast("decimal(18,5)")).alias("volume"),
        F.sum("trades").alias("trades"),
    )
    assert m5.agg(F.sum("trades")).first()[0] == canon.count()
    dec5 = lambda c: F.sum(F.col(c).cast("decimal(18,5)"))
    assert (
        m1.agg(dec5("volume")).first()[0]
        == m5.agg(dec5("volume")).first()[0]
    )
    bad_nest = (
        m1.select(
            F.window("minute_start", "5 minutes").start.alias("m5"),
            "high",
            "low",
        )
        .join(
            m5.select("m5", F.col("high").alias("h5"), F.col("low").alias("l5")),
            "m5",
        )
        .filter((F.col("high") > F.col("h5")) | (F.col("low") < F.col("l5")))
    )
    assert bad_nest.count() == 0
