"""Driver-table loaders (TESTDATA.md).

All queries take ``(spark, sf_dir)`` and read parquet from ``sf_dir``.
Loading is lazy — Catalyst prunes columns and pushes filters to the
parquet scan, so "load the table" costs nothing until an action runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects.  Read it as a long (legacy conf) and truncate
    nanos -> micros, matching DuckDB's ns->us truncation."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if isinstance(df.schema["ts"].dataType, T.LongType):
        # integer DIV: float division would lose precision at int64 scale
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every driver table as a temp view so plans can be
    declared in Spark SQL where that reads more clearly than the
    DataFrame API (same Catalyst plan either way)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
