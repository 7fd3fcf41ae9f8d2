"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over the engine's query registry
(``binancedatapipelineinaws_spark.registry``): every operator from
SURVEY.md §2 is registered there once, pairing the idiomatic-Spark
callable with its DuckDB oracle SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from binancedatapipelineinaws_spark import registry as _registry
from binancedatapipelineinaws_spark.plans import flagship as _flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q5 shape: 6-table join + agg + top-k) on
    /root/testdata/sf0.001."""
    return _flagship.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
