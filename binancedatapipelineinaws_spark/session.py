"""SparkSession factory tuned for the engine.

Local mode is the test harness; the configs are chosen to also be the
right defaults on a large cluster: AQE on (runtime join re-planning,
skew-join splitting, partition coalescing), UTC session timezone
(parity with the reference's naive second-granularity timestamps,
main.py:56), Arrow enabled for the Pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "binance-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        # static conf (fixed at context creation): the oracle gate
        # collects FULL results by design, and at sf10 a 10M-row window
        # query serializes >1 GiB of task results — the 1g default
        # aborted q_win_rolling_corr's 60M-row compare.  On a real
        # cluster this bounds driver-side collects the same way.
        .config(
            "spark.driver.maxResultSize",
            os.environ.get("SPARK_MAX_RESULT", "16g"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config(
            "spark.sql.warehouse.dir",
            os.path.join(
                os.environ.get("TMPDIR", "/tmp"), "spark_graft_warehouse"
            ),
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def prepare(spark: SparkSession) -> SparkSession:
    """Idempotently apply runtime-settable configs to a session we did
    not create (the driver hands us one).  Timezone matters most: every
    epoch<->timestamp query assumes UTC, matching DuckDB's naive
    timestamps."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    return spark
