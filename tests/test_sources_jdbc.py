"""JDBC sink parity (SURVEY.md §2.1): the reference bulk-loads TSV into
Aurora (lambda_function.py:26-32); the engine's equivalent is
df.write.jdbc.  No JDBC driver jar is baked into this container, so the
test drives the codepath up to driver resolution and skips when the JVM
cannot find one — on a cluster with the MySQL/Postgres jar installed the
same call performs the real load.
"""

from __future__ import annotations

import pytest

from binancedatapipelineinaws_spark.canonical import btcusdt
from binancedatapipelineinaws_spark.sources.tsv import write_btcusdt_jdbc

SF = "/root/testdata/sf0.001"


def test_jdbc_sink_codepath(spark):
    df = btcusdt(spark, SF).limit(10)
    try:
        write_btcusdt_jdbc(
            df,
            url="jdbc:mysql://localhost:1/binance",
            properties={"driver": "com.mysql.cj.jdbc.Driver", "user": "x"},
        )
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        if "ClassNotFoundException" in msg or "No suitable driver" in msg:
            pytest.skip("no JDBC driver jar in container (expected)")
        # a connection failure would mean the driver resolved and the
        # writer got as far as opening a connection — also a pass for
        # the codepath, but unexpected here
        raise
    pytest.fail("write unexpectedly succeeded against a closed port")
