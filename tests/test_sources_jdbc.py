"""JDBC sink parity (SURVEY.md §2.1): the reference bulk-loads TSV into
Aurora MySQL (lambda_function.py:26-32); the engine's equivalent is
df.write.jdbc.  The container bakes no MySQL driver in, but pyspark
ships Apache Derby (an embedded pure-Java JDBC database) in its own
jars directory — so the writer/reader codepath IS exercised end-to-end:
a real JDBC write through Spark's JdbcUtils (connection-per-partition,
batched INSERTs, dialect type mapping) and a real read-back through
spark.read.jdbc, compared row-for-row.  Against Aurora only the URL and
driver class change.
"""

from __future__ import annotations

import pytest

from binancedatapipelineinaws_spark.canonical import btcusdt
from binancedatapipelineinaws_spark.sources.tsv import (
    read_jdbc_table,
    write_btcusdt_jdbc,
)

SF = "/root/testdata/sf0.001"

DERBY_PROPS = {"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"}


def _derby_url(tmp_path, name="binance"):
    return f"jdbc:derby:{tmp_path}/{name};create=true"


def _rows(df):
    return sorted(
        tuple(r) for r in df.select(sorted(df.columns)).collect()
    )


def test_jdbc_write_read_roundtrip(spark, tmp_path):
    df = btcusdt(spark, SF).limit(50).cache()
    url = _derby_url(tmp_path)
    write_btcusdt_jdbc(df, url=url, properties=DERBY_PROPS)
    back = read_jdbc_table(spark, url, "btcusdt", properties=DERBY_PROPS)
    assert set(back.columns) == set(df.columns)
    assert _rows(back) == _rows(df)


def test_jdbc_append_mode_accumulates(spark, tmp_path):
    df = btcusdt(spark, SF).limit(10).cache()
    url = _derby_url(tmp_path, "binance_append")
    write_btcusdt_jdbc(df, url=url, properties=DERBY_PROPS)
    write_btcusdt_jdbc(df, url=url, properties=DERBY_PROPS)
    back = read_jdbc_table(
        spark, url, "btcusdt", properties=DERBY_PROPS
    )
    assert back.count() == 2 * df.count()
    # every original row appears exactly twice
    assert _rows(back) == sorted(_rows(df) + _rows(df))


def test_jdbc_missing_driver_is_actionable(spark):
    # the Aurora path on a cluster WITHOUT the MySQL jar must fail at
    # driver resolution (classloader), not corrupt anything
    df = btcusdt(spark, SF).limit(1)
    with pytest.raises(Exception, match="ClassNotFound|No suitable driver"):
        write_btcusdt_jdbc(
            df,
            url="jdbc:mysql://localhost:1/binance",
            properties={"driver": "com.mysql.cj.jdbc.Driver", "user": "x"},
        )
