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


def test_jdbc_type_matrix_roundtrip(spark, tmp_path):
    """Every row of the MySQL<->Spark type decision matrix
    (sources/jdbc_types.py) round-trips boundary values through a real
    JDBC write + read-back.  Default target is embedded Derby; set
    SPARK_GRAFT_JDBC_URL (+ SPARK_GRAFT_JDBC_DRIVER) to point the SAME
    test at live MySQL."""
    import datetime
    import os
    from decimal import Decimal

    from binancedatapipelineinaws_spark.sources.jdbc_types import (
        JDBC_TYPE_MATRIX,
        matrix_create_types,
        matrix_schema,
    )

    url = os.environ.get("SPARK_GRAFT_JDBC_URL") or _derby_url(
        tmp_path, "typematrix"
    )
    driver = os.environ.get("SPARK_GRAFT_JDBC_DRIVER")
    props = {"driver": driver} if driver else dict(DERBY_PROPS)

    rows = [
        # (bid, parameter, price, quantity, time, maker)
        (0, "", Decimal("0.00"), Decimal("0.00000"),
         datetime.datetime(1970, 1, 1, 0, 0, 0), 0),
        (1, "BTCUSDT", Decimal("0.01"), Decimal("0.00001"),
         datetime.datetime(2024, 1, 2, 3, 4, 5, 123456), 1),
        (-1, "ETHBTCLONG", Decimal("-99999.99"), Decimal("-99.99999"),
         datetime.datetime(1969, 12, 31, 23, 59, 59), -128),
        (2**63 - 1, "Z", Decimal("99999.99"), Decimal("99.99999"),
         datetime.datetime(2038, 1, 19, 3, 14, 7, 999999), 127),
        (-(2**63), "ten_chars_", Decimal("12345.67"), Decimal("12.34567"),
         datetime.datetime(2000, 2, 29, 12, 0, 0), 1),
    ]
    df = spark.createDataFrame(rows, matrix_schema())
    (
        df.write.mode("overwrite")
        .option("createTableColumnTypes", matrix_create_types())
        .jdbc(url, "typematrix", properties=props)
    )
    back = read_jdbc_table(spark, url, "typematrix", properties=props)
    # restore width-narrowed columns (Derby has no TINYINT: ByteType
    # travels as SMALLINT and reads back short)
    for m in JDBC_TYPE_MATRIX:
        if m["readback_cast"]:
            back = back.withColumn(
                m["col"], back[m["col"]].cast(m["readback_cast"])
            )
        assert m["col"].upper() in {c.upper() for c in back.columns}
    got = sorted(tuple(r) for r in back.select(*df.columns).collect())
    assert got == sorted(rows)
    # post-cast schema parity with the declared matrix
    got_types = dict(back.select(*df.columns).dtypes)
    want_types = {m["col"]: m["spark"] for m in JDBC_TYPE_MATRIX}
    assert got_types == want_types
