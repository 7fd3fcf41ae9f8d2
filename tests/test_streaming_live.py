"""Live-source streaming parity (SURVEY.md §2.8): the reference's EP1
consumes a live WebSocket (main.py:30-35).  The engine's live-TCP
equivalent is the socket source; these tests drive it against a real
local TCP server, and the rate source variant at a controlled rate.
Both feed the SAME canonicalization plan as the file-replay tests.
"""

from __future__ import annotations

import socket
import threading
import time

from binancedatapipelineinaws_spark.streaming.pipeline import (
    canonical_stream,
    parse_tick_lines,
    read_tick_stream_rate,
    read_tick_stream_socket,
)

# wire format: 8-dp decimal strings (FIXTURES.md A1 / main.py:56-66)
TICK_LINES = [
    "1001\tBTCUSDT\t30123.45\t0.00500000\t1700000000000\ttrue",
    "1002\tBTCUSDT\t30124.00\t0.01000000\t1700000001000\tfalse",
    "1003\tBTCUSDT\t30125.55\t0.02500000\t1700000002000\ttrue",
]


def _serve_lines(server: socket.socket, payload: bytes, done: threading.Event):
    conn, _ = server.accept()
    try:
        conn.sendall(payload)
        # keep the connection open until the query has consumed the rows
        done.wait(timeout=60)
    finally:
        conn.close()


def test_socket_source_feeds_canonical_pipeline(spark, tmp_path):
    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("127.0.0.1", 0))
    server.listen(1)
    port = server.getsockname()[1]
    done = threading.Event()
    payload = ("\n".join(TICK_LINES) + "\n").encode()
    t = threading.Thread(target=_serve_lines, args=(server, payload, done))
    t.start()
    try:
        canonical = canonical_stream(read_tick_stream_socket(spark, port=port))
        q = (
            canonical.writeStream.format("memory")
            .queryName("socket_ticks")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(processingTime="500 milliseconds")
            .start()
        )
        try:
            deadline = time.time() + 90
            while time.time() < deadline:
                if spark.sql("SELECT count(*) FROM socket_ticks").first()[0] >= 3:
                    break
                time.sleep(0.5)
            rows = {
                r.bid: r for r in spark.sql("SELECT * FROM socket_ticks").collect()
            }
            assert set(rows) == {1001, 1002, 1003}
            r = rows[1001]
            assert r.parameter == "BTCUSDT"
            assert float(r.price) == 30123.45
            assert r.maker == 1  # is_buyer_maker=true -> 1
        finally:
            q.stop()
    finally:
        done.set()
        t.join(timeout=10)
        server.close()


def test_rate_source_synthesizes_valid_ticks(spark, tmp_path):
    canonical = canonical_stream(read_tick_stream_rate(spark, rows_per_second=500))
    q = (
        canonical.writeStream.format("memory")
        .queryName("rate_ticks")
        .option("checkpointLocation", str(tmp_path / "ckpt_rate"))
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql("SELECT count(*) FROM rate_ticks").first()[0] >= 100:
                break
            time.sleep(0.5)
        sample = spark.sql(
            "SELECT min(price) AS lo, max(price) AS hi,"
            " min(quantity) AS qlo, count(DISTINCT bid) AS ids,"
            " count(*) AS n FROM rate_ticks"
        ).first()
        assert sample.n >= 100
        assert sample.ids == sample.n  # rate `value` is unique
        assert sample.lo >= 30000.0
        assert sample.qlo > 0
    finally:
        q.stop()


def test_parse_tick_lines_roundtrip(spark):
    # the socket parse projection matches the schema-applied CSV read
    df = spark.createDataFrame([(l,) for l in TICK_LINES], "value string")
    parsed = parse_tick_lines(df)
    assert [f.name for f in parsed.schema.fields] == [
        "trade_id",
        "symbol",
        "price_str",
        "qty_str",
        "trade_time_ms",
        "is_buyer_maker",
    ]
    rows = {r.trade_id: r for r in parsed.collect()}
    assert rows[1002].is_buyer_maker is False
    assert rows[1003].qty_str == "0.02500000"


def test_kafka_source_parity_gated(spark):
    """The Kafka reader shares parse_tick_lines with the socket path;
    without the connector jar (this container) we assert the gate
    reports unavailable and the builder fails only at .load()."""
    import pytest

    from binancedatapipelineinaws_spark.streaming.pipeline import (
        kafka_source_available,
        read_tick_stream_kafka,
    )

    if kafka_source_available(spark):
        df = read_tick_stream_kafka(spark, "localhost:9092")
        assert df.schema["trade_id"].dataType.typeName() == "long"
    else:
        with pytest.raises(Exception):
            read_tick_stream_kafka(spark, "localhost:9092")
