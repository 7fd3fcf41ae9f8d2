"""End-to-end WebSocket ingest parity (VERDICT r7 item 8): the
reference's actual wire protocol (Binance trade WebSocket,
main.py:30-35) exercised against a local RFC 6455 server — handshake
validation, 7/16-bit frame lengths, fragmentation, ping/pong, the
combined-stream envelope, minute-file rotation — then the spooled
files fed through the full canonicalize -> window -> sink pipeline.
wss:// transport is exercised too: a self-signed local TLS server
drives the handshake + frames + ping/pong through a real ssl channel
with certificate verification on (test_wss_tls_handshake_end_to_end).
"""

from __future__ import annotations

import base64
import glob
import hashlib
import json
import socket
import struct
import threading

from pyspark.sql import functions as F

from binancedatapipelineinaws_spark.streaming import websocket as ws
from binancedatapipelineinaws_spark.streaming.pipeline import (
    canonical_stream,
    ohlcv_stream,
    read_tick_stream,
)

# --- a minimal RFC 6455 SERVER (test infrastructure) -------------------------


def _server_handshake(conn: socket.socket) -> None:
    req = b""
    while b"\r\n\r\n" not in req:
        chunk = conn.recv(4096)
        assert chunk, "client closed during handshake"
        req += chunk
    lines = req.split(b"\r\n\r\n")[0].decode("latin-1").split("\r\n")
    assert lines[0].startswith("GET "), lines[0]
    headers = {
        k.strip().lower(): v.strip()
        for k, _, v in (ln.partition(":") for ln in lines[1:])
    }
    assert headers.get("upgrade", "").lower() == "websocket"
    assert headers.get("sec-websocket-version") == "13"
    key = headers["sec-websocket-key"]
    # independent accept computation (don't trust the client module to
    # test the client module)
    accept = base64.b64encode(
        hashlib.sha1(
            (key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").encode()
        ).digest()
    ).decode()
    conn.sendall(
        (
            "HTTP/1.1 101 Switching Protocols\r\n"
            "Upgrade: websocket\r\n"
            "Connection: Upgrade\r\n"
            f"Sec-WebSocket-Accept: {accept}\r\n\r\n"
        ).encode()
    )


def _server_frame(opcode: int, payload: bytes, fin: bool = True) -> bytes:
    b1 = (0x80 if fin else 0x00) | opcode
    n = len(payload)
    if n < 126:
        return bytes([b1, n]) + payload
    if n < 1 << 16:
        return bytes([b1, 126]) + struct.pack(">H", n) + payload
    return bytes([b1, 127]) + struct.pack(">Q", n) + payload


def _read_client_frame(conn: socket.socket) -> tuple[int, bytes]:
    def rx(n):
        buf = b""
        while len(buf) < n:
            chunk = conn.recv(n - len(buf))
            assert chunk, "client closed mid-frame"
            buf += chunk
        return buf

    b1, b2 = rx(2)
    opcode = b1 & 0x0F
    assert b2 & 0x80, "client frame MUST be masked (RFC 6455 5.3)"
    n = b2 & 0x7F
    if n == 126:
        (n,) = struct.unpack(">H", rx(2))
    elif n == 127:
        (n,) = struct.unpack(">Q", rx(8))
    mask = rx(4)
    payload = bytes(b ^ mask[i % 4] for i, b in enumerate(rx(n)))
    return opcode, payload


def _trade(t, price, qty, trade_ms, maker=False, extra=None):
    msg = {
        "e": "trade",
        "E": trade_ms,
        "s": "BTCUSDT",
        "t": t,
        "p": price,
        "q": qty,
        "T": trade_ms,
        "m": maker,
    }
    if extra:
        msg.update(extra)
    return json.dumps(msg)


BASE_MS = 1_700_000_040_000  # minute boundary: 1_700_000_040 = 60 * n


def _serve_session(server: socket.socket, seen: dict) -> None:
    conn, _ = server.accept()
    try:
        _server_handshake(conn)
        # minute 0: one plain trade + one 16-bit-length frame (payload
        # padded past 125 bytes) + a combined-stream envelope
        conn.sendall(
            _server_frame(
                ws.OP_TEXT,
                _trade(1, "30000.10", "0.10000000", BASE_MS + 1_000).encode(),
            )
        )
        big = _trade(
            2,
            "30010.20",
            "0.20000000",
            BASE_MS + 2_000,
            maker=True,
            extra={"pad": "x" * 150},
        ).encode()
        assert len(big) > 125  # forces the 126 length form
        conn.sendall(_server_frame(ws.OP_TEXT, big))
        envelope = json.dumps(
            {
                "stream": "btcusdt@trade",
                "data": json.loads(
                    _trade(3, "29990.00", "0.30000000", BASE_MS + 30_000)
                ),
            }
        ).encode()
        conn.sendall(_server_frame(ws.OP_TEXT, envelope))
        # a ping mid-stream: the client must answer with an echo pong
        conn.sendall(_server_frame(ws.OP_PING, b"hb-1"))
        # a non-trade control message: must be ignored, not spooled
        conn.sendall(
            _server_frame(
                ws.OP_TEXT, json.dumps({"result": None, "id": 7}).encode()
            )
        )
        # minute 1 arrives -> the client must rotate minute 0 to .tsv;
        # delivered FRAGMENTED across two frames (text + continuation)
        frag = _trade(4, "30020.00", "0.40000000", BASE_MS + 61_000).encode()
        half = len(frag) // 2
        conn.sendall(_server_frame(ws.OP_TEXT, frag[:half], fin=False))
        conn.sendall(_server_frame(ws.OP_CONT, frag[half:]))
        # late trade for already-closed minute 0: goes to the CURRENT
        # file (the watermark drops it downstream), never reopens
        conn.sendall(
            _server_frame(
                ws.OP_TEXT,
                _trade(5, "29000.00", "9.00000000", BASE_MS + 5_000).encode(),
            )
        )
        # minute 2 -> rotates minute 1
        conn.sendall(
            _server_frame(
                ws.OP_TEXT,
                _trade(6, "30030.00", "0.50000000", BASE_MS + 121_000).encode(),
            )
        )
        # collect the pong before closing
        opcode, payload = _read_client_frame(conn)
        seen["pong"] = (opcode, payload)
        conn.sendall(_server_frame(ws.OP_CLOSE, struct.pack(">H", 1000)))
    finally:
        conn.close()


def test_ws_ingest_to_ohlcv_pipeline(spark, tmp_path):
    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("127.0.0.1", 0))
    server.listen(1)
    port = server.getsockname()[1]
    seen: dict = {}
    t = threading.Thread(target=_serve_session, args=(server, seen))
    t.start()

    spool = str(tmp_path / "spool")
    try:
        conn = ws.connect("127.0.0.1", port)
        stats = ws.spool_trades(conn, spool)
        conn.close()
    finally:
        t.join(timeout=30)
        server.close()

    # wire-level assertions
    assert seen["pong"] == (ws.OP_PONG, b"hb-1")  # ping answered, echoed
    assert stats.messages == 7  # 6 trades + 1 non-trade
    assert stats.trades == 6
    # minutes 0 and 1 rotated during the session; minute 2 closed on exit
    assert stats.files_closed == 3
    files = sorted(glob.glob(f"{spool}/*.tsv"))
    assert [f.rsplit("/", 1)[1] for f in files] == [
        "1700000040.tsv",
        "1700000100.tsv",
        "1700000160.tsv",
    ]
    assert glob.glob(f"{spool}/*.part") == []
    # the late trade landed in the minute-1 file (current at arrival),
    # and minute 0 was NOT reopened
    with open(f"{spool}/1700000100.tsv") as fh:
        minute1_ids = [ln.split("\t")[0] for ln in fh.read().splitlines()]
    assert minute1_ids == ["4", "5"]
    with open(f"{spool}/1700000040.tsv") as fh:
        assert [ln.split("\t")[0] for ln in fh.read().splitlines()] == [
            "1",
            "2",
            "3",
        ]

    # full pipeline: spooled files -> canonicalize -> windowed OHLCV.
    # All three files fit one availableNow batch (<= maxFilesPerTrigger),
    # so every trade — including late trade 5 — is admitted before the
    # watermark first advances; with a 0-second delay the watermark then
    # sits at the max event time (BASE+121 s), closing minutes 0 and 1
    # but not the still-open minute 2.  The append-mode flush happens on
    # a SECOND pass over the same checkpoint (the
    # test_streaming_ohlcv_matches_batch pattern).
    out = str(tmp_path / "candles")

    def run_candles():
        q = (
            ohlcv_stream(
                canonical_stream(read_tick_stream(spark, spool)),
                watermark="0 seconds",
            )
            .writeStream.format("parquet")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .option("path", out)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_candles()
    run_candles()
    rows = {
        r.m: r
        for r in spark.read.parquet(out)
        .selectExpr("CAST(minute_start AS LONG) AS m", "*")
        .collect()
    }
    assert set(rows) == {1_700_000_040, 1_700_000_100}
    # minute 0: trades 1, 2 (the 16-bit-length frame), 3 (the
    # combined-stream envelope) and the late-arriving 5; open/close by
    # event time, qty strings truncated [:-3] by canonicalization
    m0 = rows[1_700_000_040]
    assert (m0.open, m0.high, m0.low, m0.close) == (
        30000.1,
        30010.2,
        29000.0,
        29990.0,
    )
    assert m0.trades == 4
    assert abs(m0.volume - 9.6) < 1e-9
    # minute 1: the fragmented trade 4 only
    m1 = rows[1_700_000_100]
    assert (m1.open, m1.high, m1.low, m1.close, m1.trades) == (
        30020.0,
        30020.0,
        30020.0,
        30020.0,
        1,
    )
    assert abs(m1.volume - 0.4) < 1e-9


def test_handshake_rejects_bad_accept(tmp_path):
    """A server echoing the wrong Sec-WebSocket-Accept must be
    refused — a mis-negotiated stream can't feed the pipeline."""

    def bad_server(server):
        conn, _ = server.accept()
        try:
            req = b""
            while b"\r\n\r\n" not in req:
                req += conn.recv(4096)
            conn.sendall(
                b"HTTP/1.1 101 Switching Protocols\r\n"
                b"Upgrade: websocket\r\n"
                b"Connection: Upgrade\r\n"
                b"Sec-WebSocket-Accept: bm90LXRoZS1yaWdodC1rZXk=\r\n\r\n"
            )
        finally:
            conn.close()

    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("127.0.0.1", 0))
    server.listen(1)
    port = server.getsockname()[1]
    t = threading.Thread(target=bad_server, args=(server,))
    t.start()
    try:
        import pytest

        with pytest.raises(ConnectionError, match="Accept mismatch"):
            ws.connect("127.0.0.1", port)
    finally:
        t.join(timeout=10)
        server.close()


def test_trade_json_to_wire_contract():
    line = ws.trade_json_to_wire(
        _trade(42, "30123.45678901", "0.00500000", 1_700_000_000_000, True)
    )
    assert line == (
        "42\tBTCUSDT\t30123.45678901\t0.00500000\t1700000000000\ttrue"
    )
    # malformed / non-trade inputs are dropped, not raised
    assert ws.trade_json_to_wire("not json") is None
    assert ws.trade_json_to_wire('{"result": null, "id": 1}') is None
    assert ws.trade_json_to_wire(json.dumps({"e": "aggTrade"})) is None


def test_frame_codec_roundtrip_all_length_forms():
    """Property-style codec check over a loopback socket pair: random
    payload sizes spanning all three length encodings (7-bit, 16-bit,
    and the 64-bit form >= 65536 bytes — unexercised by the pipeline
    tests), random fragmentation splits, pings interleaved; every
    message must reassemble byte-identically and in order."""
    import random

    rng = random.Random(8)
    sizes = [0, 1, 125, 126, 127, 65535, 65536, 70_001] + [
        rng.randrange(0, 3000) for _ in range(10)
    ]
    payloads = [bytes(rng.randrange(256) for _ in range(min(n, 2048))) * max(1, n // max(1, min(n, 2048))) for n in sizes]
    payloads = [p[:n] for p, n in zip(payloads, sizes)]

    a, b = socket.socketpair()
    try:
        wire = b""
        for i, p in enumerate(payloads):
            if i % 3 == 2 and len(p) > 1:
                # fragment: text + continuation
                cut = rng.randrange(1, len(p))
                wire += _server_frame(ws.OP_BINARY, p[:cut], fin=False)
                wire += _server_frame(ws.OP_CONT, p[cut:])
            else:
                wire += _server_frame(ws.OP_BINARY, p)
            if i % 4 == 1:
                wire += _server_frame(ws.OP_PING, b"p%d" % i)
        wire += _server_frame(ws.OP_CLOSE, struct.pack(">H", 1000))

        def feed():
            a.sendall(wire)

        t = threading.Thread(target=feed)
        t.start()
        conn = ws.WSConn(b)
        got = [p for op, p in ws.recv_messages(conn) if op == ws.OP_BINARY]
        t.join(timeout=30)
        assert [len(g) for g in got] == [len(p) for p in payloads]
        assert got == payloads
    finally:
        a.close()
        b.close()


def test_recv_rejects_oversized_and_malformed_control_frames():
    """ADVICE r8 hardening: a declared frame length above
    MAX_FRAME_BYTES must raise before any payload is buffered, and
    control frames that are fragmented or carry > 125 bytes are
    protocol errors (RFC 6455 §5.5)."""
    import pytest

    def run(wire):
        a, b = socket.socketpair()
        try:
            a.sendall(wire)
            conn = ws.WSConn(b)
            with pytest.raises(ConnectionError):
                list(ws.recv_messages(conn))
        finally:
            a.close()
            b.close()

    # 64-bit length header declaring 2^40 bytes, no payload sent: the
    # reader must reject on the declared length, not block buffering
    run(b"\x82\x7f" + struct.pack(">Q", 1 << 40))
    # fragmented ping (FIN=0 control frame)
    run(bytes([0x00 | ws.OP_PING, 2]) + b"ab")
    # ping with a 16-bit extended length of 300 (> 125)
    run(bytes([0x80 | ws.OP_PING, 126]) + struct.pack(">H", 300) + b"x" * 300)
    # fragmented message whose reassembly would exceed the cap: a small
    # first fragment, then a continuation DECLARING cap-50 bytes (each
    # frame under the per-frame cap, sum over it) — must raise on the
    # declared length with no continuation payload on the wire
    run(
        _server_frame(ws.OP_BINARY, b"x" * 100, fin=False)
        + bytes([ws.OP_CONT, 127])
        + struct.pack(">Q", ws.MAX_FRAME_BYTES - 50)
    )


def test_wss_tls_handshake_end_to_end(tmp_path):
    """The reference front door is wss:// (main.py:30-35); this drives
    the client's injectable-transport path over a REAL ssl handshake:
    self-signed cert, ssl-wrapped loopback server, full RFC 6455
    handshake + trade frames + clean close THROUGH the TLS channel,
    with certificate verification ON in the client."""
    import ssl
    import subprocess

    cert = tmp_path / "cert.pem"
    key = tmp_path / "key.pem"
    subprocess.run(
        [
            "openssl", "req", "-x509", "-newkey", "rsa:2048",
            "-keyout", str(key), "-out", str(cert), "-days", "1",
            "-nodes", "-subj", "/CN=localhost",
            "-addext", "subjectAltName=DNS:localhost,IP:127.0.0.1",
        ],
        check=True,
        capture_output=True,
    )

    srv_ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    srv_ctx.load_cert_chain(str(cert), str(key))

    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("127.0.0.1", 0))
    server.listen(1)
    port = server.getsockname()[1]

    def tls_server():
        raw, _ = server.accept()
        conn = srv_ctx.wrap_socket(raw, server_side=True)
        try:
            _server_handshake(conn)
            conn.sendall(
                _server_frame(
                    ws.OP_TEXT,
                    _trade(7, "30000.10000000", "0.25000000",
                           1_700_000_060_000).encode(),
                )
            )
            conn.sendall(_server_frame(ws.OP_PING, b"keepalive"))
            conn.sendall(
                _server_frame(
                    ws.OP_TEXT,
                    _trade(8, "30001.00000000", "0.50000000",
                           1_700_000_061_000, True).encode(),
                )
            )
            # client must answer the ping THROUGH TLS before close
            op, payload = _read_client_frame(conn)
            assert (op, payload) == (ws.OP_PONG, b"keepalive")
            conn.sendall(_server_frame(ws.OP_CLOSE, struct.pack(">H", 1000)))
        finally:
            conn.close()

    t = threading.Thread(target=tls_server)
    t.start()
    try:
        cli_ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
        cli_ctx.load_verify_locations(str(cert))
        cli_ctx.check_hostname = True
        raw = socket.create_connection(("127.0.0.1", port), timeout=30)
        tls_sock = cli_ctx.wrap_socket(raw, server_hostname="localhost")
        assert tls_sock.version() is not None  # TLS actually negotiated
        conn = ws.connect("localhost", port, sock=tls_sock)
        msgs = [p for op, p in ws.recv_messages(conn) if op == ws.OP_TEXT]
        tls_sock.close()
    finally:
        t.join(timeout=30)
        server.close()

    lines = [ws.trade_json_to_wire(m.decode()) for m in msgs]
    assert lines == [
        "7\tBTCUSDT\t30000.10000000\t0.25000000\t1700000060000\tfalse",
        "8\tBTCUSDT\t30001.00000000\t0.50000000\t1700000061000\ttrue",
    ]
