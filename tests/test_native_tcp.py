"""Native TCP protocol slice (port-9000 surface): Hello negotiation,
Ping/Pong, Query → Data(Native block) → EndOfStream, Exception packets,
and the declared subset rejections — both ends implementing the public
wire grammar (the container ships no clickhouse-client)."""

import pytest

from clickhouseocp_spark.engine import ChSparkEngine
from clickhouseocp_spark.native_tcp import (
    PROTOCOL_REVISION,
    ChNativeTcpServer,
    NativeTcpClient,
)


@pytest.fixture(scope="module")
def tcp_server(spark, sf_dir):
    eng = ChSparkEngine(sf_dir, spark=spark)
    srv = ChNativeTcpServer(eng, port=0).start()
    yield srv
    srv.shutdown()


@pytest.fixture()
def client(tcp_server):
    c = NativeTcpClient("127.0.0.1", tcp_server.port)
    yield c
    c.close()


def test_hello_negotiation(client):
    assert client.server_name == "clickhouseocp-spark"
    assert client.server_version == (25, 7)
    assert client.revision == PROTOCOL_REVISION
    assert client.timezone == "UTC"


def test_ping_pong(client):
    assert client.ping()
    assert client.ping()  # connection stays usable


def test_query_native_roundtrip(client):
    names, types, rows = client.execute(
        "SELECT number AS n, toString(number) AS s, "
        "if(number % 2 = 0, number / 2, NULL) AS h "
        "FROM numbers(5) ORDER BY n"
    )
    assert names == ["n", "s", "h"]
    assert [r[0] for r in rows] == [0, 1, 2, 3, 4]
    assert [r[1] for r in rows] == ["0", "1", "2", "3", "4"]
    assert rows[1][2] is None and rows[2][2] == 1.0
    assert any(t.startswith("Nullable(") for t in types)


def test_query_over_fixture_table(client):
    names, _types, rows = client.execute(
        "SELECT event_type, count() AS c FROM events "
        "GROUP BY event_type ORDER BY event_type"
    )
    assert names == ["event_type", "c"]
    assert [r[0] for r in rows] == [
        "click", "error", "purchase", "signup", "view",
    ]
    assert all(r[1] > 0 for r in rows)


def test_sequential_queries_one_connection(client):
    for k in (1, 7, 3):
        _n, _t, rows = client.execute(f"SELECT {k} AS v")
        assert rows == [(k,)]
        assert client.ping()


def test_exception_packet(client):
    with pytest.raises(RuntimeError, match=r"^\[62\]"):
        client.execute("SELECT definitely_not_a_function(1)")
    # the connection survives an exception
    _n, _t, rows = client.execute("SELECT 1 AS ok")
    assert rows == [(1,)]


def test_compression_rejected_before_trailing_block(tcp_server):
    """r14 ADVICE: a client that enables compression wraps the trailing
    end-of-external-tables Data packet in a compressed frame, so the
    server must reject at the compression flag — BEFORE parsing that
    block — or it misreads the stream and hangs in recv."""
    import socket as _socket

    from clickhouseocp_spark import native_tcp as nt

    sock = _socket.create_connection(
        ("127.0.0.1", tcp_server.port), timeout=10
    )
    try:
        r = nt._Reader(sock)
        hello = bytearray(nt._leb128(nt.CLIENT_HELLO))
        hello += nt._wstr("compressed-client")
        hello += nt._leb128(25) + nt._leb128(7)
        hello += nt._leb128(nt.PROTOCOL_REVISION)
        hello += nt._wstr("default") + nt._wstr("default") + nt._wstr("")
        sock.sendall(bytes(hello))
        assert r.varint() == nt.SERVER_HELLO
        r.string(), r.varint(), r.varint(), r.varint(), r.string()
        out = bytearray(nt._leb128(nt.CLIENT_QUERY))
        out += nt._wstr("")
        out += b"\x00"     # empty client info
        out += nt._wstr("")  # zero settings
        out += nt._leb128(2)   # stage: Complete
        out += nt._leb128(1)   # compression ENABLED
        out += nt._wstr("SELECT 1")
        # deliberately NO raw trailing Data packet — a compressing
        # client would send a compressed frame here instead
        sock.sendall(bytes(out))
        assert r.varint() == nt.SERVER_EXCEPTION
        int.from_bytes(r.read(4), "little", signed=True)
        name = r.string()
        msg = r.string()
        assert name == "NOT_IMPLEMENTED" and "compression" in msg
    finally:
        sock.close()


def test_malformed_column_raises_not_hangs(tcp_server):
    """r14 ADVICE: a genuinely malformed column must surface the decode
    error promptly instead of masking it as a short read and blocking
    until the 30 s socket timeout.  An unknown type string raises
    immediately (KeyError from the codec table); a corrupt length
    prefix that perpetually claims more bytes re-raises the original
    short-read error once the socket goes quiet."""
    from clickhouseocp_spark import native_tcp as nt

    c = NativeTcpClient("127.0.0.1", tcp_server.port)
    try:
        c._sock.settimeout(0.5)
        with pytest.raises(KeyError):
            c._r._buf = b"\x01x"
            c._decode_column("NoSuchType", 1)
        # String row whose varint length prefix claims ~1 TiB: every
        # decode attempt short-reads, the idle socket times out, and
        # the bounded loop re-raises with context
        c._r._buf = nt._leb128(1 << 40) + b"partial"
        with pytest.raises(ValueError, match="no further bytes"):
            c._decode_column("String", 1)
    finally:
        c.close()


def test_concurrent_connections(tcp_server):
    a = NativeTcpClient("127.0.0.1", tcp_server.port)
    b = NativeTcpClient("127.0.0.1", tcp_server.port)
    try:
        _n, _t, ra = a.execute("SELECT 10 AS v")
        _n, _t, rb = b.execute("SELECT 20 AS v")
        assert ra == [(10,)] and rb == [(20,)]
    finally:
        a.close()
        b.close()
