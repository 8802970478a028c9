"""Native TCP protocol slice — the port-9000 entry point.

The reference ships clickhouse-server with the native TCP port open
(`/root/reference/Dockerfile:203-206` exposes 9000 alongside HTTP 8123);
every other entry point (HTTP formats both directions, sessions,
readonly, EXPLAIN) already has an analog in ``server.py``.  This module
closes the protocol table with a minimal but real server-side
Hello / Ping / Query / Data(Native block) / Exception / EndOfStream
exchange over the existing ``formats.py`` Native codec.

Wire layout is the PUBLIC ClickHouse native protocol (as documented and
as implemented by the open-source drivers): LEB128 varints, varint-
length-prefixed strings, packet-type discriminators
(client: Hello=0 Query=1 Data=2 Cancel=3 Ping=4;
server: Hello=0 Data=1 Exception=2 Progress=3 Pong=4 EndOfStream=5),
and Native blocks prefixed by the block-info field list.  The protocol
revision is negotiated to ``min(client, server)``; this slice pins its
ceiling at 54058 (server timezone in Hello; client info in Query;
pre-54429 settings serialization, which well-behaved clients avoid by
sending zero settings).  Higher-revision client features (quota keys,
interserver secrets, settings-as-strings) are deliberately out of the
subset — a client announcing a higher revision still interoperates
because both sides speak the negotiated minimum.
"""

from __future__ import annotations

import socket
import socketserver
import threading

from clickhouseocp_spark.formats import _leb128, render_native

#: Protocol ceiling: server timezone in Hello, client info in Query.
PROTOCOL_REVISION = 54058
DBMS_MIN_REVISION_WITH_CLIENT_INFO = 54032
DBMS_MIN_REVISION_WITH_SERVER_TIMEZONE = 54058
DBMS_MIN_REVISION_WITH_TEMPORARY_TABLES = 50264
DBMS_MIN_REVISION_WITH_BLOCK_INFO = 51903

CLIENT_HELLO, CLIENT_QUERY, CLIENT_DATA, CLIENT_CANCEL, CLIENT_PING = range(5)
(SERVER_HELLO, SERVER_DATA, SERVER_EXCEPTION, SERVER_PROGRESS,
 SERVER_PONG, SERVER_END_OF_STREAM) = range(6)


class _Reader:
    """Exact-byte buffered reads over a socket (the wire has no framing
    beyond the packet grammar itself)."""

    def __init__(self, sock: socket.socket):
        self._sock = sock
        self._buf = b""

    def read(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise ConnectionError("peer closed mid-packet")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def varint(self) -> int:
        shift, val = 0, 0
        while True:
            b = self.read(1)[0]
            val |= (b & 0x7F) << shift
            if not b & 0x80:
                return val
            shift += 7

    def string(self) -> str:
        return self.read(self.varint()).decode("utf-8")

    def binstr(self) -> bytes:
        return self.read(self.varint())


def _wstr(s: str) -> bytes:
    b = s.encode("utf-8")
    return _leb128(len(b)) + b


def _block_info() -> bytes:
    """Default BlockInfo: field 1 (is_overflows=0), field 2
    (bucket_num=-1), end-of-fields 0."""
    return (
        _leb128(1) + b"\x00"
        + _leb128(2) + (-1).to_bytes(4, "little", signed=True)
        + _leb128(0)
    )


def _read_block_info(r: _Reader) -> None:
    while True:
        field = r.varint()
        if field == 0:
            return
        if field == 1:
            r.read(1)
        elif field == 2:
            r.read(4)
        else:  # unknown field: the grammar gives no lengths — bail
            raise ValueError(f"unknown BlockInfo field {field}")


def _read_block(r: _Reader, revision: int) -> int:
    """Consume one Native block header; only the EMPTY end-of-data
    marker is in the subset (external temporary tables are not)."""
    if revision >= DBMS_MIN_REVISION_WITH_TEMPORARY_TABLES:
        r.string()  # temporary table name
    if revision >= DBMS_MIN_REVISION_WITH_BLOCK_INFO:
        _read_block_info(r)
    n_cols = r.varint()
    n_rows = r.varint()
    if n_cols == 0 and n_rows == 0:
        return 0
    raise ValueError(
        "external (temporary) table data is out of the TCP subset — "
        "send the empty end-of-data block only"
    )


def _serve_connection(sock: socket.socket, engine) -> None:
    r = _Reader(sock)
    ptype = r.varint()
    if ptype != CLIENT_HELLO:
        sock.close()
        return
    r.string()  # client name
    r.varint()  # version major
    r.varint()  # version minor
    client_rev = r.varint()
    r.string()  # database
    r.string()  # user
    r.string()  # password
    revision = min(client_rev, PROTOCOL_REVISION)
    hello = bytearray(_leb128(SERVER_HELLO))
    hello += _wstr("clickhouseocp-spark")
    hello += _leb128(25) + _leb128(7) + _leb128(PROTOCOL_REVISION)
    if revision >= DBMS_MIN_REVISION_WITH_SERVER_TIMEZONE:
        hello += _wstr("UTC")
    sock.sendall(bytes(hello))

    while True:
        try:
            ptype = r.varint()
        except ConnectionError:
            return
        if ptype == CLIENT_PING:
            sock.sendall(_leb128(SERVER_PONG))
            continue
        if ptype == CLIENT_CANCEL:
            return
        if ptype == CLIENT_DATA:
            try:
                _read_block(r, revision)
            except ValueError:
                return
            continue
        if ptype != CLIENT_QUERY:
            return
        r.string()  # query id
        if revision >= DBMS_MIN_REVISION_WITH_CLIENT_INFO:
            kind = r.read(1)[0]
            if kind != 0:  # empty client info stops at the kind byte
                r.string()  # initial user
                r.string()  # initial query id
                r.string()  # initial address
                r.read(1)   # interface (TCP=1)
                r.string()  # os user
                r.string()  # client hostname
                r.string()  # client name
                r.varint()  # client version major
                r.varint()  # client version minor
                r.varint()  # client revision
        # settings: (name, value) pairs, empty name terminates; the
        # pre-54429 typed-value serialization is out of subset, so only
        # the terminator is accepted (clients send zero settings)
        name = r.string()
        if name:
            _send_exception(
                sock, 48, "NOT_IMPLEMENTED",
                "TCP subset: per-query settings are not supported — "
                "send zero settings",
            )
            return
        r.varint()  # stage (2 = Complete)
        compression = r.varint()
        query = r.string()
        # compression gates BEFORE the trailing data block: a client
        # that enabled compression wraps that Data packet in a
        # compressed frame, so parsing it raw would misread the stream
        # and hang in recv instead of delivering this exception
        # (r14 ADVICE)
        if compression:
            _send_exception(
                sock, 48, "NOT_IMPLEMENTED",
                "TCP subset: compression is not supported — connect "
                "with compression disabled",
            )
            return
        # trailing empty data block = end of external tables
        ptype = r.varint()
        if ptype != CLIENT_DATA:
            return
        if revision >= DBMS_MIN_REVISION_WITH_TEMPORARY_TABLES:
            r.string()
        if revision >= DBMS_MIN_REVISION_WITH_BLOCK_INFO:
            _read_block_info(r)
        if r.varint() != 0 or r.varint() != 0:
            _send_exception(
                sock, 48, "NOT_IMPLEMENTED",
                "TCP subset: external table data is not supported",
            )
            return
        try:
            df = engine.sql(query, dialect="clickhouse")
            block = render_native(df)
        except Exception as exc:  # noqa: BLE001 — wire-mapped error
            _send_exception(sock, 62, type(exc).__name__, str(exc)[:2000])
            continue
        data = bytearray(_leb128(SERVER_DATA))
        if revision >= DBMS_MIN_REVISION_WITH_TEMPORARY_TABLES:
            data += _wstr("")
        if revision >= DBMS_MIN_REVISION_WITH_BLOCK_INFO:
            data += _block_info()
        data += block
        data += _leb128(SERVER_END_OF_STREAM)
        sock.sendall(bytes(data))


def _send_exception(sock: socket.socket, code: int, name: str,
                    message: str) -> None:
    out = bytearray(_leb128(SERVER_EXCEPTION))
    out += code.to_bytes(4, "little", signed=True)
    out += _wstr(name)
    out += _wstr(message)
    out += _wstr("")  # stack trace
    out += b"\x00"    # no nested exception
    sock.sendall(bytes(out))


class ChNativeTcpServer:
    """Threaded native-protocol listener over a
    :class:`~clickhouseocp_spark.engine.ChSparkEngine` (same engine the
    HTTP server serves).  ``start()`` binds (port 0 → ephemeral, bound
    port in ``.port``); ``shutdown()`` stops the listener."""

    def __init__(self, engine, host: str = "127.0.0.1", port: int = 9000):
        self.engine = engine
        self.host, self.port = host, port
        self._server: socketserver.ThreadingTCPServer | None = None

    def start(self) -> "ChNativeTcpServer":
        eng = self.engine

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                try:
                    _serve_connection(self.request, eng)
                except (ConnectionError, ValueError, OSError):
                    pass

        socketserver.ThreadingTCPServer.allow_reuse_address = True
        self._server = socketserver.ThreadingTCPServer(
            (self.host, self.port), Handler
        )
        self.port = self._server.server_address[1]
        t = threading.Thread(target=self._server.serve_forever, daemon=True)
        t.start()
        return self

    def shutdown(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None


class NativeTcpClient:
    """Minimal native-protocol client for the same revision subset —
    the test-side counterpart (the container ships no clickhouse-client;
    both ends implement the same public wire grammar)."""

    def __init__(self, host: str, port: int, user: str = "default",
                 password: str = "", database: str = "default"):
        self._sock = socket.create_connection((host, port), timeout=30)
        self._r = _Reader(self._sock)
        hello = bytearray(_leb128(CLIENT_HELLO))
        hello += _wstr("clickhouseocp-spark-client")
        hello += _leb128(25) + _leb128(7) + _leb128(PROTOCOL_REVISION)
        hello += _wstr(database) + _wstr(user) + _wstr(password)
        self._sock.sendall(bytes(hello))
        assert self._r.varint() == SERVER_HELLO
        self.server_name = self._r.string()
        self.server_version = (self._r.varint(), self._r.varint())
        self.revision = min(self._r.varint(), PROTOCOL_REVISION)
        if self.revision >= DBMS_MIN_REVISION_WITH_SERVER_TIMEZONE:
            self.timezone = self._r.string()

    def ping(self) -> bool:
        self._sock.sendall(_leb128(CLIENT_PING))
        return self._r.varint() == SERVER_PONG

    def execute(self, query: str):
        """Run one query → (names, types, rows); raises RuntimeError on
        a server Exception packet."""
        out = bytearray(_leb128(CLIENT_QUERY))
        out += _wstr("")  # query id → server assigns
        if self.revision >= DBMS_MIN_REVISION_WITH_CLIENT_INFO:
            out += b"\x01"  # query kind: initial
            out += _wstr("") + _wstr("") + _wstr("[::1]:0")
            out += b"\x01"  # interface: TCP
            out += _wstr("tester") + _wstr("localhost")
            out += _wstr("clickhouseocp-spark-client")
            out += _leb128(25) + _leb128(7) + _leb128(PROTOCOL_REVISION)
        out += _wstr("")   # zero settings
        out += _leb128(2)  # stage: Complete
        out += _leb128(0)  # no compression
        out += _wstr(query)
        # end-of-external-tables marker: one empty block
        out += _leb128(CLIENT_DATA)
        if self.revision >= DBMS_MIN_REVISION_WITH_TEMPORARY_TABLES:
            out += _wstr("")
        if self.revision >= DBMS_MIN_REVISION_WITH_BLOCK_INFO:
            out += _block_info()
        out += _leb128(0) + _leb128(0)
        self._sock.sendall(bytes(out))

        names: list[str] = []
        types: list[str] = []
        rows: list[tuple] = []
        while True:
            ptype = self._r.varint()
            if ptype == SERVER_END_OF_STREAM:
                return names, types, rows
            if ptype == SERVER_EXCEPTION:
                code = int.from_bytes(self._r.read(4), "little", signed=True)
                name = self._r.string()
                msg = self._r.string()
                self._r.string()  # stack
                self._r.read(1)   # nested flag
                raise RuntimeError(f"[{code}] {name}: {msg}")
            if ptype == SERVER_PROGRESS:
                self._r.varint(), self._r.varint(), self._r.varint()
                continue
            if ptype != SERVER_DATA:
                raise RuntimeError(f"unexpected server packet {ptype}")
            if self.revision >= DBMS_MIN_REVISION_WITH_TEMPORARY_TABLES:
                self._r.string()
            if self.revision >= DBMS_MIN_REVISION_WITH_BLOCK_INFO:
                _read_block_info(self._r)
            n_cols = self._r.varint()
            n_rows = self._r.varint()
            if n_cols == 0:
                continue
            blk_names, blk_types, cols = [], [], []
            for _ in range(n_cols):
                blk_names.append(self._r.string())
                blk_types.append(self._r.string())
                vals = self._decode_column(blk_types[-1], n_rows)
                cols.append(vals)
            names, types = blk_names, blk_types
            rows.extend(zip(*cols) if cols else [])

    def _decode_column(self, ch_type: str, n_rows: int) -> list:
        """Stream-decode one column by buffering greedily: fixed-width
        types read exactly; strings/arrays read incrementally via the
        formats codec on a growing buffer."""
        from clickhouseocp_spark.formats import _native_decode_column

        import struct

        # greedy: try to decode from the current buffer, pulling more
        # bytes on short reads (columns are variable width; the codec
        # raises IndexError/struct.error when the buffer is truncated).
        # Bounded (r14 ADVICE): a genuinely malformed column — unknown
        # type string, corrupt length prefix — raises the same errors
        # regardless of buffer size, so a recv timeout / peer close /
        # oversized buffer re-raises the ORIGINAL decode error with
        # context instead of masking it as a hang.
        max_buf = 1 << 26  # 64 MiB — far past any one-block column
        while True:
            try:
                vals, pos = _native_decode_column(
                    ch_type, n_rows, bytes(self._r._buf), 0
                )
            except (IndexError, ValueError, struct.error) as exc:
                if len(self._r._buf) > max_buf:
                    raise ValueError(
                        f"cannot decode column of type {ch_type!r} "
                        f"after {len(self._r._buf)} buffered bytes"
                    ) from exc
                try:
                    chunk = self._r._sock.recv(65536)
                except (TimeoutError, socket.timeout):
                    raise ValueError(
                        f"cannot decode column of type {ch_type!r}: "
                        f"no further bytes arrived "
                        f"({len(self._r._buf)} buffered)"
                    ) from exc
                if not chunk:
                    raise ValueError(
                        f"peer closed mid-column while decoding "
                        f"{ch_type!r} ({len(self._r._buf)} buffered)"
                    ) from exc
                self._r._buf += chunk
                continue
            self._r._buf = self._r._buf[pos:]
            return vals

    def close(self) -> None:
        self._sock.close()
