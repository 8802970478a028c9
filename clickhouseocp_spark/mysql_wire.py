"""MySQL wire-compatibility slice — the port-9004 entry point.

The reference ships clickhouse-server with the MySQL compatibility port
open (`/root/reference/Dockerfile:203-206,328` exposes 9004 alongside
HTTP 8123 and native TCP 9000).  After round 14's native-TCP slice this
was the last reference-exposed port family with no analog; this module
closes it the same way: a minimal but real server-side implementation of
the PUBLIC MySQL client/server protocol (as documented in the MySQL
internals manual and implemented by every connector):

- Initial Handshake v10 greeting → HandshakeResponse41 → OK (any
  credentials accepted, matching the slice's open-auth HTTP default),
- command phase: COM_QUERY → text resultset (column count,
  ColumnDefinition41 per column, EOF, lenenc-string rows, EOF),
  COM_PING/COM_INIT_DB/COM_QUIT, SET/USE statements acknowledged with
  OK (what real connectors send on connect),
- ERR packets with SQL state for failed queries.

Values travel in the MySQL TEXT protocol (every cell a length-encoded
string; NULL = 0xFB), so the typed work stays in Spark and the wire
rendering is a driver-side format step like the other terminal renders.
CLIENT_DEPRECATE_EOF is deliberately not offered: the classic
EOF-delimited resultset is the most widely understood framing and keeps
both ends of the subset small.  Queries execute through the ClickHouse
dialect front-end — the reference's MySQL port also speaks ClickHouse
SQL, not MySQL SQL.
"""

from __future__ import annotations

import datetime as _dt
import re
import socket
import socketserver
import struct
import threading

# --- capability flags (public protocol constants) ---
CLIENT_CONNECT_WITH_DB = 0x00000008
CLIENT_PROTOCOL_41 = 0x00000200
CLIENT_SECURE_CONNECTION = 0x00008000
CLIENT_PLUGIN_AUTH = 0x00080000
CLIENT_PLUGIN_AUTH_LENENC = 0x00200000

SERVER_CAPABILITIES = (
    CLIENT_PROTOCOL_41
    | CLIENT_SECURE_CONNECTION
    | CLIENT_PLUGIN_AUTH
    | CLIENT_CONNECT_WITH_DB
)

#: command bytes
COM_QUIT, COM_INIT_DB, COM_QUERY = 0x01, 0x02, 0x03
COM_PING = 0x0E

#: column type bytes (text protocol still labels every column)
MYSQL_TYPE_TINY = 0x01
MYSQL_TYPE_LONG = 0x03
MYSQL_TYPE_FLOAT = 0x04
MYSQL_TYPE_DOUBLE = 0x05
MYSQL_TYPE_LONGLONG = 0x08
MYSQL_TYPE_DATE = 0x0A
MYSQL_TYPE_DATETIME = 0x0C
MYSQL_TYPE_NEWDECIMAL = 0xF6
MYSQL_TYPE_VAR_STRING = 0xFD

SERVER_VERSION = "25.7.4-clickhouseocp-spark"
CHARSET_UTF8 = 33  # utf8_general_ci


def _lenenc_int(n: int) -> bytes:
    if n < 0xFB:
        return bytes([n])
    if n <= 0xFFFF:
        return b"\xfc" + struct.pack("<H", n)
    if n <= 0xFFFFFF:
        return b"\xfd" + struct.pack("<I", n)[:3]
    return b"\xfe" + struct.pack("<Q", n)


def _lenenc_str(b: bytes) -> bytes:
    return _lenenc_int(len(b)) + b


class _PacketIO:
    """MySQL packet framing: 3-byte little-endian payload length +
    1-byte sequence id.  Sequence ids restart at 0 for each command and
    increment per packet within one exchange."""

    def __init__(self, sock: socket.socket):
        self._sock = sock
        self._buf = b""
        self.seq = 0

    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise ConnectionError("peer closed mid-packet")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def read_packet(self) -> bytes:
        header = self._read_exact(4)
        length = int.from_bytes(header[:3], "little")
        self.seq = (header[3] + 1) & 0xFF
        return self._read_exact(length)

    def send_packet(self, payload: bytes) -> None:
        # the slice caps resultsets well under the 16 MiB split point
        self._sock.sendall(
            len(payload).to_bytes(3, "little")
            + bytes([self.seq])
            + payload
        )
        self.seq = (self.seq + 1) & 0xFF


def _ok_packet() -> bytes:
    # header 0x00, affected rows 0, last insert id 0, status, warnings
    return b"\x00\x00\x00" + struct.pack("<HH", 0x0002, 0)


def _eof_packet() -> bytes:
    return b"\xfe" + struct.pack("<HH", 0, 0x0002)


def _err_packet(code: int, sql_state: str, message: str) -> bytes:
    return (
        b"\xff"
        + struct.pack("<H", code)
        + b"#"
        + sql_state.encode("ascii")[:5].ljust(5, b"0")
        + message.encode("utf-8")[:1000]
    )


def _column_definition(name: str, spark_type: str) -> bytes:
    ctype, length, decimals = _map_type(spark_type)
    nb = name.encode("utf-8")
    return (
        _lenenc_str(b"def")        # catalog — always "def"
        + _lenenc_str(b"")         # schema
        + _lenenc_str(b"")         # table
        + _lenenc_str(b"")         # org_table
        + _lenenc_str(nb)          # name
        + _lenenc_str(nb)          # org_name
        + b"\x0c"                  # fixed-length fields length
        + struct.pack("<H", CHARSET_UTF8)
        + struct.pack("<I", length)
        + bytes([ctype])
        + struct.pack("<H", 0)     # flags
        + bytes([decimals])
        + b"\x00\x00"              # filler
    )


def _map_type(spark_type: str) -> tuple[int, int, int]:
    """Spark simpleString → (mysql type byte, display length, decimals).

    Decimals byte 31 marks a floating point (MySQL's convention for
    'not fixed'); text-protocol values are strings either way.
    """
    t = spark_type.lower()
    if t in ("tinyint", "boolean"):
        return MYSQL_TYPE_TINY, 4, 0
    if t in ("smallint", "int"):
        return MYSQL_TYPE_LONG, 11, 0
    if t == "bigint":
        return MYSQL_TYPE_LONGLONG, 20, 0
    if t == "float":
        return MYSQL_TYPE_FLOAT, 12, 31
    if t == "double":
        return MYSQL_TYPE_DOUBLE, 22, 31
    if t.startswith("decimal"):
        m = re.match(r"decimal\((\d+),(\d+)\)", t)
        p, s = (int(m.group(1)), int(m.group(2))) if m else (38, 6)
        return MYSQL_TYPE_NEWDECIMAL, p + 2, s
    if t == "date":
        return MYSQL_TYPE_DATE, 10, 0
    if t.startswith("timestamp"):
        return MYSQL_TYPE_DATETIME, 26, 6
    return MYSQL_TYPE_VAR_STRING, 65535, 0


def _render_text(v) -> bytes | None:
    """One cell in the MySQL text protocol (None → NULL byte upstream).

    Mirrors the CSV/TSV renders: bools as 1/0, datetimes in MySQL
    literal layout, arrays/structs via str() (the slice's resultsets
    are scalar-projected like the other terminal formats).
    """
    if v is None:
        return None
    if isinstance(v, bool):
        return b"1" if v else b"0"
    if isinstance(v, _dt.datetime):
        return v.strftime(
            "%Y-%m-%d %H:%M:%S.%f" if v.microsecond else "%Y-%m-%d %H:%M:%S"
        ).encode("ascii")
    if isinstance(v, _dt.date):
        return v.isoformat().encode("ascii")
    if isinstance(v, bytes):
        return v
    if isinstance(v, float):
        return repr(v).encode("ascii")
    return str(v).encode("utf-8")


#: statements connectors fire on connect that expect a bare OK
_ACK_STMT = re.compile(r"^\s*(SET|USE)\b", re.IGNORECASE)


def _send_resultset(io: _PacketIO, df, max_rows: int = 10_000) -> None:
    fields = df.schema.fields
    rows = df.limit(max_rows).collect()
    io.send_packet(_lenenc_int(len(fields)))
    for f in fields:
        io.send_packet(_column_definition(f.name, f.dataType.simpleString()))
    io.send_packet(_eof_packet())
    for row in rows:
        out = bytearray()
        for i in range(len(fields)):
            cell = _render_text(row[i])
            out += b"\xfb" if cell is None else _lenenc_str(cell)
        io.send_packet(bytes(out))
    io.send_packet(_eof_packet())


def _serve_connection(sock: socket.socket, engine) -> None:
    io = _PacketIO(sock)
    # --- Initial Handshake v10 greeting ---
    greeting = bytearray(b"\x0a")  # protocol version
    greeting += SERVER_VERSION.encode("ascii") + b"\x00"
    greeting += struct.pack("<I", threading.get_ident() & 0xFFFFFFFF)
    greeting += b"12345678" + b"\x00"  # auth-plugin-data part 1 + filler
    greeting += struct.pack("<H", SERVER_CAPABILITIES & 0xFFFF)
    greeting += bytes([CHARSET_UTF8])
    greeting += struct.pack("<H", 0x0002)  # status: autocommit
    greeting += struct.pack("<H", SERVER_CAPABILITIES >> 16)
    greeting += bytes([21])  # auth-plugin-data total length
    greeting += b"\x00" * 10
    greeting += b"901234567890" + b"\x00"  # part 2 (13 bytes with NUL)
    greeting += b"mysql_native_password\x00"
    io.send_packet(bytes(greeting))

    # --- HandshakeResponse41 (credentials accepted as-is) ---
    resp = io.read_packet()
    if len(resp) < 32:
        sock.close()
        return
    caps = struct.unpack_from("<I", resp, 0)[0]
    if not caps & CLIENT_PROTOCOL_41:
        io.send_packet(_err_packet(
            1043, "08S01", "pre-4.1 clients are out of the subset"))
        sock.close()
        return
    io.send_packet(_ok_packet())

    # --- command phase ---
    while True:
        io.seq = 0
        try:
            pkt = io.read_packet()
        except ConnectionError:
            return
        if not pkt:
            return
        cmd = pkt[0]
        if cmd == COM_QUIT:
            return
        if cmd == COM_PING or cmd == COM_INIT_DB:
            io.send_packet(_ok_packet())
            continue
        if cmd != COM_QUERY:
            io.send_packet(_err_packet(
                1047, "08S01", f"command {cmd:#x} is out of the subset"))
            continue
        query = pkt[1:].decode("utf-8", errors="replace")
        if _ACK_STMT.match(query):
            io.send_packet(_ok_packet())
            continue
        try:
            df = engine.sql(query, dialect="clickhouse")
            _send_resultset(io, df)
        except Exception as exc:  # noqa: BLE001 — wire-mapped error
            io.send_packet(_err_packet(
                1105, "HY000", f"{type(exc).__name__}: {exc}"))


class ChMySqlServer:
    """Threaded MySQL-protocol server over the ClickHouse-dialect engine
    (mirrors ``ChNativeTcpServer``; port=0 binds an ephemeral port)."""

    def __init__(self, engine, host: str = "127.0.0.1", port: int = 9004):
        self.engine = engine
        self.host, self.port = host, port
        self._server: socketserver.ThreadingTCPServer | None = None

    def start(self) -> "ChMySqlServer":
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


class MySqlWireClient:
    """Minimal MySQL-protocol client for the same subset — the test-side
    counterpart (the container ships no mysql client; both ends
    implement the same public wire grammar)."""

    def __init__(self, host: str, port: int, user: str = "default",
                 password: str = "", database: str = "default"):
        self._sock = socket.create_connection((host, port), timeout=30)
        self._io = _PacketIO(self._sock)
        greeting = self._io.read_packet()
        if greeting[0] != 0x0A:
            raise ConnectionError(f"unexpected protocol {greeting[0]}")
        end = greeting.index(b"\x00", 1)
        self.server_version = greeting[1:end].decode("ascii")
        resp = bytearray()
        caps = (CLIENT_PROTOCOL_41 | CLIENT_SECURE_CONNECTION
                | CLIENT_PLUGIN_AUTH | CLIENT_CONNECT_WITH_DB)
        resp += struct.pack("<I", caps)
        resp += struct.pack("<I", 1 << 24)  # max packet size
        resp += bytes([CHARSET_UTF8])
        resp += b"\x00" * 23
        resp += user.encode("utf-8") + b"\x00"
        resp += bytes([0])  # empty auth response (secure-connection len)
        resp += database.encode("utf-8") + b"\x00"
        resp += b"mysql_native_password\x00"
        self._io.send_packet(bytes(resp))
        ack = self._io.read_packet()
        if ack and ack[0] == 0xFF:
            raise RuntimeError(self._parse_err(ack))
        self.connected = bool(ack) and ack[0] == 0x00

    @staticmethod
    def _parse_err(pkt: bytes) -> str:
        code = struct.unpack_from("<H", pkt, 1)[0]
        msg = pkt[9:].decode("utf-8", errors="replace")
        return f"[{code}] {msg}"

    @staticmethod
    def _read_lenenc(pkt: bytes, pos: int) -> tuple[int | None, int]:
        b = pkt[pos]
        if b < 0xFB:
            return b, pos + 1
        if b == 0xFB:
            return None, pos + 1  # NULL cell
        if b == 0xFC:
            return struct.unpack_from("<H", pkt, pos + 1)[0], pos + 3
        if b == 0xFD:
            return int.from_bytes(pkt[pos + 1:pos + 4], "little"), pos + 4
        return struct.unpack_from("<Q", pkt, pos + 1)[0], pos + 9

    def ping(self) -> bool:
        self._io.seq = 0
        self._io.send_packet(bytes([COM_PING]))
        return self._io.read_packet()[0] == 0x00

    def execute(self, query: str):
        """Run one query → (names, type_bytes, rows-of-text); OK-only
        statements (SET/USE) return ([], [], []); raises RuntimeError on
        an ERR packet."""
        self._io.seq = 0
        self._io.send_packet(bytes([COM_QUERY]) + query.encode("utf-8"))
        first = self._io.read_packet()
        if first[0] == 0xFF:
            raise RuntimeError(self._parse_err(first))
        if first[0] == 0x00:
            return [], [], []
        n_cols, _ = self._read_lenenc(first, 0)
        names: list[str] = []
        types: list[int] = []
        for _ in range(n_cols):
            col = self._io.read_packet()
            pos = 0
            parts = []
            for _f in range(6):  # catalog..org_name
                ln, pos = self._read_lenenc(col, pos)
                parts.append(col[pos:pos + ln].decode("utf-8"))
                pos += ln
            names.append(parts[4])
            pos += 1 + 2 + 4  # fixed-len marker, charset, length
            types.append(col[pos])
        assert self._io.read_packet()[0] == 0xFE  # EOF after columns
        rows: list[tuple] = []
        while True:
            pkt = self._io.read_packet()
            if pkt[0] == 0xFE and len(pkt) < 9:
                return names, types, rows
            if pkt[0] == 0xFF:
                raise RuntimeError(self._parse_err(pkt))
            pos = 0
            row = []
            for _ in range(n_cols):
                ln, pos = self._read_lenenc(pkt, pos)
                if ln is None:
                    row.append(None)
                else:
                    row.append(pkt[pos:pos + ln].decode("utf-8"))
                    pos += ln
            rows.append(tuple(row))

    def close(self) -> None:
        try:
            self._io.seq = 0
            self._io.send_packet(bytes([COM_QUIT]))
        except OSError:
            pass
        self._sock.close()
