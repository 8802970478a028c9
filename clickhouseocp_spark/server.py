"""HTTP interface analog — the reference image's port-8123 surface.

The reference exposes ClickHouse's HTTP interface (`/root/reference
Dockerfile:203-206`: HTTP 8123 alongside native TCP 9000 / MySQL 9004 /
PG 9005).  This module serves the same request shapes over the Spark engine
with nothing beyond the stdlib http.server:

- ``GET /ping`` → ``Ok.\\n`` (the CH liveness contract)
- ``GET /?query=...`` and ``POST /`` (query in the body, or ``?query=`` +
  data body for ``INSERT ... FORMAT ...`` ingestion, CH-style)
- trailing ``FORMAT <name>`` in the query or ``?default_format=`` chooses
  the rendering (everything ``formats.render`` supports); default
  TabSeparated, matching CH's HTTP default
- ``?session_id=`` scopes ``SET name = value`` statements to that HTTP
  session (CH session semantics: settings persist across requests with the
  same id; ``dialect`` and ``default_format`` take effect, everything else
  is recorded — same tolerance policy as the engine's SET)
- ``?query_id=`` (or a server-generated id) echoes back in
  ``X-ClickHouse-Query-Id``; every success carries ``X-ClickHouse-Format``
  and ``X-ClickHouse-Timezone``, like the reference server
- gzip both ways: a request body with ``Content-Encoding: gzip`` is
  inflated; responses are gzipped when the client sends
  ``Accept-Encoding: gzip`` AND ``enable_http_compression=1`` (param or
  session setting) — CH's exact opt-in rule
- errors → 500 with the real ClickHouse exception code for the common
  classes (60 UNKNOWN_TABLE, 62 SYNTAX_ERROR, 46 UNKNOWN_FUNCTION,
  47 UNKNOWN_IDENTIFIER, 36 BAD_ARGUMENTS; 1000 otherwise) in
  ``X-ClickHouse-Exception-Code`` and the message in the body — HTTP
  drivers key retry/error handling off these codes
- every successful query response carries ``X-ClickHouse-Summary`` — the
  CH JSON shape (string-valued ``read_rows``/``read_bytes``/
  ``written_rows``/``written_bytes``/``total_rows_to_read``/
  ``result_rows``/``result_bytes``/``elapsed_ns``); with
  ``send_progress_in_http_headers=1`` (param or session setting) the
  response streams CH's incremental progress shape: repeated
  ``X-ClickHouse-Progress`` header fields flushed while the query executes
  (one per ``http_headers_progress_interval_ms``, default 100 ms, plus the
  final cumulative event — always ≥2), with a buffered single-event
  fallback for gzip responses and INSERTs.
  Documented deviation: ``read_rows``/``read_bytes`` report the rows the
  driver materialized into the result, not storage-scan counters — Spark's
  per-scan metrics live in JVM SQL-metric objects the library deliberately
  doesn't reach into; clients that sum Summary fields for progress bars
  still converge because the final event equals the result totals

Architecture note (SURVEY §7): the engine stays library-first — this is a
thin adapter so HTTP-driver users can point at the Spark engine, not a
reimplementation of the native TCP protocol.  Concurrency follows the
image's ``max_concurrent_queries`` pin (Dockerfile:210, 100): a semaphore
gates query execution; Spark's scheduler interleaves the jobs.
"""

from __future__ import annotations

import gzip
import re
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

_CONTENT_TYPES = {
    "json": "application/json; charset=UTF-8",
    "csv": "text/csv; charset=UTF-8",
}


def _content_type(fmt: str) -> str:
    f = fmt.lower()
    if f.startswith("json"):
        return _CONTENT_TYPES["json"]
    if f.startswith("csv"):
        return _CONTENT_TYPES["csv"]
    if (
        f.replace("_", "").startswith("rowbinary")
        or f in ("native", "arrow", "arrowstream")
    ):
        return "application/octet-stream"
    return "text/plain; charset=UTF-8"


#: common ClickHouse exception codes (from the public ErrorCodes list) that
#: HTTP drivers actually branch on
_CODE_UNKNOWN_FUNCTION = 46
_CODE_UNKNOWN_IDENTIFIER = 47
_CODE_UNKNOWN_TABLE = 60
_CODE_SYNTAX_ERROR = 62
_CODE_BAD_ARGUMENTS = 36
_CODE_READONLY = 164

#: statement heads rejected under readonly=1 (CH's readonly=1 contract:
#: reads and session SETs allowed, mutations/DDL refused with code 164)
_WRITE_HEADS = (
    "INSERT", "CREATE", "DROP", "ALTER", "TRUNCATE", "RENAME", "EXCHANGE",
    "OPTIMIZE", "DELETE", "ATTACH", "DETACH", "UNDROP",
)


def exception_code(e: Exception) -> int:
    """Map an engine/Spark exception to the ClickHouse exception code a real
    server would send.  Classification is by exception type first, then by
    the stable Spark error-class markers in the message; anything
    unrecognized keeps CH's 1000 (POCO_EXCEPTION — the generic bucket)."""
    name = type(e).__name__
    msg = str(e)
    if name in ("ChSqlError", "KqlError", "PrqlError"):
        # transpiler-level parse/unsupported-construct failures
        return _CODE_SYNTAX_ERROR
    if name == "KeyError" and "unknown table" in msg:
        return _CODE_UNKNOWN_TABLE
    if "TABLE_OR_VIEW_NOT_FOUND" in msg or "UNKNOWN_TABLE" in msg:
        return _CODE_UNKNOWN_TABLE
    if "UNRESOLVED_ROUTINE" in msg or "UNKNOWN_FUNCTION" in msg:
        return _CODE_UNKNOWN_FUNCTION
    if "UNRESOLVED_COLUMN" in msg or "UNKNOWN_IDENTIFIER" in msg:
        return _CODE_UNKNOWN_IDENTIFIER
    if "PARSE_SYNTAX_ERROR" in msg:
        return _CODE_SYNTAX_ERROR
    if isinstance(e, (ValueError, TypeError)):
        return _CODE_BAD_ARGUMENTS
    return 1000


_SET_RE = re.compile(r"(?is)^\s*SET\s+(\w+)\s*=\s*('[^']*'|\S+?)\s*;?\s*$")


def _summary_json(
    result_rows: int = 0,
    result_bytes: int = 0,
    written_rows: int = 0,
    elapsed_ns: int = 0,
) -> str:
    """The ``X-ClickHouse-Summary`` JSON — CH emits every numeric field as a
    STRING (clickhouse-js et al. parse them with parseInt), in this key
    order."""
    import json as _json

    return _json.dumps(
        {
            "read_rows": str(result_rows),
            "read_bytes": str(result_bytes),
            "written_rows": str(written_rows),
            "written_bytes": "0",
            "total_rows_to_read": str(result_rows),
            "result_rows": str(result_rows),
            "result_bytes": str(result_bytes),
            "elapsed_ns": str(elapsed_ns),
        },
        separators=(",", ":"),
    )


class ChHttpServer:
    """Serve a :class:`~clickhouseocp_spark.engine.ChSparkEngine` over the
    CH HTTP request shapes.  ``start()`` binds a daemon thread (port 0 →
    ephemeral, the bound port is in ``.port``); ``shutdown()`` stops it."""

    def __init__(self, engine, host: str = "127.0.0.1", port: int = 8123,
                 max_concurrent_queries: int = 100):
        self.engine = engine
        self._gate = threading.Semaphore(max_concurrent_queries)
        #: session_id → {setting: value}; guarded by _sessions_lock (the
        #: ThreadingHTTPServer handles each request on its own thread)
        self._sessions: dict[str, dict[str, str]] = {}
        self._sessions_lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            server_version = "clickhouseocp-spark/25.7-compat"

            def log_message(self, *a):  # quiet: the engine's query_log records
                pass

            def _reply(self, code: int, body, fmt: str = "TabSeparated",
                       extra: dict | None = None, gzip_ok: bool = False) -> None:
                data = body if isinstance(body, bytes) else body.encode("utf-8")
                self.send_response(code)
                self.send_header("Content-Type", _content_type(fmt))
                if gzip_ok and code == 200:
                    data = gzip.compress(data)
                    self.send_header("Content-Encoding", "gzip")
                self.send_header("Content-Length", str(len(data)))
                self.send_header("X-ClickHouse-Server-Display-Name", "spark")
                for k, v in (extra or {}).items():
                    self.send_header(k, v)
                self.end_headers()
                self.wfile.write(data)

            def _progress_event(self, t0: int) -> str:
                """One progress JSON in the CH header shape; task counts
                from the Spark status tracker stand in for row counters."""
                import json as _json
                import time as _time

                done = total = 0
                try:
                    tr = outer.engine.spark.sparkContext.statusTracker()
                    for jid in tr.getActiveJobsIds():
                        ji = tr.getJobInfo(jid)
                        for sid in ji.stageIds if ji else ():
                            si = tr.getStageInfo(sid)
                            if si:
                                done += si.numCompletedTasks
                                total += si.numTasks
                except Exception:  # noqa: BLE001 — progress is best-effort
                    pass
                return _json.dumps(
                    {
                        "read_rows": str(done),
                        "read_bytes": "0",
                        "written_rows": "0",
                        "written_bytes": "0",
                        "total_rows_to_read": str(total),
                        "elapsed_ns": str(_time.perf_counter_ns() - t0),
                    },
                    separators=(",", ":"),
                )

            def _stream_with_progress(
                self, execute, params, hdrs, t0, fmt, stats
            ) -> None:
                """Incremental X-ClickHouse-Progress: the status line and
                base headers flush immediately, one additional Progress
                header field flushes per interval while the query runs on a
                worker thread, and the final Progress + Summary + body
                close the response.  ≥2 progress events for any query (one
                in-flight minimum + the final cumulative one) — CH's
                chunked-progress contract.  An error after the 200 status
                line has streamed surfaces as the exception-code header +
                message body, exactly CH's mid-stream behavior."""
                import time as _time

                interval = (
                    float(
                        params.get("http_headers_progress_interval_ms") or 100
                    )
                    / 1000.0
                )
                res: dict = {}

                def _work():
                    try:
                        res["out"] = execute()
                    except Exception as e:  # noqa: BLE001 — wire it below
                        res["err"] = e

                th = threading.Thread(target=_work, daemon=True)
                self.send_response(200)
                self.send_header(
                    "X-ClickHouse-Server-Display-Name", "spark"
                )
                for k, v in hdrs.items():
                    self.send_header(k, v)
                self.flush_headers()
                th.start()
                while True:
                    th.join(interval)
                    alive = th.is_alive()
                    self.send_header(
                        "X-ClickHouse-Progress", self._progress_event(t0)
                    )
                    self.flush_headers()
                    if not alive:
                        break
                err = res.get("err")
                if err is not None:
                    msg = f"{type(err).__name__}: {err}\n".encode()
                    self.send_header(
                        "X-ClickHouse-Exception-Code",
                        str(exception_code(err)),
                    )
                    self.send_header("Content-Type", _content_type("TabSeparated"))
                    self.send_header("Content-Length", str(len(msg)))
                    self.end_headers()
                    self.wfile.write(msg)
                    return
                out = res.get("out") or ""
                if out and isinstance(out, str) and not out.endswith("\n"):
                    out += "\n"
                data = out if isinstance(out, bytes) else out.encode("utf-8")
                fmt = fmt or "TabSeparated"
                tz = outer.engine.spark.conf.get(
                    "spark.sql.session.timeZone", "Etc/UTC"
                )
                summary = _summary_json(
                    result_rows=stats.get("result_rows", 0),
                    result_bytes=len(data),
                    written_rows=stats.get("written_rows", 0),
                    elapsed_ns=_time.perf_counter_ns() - t0,
                )
                self.send_header("X-ClickHouse-Progress", summary)
                self.send_header("X-ClickHouse-Summary", summary)
                self.send_header("X-ClickHouse-Format", fmt)
                self.send_header("X-ClickHouse-Timezone", tz or "Etc/UTC")
                self.send_header("Content-Type", _content_type(fmt))
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def _handle(self, body: bytes) -> None:
                url = urlparse(self.path)
                if url.path == "/ping":
                    self._reply(200, "Ok.\n")
                    return
                if url.path == "/replicas_status":
                    # the LB health endpoint; no replication lag exists in
                    # the shared-storage architecture, so always Ok
                    self._reply(200, "Ok.\n")
                    return
                params = {k: v[-1] for k, v in parse_qs(url.query).items()}
                query_id = params.get("query_id") or str(uuid.uuid4())
                hdrs = {"X-ClickHouse-Query-Id": query_id}
                if (self.headers.get("Content-Encoding") or "").lower() == "gzip":
                    try:
                        body = gzip.decompress(body)
                    except OSError:
                        self._reply(400, "malformed gzip body\n", extra=hdrs)
                        return
                query = params.get("query", "")
                session = outer._session(params.get("session_id"))
                # readonly is sticky: "1" from EITHER the query param or the
                # session setting enforces it; an explicit readonly=0 param
                # cannot override a session-level readonly=1 (CH forbids
                # decreasing readonly once set).
                readonly = "1" in (
                    params.get("readonly"),
                    (session or {}).get("readonly"),
                )
                if (
                    readonly
                    and body
                    and re.search(
                        r"(?is)FORMAT\s+(Arrow(Stream)?|Native|Parquet"
                        r"|RowBinary(WithNamesAndTypes)?)\s*$",
                        query or "",
                    )
                ):
                    # binary bulk-ingest is a mutation: refuse BEFORE
                    # dispatching to the Arrow/Native/RowBinary handlers
                    self._reply(
                        500,
                        "Cannot execute query in readonly mode\n",
                        extra={
                            **hdrs,
                            "X-ClickHouse-Exception-Code": str(_CODE_READONLY),
                        },
                    )
                    return
                if body and re.search(
                    r"(?is)FORMAT\s+Arrow(Stream)?\s*$", query or ""
                ):
                    import time as _time

                    stats: dict = {}
                    t0 = _time.perf_counter_ns()
                    try:
                        with outer._gate:
                            outer.engine.insert_arrow(query, body, stats=stats)
                    except Exception as e:  # noqa: BLE001 — wire errors like CH
                        self._reply(
                            500,
                            f"{type(e).__name__}: {e}\n",
                            extra={
                                **hdrs,
                                "X-ClickHouse-Exception-Code": str(
                                    exception_code(e)
                                ),
                            },
                        )
                        return
                    summary = _summary_json(
                        written_rows=stats.get("written_rows", 0),
                        elapsed_ns=_time.perf_counter_ns() - t0,
                    )
                    extra = {**hdrs, "X-ClickHouse-Summary": summary}
                    if params.get("send_progress_in_http_headers") == "1":
                        extra["X-ClickHouse-Progress"] = summary
                    self._reply(200, "", extra=extra)
                    return
                if body and re.search(
                    r"(?is)FORMAT\s+Parquet\s*$", query or ""
                ):
                    import time as _time

                    stats: dict = {}
                    t0 = _time.perf_counter_ns()
                    try:
                        with outer._gate:
                            outer.engine.insert_parquet(
                                query, body, stats=stats
                            )
                    except Exception as e:  # noqa: BLE001 — wire errors like CH
                        self._reply(
                            500,
                            f"{type(e).__name__}: {e}\n",
                            extra={
                                **hdrs,
                                "X-ClickHouse-Exception-Code": str(
                                    exception_code(e)
                                ),
                            },
                        )
                        return
                    summary = _summary_json(
                        written_rows=stats.get("written_rows", 0),
                        elapsed_ns=_time.perf_counter_ns() - t0,
                    )
                    extra = {**hdrs, "X-ClickHouse-Summary": summary}
                    if params.get("send_progress_in_http_headers") == "1":
                        extra["X-ClickHouse-Progress"] = summary
                    self._reply(200, "", extra=extra)
                    return
                if body and re.search(
                    r"(?is)FORMAT\s+Native\s*$", query or ""
                ):
                    # binary column-major bulk-ingest
                    import time as _time

                    stats: dict = {}
                    t0 = _time.perf_counter_ns()
                    try:
                        with outer._gate:
                            outer.engine.insert_native(query, body, stats=stats)
                    except Exception as e:  # noqa: BLE001 — wire errors like CH
                        self._reply(
                            500,
                            f"{type(e).__name__}: {e}\n",
                            extra={
                                **hdrs,
                                "X-ClickHouse-Exception-Code": str(
                                    exception_code(e)
                                ),
                            },
                        )
                        return
                    summary = _summary_json(
                        written_rows=stats.get("written_rows", 0),
                        elapsed_ns=_time.perf_counter_ns() - t0,
                    )
                    extra = {**hdrs, "X-ClickHouse-Summary": summary}
                    if params.get("send_progress_in_http_headers") == "1":
                        extra["X-ClickHouse-Progress"] = summary
                    self._reply(200, "", extra=extra)
                    return
                if body and re.search(
                    r"(?is)FORMAT\s+RowBinary(WithNamesAndTypes)?\s*$",
                    query or "",
                ):
                    # binary bulk-ingest: never decode the body as text
                    import time as _time

                    stats: dict = {}
                    t0 = _time.perf_counter_ns()
                    try:
                        with outer._gate:
                            outer.engine.insert_rowbinary(query, body, stats=stats)
                    except Exception as e:  # noqa: BLE001 — wire errors like CH
                        self._reply(
                            500,
                            f"{type(e).__name__}: {e}\n",
                            extra={
                                **hdrs,
                                "X-ClickHouse-Exception-Code": str(
                                    exception_code(e)
                                ),
                            },
                        )
                        return
                    summary = _summary_json(
                        written_rows=stats.get("written_rows", 0),
                        elapsed_ns=_time.perf_counter_ns() - t0,
                    )
                    extra = {**hdrs, "X-ClickHouse-Summary": summary}
                    if params.get("send_progress_in_http_headers") == "1":
                        extra["X-ClickHouse-Progress"] = summary
                    self._reply(200, "", extra=extra)
                    return
                text = body.decode("utf-8") if body else ""
                if query and text:
                    # CH ingestion shape: statement in ?query=, data in body
                    query = query.rstrip() + "\n" + text
                elif not query:
                    query = text
                if not query.strip():
                    self._reply(400, "no query\n", extra=hdrs)
                    return

                if readonly and query.lstrip().split(None, 1)[0].upper() in (
                    _WRITE_HEADS
                ):
                    self._reply(
                        500,
                        "Cannot execute query in readonly mode\n",
                        extra={
                            **hdrs,
                            "X-ClickHouse-Exception-Code": str(_CODE_READONLY),
                        },
                    )
                    return
                mset = _SET_RE.match(query)
                if (
                    mset
                    and readonly
                    and mset.group(1).lower() == "readonly"
                    and mset.group(2).strip().strip("'") != "1"
                ):
                    # readonly can never be decreased once set (CH semantics)
                    self._reply(
                        500,
                        "Cannot modify 'readonly' setting in readonly mode\n",
                        extra={
                            **hdrs,
                            "X-ClickHouse-Exception-Code": str(_CODE_READONLY),
                        },
                    )
                    return
                if mset and session is not None:
                    # session-scoped SET: persists for this session_id only,
                    # does not leak into the shared engine (CH semantics)
                    session[mset.group(1).lower()] = mset.group(2).strip().strip("'")
                    self._reply(200, "", extra=hdrs)
                    return

                from clickhouseocp_spark.engine import detect_trailing_format

                fmt = params.get("default_format") or (
                    session or {}
                ).get("default_format")
                dialect = (session or {}).get("dialect") or "clickhouse"
                is_insert = query.lstrip().upper().startswith("INSERT")
                trailing = detect_trailing_format(query)
                if trailing:
                    fmt = trailing  # trailing FORMAT wins (drives Content-Type)
                elif fmt and not is_insert:
                    query = query.rstrip().rstrip(";") + f" FORMAT {fmt}"
                want_gzip = (
                    "gzip" in (self.headers.get("Accept-Encoding") or "").lower()
                    and (
                        params.get("enable_http_compression")
                        or (session or {}).get("enable_http_compression")
                    )
                    == "1"
                )
                import time as _time

                stats = {}
                t0 = _time.perf_counter_ns()

                def _execute():
                    with outer._gate:
                        if (fmt or "").lower() in ("arrow", "arrowstream"):
                            from clickhouseocp_spark.engine import (
                                strip_trailing_format,
                            )
                            from clickhouseocp_spark.formats import render_arrow

                            df = outer.engine.sql(
                                strip_trailing_format(query), dialect=dialect
                            )
                            out = render_arrow(
                                df,
                                stream=(fmt or "").lower() == "arrowstream",
                                stats=stats,
                            )
                        elif (fmt or "").lower() == "parquet":
                            from clickhouseocp_spark.engine import (
                                strip_trailing_format,
                            )
                            from clickhouseocp_spark.formats import (
                                render_parquet,
                            )

                            df = outer.engine.sql(
                                strip_trailing_format(query), dialect=dialect
                            )
                            out = render_parquet(df, stats=stats)
                        elif (fmt or "").lower() == "native":
                            from clickhouseocp_spark.engine import (
                                strip_trailing_format,
                            )
                            from clickhouseocp_spark.formats import render_native

                            df = outer.engine.sql(
                                strip_trailing_format(query), dialect=dialect
                            )
                            out = render_native(df, stats=stats)
                        elif (fmt or "").replace("_", "").lower() in (
                            "rowbinary", "rowbinarywithnamesandtypes"
                        ):
                            # binary wire format: bypass text rendering
                            from clickhouseocp_spark.engine import (
                                strip_trailing_format,
                            )
                            from clickhouseocp_spark.formats import (
                                render_rowbinary,
                            )

                            df = outer.engine.sql(
                                strip_trailing_format(query), dialect=dialect
                            )
                            out = render_rowbinary(
                                df,
                                with_names_and_types=(fmt or "")
                                .replace("_", "")
                                .lower()
                                .endswith("withnamesandtypes"),
                                stats=stats,
                            )
                        else:
                            out = outer.engine.run(
                                query, dialect=dialect, stats=stats
                            )
                    return out

                progress_on = (
                    params.get("send_progress_in_http_headers")
                    or (session or {}).get("send_progress_in_http_headers")
                ) == "1"
                if progress_on and not want_gzip and not is_insert:
                    # CH's incremental progress wire shape: repeated
                    # X-ClickHouse-Progress header FIELDS streamed while the
                    # query executes, then the final headers + body.  The
                    # query runs on a worker thread; each interval the
                    # handler flushes one more progress header (elapsed_ns
                    # real; read_rows/total_rows_to_read are the Spark
                    # status tracker's completed/total task counts — the
                    # per-row scan counters live in JVM task metrics the
                    # library deliberately doesn't reach into).  gzip is
                    # buffered-only (the compressed length must be known
                    # before headers close), matching the _reply path.
                    self._stream_with_progress(
                        _execute, params, hdrs, t0, fmt, stats
                    )
                    return
                try:
                    out = _execute()
                except Exception as e:  # noqa: BLE001 — wire errors like CH
                    self._reply(
                        500,
                        f"{type(e).__name__}: {e}\n",
                        extra={
                            **hdrs,
                            "X-ClickHouse-Exception-Code": str(exception_code(e)),
                        },
                    )
                    return
                if out and isinstance(out, str) and not out.endswith("\n"):
                    out += "\n"
                fmt = fmt or "TabSeparated"
                tz = outer.engine.spark.conf.get(
                    "spark.sql.session.timeZone", "Etc/UTC"
                )
                out_bytes = out if isinstance(out, bytes) else out.encode("utf-8")
                summary = _summary_json(
                    result_rows=stats.get("result_rows", 0),
                    result_bytes=len(out_bytes),
                    written_rows=stats.get("written_rows", 0),
                    elapsed_ns=_time.perf_counter_ns() - t0,
                )
                extra = {
                    **hdrs,
                    "X-ClickHouse-Format": fmt,
                    "X-ClickHouse-Timezone": tz or "Etc/UTC",
                    "X-ClickHouse-Summary": summary,
                }
                if progress_on:
                    # buffered fallback (gzip / INSERT) → one final
                    # cumulative progress event
                    extra["X-ClickHouse-Progress"] = summary
                self._reply(
                    200,
                    out,
                    fmt=fmt,
                    extra=extra,
                    gzip_ok=want_gzip,
                )

            def do_GET(self):  # noqa: N802 — http.server contract
                self._handle(b"")

            def do_POST(self):  # noqa: N802
                n = int(self.headers.get("Content-Length") or 0)
                self._handle(self.rfile.read(n) if n else b"")

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._httpd.daemon_threads = True
        self.port = self._httpd.server_address[1]
        self._thread: threading.Thread | None = None

    def _session(self, session_id: str | None) -> dict[str, str] | None:
        """The settings dict for ``session_id`` (created on first use), or
        None when the request carries no session."""
        if not session_id:
            return None
        with self._sessions_lock:
            return self._sessions.setdefault(session_id, {})

    def start(self) -> "ChHttpServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="ch-http", daemon=True
        )
        self._thread.start()
        return self

    def shutdown(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)


def serve(engine, host: str = "0.0.0.0", port: int = 8123) -> None:
    """Blocking entry point: ``python -m clickhouseocp_spark.server`` style
    foreground serving (mirrors `clickhouse-server` staying in the
    foreground in the reference image)."""
    ChHttpServer(engine, host=host, port=port).start()._thread.join()
