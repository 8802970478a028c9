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
- errors → 500 with ``X-ClickHouse-Exception-Code`` and the message in the
  body, like the reference server

Architecture note (SURVEY §7): the engine stays library-first — this is a
thin adapter so HTTP-driver users can point at the Spark engine, not a
reimplementation of the native TCP protocol.  Concurrency follows the
image's ``max_concurrent_queries`` pin (Dockerfile:210, 100): a semaphore
gates query execution; Spark's scheduler interleaves the jobs.
"""

from __future__ import annotations

import threading
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
    return "text/plain; charset=UTF-8"


class ChHttpServer:
    """Serve a :class:`~clickhouseocp_spark.engine.ChSparkEngine` over the
    CH HTTP request shapes.  ``start()`` binds a daemon thread (port 0 →
    ephemeral, the bound port is in ``.port``); ``shutdown()`` stops it."""

    def __init__(self, engine, host: str = "127.0.0.1", port: int = 8123,
                 max_concurrent_queries: int = 100):
        self.engine = engine
        self._gate = threading.Semaphore(max_concurrent_queries)
        outer = self

        class Handler(BaseHTTPRequestHandler):
            server_version = "clickhouseocp-spark/25.7-compat"

            def log_message(self, *a):  # quiet: the engine's query_log records
                pass

            def _reply(self, code: int, body: str, fmt: str = "TabSeparated",
                       extra: dict | None = None) -> None:
                data = body.encode("utf-8")
                self.send_response(code)
                self.send_header("Content-Type", _content_type(fmt))
                self.send_header("Content-Length", str(len(data)))
                self.send_header("X-ClickHouse-Server-Display-Name", "spark")
                for k, v in (extra or {}).items():
                    self.send_header(k, v)
                self.end_headers()
                self.wfile.write(data)

            def _handle(self, body: bytes) -> None:
                url = urlparse(self.path)
                if url.path == "/ping":
                    self._reply(200, "Ok.\n")
                    return
                params = {k: v[-1] for k, v in parse_qs(url.query).items()}
                query = params.get("query", "")
                text = body.decode("utf-8") if body else ""
                if query and text:
                    # CH ingestion shape: statement in ?query=, data in body
                    query = query.rstrip() + "\n" + text
                elif not query:
                    query = text
                if not query.strip():
                    self._reply(400, "no query\n")
                    return
                from clickhouseocp_spark.engine import detect_trailing_format

                fmt = params.get("default_format")
                is_insert = query.lstrip().upper().startswith("INSERT")
                trailing = detect_trailing_format(query)
                if trailing:
                    fmt = trailing  # trailing FORMAT wins (drives Content-Type)
                elif fmt and not is_insert:
                    query = query.rstrip().rstrip(";") + f" FORMAT {fmt}"
                try:
                    with outer._gate:
                        out = outer.engine.run(query)
                except Exception as e:  # noqa: BLE001 — wire errors like CH
                    self._reply(
                        500,
                        f"{type(e).__name__}: {e}\n",
                        extra={"X-ClickHouse-Exception-Code": "1000"},
                    )
                    return
                if out and not out.endswith("\n"):
                    out += "\n"
                self._reply(200, out, fmt=fmt or "TabSeparated")

            def do_GET(self):  # noqa: N802 — http.server contract
                self._handle(b"")

            def do_POST(self):  # noqa: N802
                n = int(self.headers.get("Content-Length") or 0)
                self._handle(self.rfile.read(n) if n else b"")

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._httpd.daemon_threads = True
        self.port = self._httpd.server_address[1]
        self._thread: threading.Thread | None = None

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
