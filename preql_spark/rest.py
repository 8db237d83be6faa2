"""REST server — the engine analogue of the reference's ``serve_rest``
(``preql/core/pql_functions.py:985-1040``): expose a mapping of
``name -> table | function`` as an HTTP JSON API.

The reference builds on starlette+uvicorn; this container has
neither, so the server is stdlib ``http.server`` (threaded).  Routes
mirror the reference:

- ``GET /``               → JSON list of endpoint names
- ``GET /name``           → table rows as JSON (functions with no
                            parameters are called)
- ``GET /name/a/b``       → function called with the path segments as
                            positional arguments (ints/floats coerced)

Scale guard the reference lacks: table responses are BOUNDED —
``?limit=`` (default 1000, ceiling 100k) and ``?offset=`` paginate, so
an endpoint over a 100 TB table returns a page, never a full collect.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

DEFAULT_LIMIT = 1000
MAX_LIMIT = 100_000


def _coerce(seg: str):
    for conv in (int, float):
        try:
            return conv(seg)
        except ValueError:
            pass
    return seg


def _jsonable(v):
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    return v


def _table_page(table, limit: int, offset: int) -> list[dict]:
    df = table.df.offset(offset) if offset else table.df
    return [_jsonable(r.asDict(recursive=True))
            for r in df.limit(limit).collect()]


def _make_handler(engine, endpoints: dict):
    from preql_spark.table import Table

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):            # quiet test runs
            pass

        def _send(self, code: int, payload) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):                     # noqa: N802 (stdlib API)
            url = urlparse(self.path)
            parts = [p for p in url.path.split("/") if p]
            q = parse_qs(url.query)
            if not parts:
                return self._send(200, sorted(endpoints))
            name, args = parts[0], [_coerce(p) for p in parts[1:]]
            if name not in endpoints:
                return self._send(404, {"error": f"no endpoint {name!r}"})
            target = endpoints[name]
            try:
                if isinstance(target, Table) and not args:
                    limit = min(int(q.get("limit", [DEFAULT_LIMIT])[0]),
                                MAX_LIMIT)
                    offset = int(q.get("offset", [0])[0])
                    return self._send(200, _table_page(target, limit,
                                                       offset))
                if callable(target) or not isinstance(target, Table):
                    out = target(*args) if callable(target) else target
                    if isinstance(out, Table):
                        return self._send(200, _table_page(
                            out, DEFAULT_LIMIT, 0))
                    return self._send(200, _jsonable(out))
                return self._send(400,
                                  {"error": "table endpoints take no "
                                            "path arguments"})
            except Exception as e:            # noqa: BLE001 - HTTP boundary
                return self._send(500,
                                  {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve_rest(engine, endpoints: dict, port: int = 8080,
               block: bool = True):
    """Start the server.  ``endpoints`` maps route names to Tables,
    lang-function delegates (``eng.my_func``), or plain callables —
    the reference's ``serve_rest({index: index})`` struct.  With
    ``block=False`` the server runs on a daemon thread and is
    returned (``server.shutdown()`` stops it; ``server.server_port``
    has the bound port — pass ``port=0`` for an ephemeral one)."""
    server = ThreadingHTTPServer(("127.0.0.1", port),
                                 _make_handler(engine, dict(endpoints)))
    if block:
        try:
            server.serve_forever()
        finally:
            server.server_close()
        return None
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server
