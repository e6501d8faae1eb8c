"""Literal-parity HTTP shim over the stream engine.

The reference's public wire contract is tiny (``src/index.ts:4-11``,
``src/stream_manager.ts:42-67,181-229``): the URL path names the
stream, POST produces, GET consumes/long-polls, DELETE destroys, PUT
is reserved (405), and an optional constant ``auth`` header gates
everything.  SURVEY.md declares the HTTP layer out of engine scope —
the engine's users are Spark sessions — but this stdlib shim makes
parity directly testable against scenarios lifted from the
reference's own e2e suite (``tests/index.test.ts:28-350``).

Response shapes (exact):

- POST   → 200 ``{"offsets": [<32-char offset>, ...]}`` (one per
  record; the reference resolves a flat ``string[]`` per request —
  its tests use ``offsets[0]`` directly as a consume cursor);
  400 ``{"error": "Invalid JSON body"}``; 400 ``{"error": "Invalid
  version parameter"}``; 409 ``{"error": "Producer version too old",
  "current_version": N, "provided_version": M}``; empty ``records``
  → 200 ``{"version": N}`` (version-bump-only).
- GET    → 200 ``{"records": [{"offset": ..., "data": ...}, ...]}``;
  ``offset`` empty/missing or no rows + ``timeout_sec`` > 0 →
  long-poll; timeout → 200 ``{"records": []}``.
- DELETE → 200 ``{"success": true}``.
- PUT    → 405 ``NOT IMPLEMENTED``.
- bad auth → 401 ``Unauthorized``.

Defaults: ``limit=10``, ``timeout_sec=0`` (the reference's comment at
``src/stream_manager.ts:216``: "low default avoid OOM"; its literal
``Number(x) ?? 10`` can never take the fallback branch in JS — a dead
``??`` — so we implement the documented intent).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from .manifest import FencingError
from .stream import StreamCatalog

DEFAULT_LIMIT = 10  # src/stream_manager.ts:216
DEFAULT_TIMEOUT_SEC = 0.0  # src/stream_manager.ts:217


def _make_handler(catalog: StreamCatalog, auth_header: str | None):
    class Handler(BaseHTTPRequestHandler):
        # quiet: the shim is driven by tests, not a terminal
        def log_message(self, fmt, *args):  # noqa: D102
            pass

        def _send(self, status: int, body, raw: bool = False) -> None:
            payload = body if raw else json.dumps(body)
            data = payload.encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _auth_ok(self) -> bool:
            if auth_header is None:
                return True
            return self.headers.get("auth") == auth_header

        def _stream(self):
            # reference: idFromName(pathname) — the path IS the name.
            # An empty or nested path (health-check GET /, /a/b) must
            # come back as a 404, not an uncaught ValueError that
            # aborts the connection with no response; returns None
            # after sending in that case.
            name = urlparse(self.path).path.strip("/")
            try:
                return catalog.stream(name)
            except ValueError:
                self._send(404, {"error": "Invalid stream name"})
                return None

        def _params(self) -> dict:
            q = parse_qs(urlparse(self.path).query)
            return {k: v[0] for k, v in q.items()}

        def do_PUT(self):  # noqa: N802 — http.server naming
            if not self._auth_ok():
                return self._send(401, "Unauthorized", raw=True)
            self._send(405, "NOT IMPLEMENTED", raw=True)

        def do_POST(self):  # noqa: N802
            if not self._auth_ok():
                return self._send(401, "Unauthorized", raw=True)
            n = int(self.headers.get("Content-Length") or 0)
            try:
                body = json.loads(self.rfile.read(n) or b"")
                records = body["records"]
            except (ValueError, KeyError, TypeError):
                return self._send(400, {"error": "Invalid JSON body"})
            if not isinstance(records, list):
                # a string/dict is iterable — produce() would happily
                # append its characters/keys as records (reference's
                # records.map throws instead)
                return self._send(
                    400, {"error": "records must be an array"}
                )
            params = self._params()
            version = None
            if "version" in params:
                try:
                    version = int(params["version"])
                except ValueError:
                    return self._send(
                        400, {"error": "Invalid version parameter"}
                    )
            stream = self._stream()
            if stream is None:
                return
            try:
                result = stream.produce(records, version=version)
            except FencingError:
                return self._send(
                    409,
                    {
                        "error": "Producer version too old",
                        "current_version": stream.refresh().producer_version,
                        "provided_version": version,
                    },
                )
            if not records:
                # version-bump-only (src/stream_manager.ts:265-268)
                return self._send(
                    200, {"version": stream.refresh().producer_version}
                )
            self._send(200, {"offsets": result.offsets})

        def do_GET(self):  # noqa: N802
            if not self._auth_ok():
                return self._send(401, "Unauthorized", raw=True)
            params = self._params()
            offset = params.get("offset", "")
            try:
                limit = int(params.get("limit", DEFAULT_LIMIT))
                timeout_sec = float(
                    params.get("timeout_sec", DEFAULT_TIMEOUT_SEC)
                )
            except ValueError:
                return self._send(
                    400, {"error": "Invalid limit or timeout_sec"}
                )
            import math

            if not math.isfinite(timeout_sec) or timeout_sec < 0:
                # 'inf' would pin a server thread forever; 'nan' makes
                # every deadline comparison False
                return self._send(
                    400, {"error": "Invalid limit or timeout_sec"}
                )
            stream = self._stream()
            if stream is None:
                return
            try:
                records = (
                    stream.consume(offset, limit=limit) if offset else []
                )
            except ValueError:
                # malformed cursor (not the 32-digit offset format):
                # 400, not an aborted connection
                return self._send(400, {"error": "Invalid offset"})
            if not timeout_sec or records:
                return self._send(
                    200,
                    {
                        "records": [
                            {"offset": r.offset, "data": r.data}
                            for r in records
                        ]
                    },
                )
            # Long-poll pinned to the CLIENT's cursor: records produced
            # between the consume() above and the wait would be inside
            # a now-snapshot and the poll would block its full timeout
            # despite matching data existing.
            got = stream.tail(
                limit=limit,
                timeout_sec=timeout_sec,
                after_offset=offset or None,
            )
            self._send(
                200,
                {
                    "records": [
                        {"offset": r.offset, "data": r.data}
                        for r in got
                    ]
                },
            )

        def do_DELETE(self):  # noqa: N802
            if not self._auth_ok():
                return self._send(401, "Unauthorized", raw=True)
            stream = self._stream()
            if stream is None:
                return
            stream.destroy()
            self._send(200, {"success": True})

    return Handler


class StreamHTTPShim:
    """A running shim server; ``with StreamHTTPShim(catalog) as url:``
    yields the base URL.  One thread per request (long-polls block a
    thread each, like the reference blocks a DO request)."""

    def __init__(
        self, catalog: StreamCatalog, auth_header: str | None = None
    ):
        self._server = ThreadingHTTPServer(
            ("127.0.0.1", 0), _make_handler(catalog, auth_header)
        )
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )

    def __enter__(self) -> str:
        self._thread.start()
        host, port = self._server.server_address
        return f"http://{host}:{port}"

    def __exit__(self, *exc) -> None:
        self._server.shutdown()
        self._server.server_close()
        self._thread.join(timeout=10)
