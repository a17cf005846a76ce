"""Serving layer: the reference's FastAPI backend re-expressed with the
stdlib (no web-framework dependency in this engine).

Reference ``backend.py:14-41``: ``GET /health`` -> ``{"status":"ok"}``;
``GET /`` serves ``announcements.html``, regenerating it from
``announcements.csv`` when the HTML is missing, 404 when the CSV is
missing too, 500 on render failures.  Same routes, same
regenerate-if-missing contract, same status codes — behind
``http.server`` so the engine stays dependency-free (a batch engine's
serving tier is intentionally driver-side: the report it serves is
10^2-10^3 rows, produced by the Dataset report layer).
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def ensure_html_exists(csv_path: str, html_path: str) -> None:
    """Regenerate the dashboard from the consolidated CSV when the HTML
    is missing (reference ``backend.py:14-18``)."""
    if os.path.exists(html_path):
        return
    if not os.path.exists(csv_path):
        raise FileNotFoundError(
            f"{csv_path} not found. Generate CSV first."
        )
    import pandas as pd

    from .stages.dashboard import write_dashboard

    write_dashboard(pd.read_csv(csv_path).fillna(""), html_path)


def _make_handler(csv_path: str, html_path: str):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet test runs
            pass

        def _send(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("content-type", ctype)
            self.send_header("content-length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._send(
                    200,
                    json.dumps({"status": "ok"}).encode(),
                    "application/json",
                )
                return
            if self.path == "/":
                try:
                    ensure_html_exists(csv_path, html_path)
                    with open(html_path, "rb") as f:
                        content = f.read()
                    self._send(
                        200, content, "text/html; charset=utf-8"
                    )
                except FileNotFoundError as e:
                    self._send(
                        404,
                        json.dumps({"detail": str(e)}).encode(),
                        "application/json",
                    )
                except Exception as e:  # pragma: no cover
                    self._send(
                        500,
                        json.dumps(
                            {"detail": f"Failed to serve HTML: {e}"}
                        ).encode(),
                        "application/json",
                    )
                return
            self._send(
                404, json.dumps({"detail": "not found"}).encode(),
                "application/json",
            )

    return Handler


class DashboardServer:
    """Threaded dashboard server; use as a context manager in tests,
    or ``serve_forever`` from the CLI."""

    def __init__(
        self,
        csv_path: str = "announcements.csv",
        html_path: str = "announcements.html",
        host: str = "127.0.0.1",
        port: int = 0,
    ):
        self._httpd = ThreadingHTTPServer(
            (host, port), _make_handler(csv_path, html_path)
        )
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def __enter__(self):
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)

    def serve_forever(self):  # pragma: no cover - CLI path
        with self:
            self._thread.join()
