"""Observability HTTP surface (SURVEY §2.1 R13).

``/health`` -> "OK", ``/metrics`` -> Prometheus text, matching the reference's
axum router on 0.0.0.0:3000 (`mrcond/src/main.rs:53-73`). Runs on a daemon
thread next to the Spark driver.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .metrics import Metrics


def start_http(metrics: Metrics, host: str = "0.0.0.0", port: int = 3000) -> ThreadingHTTPServer:
    class Handler(BaseHTTPRequestHandler):
        def do_GET(self) -> None:  # noqa: N802 (stdlib API)
            if self.path == "/health":
                body = b"OK"
                ctype = "text/plain"
            elif self.path == "/metrics":
                body = metrics.export().encode()
                ctype = "text/plain; version=0.0.4"
            else:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt: str, *args) -> None:  # silence request logs
            pass

    server = ThreadingHTTPServer((host, port), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True, name="engine-http")
    thread.start()
    return server
