"""HTTP ingress + state-query surface (R22): the reference's only
interactive API, re-expressed over the socket push source.

The reference's stream manager exposes an aiohttp server
(/root/reference/stream_manager/src/stream_manager/manager.py:205-248)
with routes (manager.py:216-223):

- ``POST /online/{stream}`` — schedule a download attempt with
  ``poll_attempt=False`` (online_handler, manager.py:163-176);
- ``GET /state`` — dump live per-stream state (manager.py:196-198);
- ``POST /reload`` — re-run config load (manager.py:207-209).

Spark has no driver-embedded ingress, so the analog is a small stdlib
HTTP bridge that terminates the reference's HTTP contract and forwards
each signal as one line to the socket push source
(:mod:`tw_etl_spark.streaming.sources`), which parses lines JVM-side
and feeds the retry machine. The bridge owns BOTH listening sockets:
Spark's socket source connects to ``line_port``; curl/clients hit
``http_port``. At production scale the same contract terminates in a
load balancer writing to Kafka; the bridge is the reference-shaped
dev/test transport, exactly like the reference's own aiohttp ingress
(single-process, at-most-once).

``GET /state`` delegates to a ``state_reader`` callable so the server
stays transport-only; pair it with
:func:`tw_etl_spark.streaming.state_export.read_machine_state` (the
state-store reader) or an actions-derived projection.
"""

from __future__ import annotations

import json
import socket
import threading
from collections.abc import Callable
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class HttpPushBridge:
    """Reference-shaped HTTP API bridging onto a line socket.

    Parameters
    ----------
    state_reader:
        zero-arg callable returning a JSON-serializable object for
        ``GET /state`` (503 if absent).
    on_reload:
        zero-arg callable invoked by ``POST /reload`` (the reference
        re-reads config.yml; here the caller decides what reload means
        — e.g. refresh a broadcast config table).
    """

    def __init__(
        self,
        host: str = "127.0.0.1",
        state_reader: Callable[[], object] | None = None,
        on_reload: Callable[[], None] | None = None,
    ) -> None:
        self._host = host
        self._state_reader = state_reader
        self._on_reload = on_reload
        self._clients: list[socket.socket] = []
        self._lock = threading.Lock()
        self._closed = False

        # line server: Spark's socket source connects here
        self._line_srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._line_srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._line_srv.bind((host, 0))
        self._line_srv.listen(8)
        self.line_port: int = self._line_srv.getsockname()[1]

        bridge = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence per-request stderr noise
                pass

            def _reply(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self) -> None:
                if self.path.startswith("/online/"):
                    stream = self.path[len("/online/") :].strip("/")
                    if not stream:
                        return self._reply(400, {"error": "missing stream id"})
                    bridge.push_line(f"online/{stream}")
                    return self._reply(200, {"ok": True, "stream": stream})
                if self.path == "/event":
                    n = int(self.headers.get("Content-Length", 0))
                    raw = self.rfile.read(n).decode()
                    try:
                        json.loads(raw)
                    except ValueError:
                        return self._reply(400, {"error": "body must be JSON"})
                    bridge.push_line(raw.replace("\n", " "))
                    return self._reply(200, {"ok": True})
                if self.path == "/reload":
                    if bridge._on_reload is None:
                        return self._reply(503, {"error": "no reload hook"})
                    bridge._on_reload()
                    return self._reply(200, {"ok": True})
                return self._reply(404, {"error": "unknown route"})

            def do_GET(self) -> None:
                if self.path == "/state":
                    if bridge._state_reader is None:
                        return self._reply(503, {"error": "no state reader"})
                    return self._reply(200, {"state": bridge._state_reader()})
                return self._reply(404, {"error": "unknown route"})

        self._http = ThreadingHTTPServer((host, 0), Handler)
        self.http_port: int = self._http.server_address[1]

        self._accept_thread = threading.Thread(target=self._accept_loop, daemon=True)
        self._http_thread = threading.Thread(
            target=self._http.serve_forever, daemon=True
        )

    # ------------------------------------------------------------- lifecycle
    def start(self) -> "HttpPushBridge":
        self._accept_thread.start()
        self._http_thread.start()
        return self

    def stop(self) -> None:
        self._closed = True
        self._http.shutdown()
        self._http.server_close()
        try:
            self._line_srv.close()
        except OSError:
            pass
        with self._lock:
            for c in self._clients:
                try:
                    c.close()
                except OSError:
                    pass
            self._clients.clear()

    def __enter__(self) -> "HttpPushBridge":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    # -------------------------------------------------------------- plumbing
    def _accept_loop(self) -> None:
        while not self._closed:
            try:
                conn, _ = self._line_srv.accept()
            except OSError:
                return
            with self._lock:
                self._clients.append(conn)

    def push_line(self, line: str) -> int:
        """Send one line to every connected socket-source client.
        Returns the number of live clients written to."""
        data = (line + "\n").encode()
        sent = 0
        with self._lock:
            live = []
            for c in self._clients:
                try:
                    c.sendall(data)
                    live.append(c)
                    sent += 1
                except OSError:
                    try:
                        c.close()
                    except OSError:
                        pass
            self._clients = live
        return sent
