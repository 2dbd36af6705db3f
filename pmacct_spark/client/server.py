"""Query server: the reference's UNIX-socket protocol surface
(src/server.c:31-480 + imt_plugin.c poll loop) over :class:`ImtTable`.

One request per connection, newline-delimited JSON (the wire format is
ours — the reference uses packed C structs over /tmp/collect.pipe; the
REQUEST VOCABULARY is the reference's):

    {"cmd": "stats"}                          -> -s full scan
    {"cmd": "match", "spec": "...", "counters_only": b, "sum": b,
     "reset": b}                              -> -M/-N/-S/-r
    {"cmd": "topn", "counter": "bytes", "n": 10}  -> -T
    {"cmd": "status"}                         -> -t bucket stats
    {"cmd": "erase"}                          -> -e

Response: {"ok": true, "columns": [...], "rows": [[...], ...]} or
{"ok": false, "error": "..."}.

Serving note: queries execute on the driver's cached DataFrame — the
serving layer is a control-plane thread, not a data-plane operator (the
reference's IMT process is the same shape: a poll loop beside the
collector). A production deploy would put the aggregate in an external
serving store; this server exists so a pmacct user's client workflow
(point the client at a socket, issue -s/-M/-N) keeps working.
"""

from __future__ import annotations

import json
import os
import socket
import threading

from pmacct_spark.client.imt import ImtTable


def _execute(table: ImtTable, req: dict):
    cmd = req.get("cmd")
    if cmd == "stats":
        return table.stats()
    if cmd == "match":
        return table.match(
            req["spec"],
            counters_only=bool(req.get("counters_only")),
            sum_matches=bool(req.get("sum")),
            reset_after=bool(req.get("reset")),
        )
    if cmd == "topn":
        return table.topn(req.get("counter", "bytes"), int(req.get("n", 10)))
    if cmd == "status":
        return table.status()
    if cmd == "erase":
        table.erase()
        return None
    raise ValueError(f"unknown cmd {cmd!r}")


class ImtServer:
    """UNIX-socket server for one served table. ``start()`` runs the
    accept loop in a daemon thread; one JSON request per connection."""

    def __init__(self, table: ImtTable, path: str):
        self.table = table
        self.path = path
        self._sock: socket.socket | None = None
        self._thread: threading.Thread | None = None
        self._stop = threading.Event()

    def start(self) -> "ImtServer":
        if os.path.exists(self.path):
            os.unlink(self.path)
        self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        self._sock.bind(self.path)
        self._sock.listen(8)
        self._sock.settimeout(0.2)
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def _loop(self) -> None:
        assert self._sock is not None
        while not self._stop.is_set():
            try:
                conn, _ = self._sock.accept()
            except socket.timeout:
                continue
            except OSError:
                break
            try:
                buf = b""
                while not buf.endswith(b"\n"):
                    chunk = conn.recv(65536)
                    if not chunk:
                        break
                    buf += chunk
                req = json.loads(buf.decode())
                df = _execute(self.table, req)
                if df is None:
                    resp = {"ok": True, "columns": [], "rows": []}
                else:
                    rows = df.collect()
                    resp = {
                        "ok": True,
                        "columns": df.columns,
                        "rows": [
                            [None if v is None else v for v in r] for r in rows
                        ],
                    }
            except Exception as exc:  # protocol errors -> error reply
                resp = {"ok": False, "error": str(exc)}
            try:
                conn.sendall((json.dumps(resp, default=str) + "\n").encode())
            finally:
                conn.close()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
        if self._sock is not None:
            self._sock.close()
        if os.path.exists(self.path):
            os.unlink(self.path)


def query(path: str, req: dict) -> dict:
    """Client side: one request against a served socket."""
    s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    s.connect(path)
    try:
        s.sendall((json.dumps(req) + "\n").encode())
        buf = b""
        while not buf.endswith(b"\n"):
            chunk = s.recv(65536)
            if not chunk:
                break
            buf += chunk
        return json.loads(buf.decode())
    finally:
        s.close()
