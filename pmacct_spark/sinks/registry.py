"""Confluent Schema Registry over live HTTP/1.1 — in-process server
peer + client with the same two-method surface as
:class:`pmacct_spark.sinks.avro.StubSchemaRegistry`.

The reference negotiates Avro schemas through libserdes against a
registry URL (src/plugin_cmn_avro.c:47, ``kafka_avro_schema_registry``
config key). This module closes the one formerly-stubbed seam: the
HTTP conversation itself. The server speaks the registry's REST
surface (the subset libserdes uses):

  POST /subjects/{subject}/versions   {"schema": "<json>"} -> {"id": N}
  GET  /schemas/ids/{id}              -> {"schema": "<json>"}
  GET  /subjects/{subject}/versions   -> [1, 2, ...]
  GET  /subjects/{subject}/versions/{v} -> {subject, version, id, schema}

with the registry's semantics: registering a byte-identical (canonical)
schema is idempotent and returns the existing id; an evolved schema
under the same subject gets a new global id and the next version.

Scale note: like libserdes, the client caches ids — registration
happens once on the driver per (subject, schema); executors never talk
to the registry (see ``avro_registry_frames``).
"""

from __future__ import annotations

import json
import socket
import threading

_CT = "application/vnd.schemaregistry.v1+json"


def _canon(schema_json: str) -> str:
    return json.dumps(json.loads(schema_json), sort_keys=True)


class SchemaRegistryServer:
    """Minimal threaded HTTP/1.1 registry peer (raw sockets, stdlib
    only — the same in-process-live-peer pattern as the Kafka, AMQP,
    PG, MySQL, ZMTP and HTTP/2 servers in this repo)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self.host, self._port = host, port
        self._srv: socket.socket | None = None
        self._lock = threading.Lock()
        self._by_id: dict[int, str] = {}
        self._subjects: dict[str, list[tuple[int, str]]] = {}
        self._next_id = 1
        self.requests_served = 0

    @property
    def port(self) -> int:
        assert self._srv is not None
        return self._srv.getsockname()[1]

    def start(self) -> "SchemaRegistryServer":
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind((self.host, self._port))
        self._srv.listen(16)
        threading.Thread(target=self._accept_loop, daemon=True).start()
        return self

    def stop(self) -> None:
        try:
            if self._srv:
                self._srv.close()
        except OSError:
            pass

    # -- registry semantics (shared with StubSchemaRegistry) ----------

    def _register(self, subject: str, schema_json: str) -> int:
        canon = _canon(schema_json)
        with self._lock:
            versions = self._subjects.setdefault(subject, [])
            for sid, existing in versions:
                if existing == canon:
                    return sid
            sid = self._next_id
            self._next_id += 1
            self._by_id[sid] = canon
            versions.append((sid, canon))
            return sid

    # -- HTTP plumbing ------------------------------------------------

    def _accept_loop(self) -> None:
        while True:
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            threading.Thread(
                target=self._serve, args=(conn,), daemon=True
            ).start()

    def _serve(self, conn: socket.socket) -> None:
        conn.settimeout(10)
        try:
            buf = b""
            while True:
                while b"\r\n\r\n" not in buf:
                    chunk = conn.recv(65536)
                    if not chunk:
                        return
                    buf += chunk
                head, _, rest = buf.partition(b"\r\n\r\n")
                lines = head.decode("latin-1").split("\r\n")
                method, path, _version = lines[0].split(" ", 2)
                headers = {}
                for ln in lines[1:]:
                    k, _, v = ln.partition(":")
                    headers[k.strip().lower()] = v.strip()
                clen = int(headers.get("content-length", "0"))
                while len(rest) < clen:
                    chunk = conn.recv(65536)
                    if not chunk:
                        return
                    rest += chunk
                body, buf = rest[:clen], rest[clen:]
                status, payload = self._route(method, path, body)
                resp = json.dumps(payload).encode()
                conn.sendall(
                    (
                        f"HTTP/1.1 {status}\r\n"
                        f"Content-Type: {_CT}\r\n"
                        f"Content-Length: {len(resp)}\r\n"
                        "Connection: keep-alive\r\n\r\n"
                    ).encode()
                    + resp
                )
                self.requests_served += 1
                if headers.get("connection", "").lower() == "close":
                    return
        except (OSError, ValueError):
            pass
        finally:
            try:
                conn.close()
            except OSError:
                pass

    def _route(self, method: str, path: str, body: bytes):
        parts = [p for p in path.split("/") if p]
        if method == "POST" and len(parts) == 3 and parts[0] == "subjects" \
                and parts[2] == "versions":
            try:
                schema = json.loads(body.decode())["schema"]
            except (ValueError, KeyError):
                return "422 Unprocessable Entity", {
                    "error_code": 42201, "message": "invalid schema"
                }
            return "200 OK", {"id": self._register(parts[1], schema)}
        if method == "GET" and len(parts) == 3 and parts[0] == "schemas" \
                and parts[1] == "ids":
            with self._lock:
                canon = self._by_id.get(int(parts[2]))
            if canon is None:
                return "404 Not Found", {
                    "error_code": 40403, "message": "schema not found"
                }
            return "200 OK", {"schema": canon}
        if method == "GET" and len(parts) >= 3 and parts[0] == "subjects" \
                and parts[2] == "versions":
            with self._lock:
                versions = self._subjects.get(parts[1])
            if versions is None:
                return "404 Not Found", {
                    "error_code": 40401, "message": "subject not found"
                }
            if len(parts) == 3:
                return "200 OK", list(range(1, len(versions) + 1))
            v = int(parts[3])
            if not 1 <= v <= len(versions):
                return "404 Not Found", {
                    "error_code": 40402, "message": "version not found"
                }
            sid, canon = versions[v - 1]
            return "200 OK", {
                "subject": parts[1], "version": v, "id": sid,
                "schema": canon,
            }
        return "404 Not Found", {"error_code": 404, "message": "no route"}


class HttpSchemaRegistryClient:
    """HTTP-backed registry client, duck-compatible with
    StubSchemaRegistry (register / get_schema) so
    ``avro_registry_frames`` / ``read_registry_frame`` take either.
    Caches both directions like libserdes, so repeated framing and
    decoding generate no registry traffic."""

    def __init__(self, host: str, port: int):
        self.host, self.port = host, port
        self._id_cache: dict[tuple[str, str], int] = {}
        self._schema_cache: dict[int, dict] = {}

    def _request(self, method: str, path: str, payload=None):
        import http.client

        conn = http.client.HTTPConnection(self.host, self.port, timeout=10)
        try:
            body = None if payload is None else json.dumps(payload)
            conn.request(
                method, path, body=body, headers={"Content-Type": _CT}
            )
            resp = conn.getresponse()
            data = json.loads(resp.read().decode())
            if resp.status >= 400:
                raise ValueError(
                    f"registry {resp.status}: {data.get('message')}"
                )
            return data
        finally:
            conn.close()

    def register(self, subject: str, schema_json: str) -> int:
        key = (subject, _canon(schema_json))
        if key not in self._id_cache:
            out = self._request(
                "POST", f"/subjects/{subject}/versions",
                {"schema": schema_json},
            )
            self._id_cache[key] = int(out["id"])
        return self._id_cache[key]

    def get_schema(self, schema_id: int) -> dict:
        if schema_id not in self._schema_cache:
            out = self._request("GET", f"/schemas/ids/{schema_id}")
            self._schema_cache[schema_id] = json.loads(out["schema"])
        return self._schema_cache[schema_id]

    def subject_versions(self, subject: str) -> list[int]:
        return self._request("GET", f"/subjects/{subject}/versions")
