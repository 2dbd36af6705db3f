"""Minimal RESP (REdis Serialization Protocol v2) wire layer: a
client, a tiny in-process server for tests, and the daemon-presence
publisher thread.

This is the engine's seam for the reference's redis integration
(src/redis_common.c): every pmacct daemon with ``redis_host`` set runs
a background thread that publishes short-TTL presence keys
(``{cluster_name}+{cluster_id}+daemon_type``,
``...+process+{name}+{type}`` and per-subsystem ``+bgp``/``+bmp``/
``+telemetry`` markers, p_redis_thread_produce_common_core_handler
src/redis_common.c:281-336) every PM_REDIS_DEFAULT_REFRESH_TIME
seconds with PM_REDIS_DEFAULT_EXP_TIME expiry, so an external
orchestrator sees live cluster membership. Connection loss must NEVER
stop the daemon (reference test tests/901-redis-connection-loss): the
connect is non-fatal, failures log a WARN and re-dial with a >= 1 s
throttle (PM_REDIS_DEFAULT_CONN_RETRY, p_redis_connect
src/redis_common.c:87-168), and accounting continues throughout the
outage.

The protocol encoding is implemented from the public RESP spec —
commands are arrays of bulk strings; replies are simple strings (+),
errors (-), integers (:), bulk strings ($) and arrays (*).
"""

from __future__ import annotations

import fnmatch
import socket
import threading
import time

PM_REDIS_DEFAULT_PORT = 6379
PM_REDIS_DEFAULT_EXP_TIME = 3
PM_REDIS_DEFAULT_REFRESH_TIME = 1
PM_REDIS_DEFAULT_CONN_RETRY = 1
PM_REDIS_DEFAULT_SEP = "+"


def encode_command(*args: str | bytes | int) -> bytes:
    """RESP command: array of bulk strings."""
    out = [b"*%d\r\n" % len(args)]
    for a in args:
        if isinstance(a, int):
            a = str(a)
        if isinstance(a, str):
            a = a.encode()
        out.append(b"$%d\r\n%s\r\n" % (len(a), a))
    return b"".join(out)


class _Conn:
    """Buffered reply reader over a socket."""

    def __init__(self, sock: socket.socket):
        self.sock = sock
        self.buf = b""

    def _readline(self) -> bytes:
        while b"\r\n" not in self.buf:
            chunk = self.sock.recv(4096)
            if not chunk:
                raise ConnectionError("redis peer closed")
            self.buf += chunk
        line, self.buf = self.buf.split(b"\r\n", 1)
        return line

    def _readn(self, n: int) -> bytes:
        while len(self.buf) < n + 2:
            chunk = self.sock.recv(4096)
            if not chunk:
                raise ConnectionError("redis peer closed")
            self.buf += chunk
        data, self.buf = self.buf[:n], self.buf[n + 2:]
        return data

    def read_reply(self):
        line = self._readline()
        t, rest = line[:1], line[1:]
        if t == b"+":
            return rest.decode()
        if t == b"-":
            raise RedisReplyError(rest.decode())
        if t == b":":
            return int(rest)
        if t == b"$":
            n = int(rest)
            return None if n == -1 else self._readn(n)
        if t == b"*":
            n = int(rest)
            return None if n == -1 else [self.read_reply() for _ in range(n)]
        raise ConnectionError(f"bad RESP type byte {t!r}")


class RedisReplyError(Exception):
    """-ERR reply (the command reached the server; transport is fine)."""


class RespClient:
    """Blocking RESP2 client (the hiredis-synchronous-context shape the
    reference uses)."""

    def __init__(self, host: str, port: int, timeout: float = 5.0):
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self.sock.settimeout(timeout)
        self._conn = _Conn(self.sock)

    def command(self, *args):
        self.sock.sendall(encode_command(*args))
        return self._conn.read_reply()

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass


class MiniRedisServer:
    """In-process RESP2 server implementing the subset the presence
    seam uses (PING, AUTH, SELECT, SET, SETEX, GET, DEL, KEYS, TTL,
    EXISTS) with real key expiry — the reference test framework's
    redis container, minus the container. Restartable on the same
    port (``MiniRedisServer(port=old_port)``) for connection-loss
    scenarios."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 passwd: str | None = None):
        self.host, self.port, self.passwd = host, port, passwd
        self._data: dict[int, dict[str, tuple[bytes, float | None]]] = {}
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._srv: socket.socket | None = None
        self._threads: list[threading.Thread] = []

    def start(self) -> "MiniRedisServer":
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind((self.host, self.port))
        srv.listen(16)
        srv.settimeout(0.2)
        self._srv = srv
        self.port = srv.getsockname()[1]
        t = threading.Thread(target=self._accept_loop, daemon=True)
        t.start()
        self._threads.append(t)
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._srv is not None:
            try:
                self._srv.close()
            except OSError:
                pass
            self._srv = None
        for t in self._threads:
            t.join(timeout=5)
        self._threads = []

    # --- inspection helpers for tests -------------------------------
    def get(self, key: str, db: int = 0) -> bytes | None:
        with self._lock:
            v = self._data.get(db, {}).get(key)
            if v is None:
                return None
            val, exp = v
            if exp is not None and time.monotonic() >= exp:
                del self._data[db][key]
                return None
            return val

    def keys(self, pattern: str = "*", db: int = 0) -> list[str]:
        with self._lock:
            now = time.monotonic()
            d = self._data.get(db, {})
            live = [k for k, (_, e) in d.items() if e is None or e > now]
        return sorted(k for k in live if fnmatch.fnmatchcase(k, pattern))

    # --- server internals --------------------------------------------
    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                cli, _ = self._srv.accept()
            except (TimeoutError, OSError):
                continue
            t = threading.Thread(
                target=self._serve, args=(cli,), daemon=True
            )
            t.start()
            self._threads.append(t)

    def _serve(self, sock: socket.socket) -> None:
        sock.settimeout(0.5)
        conn = _Conn(sock)
        db = 0
        authed = self.passwd is None
        try:
            while not self._stop.is_set():
                try:
                    req = conn.read_reply()
                except TimeoutError:
                    continue
                except (ConnectionError, OSError):
                    return
                if not isinstance(req, list) or not req:
                    sock.sendall(b"-ERR protocol\r\n")
                    continue
                cmd = req[0].upper().decode()
                args = req[1:]
                if cmd == "AUTH":
                    if self.passwd is not None and args and (
                        args[0].decode() == self.passwd
                    ):
                        authed = True
                        sock.sendall(b"+OK\r\n")
                    else:
                        sock.sendall(b"-ERR invalid password\r\n")
                    continue
                if not authed:
                    sock.sendall(b"-NOAUTH Authentication required.\r\n")
                    continue
                sock.sendall(self._dispatch(cmd, args, db)
                             if cmd != "SELECT" else self._select(args))
                if cmd == "SELECT" and args:
                    try:
                        db = int(args[0])
                    except ValueError:
                        pass
        finally:
            try:
                sock.close()
            except OSError:
                pass

    @staticmethod
    def _select(args) -> bytes:
        try:
            int(args[0])
            return b"+OK\r\n"
        except (ValueError, IndexError):
            return b"-ERR invalid DB index\r\n"

    def _dispatch(self, cmd: str, args: list, db: int) -> bytes:
        now = time.monotonic()
        with self._lock:
            d = self._data.setdefault(db, {})
            if cmd == "PING":
                return b"+PONG\r\n"
            if cmd == "SET" and len(args) >= 2:
                d[args[0].decode()] = (args[1], None)
                return b"+OK\r\n"
            if cmd == "SETEX" and len(args) >= 3:
                try:
                    ttl = int(args[1])
                except ValueError:
                    return b"-ERR value is not an integer\r\n"
                d[args[0].decode()] = (args[2], now + ttl)
                return b"+OK\r\n"
            if cmd == "GET" and args:
                v = d.get(args[0].decode())
                if v is None or (v[1] is not None and now >= v[1]):
                    d.pop(args[0].decode(), None)
                    return b"$-1\r\n"
                return b"$%d\r\n%s\r\n" % (len(v[0]), v[0])
            if cmd == "DEL":
                n = 0
                for a in args:
                    if d.pop(a.decode(), None) is not None:
                        n += 1
                return b":%d\r\n" % n
            if cmd == "EXISTS":
                n = 0
                for a in args:
                    v = d.get(a.decode())
                    if v is not None and (v[1] is None or now < v[1]):
                        n += 1
                return b":%d\r\n" % n
            if cmd == "TTL" and args:
                v = d.get(args[0].decode())
                if v is None:
                    return b":-2\r\n"
                if v[1] is None:
                    return b":-1\r\n"
                return b":%d\r\n" % max(0, int(v[1] - now))
            if cmd == "KEYS" and args:
                pat = args[0].decode()
                live = sorted(
                    k for k, (_, e) in d.items()
                    if (e is None or e > now)
                    and fnmatch.fnmatchcase(k, pat)
                )
                out = [b"*%d\r\n" % len(live)]
                for k in live:
                    kb = k.encode()
                    out.append(b"$%d\r\n%s\r\n" % (len(kb), kb))
                return b"".join(out)
        return b"-ERR unknown command '%s'\r\n" % cmd.encode()


class RedisPresence:
    """The per-daemon presence publisher
    (p_redis_master_produce_thread, src/redis_common.c:43-64): publish
    the short-TTL membership keys every refresh tick; on transport
    failure log a WARN, keep the daemon alive, and re-dial throttled
    to one attempt per PM_REDIS_DEFAULT_CONN_RETRY second until the
    server returns — then resume publishing so the keys reappear
    before their TTL would matter (reference test 901)."""

    def __init__(
        self,
        host: str,
        port: int,
        cluster_name: str,
        cluster_id: int = 0,
        name: str = "default",
        ptype: str = "core",
        daemon_type: str = "nfacctd",
        extras: tuple[str, ...] = (),
        db: int = 0,
        passwd: str | None = None,
        exp_time: int = PM_REDIS_DEFAULT_EXP_TIME,
        refresh_secs: float = PM_REDIS_DEFAULT_REFRESH_TIME,
    ):
        self.host, self.port = host, port
        self.cluster_name, self.cluster_id = cluster_name, int(cluster_id)
        self.name, self.ptype, self.daemon_type = name, ptype, daemon_type
        self.extras = tuple(extras)
        self.db, self.passwd = int(db), passwd
        self.exp_time, self.refresh_secs = int(exp_time), float(refresh_secs)
        self.publishes = 0
        self.reconnects = 0
        self.last_error: Exception | None = None
        self.warnings: list[str] = []
        self._cli: RespClient | None = None
        self._last_dial = 0.0
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    # key layout: {cluster_name}+{cluster_id}+{resource}
    def _key(self, resource: str) -> str:
        s = PM_REDIS_DEFAULT_SEP
        return f"{self.cluster_name}{s}{self.cluster_id}{s}{resource}"

    def _presence_keys(self) -> list[tuple[str, str]]:
        s = PM_REDIS_DEFAULT_SEP
        nt = f"process{s}{self.name}{s}{self.ptype}"
        keys = [("daemon_type", self.daemon_type), (nt, "1")]
        keys.extend((f"{nt}{s}{x}", "1") for x in self.extras)
        return keys

    def start(self) -> "RedisPresence":
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None
        if self._cli is not None:
            self._cli.close()
            self._cli = None

    def _dial(self) -> bool:
        """Non-fatal connect with the reference's 1/s retry throttle."""
        now = time.monotonic()
        if now - self._last_dial < PM_REDIS_DEFAULT_CONN_RETRY:
            return False
        self._last_dial = now
        try:
            cli = RespClient(self.host, self.port, timeout=3.0)
            if self.passwd:
                cli.command("AUTH", self.passwd)
            if self.db:
                cli.command("SELECT", self.db)
            cli.command("PING")
        except (ConnectionError, OSError, RedisReplyError) as exc:
            self.last_error = exc
            self.warnings.append(
                f"WARN ( {self.name}/{self.ptype}/redis ): "
                f"Can't connect to redis server: {exc}"
            )
            return False
        if self._cli is not None:
            self._cli.close()
            self.reconnects += 1
        self._cli = cli
        return True

    def _loop(self) -> None:
        while not self._stop.is_set():
            if self._cli is None:
                self._dial()
            if self._cli is not None:
                try:
                    for resource, value in self._presence_keys():
                        self._cli.command(
                            "SETEX", self._key(resource),
                            self.exp_time, value,
                        )
                    self.publishes += 1
                except (ConnectionError, OSError) as exc:
                    # server went away mid-publish: drop the context,
                    # warn, and let the dial throttle pace recovery —
                    # the daemon's accounting path never notices
                    self.last_error = exc
                    self.warnings.append(
                        f"WARN ( {self.name}/{self.ptype}/redis ): "
                        f"Can't connect to redis server: {exc}"
                    )
                    self._cli.close()
                    self._cli = None
                except RedisReplyError as exc:
                    # -ERR reply: transport is fine (p_redis_process_
                    # reply logs and carries on)
                    self.warnings.append(
                        f"WARN ( {self.name}/{self.ptype}/redis ): "
                        f"reply='{exc}'"
                    )
            self._stop.wait(self.refresh_secs)


class BmpBgpHa:
    """BMP/BGP high-availability election over redis (reference
    src/ha.c + docs/README_BGP_BMP_HA.md; tests 206/303/402): every
    collector in <cluster_name, cluster_id> publishes its STARTUP
    timestamp (microseconds) under
    ``{cluster}+{id}+{name}+ha_daemon_startup_time`` with a short TTL
    every second; a daemon is ACTIVE iff no peer advertises a SMALLER
    (older) timestamp — oldest collector wins, and when it dies its
    key expires so the next-oldest takes over within ~TTL seconds
    (bmp_bgp_ha_redis_check_daemon_state, src/ha.c:269-289).

    Signal surface mirrored as methods: set_to_active / set_to_standby
    (forced mode — election suspended, src/ha.c:365-376), set_to_normal
    (back to timestamp-based), regenerate_timestamp (re-stamp NOW, i.e.
    voluntarily yield leadership, src/ha.c:358).

    Redis outage is non-fatal: the last elected state holds, a WARN is
    recorded, and the dial retries at 1/s (the daemon never stops
    collecting — reference test 901 semantics apply here too).

    ``on_activate`` fires on every standby->active transition — the
    engine's analogue of the reference's queue dump (src/ha.c:222-266):
    the daemon's msglog render replays the full session history from
    the spool, so the new active re-emits everything the consumer
    might have missed (the reference's scenario-01 'unlimited queue'
    retention shape)."""

    KEY_ID = "ha_daemon_startup_time"

    def __init__(
        self,
        host: str,
        port: int,
        cluster_name: str,
        cluster_id: int = 0,
        name: str = "default",
        startup_us: int | None = None,
        exp_time: int = PM_REDIS_DEFAULT_EXP_TIME,
        refresh_secs: float = PM_REDIS_DEFAULT_REFRESH_TIME,
        passwd: str | None = None,
        on_activate=None,
    ):
        self.host, self.port = host, port
        self.cluster_name, self.cluster_id = cluster_name, int(cluster_id)
        self.name = name
        self.startup_us = (
            int(time.time() * 1_000_000) if startup_us is None
            else int(startup_us)
        )
        self.exp_time, self.refresh_secs = int(exp_time), float(refresh_secs)
        self.passwd = passwd
        self.on_activate = on_activate
        self.forwarding = False  # elected state (bmp_bgp_forwarding)
        self.forced_mode = False
        self.transitions = 0
        self.warnings: list[str] = []
        self.last_error: Exception | None = None
        self._cli: RespClient | None = None
        self._last_dial = 0.0
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    # --- the reference's signal handlers, as methods ----------------
    def set_to_active(self) -> None:
        self.forced_mode = True
        self._set_state(True)

    def set_to_standby(self) -> None:
        self.forced_mode = True
        self._set_state(False)

    def set_to_normal(self) -> None:
        self.forced_mode = False

    def regenerate_timestamp(self) -> None:
        self.startup_us = int(time.time() * 1_000_000)

    def start(self) -> "BmpBgpHa":
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None
        if self._cli is not None:
            self._cli.close()
            self._cli = None

    def _set_state(self, active: bool) -> None:
        if active and not self.forwarding:
            self.transitions += 1
            if self.on_activate is not None:
                self.on_activate()
        self.forwarding = active

    def _key(self) -> str:
        s = PM_REDIS_DEFAULT_SEP
        return (
            f"{self.cluster_name}{s}{self.cluster_id}{s}"
            f"{self.name}{s}{self.KEY_ID}"
        )

    def _pattern(self) -> str:
        s = PM_REDIS_DEFAULT_SEP
        return f"{self.cluster_name}{s}{self.cluster_id}{s}*{self.KEY_ID}"

    def _dial(self) -> bool:
        now = time.monotonic()
        if now - self._last_dial < PM_REDIS_DEFAULT_CONN_RETRY:
            return False
        self._last_dial = now
        try:
            cli = RespClient(self.host, self.port, timeout=3.0)
            if self.passwd:
                cli.command("AUTH", self.passwd)
            cli.command("PING")
        except (ConnectionError, OSError, RedisReplyError) as exc:
            self.last_error = exc
            self.warnings.append(
                f"WARN ( {self.name}/ha/redis ): "
                f"Can't connect to redis server: {exc}"
            )
            return False
        if self._cli is not None:
            self._cli.close()
        self._cli = cli
        return True

    def _tick(self) -> None:
        cli = self._cli
        if cli is None:
            return
        cli.command(
            "SETEX", self._key(), self.exp_time, str(self.startup_us)
        )
        if self.forced_mode:
            return
        keys = cli.command("KEYS", self._pattern()) or []
        active = True
        for k in keys:
            v = cli.command("GET", k)
            if v is None:
                continue
            try:
                ts = int(v)
            except ValueError:
                continue
            if ts < self.startup_us:
                active = False  # an older daemon owns the cluster
                break
        self._set_state(active)

    def _loop(self) -> None:
        while not self._stop.is_set():
            if self._cli is None:
                self._dial()
            if self._cli is not None:
                try:
                    self._tick()
                except (ConnectionError, OSError) as exc:
                    # outage: hold the last elected state (the
                    # reference keeps daemon_state), warn, re-dial
                    self.last_error = exc
                    self.warnings.append(
                        f"WARN ( {self.name}/ha/redis ): "
                        f"Can't connect to redis server: {exc}"
                    )
                    self._cli.close()
                    self._cli = None
                except RedisReplyError as exc:
                    self.warnings.append(
                        f"WARN ( {self.name}/ha/redis ): reply='{exc}'"
                    )
            self._stop.wait(self.refresh_secs)
