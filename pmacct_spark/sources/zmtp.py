"""ZMTP 3.0 (the ZeroMQ wire protocol) over real loopback sockets:
the socket half of the reference's ZMQ transports, implemented from
the public spec so the engine's (topic, payload) frames are exercised
end-to-end through genuine TCP byte streams.

Reference mapping: the reference uses ZeroMQ in two roles —
(a) telemetry ingest: pmtelemetryd binds a PULL socket that the
    external gRPC collector PUSHes de-marshalled JSON into
    (src/telemetry/telemetry.c:115-135, zmq_bind + PULL), and
(b) Kafka-less pub/sub delivery: plugins PUBlish records under a
    single-byte topic, consumers SUBscribe with a topic filter
    (src/zmq_common.c:56 p_zmq_set_topic, :348-358 PUB/PUSH setup,
    :482 subscriber filter).
This module implements both conversations at the ZMTP 3.0 level:
64-byte greeting, NULL-mechanism READY handshake with Socket-Type
metadata (peer compatibility checked), the PLAIN mechanism
(HELLO/WELCOME/INITIATE/READY credential flow, spec 24 — the
reference's ZAP user/passwd surface), short/long message framing,
and 3.0 PUB/SUB subscription messages (\\x01 topic / \\x00 topic).

Honest scope note: this is OUR ZMTP implementation, not libzmq —
reconnection, HWM back-pressure and CURVE encryption are out of
scope. What it proves beyond the frame contracts: the
handshake, socket-type compatibility rules, message framing and
PUB-side topic-prefix filtering all survive a real socket.
"""

from __future__ import annotations

import socket
import struct
import threading
import time

from pmacct_spark.sources.sockio import recv_exact as _recv_exact

def _greeting(mechanism: str = "NULL", as_server: bool = False) -> bytes:
    mech = mechanism.encode().ljust(20, b"\x00")
    return (
        b"\xff" + b"\x00" * 8 + b"\x7f"  # signature
        + b"\x03\x00"  # version 3.0
        + mech
        + (b"\x01" if as_server else b"\x00")  # as-server
        + b"\x00" * 31  # filler
    )


_GREETING = _greeting()

_COMPATIBLE = {
    "PUSH": {"PULL"},
    "PULL": {"PUSH"},
    "PUB": {"SUB"},
    "SUB": {"PUB"},
    "REQ": {"REP", "ROUTER"},
    "ROUTER": {"REQ", "DEALER"},
}


def _send_frame(
    sock: socket.socket, body: bytes, command: bool = False, more: bool = False
) -> None:
    flags = (4 if command else 0) | (1 if more else 0)
    if len(body) <= 255:
        sock.sendall(bytes([flags, len(body)]) + body)
    else:
        sock.sendall(bytes([flags | 2]) + struct.pack(">Q", len(body)) + body)


def _recv_frame(sock: socket.socket) -> tuple[int, bytes]:
    flags = _recv_exact(sock, 1)[0]
    if flags & 2:  # LONG
        (size,) = struct.unpack(">Q", _recv_exact(sock, 8))
    else:
        size = _recv_exact(sock, 1)[0]
    return flags, _recv_exact(sock, size)


def _ready_command(socket_type: str) -> bytes:
    name = b"READY"
    prop = b"Socket-Type"
    val = socket_type.encode()
    return (
        bytes([len(name)]) + name
        + bytes([len(prop)]) + prop
        + struct.pack(">I", len(val)) + val
    )


def _parse_ready(body: bytes) -> str:
    nlen = body[0]
    name = body[1 : 1 + nlen]
    if name != b"READY":
        raise ValueError(f"expected READY, got {name!r}")
    off = 1 + nlen
    while off < len(body):
        plen = body[off]
        pname = body[off + 1 : off + 1 + plen]
        off += 1 + plen
        (vlen,) = struct.unpack_from(">I", body, off)
        val = body[off + 4 : off + 4 + vlen]
        off += 4 + vlen
        if pname.lower() == b"socket-type":
            return val.decode()
    raise ValueError("READY carried no Socket-Type")


def _command(name: bytes, data: bytes = b"") -> bytes:
    return bytes([len(name)]) + name + data


def _split_command(body: bytes) -> tuple[bytes, bytes]:
    n = body[0]
    return body[1 : 1 + n], body[1 + n :]


def _metadata(socket_type: str) -> bytes:
    prop = b"Socket-Type"
    val = socket_type.encode()
    return (
        bytes([len(prop)]) + prop + struct.pack(">I", len(val)) + val
    )


def _parse_metadata(data: bytes) -> str:
    off = 0
    while off < len(data):
        plen = data[off]
        pname = data[off + 1 : off + 1 + plen]
        off += 1 + plen
        (vlen,) = struct.unpack_from(">I", data, off)
        val = data[off + 4 : off + 4 + vlen]
        off += 4 + vlen
        if pname.lower() == b"socket-type":
            return val.decode()
    raise ValueError("metadata carried no Socket-Type")


def _recv_command(sock: socket.socket, expect: bytes) -> bytes:
    flags, body = _recv_frame(sock)
    if not flags & 4:
        raise ValueError(f"expected {expect.decode()} command")
    name, data = _split_command(body)
    if name == b"ERROR":
        raise ValueError(f"peer ERROR: {data[1 : 1 + data[0]].decode()}")
    if name != expect:
        raise ValueError(f"expected {expect.decode()}, got {name.decode()}")
    return data


def _check_peer_type(socket_type: str, peer_type: str) -> None:
    if peer_type not in _COMPATIBLE[socket_type]:
        raise ValueError(
            f"socket-type mismatch: {socket_type} peer is {peer_type}"
        )


def _handshake(
    sock: socket.socket,
    socket_type: str,
    credentials: tuple[str, str] | None = None,
    as_server: bool = False,
    verify=None,
) -> None:
    """ZMTP 3.0 handshake. NULL mechanism (default): exchange READY
    commands carrying Socket-Type. PLAIN mechanism (spec 24, the ZAP
    credential flow the reference drives through bgp_lg_user/_passwd
    and p_zmq_set_username): client HELLO(user, passwd) -> server
    WELCOME -> client INITIATE(metadata) -> server READY(metadata);
    a failed check answers ERROR. ``credentials`` on a client /
    ``verify`` on a server select PLAIN."""
    plain = credentials is not None or verify is not None
    mech = "PLAIN" if plain else "NULL"
    sock.sendall(_greeting(mech, as_server=as_server))
    greeting = _recv_exact(sock, 64)
    if greeting[0] != 0xFF or greeting[9] != 0x7F:
        raise ValueError("bad ZMTP signature")
    peer_mech = greeting[12:32].rstrip(b"\x00").decode()
    if peer_mech != mech:
        raise ValueError(
            f"mechanism mismatch: ours {mech}, peer {peer_mech}"
        )
    if not plain:
        _send_frame(sock, _ready_command(socket_type), command=True)
        flags, body = _recv_frame(sock)
        if not flags & 4:
            raise ValueError("expected READY command")
        _check_peer_type(socket_type, _parse_ready(body))
        return
    if as_server:
        data = _recv_command(sock, b"HELLO")
        ulen = data[0]
        user = data[1 : 1 + ulen].decode()
        plen = data[1 + ulen]
        passwd = data[2 + ulen : 2 + ulen + plen].decode()
        if not verify(user, passwd):
            reason = b"Invalid username or password"
            _send_frame(
                sock,
                _command(b"ERROR", bytes([len(reason)]) + reason),
                command=True,
            )
            raise ValueError("PLAIN authentication failed")
        _send_frame(sock, _command(b"WELCOME"), command=True)
        _check_peer_type(
            socket_type, _parse_metadata(_recv_command(sock, b"INITIATE"))
        )
        _send_frame(
            sock, _command(b"READY", _metadata(socket_type)), command=True
        )
    else:
        user, passwd = credentials
        hello = (
            bytes([len(user.encode())]) + user.encode()
            + bytes([len(passwd.encode())]) + passwd.encode()
        )
        _send_frame(sock, _command(b"HELLO", hello), command=True)
        _recv_command(sock, b"WELCOME")
        _send_frame(
            sock, _command(b"INITIATE", _metadata(socket_type)), command=True
        )
        _check_peer_type(
            socket_type, _parse_metadata(_recv_command(sock, b"READY"))
        )


class ZmtpPushClient:
    """PUSH half of the telemetry seam (the external collector's role,
    reference telemetry.c:115-135)."""

    def __init__(self, host: str, port: int):
        self.sock = socket.create_connection((host, port), timeout=10)
        _handshake(self.sock, "PUSH")

    def send(self, payload: bytes) -> None:
        _send_frame(self.sock, payload)

    def close(self) -> None:
        self.sock.close()


class ZmtpPullServer:
    """PULL bind (pmtelemetryd's role): accepts PUSH peers, collects
    every message into ``received`` (thread-safe drain())."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self.host, self.port = host, port
        self.received: list[bytes] = []
        self._lock = threading.Lock()
        self._srv: socket.socket | None = None

    def start(self) -> "ZmtpPullServer":
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind((self.host, self.port))
        self.port = self._srv.getsockname()[1]
        self._srv.listen(8)
        threading.Thread(target=self._accept_loop, daemon=True).start()
        return self

    def stop(self) -> None:
        try:
            if self._srv:
                self._srv.close()
        except OSError:
            pass

    def drain(self) -> list[bytes]:
        with self._lock:
            out, self.received = self.received, []
        return out

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
        with conn:
            try:
                _handshake(conn, "PULL")
                while True:
                    flags, body = _recv_frame(conn)
                    if flags & 4:
                        continue  # ignore further commands
                    with self._lock:
                        self.received.append(body)
            except (ConnectionError, ValueError, IndexError, struct.error):
                return


class ZmtpPubServer:
    """PUB bind (the plugin's Kafka-less delivery role): tracks each
    subscriber's topic-prefix filters from 3.0 subscription messages
    (\\x01 topic) and forwards only matching messages — the broker-side
    behavior p_zmq_set_topic relies on (src/zmq_common.c:482)."""

    # per-entry: (conn, filter list, per-connection send lock) — the
    # send lock serializes concurrent publish() callers on one socket
    # so interleaved _send_frame writes can't corrupt ZMTP framing
    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self.host, self.port = host, port
        self._subs: list[
            tuple[socket.socket, list[bytes], threading.Lock]
        ] = []
        self._lock = threading.Lock()
        self._srv: socket.socket | None = None

    def start(self) -> "ZmtpPubServer":
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind((self.host, self.port))
        self.port = self._srv.getsockname()[1]
        self._srv.listen(8)
        threading.Thread(target=self._accept_loop, daemon=True).start()
        return self

    def stop(self) -> None:
        try:
            if self._srv:
                self._srv.close()
        except OSError:
            pass

    def subscriptions(self) -> list[tuple[bytes, ...]]:
        """Snapshot of each connected subscriber's filter prefixes.

        ZMTP's slow-joiner window is real: a subscriber's SUBSCRIBE
        command rides the message channel AFTER the handshake, so
        "connection registered" does not mean "filter registered" and
        a publish in between is silently prefix-filtered away (the
        same behavior libzmq documents for PUB/SUB). Callers that need
        delivery guarantees wait on THIS — filter presence — not on
        connection count."""
        with self._lock:
            return [tuple(filters) for _, filters, _ in self._subs]

    def wait_subscribed(self, n: int, timeout: float = 20.0) -> bool:
        """Block until >= n subscribers each have >= 1 filter
        registered. Returns True on success, False on timeout."""
        deadline = time.monotonic() + timeout
        while True:
            if sum(1 for f in self.subscriptions() if f) >= n:
                return True
            if time.monotonic() >= deadline:
                return False
            time.sleep(0.01)

    def publish(self, message: bytes) -> None:
        """Forward to every subscriber whose filter prefix-matches.

        The send happens OUTSIDE the server lock: one stalled
        subscriber (full TCP buffer) must not block other publishes or
        subscription updates. Each connection's send is serialized by
        its own small lock so concurrent publishers can't interleave
        frame bytes. The socket-level timeout is never touched here —
        the per-subscriber _serve thread is concurrently recv-blocking
        on the same socket, and a send-side SO_SNDTIMEO (set once at
        accept) bounds a stalled send without poisoning that recv.
        Dead connections are pruned in a second locked pass."""
        with self._lock:
            targets = [
                entry
                for entry in self._subs
                if any(message.startswith(f) for f in entry[1])
            ]
        dead = []
        for entry in targets:
            conn, _filters, sendlock = entry
            try:
                with sendlock:
                    _send_frame(conn, message)
            except OSError:
                dead.append(entry)
        if dead:
            with self._lock:
                for entry in dead:
                    if entry in self._subs:
                        self._subs.remove(entry)
            for entry in dead:
                try:
                    entry[0].close()
                except OSError:
                    pass

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
        try:
            _handshake(conn, "PUB")
        except (ConnectionError, ValueError, IndexError, struct.error):
            conn.close()
            return
        # SO_SNDTIMEO bounds a stalled publish-side sendall() (full TCP
        # buffer on one slow subscriber) without poisoning this thread's
        # concurrent recv on the same socket — a socket-object
        # settimeout() would apply to both directions.
        conn.setsockopt(
            socket.SOL_SOCKET,
            socket.SO_SNDTIMEO,
            struct.pack("ll", 5, 0),
        )
        filters: list[bytes] = []
        entry = (conn, filters, threading.Lock())
        with self._lock:
            self._subs.append(entry)
        try:
            while True:
                flags, body = _recv_frame(conn)
                if flags & 4:
                    continue
                # 3.0 subscription messages ride the message channel
                if body[:1] == b"\x01":
                    with self._lock:
                        filters.append(body[1:])
                elif body[:1] == b"\x00":
                    with self._lock:
                        if body[1:] in filters:
                            filters.remove(body[1:])
        except (ConnectionError, ValueError, IndexError, struct.error):
            with self._lock:
                if entry in self._subs:
                    self._subs.remove(entry)
            conn.close()


class ZmtpSubClient:
    """SUB connect: sends the 3.0 subscription message for each topic
    prefix, then receives matching messages."""

    def __init__(self, host: str, port: int, topics: list[bytes]):
        self.sock = socket.create_connection((host, port), timeout=10)
        _handshake(self.sock, "SUB")
        for t in topics:
            _send_frame(self.sock, b"\x01" + t)

    def recv(self, timeout: float = 5.0) -> bytes:
        self.sock.settimeout(timeout)
        while True:
            flags, body = _recv_frame(self.sock)
            if not flags & 4:
                return body

    def close(self) -> None:
        self.sock.close()


def _recv_message(sock: socket.socket) -> list[bytes]:
    """Read one full multipart message (frames until MORE clears),
    skipping interleaved commands."""
    parts: list[bytes] = []
    while True:
        flags, body = _recv_frame(sock)
        if flags & 4:
            continue
        parts.append(body)
        if not flags & 1:
            return parts


def _send_message(sock: socket.socket, parts: list[bytes]) -> None:
    for i, p in enumerate(parts):
        _send_frame(sock, p, more=(i < len(parts) - 1))


class ZmtpReqClient:
    """REQ half of the Looking Glass seam (the reference LG client's
    role, examples/lg/pmbgp.py over libzmq REQ). On the wire a
    REQ<->ROUTER exchange brackets each message with an empty
    delimiter frame; the router identity is connection-local and never
    appears on the wire."""

    def __init__(
        self,
        host: str,
        port: int,
        timeout: float = 30.0,
        credentials: tuple[str, str] | None = None,
    ):
        # generous timeout: an LG reply may wait on a RIB recompute
        self.sock = socket.create_connection((host, port), timeout=timeout)
        _handshake(self.sock, "REQ", credentials=credentials)

    def request(self, parts: list[bytes]) -> list[bytes]:
        _send_frame(self.sock, b"", more=True)  # REQ envelope delimiter
        _send_message(self.sock, parts)
        reply = _recv_message(self.sock)
        if reply and reply[0] == b"":
            reply = reply[1:]
        return reply

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass


class ZmtpRouterServer:
    """ROUTER bind (the reference LG daemon's role,
    src/bgp/bgp_lg.c:67 p_zmq_router_setup): per-connection sessions;
    each inbound multipart request (delimiter stripped) is answered by
    ``handler(parts) -> reply parts`` under the same envelope."""

    def __init__(
        self, handler, host: str = "127.0.0.1", port: int = 0, verify=None
    ):
        self.handler = handler
        self.verify = verify  # (user, passwd) -> bool selects PLAIN
        self.host, self.port = host, port
        self._srv: socket.socket | None = None

    def start(self) -> "ZmtpRouterServer":
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind((self.host, self.port))
        self.port = self._srv.getsockname()[1]
        self._srv.listen(8)
        threading.Thread(target=self._accept_loop, daemon=True).start()
        return self

    def stop(self) -> None:
        try:
            if self._srv:
                self._srv.close()
        except OSError:
            pass

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
        with conn:
            try:
                _handshake(
                    conn, "ROUTER",
                    as_server=self.verify is not None,
                    verify=self.verify,
                )
                while True:
                    parts = _recv_message(conn)
                    if parts and parts[0] == b"":
                        parts = parts[1:]
                    reply = self.handler(parts)
                    _send_frame(conn, b"", more=True)
                    _send_message(conn, reply)
            except (ConnectionError, ValueError, IndexError, struct.error):
                return
