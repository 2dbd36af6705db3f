"""BGP session cross-connect proxy — ``bgp_daemon_xconnect_map``
(reference CONFIG-KEYS:3265, examples/bgp_xconnects.map.example).

BGP proxying: edge routers peer with this daemon, and each accepted
session is 1:1 cross-connected to a BGP collector (an nfacctd
correlating flow and BGP data). Semantics mirror the reference's
select-loop implementation (src/bgp/bgp.c):

- mapping is by IP address layer only, NOT the BGP Router ID
  (src/bgp/bgp_util.c:789 bgp_peer_xconnect_init matches the peer's
  source address against the map pool);
- raw bytes are forwarded BOTH directions with no local BGP
  processing (src/bgp/bgp.c:998 ``send_fd = peer->xconnect_fd`` and
  the mirrored xconnect_fd -> peer recv at :1003-1009) — the far
  collector runs the FSM;
- only ONE session per peer IP: a new connection for an existing
  xconnect is refused (src/bgp/bgp.c:948 "Refusing new incoming
  connection for existing BGP xconnect");
- a peer with no map entry is dropped (src/bgp/bgp_util.c:837
  "unable to xconnect BGP peer. Missing entry");
- mutually exclusive with BGP msglog/dump (src/bgp/bgp.c:298) —
  enforced by the daemon wiring, since the proxy never decodes.

Scale note: the proxy is control-plane machinery (hundreds of BGP
sessions, not data volume); one thread per direction per session is
the same budget the reference spends on its select() slots.
"""

from __future__ import annotations

import ipaddress
import socket
import threading


def match_xconnect(entries: list[dict], peer_ip: str) -> dict | None:
    """First map entry whose ``bgp_src`` prefix contains ``peer_ip``
    (the reference's linear pool walk, first match wins)."""
    addr = ipaddress.ip_address(peer_ip)
    for e in entries:
        if addr.version == e["src"].version and addr in e["src"]:
            return e
    return None


class BgpXconnectProxy:
    """Accepting TCP listener that cross-connects each mapped BGP
    session to its collector and pumps raw bytes both ways."""

    def __init__(
        self,
        entries: list[dict],
        host: str = "127.0.0.1",
        port: int = 0,
        md5_keys: dict[str, bytes] | None = None,
    ):
        self.entries = entries
        self.host = host
        self.port = port
        # TCP-MD5 on INBOUND sessions to the proxy, never outbound —
        # exactly the reference's support matrix (CONFIG-KEYS:3272:
        # "TCP-MD5 is supported on inbound sessions to the proxy
        # (via bgp_daemon_md5_file) but not on outbound ones")
        self.md5_keys = md5_keys or {}
        self._srv: socket.socket | None = None
        self._accept_thread: threading.Thread | None = None
        self._threads: list[threading.Thread] = []
        self._stop = threading.Event()
        self._lock = threading.Lock()
        # peer ip -> (peer_sock, dst_sock) while cross-connected
        self._active: dict[str, tuple] = {}
        self.sessions_started = 0
        self.refused_existing = 0
        self.refused_unmapped = 0
        self.connect_failures = 0
        self.bytes_to_dst = 0
        self.bytes_to_peer = 0

    # -- lifecycle ------------------------------------------------------
    def start(self) -> "BgpXconnectProxy":
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind((self.host, self.port))
        self.port = self._srv.getsockname()[1]
        if self.md5_keys:
            from pmacct_spark.sources.tcp import set_tcp_md5

            for peer, key in self.md5_keys.items():
                set_tcp_md5(self._srv, peer, key)
        self._srv.listen(16)
        self._srv.settimeout(0.05)
        self._stop.clear()
        self._accept_thread = threading.Thread(
            target=self._accept_loop, name=f"bgp-xconnect-{self.port}",
            daemon=True,
        )
        self._accept_thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._accept_thread is not None:
            self._accept_thread.join(timeout=10)
            self._accept_thread = None
        with self._lock:
            socks = [s for pair in self._active.values() for s in pair]
        for s in socks:
            try:
                s.close()
            except OSError:
                pass
        for t in self._threads:
            t.join(timeout=10)
        self._threads = []
        if self._srv is not None:
            self._srv.close()
            self._srv = None

    def __enter__(self) -> "BgpXconnectProxy":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    @property
    def sessions_active(self) -> int:
        with self._lock:
            return len(self._active)

    # -- socket threads --------------------------------------------------
    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                conn, (peer, _port) = self._srv.accept()
            except socket.timeout:
                continue
            except OSError:
                break
            entry = match_xconnect(self.entries, peer)
            if entry is None:
                # src/bgp/bgp_util.c:837: no map entry -> drop
                self.refused_unmapped += 1
                conn.close()
                continue
            with self._lock:
                if peer in self._active:
                    # src/bgp/bgp.c:948: one session per peer IP
                    self.refused_existing += 1
                    conn.close()
                    continue
                self._active[peer] = (conn, None)
            dst = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            dst.settimeout(5)
            try:
                dst.connect((entry["dst_host"], entry["dst_port"]))
            except OSError:
                # src/bgp/bgp_util.c:823 connect() failure path
                self.connect_failures += 1
                dst.close()
                conn.close()
                with self._lock:
                    self._active.pop(peer, None)
                continue
            with self._lock:
                self._active[peer] = (conn, dst)
            self.sessions_started += 1
            for src_sock, dst_sock, attr in (
                (conn, dst, "bytes_to_dst"),
                (dst, conn, "bytes_to_peer"),
            ):
                t = threading.Thread(
                    target=self._pump,
                    args=(peer, src_sock, dst_sock, attr),
                    daemon=True,
                )
                t.start()
                self._threads.append(t)
            self._threads = [x for x in self._threads if x.is_alive()]

    def _pump(
        self, peer: str, src: socket.socket, dst: socket.socket, attr: str
    ) -> None:
        """One direction of the cross-connect: peer->collector or
        collector->peer, raw bytes, no reframing (the far end walks
        its own message boundaries exactly as if directly peered)."""
        try:
            # the listener may close the socket under us at teardown —
            # settimeout on a closed fd raises OSError
            src.settimeout(0.2)
            while not self._stop.is_set():
                try:
                    chunk = src.recv(65535)
                except socket.timeout:
                    continue
                except OSError:
                    break
                if not chunk:
                    break
                try:
                    dst.sendall(chunk)
                except OSError:
                    break
                setattr(self, attr, getattr(self, attr) + len(chunk))
        except OSError:
            pass  # socket closed under us mid-teardown
        finally:
            # either side closing tears down the pair (the reference
            # closes both fds in bgp_peer_close)
            for s in (src, dst):
                try:
                    s.close()
                except OSError:
                    pass
            with self._lock:
                self._active.pop(peer, None)
