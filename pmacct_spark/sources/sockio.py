"""Shared socket primitives for the live wire-protocol modules
(kafka_wire / amqp_wire / zmtp / pgwire / mysql_wire): one EOF
convention instead of five hand-rolled recv loops."""

from __future__ import annotations

import socket


def recv_exact(sock: socket.socket, n: int) -> bytes:
    """Read exactly ``n`` bytes or raise ConnectionError on EOF."""
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed")
        buf += chunk
    return buf
