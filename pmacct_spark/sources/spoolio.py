"""Shared spool-file writer: the atomic write-then-rename protocol
every socket source relies on.

Spark's file listing (batch read AND FileStreamSource tailing) must
never see a half-written parquet file; all three spools (UDP datagram,
TCP session, RTR PDU) therefore write to a dot-prefixed temp name and
rename into place — rename is atomic on POSIX and dotted names are
ignored by Spark's listing. One helper keeps the contract in one
place instead of three drifting copies.
"""

from __future__ import annotations

import os


def write_spool_file(spool_dir: str, name: str, table) -> str:
    """Write a pyarrow ``table`` as ``<spool_dir>/<name>`` atomically;
    returns the final path."""
    import pyarrow.parquet as pq

    tmp = os.path.join(spool_dir, f"._{name}.tmp")
    final = os.path.join(spool_dir, name)
    pq.write_table(table, tmp)
    os.rename(tmp, final)
    return final
