"""Client query surface — the pmacct client's interactive semantics
(reference src/pmacct.c usage :89-121, server-side src/server.c:64-480)
served over a maintained aggregate DataFrame."""

from pmacct_spark.client.imt import ImtTable, compile_match

__all__ = ["ImtTable", "compile_match"]
