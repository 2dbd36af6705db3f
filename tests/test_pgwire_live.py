"""LIVE PostgreSQL-wire tests: the v3 protocol (startup, simple
queries with command tags, the COPY FROM STDIN sub-protocol, error
recovery) over REAL loopback TCP sockets, driving the reference's
exact libpq statement cycle — per-row UPDATE -> rowcount 0 -> INSERT
(src/sql_common.c:606,680-765), multi-row VALUES, and sql_use_copy
with sql_delimiter (src/pgsql_plugin.c) — against the embedded engine
behind a genuine wire server (see the honest-scope note in
sinks/pgwire.py).
"""

from __future__ import annotations

import pytest

from pmacct_spark.sinks.pgwire import MiniPgServer, PgWireClient


@pytest.fixture()
def server(tmp_path):
    srv = MiniPgServer(str(tmp_path / "wire.duckdb")).start()
    yield srv
    srv.stop()


def test_startup_and_select(server):
    cli = PgWireClient(server.host, server.port)
    try:
        tag, rows = cli.execute("SELECT 1 AS one, 'x' AS s, NULL AS n")
        assert tag == "SELECT 1"
        assert rows == [["1", "x", None]]
    finally:
        cli.close()


def test_update_then_insert_cycle_over_wire(server):
    """The reference's purge control flow verbatim: for each aggregate
    row, UPDATE ... SET bytes=bytes+N; if the command tag reports 0
    affected rows, INSERT — branching on the WIRE rowcount exactly as
    libpq does. Two purges; the final table carries summed counters."""
    cli = PgWireClient(server.host, server.port)
    try:
        cli.execute(
            "CREATE TABLE acct (peer VARCHAR, proto INTEGER, bytes BIGINT,"
            " packets BIGINT, stamp_updated VARCHAR)"
        )
        purge1 = [("10.0.0.1", 6, 1000, 10), ("10.0.0.2", 17, 200, 2)]
        purge2 = [("10.0.0.1", 6, 500, 5), ("10.0.0.3", 6, 50, 1)]
        for stamp, batch in (("t1", purge1), ("t2", purge2)):
            for peer, proto, byt, pkt in batch:
                tag, _ = cli.execute(
                    f"UPDATE acct SET bytes = bytes + {byt},"
                    f" packets = packets + {pkt}, stamp_updated = '{stamp}'"
                    f" WHERE peer = '{peer}' AND proto = {proto}"
                )
                if cli.rowcount(tag) == 0:  # the reference's branch
                    tag, _ = cli.execute(
                        "INSERT INTO acct VALUES "
                        f"('{peer}', {proto}, {byt}, {pkt}, '{stamp}')"
                    )
                    assert cli.rowcount(tag) == 1
        _tag, rows = cli.execute(
            "SELECT peer, proto, bytes, packets, stamp_updated FROM acct"
            " ORDER BY peer"
        )
        assert rows == [
            ["10.0.0.1", "6", "1500", "15", "t2"],
            ["10.0.0.2", "17", "200", "2", "t1"],
            ["10.0.0.3", "6", "50", "1", "t2"],
        ]
    finally:
        cli.close()


def test_multi_values_insert_over_wire(server):
    """sql_multi_values: one INSERT statement carrying a VALUES buffer
    of many rows; the command tag reports them all."""
    cli = PgWireClient(server.host, server.port)
    try:
        cli.execute("CREATE TABLE mv (k INTEGER, v BIGINT)")
        values = ", ".join(f"({i}, {i * 10})" for i in range(250))
        tag, _ = cli.execute(f"INSERT INTO mv VALUES {values}")
        assert cli.rowcount(tag) == 250
        _t, rows = cli.execute("SELECT COUNT(*), SUM(v) FROM mv")
        assert rows == [["250", str(sum(i * 10 for i in range(250)))]]
    finally:
        cli.close()


def test_copy_from_stdin_over_wire(server):
    """sql_use_copy + sql_delimiter: the CopyInResponse/CopyData/
    CopyDone sub-protocol bulk-loads delimited text; the COPY tag
    reports the row count."""
    cli = PgWireClient(server.host, server.port)
    try:
        cli.execute("CREATE TABLE cp (peer VARCHAR, bytes BIGINT)")
        data = "".join(f"10.0.0.{i % 7}|{i * 100}\n" for i in range(1000))
        tag = cli.copy_in(
            "COPY cp FROM STDIN (FORMAT csv, DELIMITER '|')", data.encode()
        )
        assert tag == "COPY 1000"
        _t, rows = cli.execute("SELECT COUNT(*), SUM(bytes) FROM cp")
        assert rows == [["1000", str(sum(i * 100 for i in range(1000)))]]
    finally:
        cli.close()


def test_error_keeps_session_usable(server):
    """An ErrorResponse drains to ReadyForQuery and the session keeps
    working — the recovery behavior libpq relies on."""
    cli = PgWireClient(server.host, server.port)
    try:
        with pytest.raises(RuntimeError):
            cli.execute("SELECT * FROM definitely_missing_table")
        tag, rows = cli.execute("SELECT 41 + 1 AS v")
        assert (tag, rows) == ("SELECT 1", [["42"]])
    finally:
        cli.close()
