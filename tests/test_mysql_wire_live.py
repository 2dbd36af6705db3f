"""LIVE MySQL-wire tests: protocol v10 (handshake, COM_QUERY, OK
packets with length-encoded affected_rows, 4.1 text result sets, ERR
recovery) over REAL loopback TCP sockets, driving the reference's
libmysqlclient conversations — mysql_real_query +
mysql_affected_rows branching for the UPDATE-then-INSERT purge cycle
(src/sql_common.c:606,680-765; src/mysql_plugin.c) and
sql_multi_values VALUES buffers (CONFIG-KEYS:1519-1531). See the
honest-scope note in sinks/mysql_wire.py.
"""

from __future__ import annotations

import pytest

from pmacct_spark.sinks.mysql_wire import MiniMySqlServer, MySqlWireClient


@pytest.fixture()
def server(tmp_path):
    srv = MiniMySqlServer(str(tmp_path / "wire_my.duckdb")).start()
    yield srv
    srv.stop()


def test_handshake_and_select(server):
    cli = MySqlWireClient(server.host, server.port)
    try:
        affected, rows = cli.query("SELECT 1 AS one, 'x' AS s, NULL AS n")
        assert affected == 0
        assert rows == [["1", "x", None]]
    finally:
        cli.close()


def test_update_then_insert_cycle_over_wire(server):
    """mysql_affected_rows drives the branch: UPDATE first; when the
    OK packet reports 0 affected rows, INSERT — two purges, counters
    summed in the final table."""
    cli = MySqlWireClient(server.host, server.port)
    try:
        cli.query(
            "CREATE TABLE acct (peer VARCHAR, proto INTEGER,"
            " bytes BIGINT, packets BIGINT, stamp_updated VARCHAR)"
        )
        purges = [
            ("t1", [("10.0.0.1", 6, 1000, 10), ("10.0.0.2", 17, 200, 2)]),
            ("t2", [("10.0.0.1", 6, 500, 5), ("10.0.0.3", 6, 50, 1)]),
        ]
        for stamp, batch in purges:
            for peer, proto, byt, pkt in batch:
                affected, _ = cli.query(
                    f"UPDATE acct SET bytes = bytes + {byt},"
                    f" packets = packets + {pkt}, stamp_updated = '{stamp}'"
                    f" WHERE peer = '{peer}' AND proto = {proto}"
                )
                if affected == 0:  # the reference's branch
                    affected, _ = cli.query(
                        "INSERT INTO acct VALUES "
                        f"('{peer}', {proto}, {byt}, {pkt}, '{stamp}')"
                    )
                    assert affected == 1
        _a, rows = cli.query(
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
    """sql_multi_values: one INSERT statement, many rows, the OK
    packet's affected_rows reports them all."""
    cli = MySqlWireClient(server.host, server.port)
    try:
        cli.query("CREATE TABLE mv (k INTEGER, v BIGINT)")
        values = ", ".join(f"({i}, {i * 10})" for i in range(300))
        affected, _ = cli.query(f"INSERT INTO mv VALUES {values}")
        assert affected == 300
        _a, rows = cli.query("SELECT COUNT(*), SUM(v) FROM mv")
        assert rows == [["300", str(sum(i * 10 for i in range(300)))]]
    finally:
        cli.close()


def test_error_keeps_session_usable(server):
    cli = MySqlWireClient(server.host, server.port)
    try:
        with pytest.raises(RuntimeError):
            cli.query("SELECT * FROM missing_table_for_sure")
        affected, rows = cli.query("SELECT 41 + 1 AS v")
        assert (affected, rows) == (0, [["42"]])
    finally:
        cli.close()


def test_sql_num_hosts_inet6_aton_over_wire(server):
    """sql_num_hosts statement shape over the live wire: the
    reference wraps every host value in INET6_ATON() server-side
    (count_src_host_aton_handler src/sql_handlers.c:1241;
    CONFIG-KEYS:1911 'assumes the INET_ATON() and INET6_ATON()
    function are defined in the RDBMS' — the wire server defines
    them, like MySQL does natively). Numeric ip columns upsert:
    UPDATE keys on the binary form, INSERT stores it."""
    import socket as _s

    cli = MySqlWireClient(server.host, server.port)
    try:
        cli.query(
            "CREATE TABLE acct_n (ip_src BLOB, bytes BIGINT)"
        )
        for ip, byt in (
            ("10.0.0.1", 1000), ("2001:db8::1", 700),
            ("10.0.0.1", 500),  # same key again -> UPDATE branch
        ):
            affected, _ = cli.query(
                f"UPDATE acct_n SET bytes = bytes + {byt}"
                f" WHERE ip_src = INET6_ATON('{ip}')"
            )
            if affected == 0:
                affected, _ = cli.query(
                    "INSERT INTO acct_n VALUES "
                    f"(INET6_ATON('{ip}'), {byt})"
                )
                assert affected == 1
        # INET_ATON is defined too (the classic v4-only u32 form)
        _a, aton = cli.query("SELECT INET_ATON('10.0.0.1')")
        assert aton == [[str(0x0A000001)]]
        _a, rows = cli.query(
            "SELECT hex(ip_src), bytes FROM acct_n ORDER BY bytes DESC"
        )
        assert rows == [
            [_s.inet_aton("10.0.0.1").hex().upper(), "1500"],
            [_s.inet_pton(_s.AF_INET6, "2001:db8::1").hex().upper(),
             "700"],
        ]
    finally:
        cli.close()
