"""Cross-cutting services: access control, transactions, metrics,
warnings, trace tokens.

Reference: ``io.trino.security.AccessControl`` (+ FileBasedAccessControl),
``transaction/InMemoryTransactionManager``, airlift ``@Managed`` JMX beans
+ ``plugin/trino-jmx``, ``spi/WarningCollector``,
``server/GenerateTraceTokenRequestFilter``.
"""

import json
import urllib.request

import pytest

from presto_tpu.client.api import connect
from presto_tpu.exec.runner import LocalRunner
from presto_tpu.utils.security import (AccessDeniedError,
                                       RuleBasedAccessControl)


@pytest.fixture(scope="module")
def conn():
    return connect(schema="tiny")


def test_access_control_denies_table():
    r = LocalRunner(scale_factor=0.01,
                    access_control=RuleBasedAccessControl(
                        denied_tables={"orders"}))
    with pytest.raises(AccessDeniedError):
        r.run_sql("select count(*) from orders")
    r.run_sql("select count(*) from region")  # others still pass


def test_access_control_denies_column():
    r = LocalRunner(scale_factor=0.01,
                    access_control=RuleBasedAccessControl(
                        denied_columns={"customer": {"c_acctbal"}}))
    with pytest.raises(AccessDeniedError):
        r.run_sql("select sum(c_acctbal) from customer")
    # a query not touching the denied column is fine (column-level mask)
    r.run_sql("select count(*) from customer")


def test_access_control_read_only_blocks_writes():
    r = LocalRunner(scale_factor=0.01,
                    access_control=RuleBasedAccessControl(read_only=True))
    with pytest.raises(AccessDeniedError):
        r.run_sql("create table t as select 1 x from region limit 1")


def test_transaction_commit_and_rollback(conn):
    conn.begin()
    conn.execute("create table txt1 as select 1 x from region limit 1")
    assert conn.execute("select count(*) c from txt1").fetchall() == [(1,)]
    conn.rollback()
    with pytest.raises(Exception):
        conn.execute("select count(*) from txt1")
    conn.begin()
    conn.execute("create table txt2 as select 2 x from region limit 1")
    conn.commit()
    assert conn.execute("select x from txt2").fetchall() == [(2,)]
    conn.execute("drop table txt2")


def test_cross_join_warning(conn):
    cur = conn.execute("select count(*) c from region, nation")
    assert any(w["warningCode"] == "CROSS_JOIN" for w in cur.warnings)
    cur2 = conn.execute(
        "select count(*) c from nation join region on n_regionkey = "
        "r_regionkey")
    assert not any(w["warningCode"] == "CROSS_JOIN"
                   for w in cur2.warnings)


def test_metrics_queryable(conn):
    m = dict(conn.execute("show metrics").fetchall())
    assert m.get("queries.planned", 0) > 0
    assert "uptime_s" in m


def test_trace_token_roundtrip(conn):
    from presto_tpu.client.server import StatementServer
    srv = StatementServer(conn)
    try:
        req = urllib.request.Request(
            f"{srv.url}/v1/statement",
            data=b"select count(*) c from region",
            headers={"X-Trace-Token": "tok-42"}, method="POST")
        out = json.loads(urllib.request.urlopen(req).read())
        assert out.get("traceToken") == "tok-42"
        # token persists through nextUri paging
        nxt = json.loads(urllib.request.urlopen(out["nextUri"]).read())
        assert nxt.get("traceToken") == "tok-42"
    finally:
        srv.close()


def test_blackhole_connector():
    """Null sink (reference: plugin/trino-blackhole): writes swallowed,
    reads empty, schema remembered."""
    from presto_tpu.connector import blackhole_connector
    r = LocalRunner(scale_factor=0.01)
    bh = blackhole_connector()
    r.datasource.register(bh)
    # write through the SPI sink
    t = r.run_sql("select r_regionkey k, r_name n from region")
    bh.page_sink.create_table("sink1", t)
    assert bh.metadata.rows_swallowed == 5
    assert "sink1" in bh.metadata.list_tables()
    # reads return zero rows through the engine
    out = r.run_sql("select count(*) c from sink1").to_pandas()
    assert out.c.iloc[0] == 0
