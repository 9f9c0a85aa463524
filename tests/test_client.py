"""Client API tests (DB-API cursor surface + query lifecycle;
reference: ``client/trino-client`` StatementClient behavior)."""

import pytest

from presto_tpu.client.api import connect, QueryState


@pytest.fixture(scope="module")
def conn():
    return connect(schema="tiny")


def test_cursor_roundtrip(conn):
    cur = conn.execute(
        "select n_name, n_regionkey from nation order by n_nationkey limit 3")
    assert [d[0] for d in cur.description] == ["n_name", "n_regionkey"]
    rows = cur.fetchall()
    assert rows[0] == ("ALGERIA", 0)
    assert len(rows) == 3
    assert cur.rowcount == 3


def test_fetch_modes(conn):
    cur = conn.execute("select n_nationkey from nation order by 1")
    assert cur.fetchone() == (0,)
    assert cur.fetchmany(2) == [(1,), (2,)]
    rest = cur.fetchall()
    assert len(rest) == 22


def test_params_and_history(conn):
    cur = conn.cursor()
    cur.execute("select n_name from nation where n_name = ?", ["FRANCE"])
    assert cur.fetchall() == [("FRANCE",)]
    infos = conn.queries()
    assert infos[-1].state is QueryState.FINISHED
    assert infos[-1].rows == 1


def test_failed_query_state(conn):
    cur = conn.cursor()
    with pytest.raises(Exception):
        cur.execute("select nonexistent_col from nation")
    assert cur.last_query.state is QueryState.FAILED
    assert "nonexistent_col" in (cur.last_query.error or "")
