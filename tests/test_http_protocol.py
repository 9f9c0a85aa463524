"""REST statement protocol tests (reference: client protocol
``POST /v1/statement`` + nextUri paging, ``StatementClientV1.advance()``)."""

import json
import urllib.request

import pytest

from presto_tpu.client.api import connect
from presto_tpu.client.server import HttpClient, StatementServer, PAGE_ROWS

SF = 0.01


@pytest.fixture(scope="module")
def server():
    srv = StatementServer(connect(scale_factor=SF))
    yield srv
    srv.close()


@pytest.fixture(scope="module")
def client(server):
    return HttpClient(server.url)


def test_simple_query(client):
    cols, rows = client.execute(
        "select n_name, n_nationkey from nation order by n_nationkey limit 3")
    assert [c["name"] for c in cols] == ["n_name", "n_nationkey"]
    assert rows[0][0] == "ALGERIA" and [r[1] for r in rows] == [0, 1, 2]


def test_paging(client):
    n = PAGE_ROWS * 2 + 500
    cols, rows = client.execute(
        f"select o_orderkey from orders limit {n}")
    assert len(rows) == n  # crossed 3 page fetches


def test_logical_value_rendering(client):
    cols, rows = client.execute(
        "select o_orderdate, o_totalprice from orders "
        "order by o_orderkey limit 1")
    assert cols[0]["type"] == "date"
    assert rows[0][0].count("-") == 2          # ISO date string
    assert "." in rows[0][1]                   # pointed decimal string


def test_error_propagation(client):
    with pytest.raises(RuntimeError):
        client.execute("select * from no_such_table")


def test_query_list_and_info(server, client):
    client.execute("select 1 x from region limit 1")
    with urllib.request.urlopen(f"{server.url}/v1/query") as r:
        queries = json.loads(r.read())
    assert any(q["state"] == "FINISHED" for q in queries)
    assert any(q["state"] == "FAILED" for q in queries)  # from error test
    with urllib.request.urlopen(f"{server.url}/v1/info") as r:
        info = json.loads(r.read())
    assert info["coordinator"] is True


def test_dml_over_http(client):
    client.execute("create table http_t as "
                   "select n_nationkey k, n_regionkey r from nation")
    _, rows = client.execute("delete from http_t where r = 0")
    assert rows[0][0] == 5
    _, rows = client.execute("update http_t set k = k + 1000 where r = 1")
    assert rows[0][0] == 5
    _, rows = client.execute("select count(*) c from http_t where k >= 1000")
    assert rows[0][0] == 5
    client.execute("drop table http_t")


def test_error_code_taxonomy(server):
    """Structured error triple (reference: spi/StandardErrorCode.java)."""
    import urllib.request
    req = urllib.request.Request(
        f"{server.url}/v1/statement",
        data=b"select * from no_such_table_xyz", method="POST")
    with urllib.request.urlopen(req) as r:
        body = json.loads(r.read())
    err = body["error"]
    assert err["errorType"] == "USER_ERROR"
    assert err["errorName"] in ("TABLE_NOT_FOUND", "GENERIC_USER_ERROR")
    assert isinstance(err["errorCode"], int)


def test_stats_and_progress(server):
    import urllib.request
    req = urllib.request.Request(
        f"{server.url}/v1/statement",
        data=b"select count(*) c from nation", method="POST")
    with urllib.request.urlopen(req) as r:
        body = json.loads(r.read())
    st = body["stats"]
    assert st["state"] == "FINISHED"
    assert st["scheduled"] is True
    assert st["progressPercentage"] == 100.0
    assert "peakMemoryBytes" in st and "elapsedTimeMillis" in st


def test_session_header_applied(server):
    import urllib.request
    req = urllib.request.Request(
        f"{server.url}/v1/statement",
        data=b"select r_regionkey from region limit 1",
        headers={"X-Trino-Session": "query_max_rows=9"}, method="POST")
    with urllib.request.urlopen(req) as r:
        body = json.loads(r.read())
    assert body["stats"]["state"] in ("FINISHED", "FAILED")


def test_resource_groups_over_http():
    from presto_tpu.client.api import connect
    from presto_tpu.client.server import StatementServer, HttpClient
    from presto_tpu.parallel.resource_groups import (ResourceGroup,
                                                     ResourceGroupManager)
    import urllib.request
    mgr = ResourceGroupManager(
        [ResourceGroup("g", hard_concurrency_limit=2, max_queued=4)],
        [("*", "g")])
    srv = StatementServer(connect(schema="tiny"), resource_groups=mgr)
    try:
        cli = HttpClient(srv.url)
        _, rows = cli.execute("select count(*) c from region")
        assert rows[0][0] == 5
        with urllib.request.urlopen(f"{srv.url}/v1/resourceGroup") as r:
            info = json.loads(r.read())
        assert info[0]["name"] == "g" and info[0]["admitted"] == 1
    finally:
        srv.close()


def test_web_ui(server):
    """/ui renders the query overview page (core/trino-web-ui role)."""
    import urllib.request
    from presto_tpu.client.server import HttpClient
    HttpClient(server.url).execute("select count(*) c from region")
    with urllib.request.urlopen(server.url + "/ui") as resp:
        body = resp.read().decode()
    assert "presto_tpu coordinator" in body
    assert "FINISHED" in body and "count(*)" in body


def test_shared_secret_auth():
    """Internal-communication auth: requests without the bearer secret
    are rejected 401; the authed client works (reference:
    ``server/security/InternalAuthenticationManager``)."""
    import urllib.error
    srv = StatementServer(connect(scale_factor=SF), shared_secret="s3cr3t")
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            HttpClient(srv.url).execute("select 1 as x from region limit 1")
        assert ei.value.code == 401
        cols, rows = HttpClient(srv.url, token="s3cr3t").execute(
            "select 1 as x from region limit 1")
        assert rows == [[1]]
    finally:
        srv.close()


def test_gzip_compression_flag():
    """Client-edge response compression flag (the reference's
    exchange-compression analogue: ``FeaturesConfig
    .isExchangeCompressionEnabled``; ICI traffic stays raw by design)."""
    srv = StatementServer(connect(scale_factor=SF), compress=True)
    try:
        cols, rows = HttpClient(srv.url, accept_gzip=True).execute(
            "select o_orderkey from orders order by o_orderkey limit 2000")
        assert len(rows) == 2000 and rows[0] == [1]
        # negotiation: a client NOT accepting gzip still gets plain JSON
        cols, rows = HttpClient(srv.url).execute(
            "select count(*) c from nation")
        assert rows == [[25]]
    finally:
        srv.close()
