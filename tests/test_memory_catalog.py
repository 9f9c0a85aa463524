"""Writable memory catalog: CTAS / INSERT / DROP / re-query
(reference: plugin/trino-memory + TableWriter path)."""

import pytest

from presto_tpu.exec.runner import LocalRunner


@pytest.fixture()
def runner():
    return LocalRunner(scale_factor=0.01)


def test_ctas_and_query(runner):
    runner.run_sql(
        "create table big_nations as "
        "select n_name, n_regionkey from nation where n_regionkey >= 3")
    got = runner.run_sql(
        "select count(*) c, min(n_regionkey) mn from big_nations").to_pydict()
    assert got["c"][0] == 10 and got["mn"][0] == 3
    # joinable with generated tables
    j = runner.run_sql(
        "select r_name, count(*) c from big_nations, region "
        "where n_regionkey = r_regionkey group by r_name order by r_name"
    ).to_pandas()
    assert j.r_name.tolist() == ["EUROPE", "MIDDLE EAST"]
    assert j.c.tolist() == [5, 5]


def test_insert_and_drop(runner):
    runner.run_sql("create table t1 as select n_nationkey k from nation")
    runner.run_sql("insert into t1 select r_regionkey from region")
    got = runner.run_sql("select count(*) c from t1").to_pydict()
    assert got["c"][0] == 30
    runner.run_sql("drop table t1")
    with pytest.raises(KeyError):
        runner.run_sql("select * from t1")


def test_show_tables(runner):
    runner.run_sql("create table zzz as select 1 x from region limit 1")
    names = runner.run_sql("show tables").to_pydict()["table"]
    assert "lineitem" in names and "zzz" in names


def test_delete(runner):
    runner.run_sql("create table td as "
                   "select n_nationkey k, n_regionkey r from nation")
    got = runner.run_sql("delete from td where r = 1").to_pydict()
    assert got["rows"][0] == 5
    left = runner.run_sql("select count(*) c, min(r) mn from td").to_pydict()
    assert left["c"][0] == 20 and left["mn"][0] == 0
    got = runner.run_sql("delete from td").to_pydict()
    assert got["rows"][0] == 20
    assert runner.run_sql("select count(*) c from td").to_pydict()["c"][0] == 0
    runner.run_sql("drop table td")


def test_update(runner):
    runner.run_sql("create table tu as "
                   "select n_nationkey k, n_regionkey r from nation")
    got = runner.run_sql(
        "update tu set r = r + 100, k = k * 2 where r >= 3").to_pydict()
    assert got["rows"][0] == 10
    chk = runner.run_sql(
        "select count(*) c from tu where r >= 103").to_pydict()
    assert chk["c"][0] == 10
    chk = runner.run_sql("select max(k) m from tu").to_pydict()
    assert chk["m"][0] == 46  # nationkey 23 (r=3) doubled
    got = runner.run_sql("update tu set k = 0").to_pydict()
    assert got["rows"][0] == 25
    assert runner.run_sql("select max(k) m from tu").to_pydict()["m"][0] == 0
    runner.run_sql("drop table tu")


def test_dml_readonly_tables_rejected(runner):
    with pytest.raises(ValueError):
        runner.run_sql("delete from nation where n_nationkey = 0")
    with pytest.raises(ValueError):
        runner.run_sql("update nation set n_nationkey = 1")
