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
