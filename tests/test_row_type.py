"""ROW column type: shredded struct-of-arrays design.

The reference stores ROW columns as child blocks behind one object
header (``spi/block/RowBlock.java``); the TPU design SHREDS a row-typed
column into independent per-field device columns (``r.x``, ``r.y``) at
plan time — structs never exist on device — and re-assembles dicts only
at the client edge.  Field access, subscripts, row comparison, and CTAS
round-trips all decompose at plan time (``RowComparisonOperators``,
``RowToRowCast`` analogues in ``sql/planner/planner.py``).
"""

import pytest

from presto_tpu.exec.runner import LocalRunner


@pytest.fixture(scope="module")
def runner():
    return LocalRunner(scale_factor=0.01)


def _one(runner, expr):
    df = runner.run_sql(f"select {expr} as v from region limit 1").to_pandas()
    return df.iloc[0]["v"]


def test_anonymous_row_renders_dict(runner):
    v = _one(runner, "row(1, 'a')")
    assert v == {"f0": 1, "f1": "a"}


def test_cast_names_fields(runner):
    v = _one(runner, "cast(row(1, 'a') as row(x bigint, y varchar))")
    assert v == {"x": 1, "y": "a"}


def test_field_dereference(runner):
    df = runner.run_sql(
        "select q.r.x + 1 as a from (select cast(row(41, 'z') as "
        "row(x bigint, y varchar)) as r from region limit 1) q").to_pandas()
    assert int(df.iloc[0]["a"]) == 42


def test_subscript_ordinal(runner):
    df = runner.run_sql(
        "select r[1] as a, r[2] as b from (select cast(row(7, 'q') as "
        "row(x bigint, y varchar)) as r from region limit 1) q").to_pandas()
    assert int(df.iloc[0]["a"]) == 7
    assert df.iloc[0]["b"] == "q"


def test_row_comparison_on_columns(runner):
    df = runner.run_sql(
        "select count(*) c from (select cast(row(r_regionkey, r_regionkey+1)"
        " as row(a bigint, b bigint)) as r from region) q "
        "where q.r = row(2, 3)").to_pandas()
    assert int(df.iloc[0]["c"]) == 1


def test_ctas_roundtrip_shredded(runner):
    runner.run_sql("drop table if exists rowt")
    runner.run_sql(
        "create table rowt as select r_regionkey as k, "
        "cast(row(r_regionkey * 10, r_name) as row(v bigint, nm varchar)) "
        "as payload from region")
    try:
        # field access on the stored (shredded) row column
        df = runner.run_sql(
            "select payload.v as v from rowt where k = 3").to_pandas()
        assert int(df.iloc[0]["v"]) == 30
        # whole-row select re-assembles
        df = runner.run_sql(
            "select payload from rowt where k = 1").to_pandas()
        v = df.iloc[0]["payload"]
        assert v["v"] == 10 and isinstance(v["nm"], str)
        # row columns survive WHERE on sibling fields + ORDER BY scalars
        df = runner.run_sql(
            "select k, payload from rowt where payload.v >= 20 "
            "order by k").to_pandas()
        assert list(df["k"]) == [2, 3, 4]
    finally:
        runner.run_sql("drop table rowt")


def test_row_in_select_star(runner):
    runner.run_sql("drop table if exists rowt2")
    runner.run_sql(
        "create table rowt2 as select cast(row(1, 2) as "
        "row(a bigint, b bigint)) as r from region limit 1")
    try:
        df = runner.run_sql("select * from rowt2").to_pandas()
        assert df.iloc[0]["r"] == {"a": 1, "b": 2}
    finally:
        runner.run_sql("drop table rowt2")
