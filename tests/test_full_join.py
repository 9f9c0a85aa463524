"""FULL OUTER JOIN + round-5 planner features.

Reference: ``operator/join/LookupJoinOperatorFactory.java:52`` (join
type FULL_OUTER — unvisited build positions emitted after the probe),
``sql/analyzer/StatementAnalyzer`` (ordinal resolution), QueryPlanner
EXISTS-under-OR semi-join marks."""

import pytest

from presto_tpu.exec.runner import LocalRunner


@pytest.fixture(scope="module")
def runner():
    r = LocalRunner(scale_factor=0.01)
    r.run_sql("create table fj_a as select o_orderkey k, o_totalprice v "
              "from orders where o_orderkey <= 7")
    r.run_sql("create table fj_b as select o_orderkey k2, o_custkey c "
              "from orders where o_orderkey in (6, 7, 32, 33, 34)")
    return r


@pytest.mark.parametrize("fused", [False, None])
def test_full_join_extends_both_sides(runner, fused):
    t = runner.run_sql(
        "select k, k2, v, c from fj_a full join fj_b on k = k2 "
        "order by k, k2", fused=fused)
    df = t.to_pandas()
    assert len(df) == 10
    # 7 probe rows (5 unmatched + 2 matched) + 3 unmatched build rows
    assert df["k"].notna().sum() == 7
    assert df["k2"].notna().sum() == 5
    matched = df[df["k"].notna() & df["k2"].notna()]
    assert sorted(matched["k"]) == [6, 7]
    # null-extended sides carry NULL payloads
    assert df[df["k"].isna()]["v"].isna().all()
    assert df[df["k2"].isna()]["c"].isna().all()


def test_full_join_null_keys_never_match(runner):
    runner.run_sql("create table fj_n as select if(k < 3, null, k) k3, v "
                   "from fj_a")
    t = runner.run_sql(
        "select count(*) c1, count(k) ck, count(k3) ck3 "
        "from fj_n full join fj_a on k3 = k", fused=False)
    row = t.to_pandas().iloc[0]
    # 5 matches + 2 NULL-key fj_n rows + 2 unmatched fj_a rows
    assert (row.c1, row.ck, row.ck3) == (9, 7, 5)


def test_full_join_aggregate_fused(runner):
    got = runner.run_sql(
        "select sum(case when k is not null and k2 is null then 1 else 0 "
        "end) a, sum(case when k is null then 1 else 0 end) b, "
        "sum(case when k is not null and k2 is not null then 1 else 0 "
        "end) ab from fj_a full join fj_b on k = k2")
    assert got.to_pandas().iloc[0].tolist() == [5, 3, 2]


def test_simple_case_desugars(runner):
    t = runner.run_sql(
        "select case o_orderstatus when 'F' then 'done' else 'open' end "
        "s, count(*) c from orders group by 1 order by 2 desc")
    df = t.to_pandas()
    assert set(df["s"]) == {"done", "open"}
    assert df["c"].sum() == 15000


def test_group_order_ordinals(runner):
    a = runner.run_sql("select o_orderstatus s, count(*) c from orders "
                       "group by 1 order by 2 desc, 1").to_pandas()
    b = runner.run_sql("select o_orderstatus s, count(*) c from orders "
                       "group by o_orderstatus "
                       "order by c desc, s").to_pandas()
    assert a.equals(b)


def test_correlated_exists_under_or(runner):
    # mark-join path: correlated EXISTS arms composed with OR
    t = runner.run_sql("""
        select count(*) c from customer
        where (exists (select * from orders
                       where o_custkey = c_custkey and o_totalprice > 500000)
               or exists (select * from orders
                          where o_custkey = c_custkey
                            and o_orderpriority = '1-URGENT'))""",
                       fused=False)
    # oracle: the same predicate via IN-lists
    e = runner.run_sql("""
        select count(*) c from customer
        where c_custkey in (select o_custkey from orders
                            where o_totalprice > 500000)
           or c_custkey in (select o_custkey from orders
                            where o_orderpriority = '1-URGENT')""",
                       fused=False)
    assert t.to_pandas().iloc[0, 0] == e.to_pandas().iloc[0, 0] > 0
