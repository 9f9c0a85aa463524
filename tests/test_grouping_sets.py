"""GROUPING SETS via the native GroupId node + grouping() + mark joins +
window-over-aggregate + fused-path EXPLAIN ANALYZE fragments.

Reference: ``operator/GroupIdOperator.java`` (row expansion),
``io.trino.operator.scalar.GroupingOperationFunction`` (grouping()),
SemiJoinNode mark output, ``sql/planner/QueryPlanner`` window-over-agg
layering, ``operator/OperatorStats.java`` stats tree.
"""

import numpy as np
import pytest

from presto_tpu.exec.runner import LocalRunner
from presto_tpu.parallel import distributed as D

import tpch_oracle as O

SF = 0.01


@pytest.fixture(scope="module")
def runner():
    return LocalRunner(scale_factor=SF)


def test_groupid_single_scan(runner):
    """The plan must contain ONE lineitem scan feeding a GroupId node
    (round 3 planned one scan per grouping set)."""
    plan = runner.plan_sql(
        "select l_returnflag, l_linestatus, sum(l_quantity) q "
        "from lineitem group by rollup(l_returnflag, l_linestatus)")
    from presto_tpu.exec import physical as P

    scans, groupids = [], []

    def walk(p):
        if isinstance(p, P.PhysScan):
            scans.append(p)
        if isinstance(p, P.PhysGroupId):
            groupids.append(p)
        for c in p.children():
            walk(c)

    walk(plan)
    assert len(scans) == 1
    assert len(groupids) == 1
    assert len(groupids[0].sets) == 3     # (f,s), (f), ()


def test_rollup_values(runner):
    li = O.load("lineitem", SF)
    t = runner.run_sql(
        "select l_returnflag f, l_linestatus s, sum(l_quantity) q, "
        "grouping(l_returnflag, l_linestatus) g "
        "from lineitem group by rollup(l_returnflag, l_linestatus) "
        "order by g, f, s").to_pandas()
    assert t[t.g == 3].q.tolist() == [li.l_quantity.sum()]
    byf = li.groupby("l_returnflag").l_quantity.sum()
    sub = t[t.g == 1]
    assert sub.q.tolist() == [byf[f] for f in sub.f]
    both = li.groupby(["l_returnflag", "l_linestatus"]).l_quantity.sum()
    sub0 = t[t.g == 0]
    assert sub0.q.tolist() == [both[(f, s)] for f, s in zip(sub0.f, sub0.s)]


def test_cube_distributed(runner):
    sql = ("select o_orderstatus s, o_orderpriority p, count(*) c "
           "from orders group by cube(o_orderstatus, o_orderpriority)")
    exp = runner.run_sql(sql, fused=False).to_pandas()
    mesh = D.make_mesh(8)
    dist = D.DistributedRunner(mesh, SF)
    got = dist.run_sql(sql).to_pandas()

    def norm(df):
        return sorted(repr((None if isinstance(a, float) and np.isnan(a)
                            else a,
                            None if isinstance(b, float) and np.isnan(b)
                            else b, int(c)))
                      for a, b, c in df.itertuples(index=False))

    assert norm(got) == norm(exp)
    o = O.load("orders", SF)
    assert len(exp) == (o.o_orderstatus.nunique() *
                        o.o_orderpriority.nunique()
                        + o.o_orderstatus.nunique()
                        + o.o_orderpriority.nunique() + 1)


def test_group_by_nullable_key_merges_nulls(runner):
    """SQL GROUP BY treats NULLs as one group (exercises the validity-
    aware _group_key_arrays normalization)."""
    runner.run_sql("drop table if exists gnull")
    runner.run_sql(
        "create table gnull as select "
        "case when mod(o_orderkey, 3) = 0 then null else o_orderstatus end k, "
        "o_totalprice v from orders")
    t = runner.run_sql(
        "select k, count(*) c from gnull group by k").to_pandas()
    o = O.load("orders", SF)
    k = o.o_orderstatus.where(o.o_orderkey % 3 != 0, None)
    exp_null = int(k.isna().sum())
    got_null = int(t[t.k.isna()].c.iloc[0])
    assert got_null == exp_null
    assert len(t) == k.nunique(dropna=True) + 1
    runner.run_sql("drop table gnull")


def test_in_subquery_under_or(runner):
    """Uncorrelated IN inside an OR plans as a MARK semi-join."""
    t = runner.run_sql(
        "select count(*) c from customer "
        "where c_nationkey = 0 or c_custkey in "
        "(select o_custkey from orders where o_totalprice > 400000)"
    ).to_pandas()
    o = O.load("orders", SF)
    c = O.load("customer", SF)
    big = set(o[o.o_totalprice > 40000000].o_custkey)
    exp = int(((c.c_nationkey == 0) | c.c_custkey.isin(big)).sum())
    assert t.c.iloc[0] == exp


def test_not_exists_under_or(runner):
    t = runner.run_sql(
        "select count(*) c from region "
        "where r_regionkey = 4 or not exists "
        "(select 1 from nation where n_regionkey = 99)").to_pandas()
    assert t.c.iloc[0] == 5   # the EXISTS arm is false → NOT → all rows


def test_window_over_agg_partitioned(runner):
    o = O.load("orders", SF)
    t = runner.run_sql(
        "select o_orderstatus st, o_orderpriority p, count(*) c, "
        "sum(count(*)) over (partition by o_orderstatus) tot "
        "from orders group by o_orderstatus, o_orderpriority "
        "order by st, p").to_pandas()
    tots = o.groupby("o_orderstatus").size()
    assert t.tot.tolist() == [int(tots[s]) for s in t.st]


def test_explain_analyze_fused_fragments(runner):
    from presto_tpu.tpch.queries import QUERIES
    out = runner.run_sql("explain analyze " + QUERIES[3]).to_pydict()
    text = "\n".join(out["Query Plan"])
    assert text.count("fragment:") >= 3, text
