"""Round-2 regression tests for round-1 verdict findings.

1. Distributed group-by overflow must retry, never silently drop groups
   (reference behavior: ``operator/MultiChannelGroupByHash.java:364`` rehash).
2. LEFT JOIN with a residual (non-equi, two-sided) filter must null-extend
   probe rows whose matches all fail the filter
   (``operator/join/DefaultPageJoiner.java:296`` outerJoinCurrentPosition).
3. Window functions combined with GROUP BY must raise (not silently compute
   windows over pre-aggregation rows).
"""

import sqlite3

import numpy as np
import pandas as pd
import pytest

from presto_tpu.exec.runner import LocalRunner
from presto_tpu.parallel import distributed as D

import tpch_oracle as O

SF = 0.01


@pytest.fixture(scope="module")
def local():
    return LocalRunner(scale_factor=SF)


def _norm(df: pd.DataFrame):
    return sorted(repr(tuple(t)) for t in df.itertuples(index=False))


def test_distributed_agg_overflow_retries(local):
    """agg_cap_limit far below the group count: round-1 code silently
    dropped unsettled rows; now the overflow flag reaches the host retry."""
    mesh = D.make_mesh(8)
    dist = D.DistributedRunner(mesh, SF, agg_cap_limit=64)
    sql = ("select o_custkey, count(*) cnt, sum(o_totalprice) s "
           "from orders group by o_custkey")
    exp = local.run_sql(sql).to_pandas()
    assert len(exp) > 64 * 8, "test needs ndv above total capped capacity"
    got = dist.run_sql(sql).to_pandas()
    assert _norm(got) == _norm(exp)


def test_distributed_distinct_agg_overflow_retries(local):
    """The FIXED_HASH (distinct) route goes through repartition +
    _replicated_local_agg; its capacity is also clamped — must retry too."""
    mesh = D.make_mesh(8)
    dist = D.DistributedRunner(mesh, SF, agg_cap_limit=64)
    sql = ("select o_custkey, count(distinct o_orderpriority) c "
           "from orders group by o_custkey")
    exp = local.run_sql(sql).to_pandas()
    got = dist.run_sql(sql).to_pandas()
    assert _norm(got) == _norm(exp)


@pytest.fixture(scope="module")
def sqlite_db():
    conn = sqlite3.connect(":memory:")
    for t in ["customer", "orders"]:
        df = O.load(t, SF)
        cols = ", ".join(f'"{c}"' for c in df.columns)
        ph = ", ".join("?" * len(df.columns))
        conn.execute(f"CREATE TABLE {t} ({cols})")
        conn.executemany(
            f"INSERT INTO {t} VALUES ({ph})",
            [tuple(int(v) if isinstance(v, (int, np.integer)) else v
                   for v in row) for row in df.itertuples(index=False)])
    conn.commit()
    return conn


def test_left_join_residual_filter_null_extends(local, sqlite_db):
    """Probe rows whose matches ALL fail the two-sided residual filter must
    appear null-extended (round 1 dropped them)."""
    sql = ("select c_custkey, o_orderkey from customer "
           "left join orders on c_custkey = o_custkey "
           "and o_totalprice < c_acctbal")
    got = local.run_sql(sql).to_pandas()
    exp_rows = sqlite_db.execute(sql).fetchall()
    got_rows = sorted(
        repr((int(a), None if pd.isna(b) else int(b)))
        for a, b in got.itertuples(index=False))
    exp_norm = sorted(
        repr((int(a), None if b is None else int(b))) for a, b in exp_rows)
    assert got_rows == exp_norm
    # the fix specifically adds rows with matches that all fail the filter:
    # verify some null-extended row HAS orders (i.e. was not just unmatched)
    with_orders = {r[0] for r in sqlite_db.execute(
        "select distinct o_custkey from orders")}
    null_ext = {int(a) for a, b in got.itertuples(index=False)
                if pd.isna(b)}
    assert null_ext & with_orders, "test must exercise filtered-out matches"


def test_left_join_residual_filter_agg(local, sqlite_db):
    """Same semantics through an aggregation (counts ignore the null rows)."""
    sql = ("select c_custkey, count(o_orderkey) c from customer "
           "left join orders on c_custkey = o_custkey "
           "and o_totalprice < c_acctbal "
           "group by c_custkey")
    got = local.run_sql(sql).to_pandas()
    exp_rows = sqlite_db.execute(sql).fetchall()
    assert _norm(got) == sorted(
        repr((int(a), int(b))) for a, b in exp_rows)


def test_window_with_group_by_works(local):
    # round-3 refused this shape; round-4 plans windows AFTER aggregation
    # (reference: QueryPlanner window-over-agg layering)
    t = local.run_sql(
        "select o_custkey, count(*) c, "
        "rank() over (order by count(*) desc) r "
        "from orders group by o_custkey order by r limit 5").to_pandas()
    assert t.r.tolist()[0] == 1
    assert list(t.c) == sorted(t.c, reverse=True)
