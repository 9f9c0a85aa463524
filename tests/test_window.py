"""Window-function correctness vs pandas (reference: window suites in
``AbstractTestWindowQueries`` / ``operator/window/`` tests)."""

import numpy as np
import pandas as pd
import pytest

from presto_tpu.exec.runner import LocalRunner

import tpch_oracle as O

SF = 0.01


@pytest.fixture(scope="module")
def runner():
    return LocalRunner(scale_factor=SF)


def odf():
    return O.load("orders", SF)


def test_row_number_rank(runner):
    sql = """
    select o_custkey, o_orderdate, o_totalprice,
      row_number() over (partition by o_custkey order by o_orderdate, o_orderkey) as rn,
      rank() over (partition by o_custkey order by o_orderdate) as rk,
      dense_rank() over (partition by o_custkey order by o_orderdate) as drk
    from orders where o_custkey <= 50
    """
    got = runner.run_sql(sql).to_pandas()
    o = odf()
    d = o[o.o_custkey <= 50].copy()
    d["rn"] = d.sort_values(["o_orderdate", "o_orderkey"]) \
        .groupby("o_custkey").cumcount() + 1
    d["rk"] = d.groupby("o_custkey").o_orderdate.rank("min").astype(np.int64)
    d["drk"] = d.groupby("o_custkey").o_orderdate.rank("dense").astype(np.int64)
    key = ["o_custkey", "o_orderdate", "o_totalprice"]
    g = got.sort_values(key + ["rn"]).reset_index(drop=True)
    e = d[key + ["rn", "rk", "drk"]].sort_values(key + ["rn"]) \
        .reset_index(drop=True)
    for c in ["rn", "rk", "drk"]:
        assert g[c].tolist() == e[c].tolist(), c


def test_partition_total_and_running_sum(runner):
    sql = """
    select o_orderkey, o_custkey, o_totalprice,
      sum(o_totalprice) over (partition by o_custkey) as cust_total,
      count(*) over (partition by o_custkey) as cust_orders,
      sum(o_totalprice) over (partition by o_custkey order by o_orderkey) as run
    from orders where o_custkey <= 20
    """
    got = runner.run_sql(sql).to_pandas().sort_values("o_orderkey") \
        .reset_index(drop=True)
    o = odf()
    d = o[o.o_custkey <= 20].sort_values("o_orderkey").copy()
    d["cust_total"] = d.groupby("o_custkey").o_totalprice.transform("sum")
    d["cust_orders"] = d.groupby("o_custkey").o_totalprice.transform("size")
    d["run"] = d.groupby("o_custkey").o_totalprice.cumsum()
    d = d.reset_index(drop=True)
    assert got.cust_total.astype(np.int64).tolist() == d.cust_total.tolist()
    assert got.cust_orders.astype(np.int64).tolist() == d.cust_orders.tolist()
    assert got["run"].astype(np.int64).tolist() == d["run"].tolist()


def test_lead_lag_first(runner):
    sql = """
    select o_orderkey, o_custkey,
      lag(o_orderkey) over (partition by o_custkey order by o_orderkey) as prev_o,
      lead(o_orderkey) over (partition by o_custkey order by o_orderkey) as next_o,
      first_value(o_orderkey) over (partition by o_custkey order by o_orderkey) as first_o
    from orders where o_custkey <= 20
    """
    got = runner.run_sql(sql).to_pandas().sort_values("o_orderkey") \
        .reset_index(drop=True)
    o = odf()
    d = o[o.o_custkey <= 20].sort_values("o_orderkey").copy()
    g = d.groupby("o_custkey").o_orderkey
    d["prev_o"] = g.shift(1)
    d["next_o"] = g.shift(-1)
    d["first_o"] = g.transform("first")
    d = d.reset_index(drop=True)

    def norm(s):
        return [None if pd.isna(v) else int(v) for v in s]

    assert norm(got.prev_o) == norm(d.prev_o)
    assert norm(got.next_o) == norm(d.next_o)
    assert norm(got.first_o) == norm(d.first_o)


def test_rows_frames(runner):
    sql = """
    select o_orderkey, o_custkey, o_totalprice,
      sum(o_totalprice) over (partition by o_custkey order by o_orderkey
         rows between 1 preceding and current row) s2,
      min(o_totalprice) over (partition by o_custkey order by o_orderkey) mn,
      max(o_totalprice) over (partition by o_custkey order by o_orderkey
         rows between unbounded preceding and current row) mx
    from orders where o_custkey <= 15
    """
    got = runner.run_sql(sql).to_pandas().sort_values(
        ["o_custkey", "o_orderkey"]).reset_index(drop=True)
    o = odf()
    d = o[o.o_custkey <= 15].sort_values(["o_custkey", "o_orderkey"]) \
        .reset_index(drop=True)
    g = d.groupby("o_custkey").o_totalprice
    assert got.s2.astype(np.int64).tolist() == \
        g.rolling(2, min_periods=1).sum().reset_index(drop=True) \
        .astype(np.int64).tolist()
    assert got.mn.tolist() == g.cummin().tolist()
    assert got.mx.tolist() == g.cummax().tolist()
