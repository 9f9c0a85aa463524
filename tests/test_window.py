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


def test_range_frames_value_offsets(runner):
    """RANGE BETWEEN k PRECEDING AND CURRENT ROW / k FOLLOWING over an
    integer order key, asc and desc, vs a brute-force oracle."""
    sql = """
    select o_orderkey, o_custkey, o_orderdate, o_totalprice,
      sum(o_totalprice) over (partition by o_custkey order by o_orderdate
         range between 90 preceding and current row) s_back,
      count(*) over (partition by o_custkey order by o_orderdate
         range between 30 preceding and 30 following) c_win,
      sum(o_totalprice) over (partition by o_custkey order by o_orderdate desc
         range between 90 preceding and current row) s_desc
    from orders where o_custkey <= 40
    """
    got = runner.run_sql(sql).to_pandas().sort_values(
        ["o_custkey", "o_orderkey"]).reset_index(drop=True)
    o = odf()
    d = o[o.o_custkey <= 40].sort_values(["o_custkey", "o_orderkey"]) \
        .reset_index(drop=True)

    def brute(row, lo_off, hi_off, desc=False):
        part = d[d.o_custkey == row.o_custkey]
        v = row.o_orderdate
        if desc:  # k preceding on a DESC key = larger values
            m = (part.o_orderdate <= v + lo_off) & (part.o_orderdate >= v)
        else:
            m = (part.o_orderdate >= v - lo_off) & (part.o_orderdate <= v + hi_off)
        return part[m]

    s_back = [int(brute(r, 90, 0).o_totalprice.sum()) for r in d.itertuples()]
    c_win = [len(brute(r, 30, 30)) for r in d.itertuples()]
    s_desc = [int(brute(r, 90, 0, desc=True).o_totalprice.sum())
              for r in d.itertuples()]
    assert got.s_back.astype(np.int64).tolist() == s_back
    assert got.c_win.astype(np.int64).tolist() == c_win
    assert got.s_desc.astype(np.int64).tolist() == s_desc


def test_range_current_row_includes_peers(runner):
    """Default-style RANGE CURRENT ROW spans the whole peer run (ties in
    the order key), unlike ROWS CURRENT ROW."""
    sql = """
    select o_orderkey, o_orderpriority, o_totalprice,
      sum(o_totalprice) over (order by o_orderpriority
         range between current row and current row) peers_sum
    from orders where o_custkey <= 10
    """
    got = runner.run_sql(sql).to_pandas()
    o = odf()
    d = o[o.o_custkey <= 10]
    totals = d.groupby("o_orderpriority").o_totalprice.sum()
    g = got.sort_values("o_orderkey").reset_index(drop=True)
    e = d.sort_values("o_orderkey").reset_index(drop=True)
    want = e.o_orderpriority.map(totals)
    assert g.peers_sum.astype(np.int64).tolist() == \
        want.astype(np.int64).tolist()


def test_groups_frame(runner):
    """GROUPS frames count peer groups (reference GroupsFraming)."""
    sql = """
    select o_orderkey, o_custkey, o_orderpriority, o_totalprice,
      sum(o_totalprice) over (partition by o_custkey
         order by o_orderpriority
         groups between 1 preceding and current row) g1,
      count(*) over (partition by o_custkey order by o_orderpriority
         groups between current row and 1 following) g2
    from orders where o_custkey <= 30
    """
    got = runner.run_sql(sql).to_pandas().sort_values(
        "o_orderkey").reset_index(drop=True)
    o = odf()
    d = o[o.o_custkey <= 30]

    def brute(row, pre, fol, agg):
        part = d[d.o_custkey == row.o_custkey]
        groups = sorted(part.o_orderpriority.unique())
        gi = groups.index(row.o_orderpriority)
        sel = groups[max(gi - pre, 0):gi + fol + 1]
        rows = part[part.o_orderpriority.isin(sel)]
        return agg(rows)

    e = d.sort_values("o_orderkey").reset_index(drop=True)
    want_g1 = [int(brute(r, 1, 0, lambda x: x.o_totalprice.sum()))
               for r in e.itertuples()]
    want_g2 = [int(brute(r, 0, 1, len)) for r in e.itertuples()]
    assert got.g1.astype(np.int64).tolist() == want_g1
    assert got.g2.astype(np.int64).tolist() == want_g2


def test_ignore_nulls(runner):
    """lead/lag/first/last IGNORE NULLS vs a nullable expression."""
    sql = """
    select o_orderkey,
      lag(nullif(o_shippriority, 0)) ignore nulls over
        (partition by o_custkey order by o_orderkey) ln,
      lag(nullif(o_totalprice, 0)) ignore nulls over
        (partition by o_custkey order by o_orderkey) lp,
      first_value(nullif(o_totalprice, 0)) ignore nulls over
        (partition by o_custkey order by o_orderkey) fv
    from orders where o_custkey <= 40
    """
    got = runner.run_sql(sql).to_pandas().sort_values(
        "o_orderkey").reset_index(drop=True)
    o = odf()
    d = o[o.o_custkey <= 40].copy()
    d["np_"] = d.o_totalprice.where(d.o_totalprice != 0)
    d = d.sort_values("o_orderkey")
    grp = d.groupby("o_custkey")
    # o_shippriority is all zeros → nullif always NULL → lag stays NULL
    assert got.ln.isna().all()
    want_lp = grp.np_.apply(
        lambda s: s.ffill().shift(1)).reset_index(level=0, drop=True)
    want_lp = want_lp.loc[d.index]
    got_lp = got.lp.values
    exp_lp = want_lp.values
    both = ~(pd.isna(exp_lp) | pd.isna(got_lp))
    assert (pd.isna(exp_lp) == pd.isna(got_lp)).all()
    assert np.array_equal(got_lp[both].astype(np.int64),
                          exp_lp[both].astype(np.int64))
    # first non-null per partition (default frame ends at current peer =
    # current row since o_orderkey unique): running first non-null
    want_fv = grp.np_.apply(
        lambda s: s.expanding().apply(
            lambda w: w.dropna().iloc[0] if w.notna().any() else np.nan)
    ).reset_index(level=0, drop=True).loc[d.index]
    got_fv = got.fv.values
    exp_fv = want_fv.values
    assert (pd.isna(exp_fv) == pd.isna(got_fv)).all()
    b2 = ~pd.isna(exp_fv)
    assert np.array_equal(got_fv[b2].astype(np.int64),
                          exp_fv[b2].astype(np.int64))
