"""Generator invariants: spec-mandated structure + split determinism.

Models the reference's generator-validation fixtures (`TestTpchMetadata`,
bundled stats at ``plugin/trino-tpch/src/main/resources/tpch/statistics/``).
"""

import numpy as np
import pytest

from presto_tpu.tpch import generator as g
from presto_tpu.tpch import words

SF = 0.01


def test_fixed_tables():
    r = g.generate("region")
    assert r.row_count == 5
    assert r.to_pydict()["r_name"] == ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    n = g.generate("nation")
    assert n.row_count == 25
    assert n.to_pydict()["n_name"][7] == "GERMANY"
    assert n.to_pydict()["n_name"][8] == "INDIA"


def test_row_counts():
    assert g.generate("supplier", SF).row_count == 100
    assert g.generate("customer", SF).row_count == 1500
    assert g.generate("part", SF).row_count == 2000
    assert g.generate("partsupp", SF).row_count == 8000
    assert g.generate("orders", SF).row_count == 15000
    li = g.generate("lineitem", SF, columns=["l_orderkey"])
    assert 15000 <= li.row_count <= 7 * 15000
    assert abs(li.row_count / 15000 - 4.0) < 0.1  # mean lines/order ≈ 4


def test_sparse_orderkeys():
    o = g.generate("orders", SF, columns=["o_orderkey"])
    ok = np.asarray(o["o_orderkey"].values)
    assert ok[:10].tolist() == [1, 2, 3, 4, 5, 6, 7, 32, 33, 34]
    # 8 keys used per 32-key block
    assert ((ok & 31) < 8).all() | ((ok & 31) >= 32 - 24).any()


def test_custkey_mortality():
    o = g.generate("orders", SF, columns=["o_custkey"])
    ck = np.asarray(o["o_custkey"].values)
    assert (ck % 3 != 0).all()
    assert ck.min() >= 1 and ck.max() <= 1500


def test_partsupp_bridge():
    ps = g.generate("partsupp", SF)
    pk = np.asarray(ps["ps_partkey"].values)
    sk = np.asarray(ps["ps_suppkey"].values)
    assert (np.bincount(pk)[1:] == 4).all()          # 4 suppliers per part
    assert sk.min() >= 1 and sk.max() <= 100
    # (partkey, suppkey) pairs are unique
    assert len(np.unique(pk * 1000 + sk)) == len(pk)


def test_lineitem_supplier_consistent_with_partsupp():
    """Every (l_partkey, l_suppkey) must exist in partsupp (FK integrity)."""
    li = g.generate("lineitem", SF, columns=["l_partkey", "l_suppkey"])
    ps = g.generate("partsupp", SF)
    pairs = set(zip(np.asarray(ps["ps_partkey"].values).tolist(),
                    np.asarray(ps["ps_suppkey"].values).tolist()))
    lp = np.asarray(li["l_partkey"].values)
    ls = np.asarray(li["l_suppkey"].values)
    sample = np.linspace(0, len(lp) - 1, 500).astype(int)
    for i in sample:
        assert (int(lp[i]), int(ls[i])) in pairs


def test_dates_in_range():
    o = g.generate("orders", SF, columns=["o_orderdate"])
    od = np.asarray(o["o_orderdate"].values)
    assert od.min() >= words.START_DAYS
    li = g.generate("lineitem", SF,
                    columns=["l_shipdate", "l_commitdate", "l_receiptdate"])
    ship = np.asarray(li["l_shipdate"].values)
    rcpt = np.asarray(li["l_receiptdate"].values)
    assert ((rcpt - ship) >= 1).all() and ((rcpt - ship) <= 30).all()


def test_totalprice_matches_lineitems():
    o = g.generate("orders", SF, columns=["o_orderkey", "o_totalprice"])
    li = g.generate("lineitem", SF, columns=[
        "l_orderkey", "l_extendedprice", "l_discount", "l_tax"])
    ok = np.asarray(li["l_orderkey"].values)
    ep = np.asarray(li["l_extendedprice"].values)
    d = np.asarray(li["l_discount"].values)
    t = np.asarray(li["l_tax"].values)
    line_total = ((ep * (100 - d)) // 100) * (100 + t) // 100
    # group by orderkey (input is ordered by orderkey)
    boundaries = np.flatnonzero(np.diff(ok)) + 1
    sums = np.add.reduceat(line_total, np.concatenate([[0], boundaries]))
    tp = np.asarray(o["o_totalprice"].values)
    assert np.array_equal(sums, tp)


def test_split_determinism():
    for table in ("customer", "part", "orders"):
        full = g.generate(table, SF)
        part = g.generate(table, SF, first_row=500, n_rows=250)
        ref = full.slice(500, 250)
        for name in full.names:
            assert np.array_equal(np.asarray(ref[name].values),
                                  np.asarray(part[name].values)), (table, name)


def test_q16_supplier_comments():
    s = g.generate("supplier", SF, columns=["s_comment"])
    comments = s.to_pydict()["s_comment"]
    n_compl = sum(1 for c in comments if "Customer" in c and c.endswith("Complaints"))
    assert n_compl >= 1


def test_retail_price_formula():
    p = g.generate("part", SF, columns=["p_retailprice"])
    pk = np.arange(1, 2001)
    expect = 90000 + (pk // 10) % 20001 + 100 * (pk % 1000)
    assert np.array_equal(np.asarray(p["p_retailprice"].values), expect)
