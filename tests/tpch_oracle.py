"""Independent pandas/numpy oracle for TPC-H queries.

Plays the role of the reference's H2 oracle
(``testing/trino-testing/.../QueryAssertions.java:97`` runs each query on
Trino and H2 and diffs row sets): every query is hand-implemented here with
pandas groupby/merge over the same generated data, using exact int64
unscaled-decimal arithmetic (HALF_UP division) so results are bit-comparable
with the engine.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

from presto_tpu.tpch import generator

_cache = {}


def load(table: str, sf: float) -> pd.DataFrame:
    key = (table, sf)
    if key not in _cache:
        t = generator.generate(table, sf)
        data = {}
        for name, col in t.columns.items():
            if col.kind == "plain":
                data[name] = np.asarray(col.values)
            else:
                data[name] = pd.Series(col.to_pylist(), dtype=object)
        _cache[key] = pd.DataFrame(data)
    return _cache[key]


def days(iso: str) -> int:
    return (dt.date.fromisoformat(iso) - dt.date(1970, 1, 1)).days


def div_half_up(num, den):
    num = np.asarray(num, dtype=np.int64)
    den = np.asarray(den, dtype=np.int64)
    sign = np.where((num < 0) != (den < 0), -1, 1)
    an, ad = np.abs(num), np.maximum(np.abs(den), 1)
    q = an // ad
    q = q + ((an - q * ad) * 2 >= ad)
    return sign * q


def q1(sf: float, delta_days: int = 90) -> pd.DataFrame:
    li = load("lineitem", sf)
    cutoff = days("1998-12-01") - delta_days
    d = li[li.l_shipdate <= cutoff].copy()
    d["disc_price"] = d.l_extendedprice * (100 - d.l_discount)          # s4
    d["charge"] = d.disc_price * (100 + d.l_tax)                        # s6
    g = d.groupby(["l_returnflag", "l_linestatus"], sort=True)
    out = pd.DataFrame({
        "sum_qty": g.l_quantity.sum(),
        "sum_base_price": g.l_extendedprice.sum(),
        "sum_disc_price": g.disc_price.sum(),
        "sum_charge": g.charge.sum(),
        "avg_qty": div_half_up(g.l_quantity.sum(), g.size()),
        "avg_price": div_half_up(g.l_extendedprice.sum(), g.size()),
        "avg_disc": div_half_up(g.l_discount.sum(), g.size()),
        "count_order": g.size(),
    }).reset_index()
    return out


def q6(sf: float) -> int:
    li = load("lineitem", sf)
    lo, hi = days("1994-01-01"), days("1995-01-01")
    d = li[(li.l_shipdate >= lo) & (li.l_shipdate < hi)
           & (li.l_discount >= 5) & (li.l_discount <= 7)
           & (li.l_quantity < 2400)]
    return int((d.l_extendedprice * d.l_discount).sum())  # scale 4


def q2(sf: float) -> pd.DataFrame:
    p = load("part", sf)
    s = load("supplier", sf)
    ps = load("partsupp", sf)
    n = load("nation", sf)
    r = load("region", sf)
    eur = n.merge(r[r.r_name == "EUROPE"], left_on="n_regionkey",
                  right_on="r_regionkey")
    se = s.merge(eur, left_on="s_nationkey", right_on="n_nationkey")
    pse = ps.merge(se, left_on="ps_suppkey", right_on="s_suppkey")
    mins = pse.groupby("ps_partkey").ps_supplycost.min().rename("min_cost")
    pp = p[(p.p_size == 15) & p.p_type.str.endswith("BRASS")]
    j = pse.merge(pp, left_on="ps_partkey", right_on="p_partkey")
    j = j.merge(mins, left_on="ps_partkey", right_index=True)
    j = j[j.ps_supplycost == j.min_cost]
    j = j.sort_values(["s_acctbal", "n_name", "s_name", "p_partkey"],
                      ascending=[False, True, True, True]).head(100)
    return j[["s_acctbal", "s_name", "n_name", "p_partkey", "p_mfgr",
              "s_address", "s_phone", "s_comment"]].reset_index(drop=True)


def q3(sf: float) -> pd.DataFrame:
    c = load("customer", sf)
    o = load("orders", sf)
    li = load("lineitem", sf)
    cutoff = days("1995-03-15")
    cb = c[c.c_mktsegment == "BUILDING"]
    ob = o[o.o_orderdate < cutoff].merge(cb, left_on="o_custkey",
                                         right_on="c_custkey")
    lb = li[li.l_shipdate > cutoff].merge(ob, left_on="l_orderkey",
                                          right_on="o_orderkey")
    lb["rev"] = lb.l_extendedprice * (100 - lb.l_discount)  # s4
    g = lb.groupby(["l_orderkey", "o_orderdate", "o_shippriority"],
                   as_index=False).rev.sum()
    g = g.sort_values(["rev", "o_orderdate"], ascending=[False, True]).head(10)
    return g[["l_orderkey", "rev", "o_orderdate", "o_shippriority"]
             ].reset_index(drop=True)


def q4(sf: float) -> pd.DataFrame:
    o = load("orders", sf)
    li = load("lineitem", sf)
    lo, hi = days("1993-07-01"), days("1993-10-01")
    ok = set(li[li.l_commitdate < li.l_receiptdate].l_orderkey)
    d = o[(o.o_orderdate >= lo) & (o.o_orderdate < hi)
          & o.o_orderkey.isin(ok)]
    g = d.groupby("o_orderpriority", as_index=False).size()
    g.columns = ["o_orderpriority", "order_count"]
    return g.sort_values("o_orderpriority").reset_index(drop=True)


def q5(sf: float) -> pd.DataFrame:
    c, o, li = load("customer", sf), load("orders", sf), load("lineitem", sf)
    s, n, r = load("supplier", sf), load("nation", sf), load("region", sf)
    lo, hi = days("1994-01-01"), days("1995-01-01")
    asia = n.merge(r[r.r_name == "ASIA"], left_on="n_regionkey",
                   right_on="r_regionkey")
    sa = s.merge(asia, left_on="s_nationkey", right_on="n_nationkey")
    j = li.merge(sa, left_on="l_suppkey", right_on="s_suppkey")
    j = j.merge(o[(o.o_orderdate >= lo) & (o.o_orderdate < hi)],
                left_on="l_orderkey", right_on="o_orderkey")
    j = j.merge(c, left_on="o_custkey", right_on="c_custkey")
    j = j[j.c_nationkey == j.s_nationkey]
    j["rev"] = j.l_extendedprice * (100 - j.l_discount)
    g = j.groupby("n_name", as_index=False).rev.sum()
    return g.sort_values("rev", ascending=False).reset_index(drop=True)


def _year(daysarr):
    return pd.to_datetime(np.asarray(daysarr, np.int64), unit="D").year


def q7(sf: float) -> pd.DataFrame:
    s, li, o = load("supplier", sf), load("lineitem", sf), load("orders", sf)
    c, n = load("customer", sf), load("nation", sf)
    lo, hi = days("1995-01-01"), days("1996-12-31")
    j = li[(li.l_shipdate >= lo) & (li.l_shipdate <= hi)]
    j = j.merge(s, left_on="l_suppkey", right_on="s_suppkey")
    j = j.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    j = j.merge(c, left_on="o_custkey", right_on="c_custkey")
    n1 = n.rename(columns=lambda x: x + "_1")
    n2 = n.rename(columns=lambda x: x + "_2")
    j = j.merge(n1, left_on="s_nationkey", right_on="n_nationkey_1")
    j = j.merge(n2, left_on="c_nationkey", right_on="n_nationkey_2")
    m = (((j.n_name_1 == "FRANCE") & (j.n_name_2 == "GERMANY"))
         | ((j.n_name_1 == "GERMANY") & (j.n_name_2 == "FRANCE")))
    j = j[m].copy()
    j["l_year"] = _year(j.l_shipdate)
    j["volume"] = j.l_extendedprice * (100 - j.l_discount)
    g = j.groupby(["n_name_1", "n_name_2", "l_year"], as_index=False
                  ).volume.sum()
    g.columns = ["supp_nation", "cust_nation", "l_year", "revenue"]
    return g.sort_values(["supp_nation", "cust_nation", "l_year"]
                         ).reset_index(drop=True)


def q8(sf: float) -> pd.DataFrame:
    p, s, li = load("part", sf), load("supplier", sf), load("lineitem", sf)
    o, c, n, r = (load("orders", sf), load("customer", sf),
                  load("nation", sf), load("region", sf))
    lo, hi = days("1995-01-01"), days("1996-12-31")
    j = li.merge(p[p.p_type == "ECONOMY ANODIZED STEEL"],
                 left_on="l_partkey", right_on="p_partkey")
    j = j.merge(s, left_on="l_suppkey", right_on="s_suppkey")
    j = j.merge(o[(o.o_orderdate >= lo) & (o.o_orderdate <= hi)],
                left_on="l_orderkey", right_on="o_orderkey")
    j = j.merge(c, left_on="o_custkey", right_on="c_custkey")
    n1 = n.rename(columns=lambda x: x + "_1")
    amer = n1.merge(r[r.r_name == "AMERICA"], left_on="n_regionkey_1",
                    right_on="r_regionkey")
    j = j.merge(amer, left_on="c_nationkey", right_on="n_nationkey_1")
    n2 = n.rename(columns=lambda x: x + "_2")
    j = j.merge(n2, left_on="s_nationkey", right_on="n_nationkey_2")
    j["o_year"] = _year(j.o_orderdate)
    j["volume"] = j.l_extendedprice * (100 - j.l_discount)   # s4
    j["bra"] = np.where(j.n_name_2 == "BRAZIL", j.volume, 0)
    g = j.groupby("o_year")
    num = g.bra.sum()
    den = g.volume.sum()
    # s4 / s4 at result scale 4: shift numerator by 10^4
    share = div_half_up(num * 10**4, den)
    out = pd.DataFrame({"o_year": num.index, "mkt_share": share}
                       ).sort_values("o_year").reset_index(drop=True)
    return out


def q9(sf: float) -> pd.DataFrame:
    p, s, li = load("part", sf), load("supplier", sf), load("lineitem", sf)
    ps, o, n = load("partsupp", sf), load("orders", sf), load("nation", sf)
    j = li.merge(p[p.p_name.str.contains("green")],
                 left_on="l_partkey", right_on="p_partkey")
    j = j.merge(s, left_on="l_suppkey", right_on="s_suppkey")
    j = j.merge(ps, left_on=["l_partkey", "l_suppkey"],
                right_on=["ps_partkey", "ps_suppkey"])
    j = j.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    j = j.merge(n, left_on="s_nationkey", right_on="n_nationkey")
    j["o_year"] = _year(j.o_orderdate)
    j["amount"] = (j.l_extendedprice * (100 - j.l_discount)
                   - j.ps_supplycost * j.l_quantity)      # s4
    g = j.groupby(["n_name", "o_year"], as_index=False).amount.sum()
    g.columns = ["nation", "o_year", "sum_profit"]
    return g.sort_values(["nation", "o_year"], ascending=[True, False]
                         ).reset_index(drop=True)


def q10(sf: float) -> pd.DataFrame:
    c, o, li, n = (load("customer", sf), load("orders", sf),
                   load("lineitem", sf), load("nation", sf))
    lo, hi = days("1993-10-01"), days("1994-01-01")
    j = li[li.l_returnflag == "R"].merge(
        o[(o.o_orderdate >= lo) & (o.o_orderdate < hi)],
        left_on="l_orderkey", right_on="o_orderkey")
    j = j.merge(c, left_on="o_custkey", right_on="c_custkey")
    j = j.merge(n, left_on="c_nationkey", right_on="n_nationkey")
    j["rev"] = j.l_extendedprice * (100 - j.l_discount)
    g = j.groupby(["c_custkey", "c_name", "c_acctbal", "c_phone", "n_name",
                   "c_address", "c_comment"], as_index=False).rev.sum()
    g = g.sort_values("rev", ascending=False).head(20)
    return g[["c_custkey", "c_name", "rev", "c_acctbal", "n_name",
              "c_address", "c_phone", "c_comment"]].reset_index(drop=True)


def q11(sf: float) -> pd.DataFrame:
    ps, s, n = load("partsupp", sf), load("supplier", sf), load("nation", sf)
    ger = s.merge(n[n.n_name == "GERMANY"], left_on="s_nationkey",
                  right_on="n_nationkey")
    j = ps.merge(ger, left_on="ps_suppkey", right_on="s_suppkey")
    j["v"] = j.ps_supplycost * j.ps_availqty     # s2
    total = j.v.sum()
    thresh = total * 1000                        # × 0.0001000 (s7) → s9
    g = j.groupby("ps_partkey", as_index=False).v.sum()
    g = g[g.v * 10**7 > thresh]                  # compare at s9
    return g.sort_values("v", ascending=False).reset_index(drop=True)


def q12(sf: float) -> pd.DataFrame:
    o, li = load("orders", sf), load("lineitem", sf)
    lo, hi = days("1994-01-01"), days("1995-01-01")
    d = li[li.l_shipmode.isin(["MAIL", "SHIP"])
           & (li.l_commitdate < li.l_receiptdate)
           & (li.l_shipdate < li.l_commitdate)
           & (li.l_receiptdate >= lo) & (li.l_receiptdate < hi)]
    j = d.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    high = j.o_orderpriority.isin(["1-URGENT", "2-HIGH"])
    g = j.assign(h=high.astype(np.int64), l=(~high).astype(np.int64)) \
         .groupby("l_shipmode", as_index=False)[["h", "l"]].sum()
    g.columns = ["l_shipmode", "high_line_count", "low_line_count"]
    return g.sort_values("l_shipmode").reset_index(drop=True)


def q13(sf: float) -> pd.DataFrame:
    c, o = load("customer", sf), load("orders", sf)
    om = o[~o.o_comment.str.match(r"^.*special.*requests.*$", case=True)]
    cnt = om.groupby("o_custkey").size()
    counts = c.c_custkey.map(cnt).fillna(0).astype(np.int64)
    g = counts.value_counts().rename_axis("c_count").rename("custdist") \
        .reset_index()
    return g.sort_values(["custdist", "c_count"], ascending=[False, False]
                         ).reset_index(drop=True)


def q14(sf: float) -> int:
    li, p = load("lineitem", sf), load("part", sf)
    lo, hi = days("1995-09-01"), days("1995-10-01")
    j = li[(li.l_shipdate >= lo) & (li.l_shipdate < hi)].merge(
        p, left_on="l_partkey", right_on="p_partkey")
    j["rev"] = j.l_extendedprice * (100 - j.l_discount)   # s4
    promo = np.where(j.p_type.str.startswith("PROMO"), j.rev, 0).sum()
    total = j.rev.sum()
    # 100.00 (s2) * s4 → s6; s6 / s4 at scale 6: shift 4
    return int(div_half_up(np.int64(10000) * promo * 10**4, total))


def q15(sf: float) -> pd.DataFrame:
    li, s = load("lineitem", sf), load("supplier", sf)
    lo, hi = days("1996-01-01"), days("1996-04-01")
    d = li[(li.l_shipdate >= lo) & (li.l_shipdate < hi)].copy()
    d["rev"] = d.l_extendedprice * (100 - d.l_discount)
    g = d.groupby("l_suppkey").rev.sum()
    mx = g.max()
    top = g[g == mx].reset_index()
    j = top.merge(s, left_on="l_suppkey", right_on="s_suppkey")
    j = j.sort_values("s_suppkey")
    return j[["s_suppkey", "s_name", "s_address", "s_phone", "rev"]
             ].reset_index(drop=True)


def q16(sf: float) -> pd.DataFrame:
    ps, p, s = load("partsupp", sf), load("part", sf), load("supplier", sf)
    bad = set(s[s.s_comment.str.match(r"^.*Customer.*Complaints.*$")].s_suppkey)
    pp = p[(p.p_brand != "Brand#45")
           & ~p.p_type.str.startswith("MEDIUM POLISHED")
           & p.p_size.isin([49, 14, 23, 45, 19, 3, 36, 9])]
    j = ps[~ps.ps_suppkey.isin(bad)].merge(
        pp, left_on="ps_partkey", right_on="p_partkey")
    g = j.groupby(["p_brand", "p_type", "p_size"], as_index=False
                  ).ps_suppkey.nunique()
    g.columns = ["p_brand", "p_type", "p_size", "supplier_cnt"]
    return g.sort_values(["supplier_cnt", "p_brand", "p_type", "p_size"],
                         ascending=[False, True, True, True]
                         ).reset_index(drop=True)


def q17(sf: float) -> int:
    li, p = load("lineitem", sf), load("part", sf)
    pp = p[(p.p_brand == "Brand#23") & (p.p_container == "MED BOX")]
    avg = li.groupby("l_partkey").agg(s=("l_quantity", "sum"),
                                     c=("l_quantity", "size"))
    avg["a"] = div_half_up(avg.s, avg.c)          # avg at s2, HALF_UP
    j = li.merge(pp, left_on="l_partkey", right_on="p_partkey")
    j = j.merge(avg, left_on="l_partkey", right_index=True)
    # l_quantity (s2) < 0.2 (s1) * avg (s2) → s3: compare at s3
    j = j[j.l_quantity * 10 < 2 * j.a]
    total = j.l_extendedprice.sum()               # s2
    # s2 / 7.0 (s1) at scale 2: shift = 2 + 1 - 2 = 1
    return int(div_half_up(total * 10, 70))


def q18(sf: float) -> pd.DataFrame:
    c, o, li = load("customer", sf), load("orders", sf), load("lineitem", sf)
    big = li.groupby("l_orderkey").l_quantity.sum()
    big = set(big[big > 30000].index)
    j = o[o.o_orderkey.isin(big)].merge(c, left_on="o_custkey",
                                        right_on="c_custkey")
    j = j.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    g = j.groupby(["c_name", "c_custkey", "o_orderkey", "o_orderdate",
                   "o_totalprice"], as_index=False).l_quantity.sum()
    g = g.sort_values(["o_totalprice", "o_orderdate"],
                      ascending=[False, True]).head(100)
    return g.reset_index(drop=True)


def q19(sf: float) -> int:
    li, p = load("lineitem", sf), load("part", sf)
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    base = (j.l_shipmode.isin(["AIR", "AIR REG"])
            & (j.l_shipinstruct == "DELIVER IN PERSON"))
    a1 = ((j.p_brand == "Brand#12")
          & j.p_container.isin(["SM CASE", "SM BOX", "SM PACK", "SM PKG"])
          & (j.l_quantity >= 100) & (j.l_quantity <= 1100)
          & (j.p_size >= 1) & (j.p_size <= 5))
    a2 = ((j.p_brand == "Brand#23")
          & j.p_container.isin(["MED BAG", "MED BOX", "MED PKG", "MED PACK"])
          & (j.l_quantity >= 1000) & (j.l_quantity <= 2000)
          & (j.p_size >= 1) & (j.p_size <= 10))
    a3 = ((j.p_brand == "Brand#34")
          & j.p_container.isin(["LG CASE", "LG BOX", "LG PACK", "LG PKG"])
          & (j.l_quantity >= 2000) & (j.l_quantity <= 3000)
          & (j.p_size >= 1) & (j.p_size <= 15))
    d = j[base & (a1 | a2 | a3)]
    return int((d.l_extendedprice * (100 - d.l_discount)).sum())


def q20(sf: float) -> pd.DataFrame:
    s, n, ps = load("supplier", sf), load("nation", sf), load("partsupp", sf)
    p, li = load("part", sf), load("lineitem", sf)
    forest = set(p[p.p_name.str.startswith("forest")].p_partkey)
    lo, hi = days("1994-01-01"), days("1995-01-01")
    ld = li[(li.l_shipdate >= lo) & (li.l_shipdate < hi)]
    qty = ld.groupby(["l_partkey", "l_suppkey"]).l_quantity.sum()
    psf = ps[ps.ps_partkey.isin(forest)].copy()
    key = list(zip(psf.ps_partkey, psf.ps_suppkey))
    halfq = [qty.get(k, None) for k in key]
    keep = [h is not None and a * 100 * 2 > h  # availqty(s0)→×100 vs 0.5×sum
            for h, a in zip(halfq, psf.ps_availqty)]
    suppkeys = set(psf[keep].ps_suppkey)
    j = s[s.s_suppkey.isin(suppkeys)].merge(
        n[n.n_name == "CANADA"], left_on="s_nationkey",
        right_on="n_nationkey")
    return j.sort_values("s_name")[["s_name", "s_address"]
                                   ].reset_index(drop=True)


def q21(sf: float) -> pd.DataFrame:
    s, li, o, n = (load("supplier", sf), load("lineitem", sf),
                   load("orders", sf), load("nation", sf))
    late = li[li.l_receiptdate > li.l_commitdate]
    supp_per_order = li.groupby("l_orderkey").l_suppkey.nunique()
    late_supps = late.groupby("l_orderkey").l_suppkey.agg(
        lambda x: frozenset(x))
    j = late.merge(o[o.o_orderstatus == "F"], left_on="l_orderkey",
                   right_on="o_orderkey")
    j = j.merge(s, left_on="l_suppkey", right_on="s_suppkey")
    j = j.merge(n[n.n_name == "SAUDI ARABIA"], left_on="s_nationkey",
                right_on="n_nationkey")
    # exists l2 with another supplier: order has >1 distinct supplier
    has_other = j.l_orderkey.map(supp_per_order) > 1
    # not exists late l3 by another supplier: all late rows are mine
    me_only = [late_supps[ok] == frozenset([sk])
               for ok, sk in zip(j.l_orderkey, j.l_suppkey)]
    d = j[has_other & np.asarray(me_only)]
    g = d.groupby("s_name", as_index=False).size()
    g.columns = ["s_name", "numwait"]
    return g.sort_values(["numwait", "s_name"], ascending=[False, True]
                         ).head(100).reset_index(drop=True)


def q22(sf: float) -> pd.DataFrame:
    c, o = load("customer", sf), load("orders", sf)
    codes = ["13", "31", "23", "29", "30", "18", "17"]
    cc = c.c_phone.str[:2]
    sel = c[cc.isin(codes)].copy()
    sel["cntrycode"] = cc[cc.isin(codes)]
    pos = sel[sel.c_acctbal > 0]
    avg = div_half_up(pos.c_acctbal.sum(), len(pos))   # s2 HALF_UP
    has_orders = set(o.o_custkey)
    d = sel[(sel.c_acctbal > avg) & ~sel.c_custkey.isin(has_orders)]
    g = d.groupby("cntrycode", as_index=False).agg(
        numcust=("c_custkey", "size"), totacctbal=("c_acctbal", "sum"))
    return g.sort_values("cntrycode").reset_index(drop=True)
