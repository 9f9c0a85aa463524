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
