"""Fused single-program pipelines for benchmarking and compile checks.

One traced function per query stage — the "whole stage = one XLA program"
design point (the analogue of a fully fused Trino pipeline of compiled
operators, ``sql/planner/LocalExecutionPlanner.java`` output, with no
driver pump loop).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data import types as T
from ..data.column import PLAIN, DICT
from ..ops import agg as A
from ..ops import decimal as DEC
from ..ops import hashtable as HT
from .columns import Chunk, DCol
from .datasource import DataSource

Q1_CUTOFF_DAYS = 10471  # date '1998-12-01' - 90 days, days since epoch


def q1_stage(shipdate: jnp.ndarray, returnflag: jnp.ndarray,
             linestatus: jnp.ndarray, quantity: jnp.ndarray,
             extendedprice: jnp.ndarray, discount: jnp.ndarray,
             tax: jnp.ndarray, mask: jnp.ndarray):
    """TPC-H Q1 as one fused program: filter → derive → group-agg.

    Group key is the packed (returnflag, linestatus) dict-code pair, so the
    hash table is replaced by a direct 8-slot index — the planner's
    small-ndv fast path (reference: ``BigintGroupByHash`` specialization).
    """
    m = mask & (shipdate <= Q1_CUTOFF_DAYS)
    disc_price = extendedprice * (100 - discount)          # scale 4
    charge = disc_price * (100 + tax)                      # scale 6
    group = returnflag * 2 + linestatus                    # codes: 3 × 2
    cap = 8
    out = {
        "sum_qty": A.seg_sum(quantity, group, m, cap, jnp.int64),
        "sum_base_price": A.seg_sum(extendedprice, group, m, cap, jnp.int64),
        "sum_disc_price": A.seg_sum(disc_price, group, m, cap, jnp.int64),
        "sum_charge": A.seg_sum(charge, group, m, cap, jnp.int64),
        "count_order": A.seg_count(group, m, cap),
    }
    out["avg_qty"] = DEC.div_round_half_up(
        out["sum_qty"], jnp.maximum(out["count_order"], 1))
    out["avg_price"] = DEC.div_round_half_up(
        out["sum_base_price"], jnp.maximum(out["count_order"], 1))
    disc_sum = A.seg_sum(discount, group, m, cap, jnp.int64)
    out["avg_disc"] = DEC.div_round_half_up(
        disc_sum, jnp.maximum(out["count_order"], 1))
    return out


def q6_stage(shipdate, quantity, extendedprice, discount, mask):
    """TPC-H Q6: selective filter → one masked reduction."""
    m = (mask & (shipdate >= 8766) & (shipdate < 9131)     # [1994, 1995)
         & (discount >= 5) & (discount <= 7) & (quantity < 2400))
    return A.g_sum(extendedprice * discount, m, jnp.int64)


def q1_example_args(sf: float = 0.01):
    ds = DataSource(sf)
    chunk = ds.scan("lineitem", (
        "l_shipdate", "l_returnflag", "l_linestatus", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax"))
    c = chunk.cols
    return (c["l_shipdate"].values.astype(jnp.int32),
            c["l_returnflag"].values, c["l_linestatus"].values,
            c["l_quantity"].values, c["l_extendedprice"].values,
            c["l_discount"].values, c["l_tax"].values, chunk.mask)
