"""End-to-end physical-plan execution vs pandas oracle (Q1/Q6 hand plans —
the ``HandTpchQuery1/6.java`` milestone of the reference's benchmark dir)."""

import numpy as np
import pytest

from presto_tpu.data import types as T
from presto_tpu.exec import physical as P
from presto_tpu.exec.runner import LocalRunner
from presto_tpu.sql import ir

import tpch_oracle as O

SF = 0.01


def col(name, dtype):
    return ir.ColumnRef(name, dtype)


D2 = T.decimal(15, 2)


@pytest.fixture(scope="module")
def runner():
    return LocalRunner(scale_factor=SF)


def test_q1_hand_plan(runner):
    ep = col("l_extendedprice", D2)
    disc = col("l_discount", D2)
    tax = col("l_tax", D2)
    one = ir.lit_decimal(100, 2)
    disc_price = ir.arith("*", ep, ir.arith("-", one, disc))
    charge = ir.arith("*", disc_price, ir.arith("+", one, tax))
    plan = P.PhysSort(
        P.PhysHashAggregate(
            P.PhysFilter(
                P.PhysScan("lineitem", (
                    "l_returnflag", "l_linestatus", "l_quantity",
                    "l_extendedprice", "l_discount", "l_tax", "l_shipdate")),
                ir.Compare("<=", col("l_shipdate", T.DATE),
                           ir.lit_date(O.days("1998-12-01") - 90)),
            ),
            groups=(("l_returnflag", col("l_returnflag", T.varchar(1))),
                    ("l_linestatus", col("l_linestatus", T.varchar(1)))),
            aggs=(
                P.AggSpec("sum_qty", "sum", col("l_quantity", D2)),
                P.AggSpec("sum_base_price", "sum", ep),
                P.AggSpec("sum_disc_price", "sum", disc_price),
                P.AggSpec("sum_charge", "sum", charge),
                P.AggSpec("avg_qty", "avg", col("l_quantity", D2)),
                P.AggSpec("avg_price", "avg", ep),
                P.AggSpec("avg_disc", "avg", disc),
                P.AggSpec("count_order", "count_star"),
            ),
            ndv_hint=8,
        ),
        keys=((col("l_returnflag", T.varchar(1)), False),
              (col("l_linestatus", T.varchar(1)), False)),
    )
    got = runner.run_physical(plan).to_pandas()
    exp = O.q1(SF)
    assert len(got) == len(exp)
    for c in ["l_returnflag", "l_linestatus"]:
        assert got[c].tolist() == exp[c].tolist()
    for c in ["sum_qty", "sum_base_price", "sum_disc_price", "sum_charge",
              "avg_qty", "avg_price", "avg_disc", "count_order"]:
        assert got[c].astype(np.int64).tolist() == exp[c].astype(np.int64).tolist(), c


def test_q6_hand_plan(runner):
    ep = col("l_extendedprice", D2)
    disc = col("l_discount", D2)
    plan = P.PhysHashAggregate(
        P.PhysFilter(
            P.PhysScan("lineitem", (
                "l_extendedprice", "l_discount", "l_quantity", "l_shipdate")),
            ir.and_(
                ir.Compare(">=", col("l_shipdate", T.DATE),
                           ir.lit_date(O.days("1994-01-01"))),
                ir.Compare("<", col("l_shipdate", T.DATE),
                           ir.lit_date(O.days("1995-01-01"))),
                ir.Between(disc, ir.lit_decimal(5, 2), ir.lit_decimal(7, 2)),
                ir.Compare("<", col("l_quantity", D2),
                           ir.lit_decimal(2400, 2)),
            ),
        ),
        groups=(),
        aggs=(P.AggSpec("revenue", "sum", ir.arith("*", ep, disc)),),
    )
    got = runner.run_physical(plan)
    assert got.row_count == 1
    assert int(got.to_pydict()["revenue"][0]) == O.q6(SF)
