"""Iterative rule optimizer tests (sql/planner/rules.py)."""

import jax

jax.config.update("jax_enable_x64", True)

from presto_tpu.data import types as T
from presto_tpu.exec import physical as P
from presto_tpu.sql import ir
from presto_tpu.sql.planner import rules as R


def col(n, t=T.BIGINT):
    return ir.ColumnRef(n, t)


def scan():
    return P.PhysScan("lineitem", ("l_orderkey", "l_quantity"))


def test_merge_filters():
    p1 = ir.Compare("<", col("l_quantity"), ir.lit_bigint(10))
    p2 = ir.Compare(">", col("l_orderkey"), ir.lit_bigint(5))
    plan = P.PhysFilter(P.PhysFilter(scan(), p1), p2)
    out = R.optimize(plan)
    assert isinstance(out, P.PhysFilter)
    assert isinstance(out.child, P.PhysScan)
    assert isinstance(out.predicate, ir.Logical)


def test_remove_trivial_filter():
    plan = P.PhysFilter(scan(), ir.Literal(True, T.BOOLEAN))
    out = R.optimize(plan)
    assert isinstance(out, P.PhysScan)


def test_merge_limits_and_topn():
    plan = P.PhysLimit(P.PhysLimit(
        P.PhysSort(scan(), ((col("l_orderkey"), False),)), 20), 5)
    out = R.optimize(plan)
    assert isinstance(out, P.PhysSort) and out.limit == 5


def test_limit_over_project_over_sort():
    proj = P.PhysProject(
        P.PhysSort(scan(), ((col("l_orderkey"), False),)),
        (("q", col("l_quantity")),))
    out = R.optimize(P.PhysLimit(proj, 7))
    assert isinstance(out, P.PhysProject)
    assert isinstance(out.child, P.PhysSort) and out.child.limit == 7


def test_inline_projections():
    inner = P.PhysProject(scan(), (
        ("x", ir.arith("+", col("l_quantity"), ir.lit_bigint(1))),))
    outer = P.PhysProject(inner, (
        ("y", ir.arith("*", col("x"), ir.lit_bigint(2))),))
    out = R.optimize(outer)
    assert isinstance(out, P.PhysProject)
    assert isinstance(out.child, P.PhysScan)
    (name, e), = out.projections
    assert name == "y" and isinstance(e.left, ir.Arith)


def test_inline_projections_guard_against_duplication():
    big = ir.arith("+", ir.arith("*", col("l_quantity"),
                                 col("l_orderkey")), ir.lit_bigint(1))
    inner = P.PhysProject(scan(), (("x", big),))
    outer = P.PhysProject(inner, (
        ("y", ir.arith("+", col("x"), col("x"))),))
    out = R.optimize(outer)
    assert isinstance(out.child, P.PhysProject)  # not inlined


def test_push_filter_through_project():
    proj = P.PhysProject(scan(), (("q2", col("l_quantity")),))
    plan = P.PhysFilter(proj, ir.Compare("<", col("q2"), ir.lit_bigint(9)))
    out = R.optimize(plan)
    assert isinstance(out, P.PhysProject)
    assert isinstance(out.child, P.PhysFilter)
    assert ir.referenced_columns(out.child.predicate) == ["l_quantity"]


def test_budget_terminates():
    opt = R.IterativeOptimizer(budget=1)
    p1 = ir.Compare("<", col("l_quantity"), ir.lit_bigint(10))
    plan = P.PhysFilter(P.PhysFilter(P.PhysFilter(scan(), p1), p1), p1)
    out = opt.optimize(plan)  # must not loop forever
    assert isinstance(out, P.PhysFilter)


def test_applied_trace():
    opt = R.IterativeOptimizer()
    p1 = ir.Compare("<", col("l_quantity"), ir.lit_bigint(10))
    opt.optimize(P.PhysFilter(P.PhysFilter(scan(), p1), p1))
    assert "MergeFilters" in opt.applied


def test_tpch_results_unchanged_by_optimizer(tmp_path):
    """Q3/Q10 (limit+sort → TopN fires) bit-exact with rules on vs off."""
    from presto_tpu.exec.runner import LocalRunner
    from presto_tpu.sql.parser import parse
    from presto_tpu.sql.planner.planner import Planner
    from presto_tpu.sql.planner.pruning import prune
    from presto_tpu.tpch.queries import QUERIES

    r = LocalRunner(scale_factor=0.01)
    for qid in (3, 10):
        raw = prune(Planner(0.01).plan(parse(QUERIES[qid])), None)
        want = r.run_physical(raw)
        got = r.run_sql(QUERIES[qid])  # optimizer path
        assert [c.to_pylist() for c in got.columns.values()] == \
            [c.to_pylist() for c in want.columns.values()]
