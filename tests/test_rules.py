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


def _join(kind="inner", unique=False, best=100.0, pest=1000.0):
    probe = P.PhysScan("orders", ("o_orderkey", "o_custkey"))
    build = P.PhysScan("customer", ("c_custkey", "c_name"))
    return P.PhysHashJoin(
        probe=probe, build=build,
        probe_keys=(col("o_custkey"),), build_keys=(col("c_custkey"),),
        kind=kind, unique_build=unique,
        build_payload=(("c_custkey", "c_custkey"), ("c_name", "c_name")),
        build_est=best, probe_est=pest)


def test_push_filter_through_join_probe_side():
    pred = ir.Compare("<", col("o_orderkey"), ir.lit_bigint(10))
    out = R.optimize(P.PhysFilter(_join(), pred))
    j = out if isinstance(out, P.PhysHashJoin) else out.child
    assert isinstance(j, P.PhysHashJoin)
    assert isinstance(j.probe, P.PhysFilter)  # conjunct sank to probe


def test_push_filter_through_join_build_side_inner_only():
    pred = ir.Compare("<", col("c_custkey"), ir.lit_bigint(10))
    out = R.optimize(P.PhysFilter(_join("inner"), pred))
    j = out if isinstance(out, P.PhysHashJoin) else out.child
    assert isinstance(j.build, P.PhysFilter)
    # LEFT join: build-side conjunct must NOT push below the join
    out = R.optimize(P.PhysFilter(_join("left"), pred))
    assert isinstance(out, P.PhysFilter)
    assert not isinstance(out.child.build, P.PhysFilter)


def test_flip_join_to_smaller_build():
    # build est 1000 >= 2×100 probe est, payload covers all build cols
    j = _join(best=1000.0, pest=100.0)
    out = R.optimize(j)
    assert isinstance(out, P.PhysHashJoin)
    assert out.build.table == "orders"      # flipped: smaller side hashes?
    assert out.probe.table == "customer"
    assert out.build_est == 100.0
    assert {o for o, _ in out.build_payload} == {"o_orderkey", "o_custkey"}
    # no flip when estimates are close
    j2 = _join(best=150.0, pest=100.0)
    assert R.optimize(j2).build.table == "customer"
    # no flip for unique-build (planner's PK choice stands)
    j3 = _join(unique=True, best=1000.0, pest=100.0)
    assert R.optimize(j3).build.table == "customer"


def test_determine_join_distribution_rule():
    from presto_tpu.sql.planner.distribution import add_exchanges
    out = add_exchanges(_join(best=5000.0), broadcast_row_limit=1000)
    assert out.dist_type == "partitioned"
    out2 = add_exchanges(_join(best=500.0), broadcast_row_limit=1000)
    assert out2.dist_type == "replicated"


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


def test_dp_join_order_q5_matches_results():
    """Memo-based join reordering (ReorderJoins analogue): the DP order
    must reproduce the oracle result on a 6-relation query and choose a
    bounded-cost order (no cross products)."""
    from presto_tpu.exec.runner import LocalRunner
    from presto_tpu.tpch.queries import QUERIES

    r = LocalRunner(scale_factor=0.01)
    got = r.run_sql(QUERIES[5]).to_pandas()
    import tpch_oracle as O
    exp = O.q5(0.01)
    assert len(got) == len(exp)
    assert got.iloc[:, 0].tolist() == exp.iloc[:, 0].tolist()


def test_dp_join_order_prefers_selective_dimension():
    """A selective dimension-filtered join must be applied before the
    unselective fact-fact join (Cout minimization)."""
    from presto_tpu.sql.parser import parse
    from presto_tpu.sql.planner.planner import Planner
    import presto_tpu.exec.physical as P

    # orders x lineitem x (region-filtered) customer-like chain: the
    # optimal order filters orders by customer first
    plan = Planner(0.1).plan(parse("""
        select count(*) c from customer, orders, lineitem
        where c_custkey = o_custkey and o_orderkey = l_orderkey
          and c_mktsegment = 'BUILDING'"""))

    # walk: the innermost (first) join must involve customer (the
    # selective side), not lineitem-orders
    joins = []

    def walk(n):
        if isinstance(n, P.PhysHashJoin):
            joins.append(n)
        for ch in n.__dict__.values():
            if isinstance(ch, P.PhysOp):
                walk(ch)
            elif isinstance(ch, tuple):
                for c in ch:
                    if isinstance(c, P.PhysOp):
                        walk(c)

    walk(plan)
    assert len(joins) == 2
    # deepest join (planned first) carries the customer scan on a side
    deepest = joins[-1]

    def tables(n, acc):
        if isinstance(n, P.PhysScan):
            acc.add(n.table)
        for ch in n.__dict__.values():
            if isinstance(ch, P.PhysOp):
                tables(ch, acc)
            elif isinstance(ch, tuple):
                for c in ch:
                    if isinstance(c, P.PhysOp):
                        tables(c, acc)
        return acc

    assert "customer" in tables(deepest, set())
