"""TupleDomain extraction (DomainTranslator analogue) + distributed
dynamic filtering."""

import numpy as np
import pytest

import jax

from presto_tpu.data import types as T
from presto_tpu.sql import ir
from presto_tpu.sql.planner import domains as DOM


def col(n):
    return ir.ColumnRef(n, T.BIGINT)


def lit(v):
    return ir.Literal(v, T.BIGINT)


def test_extract_comparisons():
    d = DOM.extract(ir.and_(
        ir.Compare(">=", col("x"), lit(10)),
        ir.Compare("<", col("x"), lit(20)),
        ir.Compare("=", col("y"), lit(5))))
    assert d["x"].lo == 10 and d["x"].hi == 19
    assert d["y"].in_set == frozenset([5])


def test_extract_between_inlist_or():
    d = DOM.extract(ir.Between(col("x"), lit(3), lit(7)))
    assert (d["x"].lo, d["x"].hi) == (3, 7)
    d = DOM.extract(ir.InList(col("k"), (1, 5, 9)))
    assert d["k"].in_set == frozenset([1, 5, 9])
    assert (d["k"].lo, d["k"].hi) == (1, 9)
    d = DOM.extract(ir.or_(
        ir.Compare("=", col("x"), lit(1)),
        ir.Compare("=", col("x"), lit(8))))
    assert d["x"].in_set == frozenset([1, 8])
    # OR with a branch that doesn't constrain x: x unconstrained
    d = DOM.extract(ir.or_(
        ir.Compare("=", col("x"), lit(1)),
        ir.Compare("=", col("y"), lit(2))))
    assert "x" not in d and "y" not in d


def test_contradiction_and_flip():
    d = DOM.extract(ir.and_(
        ir.Compare("<", col("x"), lit(1)),
        ir.Compare(">", col("x"), lit(2))))
    assert d["x"].none
    d = DOM.extract(ir.Compare("<", lit(5), col("x")))  # 5 < x ⇔ x > 5
    assert d["x"].lo == 6


def test_row_range_mapping():
    # monotone key 1..100 over 100 rows; domain [41, 60] → ~20-row slice
    rr = DOM.row_range_for(DOM.Domain(41, 60), 1, 100, 100)
    first, count = rr
    assert first <= 40 and first + count >= 60
    assert count <= 25
    assert DOM.row_range_for(DOM.Domain(), 1, 100, 100) is None
    assert DOM.row_range_for(DOM.Domain(none=True), 1, 100, 100) == (0, 0)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs mesh")
def test_distributed_dynamic_filter_correct():
    """Queries whose build side covers a narrow key range stay bit-exact
    with the pre-exchange dynamic filter active."""
    from presto_tpu.exec.runner import LocalRunner
    from presto_tpu.parallel import distributed as D
    sql = ("select c.c_nationkey, count(*) c from customer c "
           "join nation n on c.c_nationkey = n.n_nationkey "
           "where n.n_regionkey = 2 group by c.c_nationkey")
    loc = LocalRunner(scale_factor=0.01).run_sql(sql).to_pandas()
    dist = D.DistributedRunner(D.make_mesh(), 0.01).run_sql(sql).to_pandas()
    key = lambda df: sorted(map(tuple, df.values.tolist()))  # noqa: E731
    assert key(dist) == key(loc)
