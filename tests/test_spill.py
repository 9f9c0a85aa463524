"""Partition-at-a-time execution under an operator-state memory budget.

The HBM-tier redesign of the reference's spill machinery: a join/agg whose
working set exceeds the MemoryPool budget hash-partitions its inputs and
processes one partition at a time (``spiller/GenericPartitioningSpiller``,
``HashBuilderOperator`` SPILLING_INPUT, ``PartitionedConsumption``,
``SpillableHashAggregationBuilder`` roles)."""

import numpy as np
import pytest

from presto_tpu.exec.runner import LocalRunner

SF = 0.01

JOIN_SQL = """
 select c.c_nationkey, count(o.o_orderkey) c, sum(o.o_totalprice) s
 from customer c join orders o on c.c_custkey = o.o_custkey
 group by c.c_nationkey
"""

EXPAND_SQL = """
 select o_orderpriority, count(*) c from orders o, customer c
 where o.o_custkey = c.c_custkey and c.c_nationkey < 7
 group by o_orderpriority
"""

LEFT_SQL = """
 select c.c_custkey, count(o.o_orderkey) c from customer c
 left join orders o on c.c_custkey = o.o_custkey
 where c.c_custkey <= 200 group by c.c_custkey
"""

SEMI_SQL = """
 select count(*) from customer c where exists (
   select * from orders o where o.o_custkey = c.c_custkey
   and o.o_totalprice > 1000.00)
"""


@pytest.fixture(scope="module")
def free():
    return LocalRunner(scale_factor=SF)


@pytest.fixture(scope="module")
def tight():
    # ~600 KB: below the join working set at SF0.01 but big enough for
    # every single scan column — forces the partitioned path
    return LocalRunner(scale_factor=SF, device_budget_bytes=600 << 10)


@pytest.mark.parametrize("sql", [JOIN_SQL, EXPAND_SQL, LEFT_SQL, SEMI_SQL])
def test_budgeted_matches_free(free, tight, sql):
    exp = free.run_sql(sql, fused=False).to_pandas()
    got = tight.run_sql(sql, fused=False).to_pandas()

    def norm(df):
        return sorted(repr(tuple(t)) for t in df.itertuples(index=False))

    assert norm(got) == norm(exp)


def test_partitioned_path_taken(tight):
    tight.ctx.spill_partitions = 0
    tight.run_sql(JOIN_SQL, fused=False)
    assert tight.ctx.spill_partitions >= 2, \
        "budget should have forced partition-at-a-time execution"


def test_free_path_not_partitioned(free):
    free.ctx.spill_partitions = 0
    free.run_sql(JOIN_SQL, fused=False)
    assert free.ctx.spill_partitions == 0


SORT_SQL = """
 select o_orderkey, o_totalprice from orders
 where o_custkey <= 600 order by o_totalprice desc, o_orderkey
"""


def test_sort_spill_ordered(free, tight):
    exp = free.run_sql(SORT_SQL, fused=False).to_pandas()
    tight.ctx.spill_partitions = 0
    got = tight.run_sql(SORT_SQL, fused=False).to_pandas()
    # ORDER-sensitive comparison: partition-order concat must be the
    # globally sorted sequence
    assert got.o_orderkey.tolist() == exp.o_orderkey.tolist()
    assert got.o_totalprice.tolist() == exp.o_totalprice.tolist()
    assert tight.ctx.spill_partitions >= 2


def test_fused_budget_fallback_q18():
    """Round-5: the fused single-program lowering consults XLA's compiled
    memory analysis against the device budget and falls back to the
    operator path (whose partition-at-a-time tiers spill) instead of
    OOMing — the q18-SF10 crash shape (VERDICT r4 missing #1)."""
    from presto_tpu.exec.runner import LocalRunner
    from presto_tpu.tpch.queries import QUERIES

    small = LocalRunner(scale_factor=0.01, device_budget_bytes=6_000_000)
    got = small.run_sql(QUERIES[18]).to_pandas()
    assert small.ctx.spill_partitions > 0  # partitioned tier engaged
    free = LocalRunner(scale_factor=0.01)
    exp = free.run_sql(QUERIES[18]).to_pandas()
    import pandas as pd
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  exp.reset_index(drop=True))
