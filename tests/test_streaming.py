"""Streaming (slice-at-a-time) aggregation + memory budget tests.

Reference model: grouped-lifespan execution
(``execution/SqlTaskExecution.java:225``) bounds memory by processing one
bucket at a time; ``memory/MemoryPool`` + revocable memory evict under
pressure. Here: the scan is consumed in row-range slices through PARTIAL
aggregation; only ndv-bounded states stay resident, and the device column
cache honors an HBM byte budget with LRU revocation.
"""

import numpy as np
import pandas as pd
import pytest

from presto_tpu.exec.datasource import DataSource
from presto_tpu.exec.runner import LocalRunner
from presto_tpu.exec.streaming import find_streamable_agg
from presto_tpu.tpch.queries import QUERIES
from presto_tpu.utils.memory import MemoryBudgetExceeded, MemoryPool

SF = 0.01


def _norm(df: pd.DataFrame):
    return [tuple(r) for r in df.itertuples(index=False)]


@pytest.fixture(scope="module")
def runner():
    return LocalRunner(scale_factor=SF)


@pytest.mark.parametrize("qid", [1, 6])
def test_streaming_matches_standard(runner, qid):
    ref = runner.run_sql(QUERIES[qid]).to_pandas()
    got = runner.run_sql_streaming(QUERIES[qid], slice_rows=7001).to_pandas()
    pd.testing.assert_frame_equal(got, ref)


def test_streaming_never_materializes_table(runner):
    """The streamed scan path must go through scan_slice, not scan."""
    fresh = LocalRunner(scale_factor=SF)
    fresh.run_sql_streaming(QUERIES[6], slice_rows=10000)
    # nothing cached for lineitem => the whole table never hit the cache
    assert not any(t == "lineitem" for (t, _) in fresh.datasource._cols), \
        "streaming must not cache the scanned table on device"


def test_streaming_group_by_high_ndv(runner):
    """Many groups across many slices merge correctly (eager 8-way merge)."""
    sql = ("select l_orderkey, sum(l_quantity) as q, count(*) as c "
           "from lineitem group by l_orderkey order by l_orderkey limit 50")
    ref = _norm(runner.run_sql(sql).to_pandas())
    got = _norm(runner.run_sql_streaming(sql, slice_rows=3000).to_pandas())
    assert got == ref


def test_streaming_fallback_for_joins(runner):
    """Plans with joins below the agg fall back to the standard path."""
    plan = runner.plan_sql(QUERIES[14])
    assert find_streamable_agg(plan) is None
    ref = _norm(runner.run_sql(QUERIES[14]).to_pandas())
    got = _norm(runner.run_sql_streaming(QUERIES[14]).to_pandas())
    assert got == ref


def test_streaming_fallback_for_distinct(runner):
    sql = "select count(distinct l_suppkey) as d from lineitem"
    plan = runner.plan_sql(sql)
    assert find_streamable_agg(plan) is None


def test_chunked_ingest_bounded_slices():
    """Generator→device ingest in bounded row slices: many small generate
    calls instead of one table-sized host materialization."""
    ds = DataSource(SF, ingest_slice_rows=2000)
    chunk = ds.scan("lineitem", ["l_quantity", "l_orderkey"])
    # slice size is in generator unit rows (order units for lineitem):
    # 15000 units / 2000 per slice = 8 generate calls
    assert ds.ingest_slices >= 8
    ds2 = DataSource(SF)
    whole = ds2.scan("lineitem", ["l_quantity", "l_orderkey"])
    np.testing.assert_array_equal(
        np.asarray(chunk.cols["l_quantity"].values),
        np.asarray(whole.cols["l_quantity"].values))


def test_memory_pool_lru_revocation():
    pool = MemoryPool(budget_bytes=100)
    dropped = []
    pool.reserve("a", 60, revoke=lambda: dropped.append("a"))
    pool.reserve("b", 30, revoke=lambda: dropped.append("b"))
    pool.touch("a")  # b is now LRU
    pool.reserve("c", 30, revoke=lambda: dropped.append("c"))
    assert dropped == ["b"], "LRU entry revoked first, and only as needed"
    assert pool.used <= 100


def test_memory_pool_exhausted_raises():
    pool = MemoryPool(budget_bytes=10)
    pool.reserve("pinned", 8)  # not revocable
    with pytest.raises(MemoryBudgetExceeded):
        pool.reserve("big", 5)


def test_datasource_budget_evicts_and_regenerates():
    """A tight device budget evicts cached columns; a later scan reloads
    them and still returns correct data."""
    ds = DataSource(SF, device_budget_bytes=2 << 20)
    a = ds.scan("lineitem", ["l_quantity"])
    q1 = np.asarray(a.cols["l_quantity"].values).copy()
    # churn the cache with other columns
    ds.scan("lineitem", ["l_extendedprice"])
    ds.scan("orders", ["o_totalprice"])
    b = ds.scan("lineitem", ["l_quantity"])
    np.testing.assert_array_equal(np.asarray(b.cols["l_quantity"].values), q1)
    assert ds.pool.budget == 2 << 20
    assert ds.pool.used <= ds.pool.budget


def test_query_under_memory_budget(runner):
    """A full query works with a budget smaller than the table."""
    ref = _norm(runner.run_sql(QUERIES[6]).to_pandas())
    tight = LocalRunner(scale_factor=SF)
    tight.datasource.pool.budget = 4 << 20
    got = _norm(tight.run_sql(QUERIES[6]).to_pandas())
    assert got == ref


def test_streaming_split_pruning():
    """A filter on the monotone key prunes generator slices entirely
    (TupleDomain → split pruning; reference ConnectorMetadata.applyFilter)."""
    from presto_tpu.exec.runner import LocalRunner
    full = LocalRunner(scale_factor=SF)
    want = _norm(full.run_sql(
        "select o_orderpriority, count(*) c, sum(o_totalprice) s "
        "from orders where o_orderkey between 1000 and 2000 "
        "group by o_orderpriority").to_pandas())
    pruned = LocalRunner(scale_factor=SF)
    got = _norm(pruned.run_sql_streaming(
        "select o_orderpriority, count(*) c, sum(o_totalprice) s "
        "from orders where o_orderkey between 1000 and 2000 "
        "group by o_orderpriority", slice_rows=500).to_pandas())
    assert sorted(map(repr, got)) == sorted(map(repr, want))
    # orders SF0.01 = 15000 units; keys 1000..2000 cover ~250+2 units →
    # at most 2 slices of 500 (vs 30 unpruned)
    assert pruned.datasource.ingest_slices <= 3
