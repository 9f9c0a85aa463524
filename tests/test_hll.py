"""HyperLogLog approx_distinct: error bounds, merge semantics, SQL paths.

Reference behavior: ``ApproximateCountDistinctAggregation`` (airlift HLL,
default standard error 2.3%)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from presto_tpu.ops import hll as HLL
from presto_tpu.ops.hashing import hash_keys


def _est(values):
    h = hash_keys([jnp.asarray(values, jnp.int64)])
    mask = jnp.ones((len(values),), jnp.bool_)
    return int(HLL.estimate(HLL.global_state(h, mask)))


@pytest.mark.parametrize("n", [0, 1, 10, 100, 5000, 200_000])
def test_error_bound(n):
    """|est − n| within ~4 standard errors (1.04/sqrt(2048) ≈ 2.3%)."""
    vals = np.arange(n, dtype=np.int64) * 7919 + 13
    est = _est(vals)
    tol = max(4 * 0.023 * n, 2)
    assert abs(est - n) <= tol, (n, est)


def test_duplicates_dont_inflate():
    vals = np.tile(np.arange(1000, dtype=np.int64), 50)  # 50k rows, 1k dv
    est = _est(vals)
    assert abs(est - 1000) <= 100


def test_merge_equals_union():
    """state(A) ⊕ state(B) == state(A ∪ B) — the property that makes the
    sketch distribute as partial→final."""
    a = np.arange(0, 3000, dtype=np.int64)
    b = np.arange(1500, 6000, dtype=np.int64)  # overlapping
    ha = hash_keys([jnp.asarray(a)])
    hb = hash_keys([jnp.asarray(b)])
    sa = HLL.global_state(ha, jnp.ones(len(a), jnp.bool_))
    sb = HLL.global_state(hb, jnp.ones(len(b), jnp.bool_))
    merged = HLL.merge(sa, sb)
    hu = hash_keys([jnp.asarray(np.concatenate([a, b]))])
    su = HLL.global_state(hu, jnp.ones(len(a) + len(b), jnp.bool_))
    assert np.array_equal(np.asarray(merged), np.asarray(su))
    assert abs(int(HLL.estimate(merged)) - 6000) <= 4 * 0.023 * 6000


@pytest.fixture(scope="module")
def runner():
    from presto_tpu.exec.runner import LocalRunner
    return LocalRunner(scale_factor=0.01)


@pytest.fixture(scope="module")
def dist_runner():
    from presto_tpu.parallel import distributed as D
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    return D.DistributedRunner(D.make_mesh(), 0.01)


def test_sql_global_and_grouped(runner):
    got = runner.run_sql(
        "select approx_distinct(o_custkey) ad, "
        "count(distinct o_custkey) cd from orders").to_pandas()
    ad, cd = int(got.ad[0]), int(got.cd[0])
    assert abs(ad - cd) <= 0.05 * cd + 2


def test_sql_distributed_matches_local_estimate(runner, dist_runner):
    """The distributed partial→final HLL merge must give EXACTLY the same
    estimate as the local path (identical registers, identical hash)."""
    sql = ("select o_orderpriority, approx_distinct(o_custkey) ad "
           "from orders group by o_orderpriority order by o_orderpriority")
    loc = runner.run_sql(sql).to_pandas()
    dist = dist_runner.run_sql(sql).to_pandas()
    assert loc.ad.tolist() == dist.ad.tolist()


def test_sql_distributed_global(runner, dist_runner):
    sql = "select approx_distinct(o_custkey) ad from orders"
    loc = runner.run_sql(sql).to_pandas()
    dist = dist_runner.run_sql(sql).to_pandas()
    assert int(loc.ad[0]) == int(dist.ad[0])
