"""Pallas kernel tests (interpreter mode on CPU; hardware runs via bench)."""

import numpy as np
import jax.numpy as jnp
import pytest

from presto_tpu.ops import pallas_kernels as PK
from presto_tpu.ops import hashtable as HT
from presto_tpu.ops.hashing import hash_keys


def test_masked_sum():
    rng = np.random.default_rng(0)
    v = rng.integers(-10**9, 10**9, size=20000).astype(np.int64)
    m = rng.random(20000) < 0.4
    got = int(PK.masked_sum(jnp.asarray(v), jnp.asarray(m), interpret=True))
    assert got == int(v[m].sum())


def test_sorted_probe_lower_bound():
    """The VMEM binary-search kernel returns numpy-searchsorted positions
    (including negative keys: signed-hi/unsigned-lo word comparison)."""
    rng = np.random.default_rng(1)
    skeys = np.sort(rng.integers(-10**12, 10**12, size=500).astype(np.int64))
    probe = np.concatenate([
        rng.choice(skeys, 300), rng.integers(-2 * 10**12, 2 * 10**12, 200)
    ]).astype(np.int64)
    got = np.asarray(PK.sorted_probe(
        jnp.asarray(skeys), jnp.asarray(probe), len(skeys), interpret=True))
    want = np.searchsorted(skeys, probe, side="left")
    np.testing.assert_array_equal(got, want)


@pytest.fixture
def pallas_interpret():
    PK.configure("interpret")
    yield
    PK.configure("off")


def test_lookup_dispatches_to_pallas(pallas_interpret):
    """hashtable.lookup dispatches to the VMEM kernel when the tier is on
    (single int key, table within VMEM budget) and agrees with the XLA
    binary-search path."""
    rng = np.random.default_rng(2)
    build = jnp.asarray(rng.choice(10**5, size=700, replace=False)
                        .astype(np.int64))
    probe = jnp.asarray(rng.integers(0, 10**5, size=3000).astype(np.int64))
    mask = jnp.asarray(rng.random(3000) < 0.9)
    cap = HT.capacity_for(700)
    table = HT.build([build], jnp.ones(700, bool), cap)
    got = np.asarray(HT.lookup(table, [probe], mask))
    PK.configure("off")
    want = np.asarray(HT.lookup(table, [probe], mask))
    np.testing.assert_array_equal(got, want)


def test_query_results_identical_with_pallas_tier(pallas_interpret):
    """End-to-end: a join + a selective global agg produce identical results
    with the Pallas tier enabled (exercises lookup + g_sum dispatch)."""
    import jax
    jax.config.update("jax_enable_x64", True)
    from presto_tpu.exec.runner import LocalRunner
    from presto_tpu.tpch.queries import QUERIES

    r = LocalRunner(scale_factor=0.01)
    q6 = r.run_sql(QUERIES[6])
    q4 = r.run_sql(QUERIES[4])
    PK.configure("off")
    r2 = LocalRunner(scale_factor=0.01)
    assert [c.to_pylist() for c in q6.columns.values()] == \
        [c.to_pylist() for c in r2.run_sql(QUERIES[6]).columns.values()]
    assert [c.to_pylist() for c in q4.columns.values()] == \
        [c.to_pylist() for c in r2.run_sql(QUERIES[4]).columns.values()]
