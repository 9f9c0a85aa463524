"""Native C host kernels: build + bit-exact parity with the numpy paths
(reference analogue: the loader tier is native; parity keeps the
generator spec-faithful regardless of which path runs)."""

import numpy as np
import pytest

from presto_tpu import native
from presto_tpu.tpch.rng import Stream, bounded_int


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C compiler available")


def _numpy_values(stream, n, use_index, first_row):
    from presto_tpu.tpch.rng import _pow_mod, _jump_powers, \
        MULTIPLIER, MODULUS
    base = (stream.seed * _pow_mod(
        MULTIPLIER, first_row * stream.uses_per_row + use_index)) % MODULUS
    jump = _pow_mod(MULTIPLIER, stream.uses_per_row)
    return (base * _jump_powers(jump, n)) % MODULUS


@pytest.mark.parametrize("seed,uses,use_index,first", [
    (1234567, 1, 1, 0), (987654321, 4, 3, 12345), (42, 7, 7, 999999),
])
def test_lcg_values_parity(seed, uses, use_index, first):
    s = Stream(seed, uses)
    want = _numpy_values(s, 5000, use_index, first)
    got = native.lcg_values(seed, uses, use_index, first, 5000)
    np.testing.assert_array_equal(got, want)


def test_lcg_bounded_parity():
    s = Stream(1234567, 2)
    raw = _numpy_values(s, 5000, 1, 77)
    want = bounded_int(raw, 5, 12345)
    got = native.lcg_bounded(1234567, 2, 1, 77, 5000, 5, 12345)
    np.testing.assert_array_equal(got, want)


def test_gather_substrings_parity():
    rng = np.random.default_rng(0)
    pool = rng.integers(32, 127, size=100000).astype(np.uint8)
    offs = rng.integers(0, 90000, size=3000).astype(np.int64)
    lens = rng.integers(1, 44, size=3000).astype(np.int64)
    got = native.gather_substrings(pool, offs, lens, 44)
    idx = offs[:, None] + np.arange(44)[None, :]
    want = np.where(np.arange(44)[None, :] < lens[:, None], pool[idx], 0)
    np.testing.assert_array_equal(got, want.astype(np.uint8))


def test_generator_identical_with_and_without_native(monkeypatch):
    """The lineitem slice is bit-identical through both paths."""
    from presto_tpu.tpch import generator as G
    a = G.generate("lineitem", 0.01, first_row=1000, n_rows=500)
    monkeypatch.setenv("PRESTO_TPU_NATIVE", "0")
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)
    b = G.generate("lineitem", 0.01, first_row=1000, n_rows=500)
    monkeypatch.setattr(native, "_tried", False)
    for c in a.names:
        ca, cb = a.columns[c], b.columns[c]
        np.testing.assert_array_equal(np.asarray(ca.values),
                                      np.asarray(cb.values), err_msg=c)
