"""Int128 kernels vs exact Python integers (VERDICT r1 item 9; reference:
``spi/type/Decimals.java`` rounding, ``spi/block/Int128ArrayBlock``)."""

import numpy as np
import pytest

import jax.numpy as jnp

from presto_tpu.ops import int128 as I

M128 = 1 << 128
HALF = 1 << 127


def to_signed128(x):
    x %= M128
    return x - M128 if x >= HALF else x


def from_py(vals):
    """Python ints → (hi, lo) int64 arrays."""
    hi = np.array([to_signed64((v % M128) >> 64) for v in vals], np.int64)
    lo = np.array([to_signed64(v % (1 << 64)) for v in vals], np.int64)
    return jnp.asarray(hi), jnp.asarray(lo)


def to_signed64(x):
    x %= 1 << 64
    return x - (1 << 64) if x >= (1 << 63) else x


def to_py(hi, lo):
    return [int(h) * (1 << 64) + (int(v) % (1 << 64))
            for h, v in zip(np.asarray(hi), np.asarray(lo))]


RNG = np.random.default_rng(0)


def rand128(n, bits=126):
    return [int(RNG.integers(-2**62, 2**62)) * int(RNG.integers(0, 2**63))
            + int(RNG.integers(-2**62, 2**62)) for _ in range(n)] + \
        [0, 1, -1, 2**64, -2**64, 2**64 - 1, -(2**64 - 1), 2**95 + 12345,
         -(2**95 + 12345), (1 << bits) - 1, -(1 << bits)]


def test_add_sub_neg():
    a = rand128(50)
    b = rand128(50)
    ah, al = from_py(a)
    bh, bl = from_py(b)
    assert to_py(*I.add(ah, al, bh, bl)) == \
        [to_signed128(x + y) for x, y in zip(a, b)]
    assert to_py(*I.sub(ah, al, bh, bl)) == \
        [to_signed128(x - y) for x, y in zip(a, b)]
    assert to_py(*I.neg(ah, al)) == [to_signed128(-x) for x in a]


def test_compare():
    a = rand128(50)
    b = rand128(50)
    b[:10] = a[:10]  # equal pairs
    ah, al = from_py(a)
    bh, bl = from_py(b)
    for op, f in [("=", lambda x, y: x == y), ("<", lambda x, y: x < y),
                  ("<=", lambda x, y: x <= y), (">", lambda x, y: x > y),
                  (">=", lambda x, y: x >= y), ("<>", lambda x, y: x != y)]:
        got = np.asarray(I.cmp(op, ah, al, bh, bl))
        exp = np.array([f(x, y) for x, y in zip(a, b)])
        assert (got == exp).all(), op


def test_mul_i64():
    a = rand128(40, bits=60)
    m = [int(RNG.integers(-10**18, 10**18)) for _ in a]
    ah, al = from_py(a)
    got = to_py(*I.mul_i64(ah, al, jnp.asarray(np.array(m, np.int64))))
    assert got == [to_signed128(x * y) for x, y in zip(a, m)]


def test_mul_128x128():
    a = rand128(40, bits=62)
    b = rand128(40, bits=62)
    ah, al = from_py(a)
    bh, bl = from_py(b)
    got = to_py(*I.mul(ah, al, bh, bl))
    assert got == [to_signed128(x * y) for x, y in zip(a, b)]


def _half_up(n, d):
    q, r = divmod(abs(n), abs(d))
    q += 1 if 2 * r >= abs(d) else 0
    return -q if (n < 0) != (d < 0) else q


def test_div_round_half_up():
    n = rand128(60)
    d = [x if x != 0 else 7 for x in rand128(60)]
    RNG.shuffle(d)
    d = [x if x != 0 else 3 for x in d]
    nh, nl = from_py(n)
    dh, dl = from_py(d)
    got = to_py(*I.div_round_half_up(nh, nl, dh, dl))
    assert got == [_half_up(x, y) for x, y in zip(n, d)]


def test_div_exact_halves():
    n = [5, -5, 7, -7, 2**100 + 1, -(2**100 + 1)]
    d = [2, 2, 2, 2, 2, 2]
    got = to_py(*I.div_round_half_up(*from_py(n), *from_py(d)))
    assert got == [3, -3, 4, -4, _half_up(2**100 + 1, 2),
                   -_half_up(2**100 + 1, 2)]


def test_rescale():
    vals = [123456789, -123456789, 10**30, -(10**30), 5, -5, 449, -451]
    h, l = from_py(vals)
    up = to_py(*I.rescale(h, l, 2, 6))
    assert up == [v * 10**4 for v in vals]
    down = to_py(*I.rescale(h, l, 4, 2))
    assert down == [_half_up(v, 100) for v in vals]
    far = to_py(*I.rescale(h, l, 0, 20))
    assert far == [to_signed128(v * 10**20) for v in vals]


def test_seg_sum128_from_i64():
    n, cap = 5000, 8
    vals = RNG.integers(-2**62, 2**62, size=n)
    group = RNG.integers(0, cap, size=n).astype(np.int32)
    mask = RNG.random(n) < 0.9
    hi, lo = I.seg_sum128_from_i64(jnp.asarray(vals), jnp.asarray(group),
                                   jnp.asarray(mask), cap)
    got = to_py(hi, lo)
    exp = [sum(int(v) for v, g, m in zip(vals, group, mask)
               if m and g == s) for s in range(cap)]
    assert got == exp, "int64 sums must not wrap in 128-bit accumulation"


def test_seg_sum128_from_i128():
    n, cap = 500, 4
    vals = rand128(n - 11)
    vals += [0] * (n - len(vals))
    group = RNG.integers(0, cap, size=n).astype(np.int32)
    mask = np.ones(n, bool)
    packed = I.pack(*from_py(vals))
    hi, lo = I.seg_sum128_from_i128(packed, jnp.asarray(group),
                                    jnp.asarray(mask), cap)
    exp = [to_signed128(sum(v for v, g in zip(vals, group) if g == s))
           for s in range(cap)]
    assert to_py(hi, lo) == exp


def test_g_sum128():
    vals = RNG.integers(-2**62, 2**62, size=1000)
    mask = RNG.random(1000) < 0.8
    hi, lo = I.g_sum128_from_i64(jnp.asarray(vals), jnp.asarray(mask))
    assert to_py(hi[None], lo[None])[0] == \
        sum(int(v) for v, m in zip(vals, mask) if m)
    v128 = rand128(200)
    m2 = np.ones(len(v128), bool)
    hi2, lo2 = I.g_sum128_from_i128(I.pack(*from_py(v128)), jnp.asarray(m2))
    assert to_py(hi2[None], lo2[None])[0] == to_signed128(sum(v128))


def test_sort_keys_order():
    vals = sorted(rand128(80))
    h, l = from_py(vals)
    k1, k2 = I.sort_keys(h, l)
    import numpy as _np
    perm = _np.lexsort((_np.asarray(k2), _np.asarray(k1)))
    assert list(perm) == list(range(len(vals)))


def test_to_host_ints_and_f64():
    vals = rand128(30)
    packed = I.pack(*from_py(vals))
    assert list(I.to_host_ints(packed)) == vals
    f = np.asarray(I.to_f64(*from_py(vals)))
    exp = np.array([float(v) for v in vals])
    assert np.allclose(f, exp, rtol=1e-12)
