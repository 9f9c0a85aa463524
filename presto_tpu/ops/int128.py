"""Int128 arithmetic over paired int64 device arrays (hi, lo).

The TPU answer to the reference's long decimals
(``core/trino-spi/.../spi/type/Decimals.java``, storage
``spi/block/Int128ArrayBlock.java``): a DECIMAL(p>18) column stores its
unscaled value as ``values[N, 2]`` = (hi word signed, lo word as a 64-bit
pattern), two's complement.  All kernels are elementwise jnp ops — no
custom lowering needed; XLA already emulates int64 on TPU as 32-bit pairs,
and these routines extend the same trick one level up.

Unsigned helpers operate on int64 bit patterns (JAX uint64 churns through
dtype promotion rules; flipping the sign bit turns signed compares into
unsigned ones, and int64 add/sub/shift are wrapping, which is exactly
two's-complement multiword arithmetic).

Rounding matches Trino: HALF_UP = round half away from zero
(``Decimals.java``)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

I64Pair = Tuple[jnp.ndarray, jnp.ndarray]

SIGN = np.int64(-2**63)
M32 = np.int64(0xFFFFFFFF)


def _i64(x):
    return jnp.asarray(x, jnp.int64)


def ult(a, b):
    """Unsigned < over int64 bit patterns."""
    return (a ^ SIGN) < (b ^ SIGN)


def uge(a, b):
    return ~ult(a, b)


def lshr(x, k):
    """Logical (zero-fill) right shift of an int64 bit pattern; k may be a
    static int or a traced array in [0, 63]."""
    if isinstance(k, int):
        if k == 0:
            return x
        return (x >> k) & np.int64((1 << (64 - k)) - 1)
    half = (x >> 1) & np.int64(2**63 - 1)  # logical shift by one
    return jnp.where(k == 0, x, half >> jnp.maximum(k - 1, 0))


def from_i64(x) -> I64Pair:
    x = _i64(x)
    return x >> 63, x  # sign extension


def pack(hi, lo) -> jnp.ndarray:
    """(hi, lo) → values array [..., 2] (column storage layout)."""
    return jnp.stack([_i64(hi), _i64(lo)], axis=-1)


def unpack(v: jnp.ndarray) -> I64Pair:
    return v[..., 0], v[..., 1]


def add(ahi, alo, bhi, blo) -> I64Pair:
    lo = alo + blo  # wrapping
    carry = ult(lo, alo).astype(jnp.int64)
    return ahi + bhi + carry, lo


def neg(hi, lo) -> I64Pair:
    return ~hi + (lo == 0).astype(jnp.int64), -lo


def sub(ahi, alo, bhi, blo) -> I64Pair:
    return add(ahi, alo, *neg(bhi, blo))


def shl(hi, lo, k: int) -> I64Pair:
    """Left shift by a static 0 <= k < 64."""
    if k == 0:
        return hi, lo
    return (hi << k) | lshr(lo, 64 - k), lo << k


def abs128(hi, lo) -> I64Pair:
    n = hi < 0
    nhi, nlo = neg(hi, lo)
    return jnp.where(n, nhi, hi), jnp.where(n, nlo, lo)


def eq(ahi, alo, bhi, blo):
    return (ahi == bhi) & (alo == blo)


def lt(ahi, alo, bhi, blo):
    """Signed int128 <."""
    return (ahi < bhi) | ((ahi == bhi) & ult(alo, blo))


def cmp(op: str, ahi, alo, bhi, blo):
    if op == "=":
        return eq(ahi, alo, bhi, blo)
    if op == "<>":
        return ~eq(ahi, alo, bhi, blo)
    if op == "<":
        return lt(ahi, alo, bhi, blo)
    if op == ">":
        return lt(bhi, blo, ahi, alo)
    if op == "<=":
        return ~lt(bhi, blo, ahi, alo)
    if op == ">=":
        return ~lt(ahi, alo, bhi, blo)
    raise ValueError(op)


def umul64(a, b) -> I64Pair:
    """Full 64×64→128 product of unsigned bit patterns (32-bit limbs)."""
    a0, a1 = a & M32, lshr(a, 32)
    b0, b1 = b & M32, lshr(b, 32)
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = lshr(p00, 32) + (p01 & M32) + (p10 & M32)  # <= 3*(2^32-1): exact
    lo = (p00 & M32) | (mid << 32)
    hi = p11 + lshr(p01, 32) + lshr(p10, 32) + lshr(mid, 32)
    return hi, lo


def mul_i64(ahi, alo, m) -> I64Pair:
    """(signed int128) × (signed int64), low 128 bits (wrapping — callers
    guarantee the true product fits DECIMAL(38)).

    a = ahi·2^64 + u(alo) exactly (two's complement), m = u(m) − 2^64·[m<0],
    so mod 2^128: hi = umul_hi(alo,m) + ahi·m − [m<0]·alo."""
    m = _i64(m)
    hi_c, lo = umul64(alo, m)
    hi = hi_c + ahi * m - jnp.where(m < 0, alo, jnp.int64(0))
    return hi, lo


def mul(ahi, alo, bhi, blo) -> I64Pair:
    """int128 × int128, low 128 bits (wrapping).

    a·b = (ahi·2^64 + u(alo))(bhi·2^64 + u(blo)); mod 2^128 the cross terms
    reduce to wrapping int64 products (x·u(y) ≡ x·y mod 2^64)."""
    hi_c, lo = umul64(alo, blo)
    hi = hi_c + ahi * blo + alo * bhi
    return hi, lo


def udivmod(nhi, nlo, dhi, dlo):
    """Unsigned 128/128 long division (bit-serial shift-subtract, 128
    rounds — used on group-count-sized arrays where it is negligible).
    Returns (q_hi, q_lo, r_hi, r_lo).  Divisor must be nonzero."""
    zero = jnp.zeros_like(nhi)

    def body(i, st):
        qh, ql, rh, rl = st
        k = jnp.int64(127) - i
        bit = jnp.where(k >= 64,
                        lshr(nhi, jnp.maximum(k - 64, 0)) & 1,
                        lshr(nlo, jnp.minimum(k, 63)) & 1)
        rh = (rh << 1) | lshr(rl, 63)
        rl = (rl << 1) | bit
        ge = uge(rh, dhi) & ((rh != dhi) | uge(rl, dlo))
        rh2, rl2 = sub(rh, rl, dhi, dlo)
        rh = jnp.where(ge, rh2, rh)
        rl = jnp.where(ge, rl2, rl)
        g = ge.astype(jnp.int64)
        qh = qh | jnp.where(k >= 64, g << jnp.minimum(
            jnp.maximum(k - 64, 0), 63), zero)
        ql = ql | jnp.where(k < 64, g << jnp.minimum(k, 63), zero)
        return qh, ql, rh, rl

    return jax.lax.fori_loop(
        jnp.int64(0), jnp.int64(128), body, (zero, zero, zero, zero))


def div_round_half_up(nhi, nlo, dhi, dlo) -> I64Pair:
    """Signed int128 / int128, rounded half away from zero
    (``Decimals.java`` HALF_UP).  Divisor zero → caller masks validity
    (we substitute 1 to keep the kernel total)."""
    dz = eq(dhi, dlo, jnp.zeros_like(dhi), jnp.zeros_like(dlo))
    dhi = jnp.where(dz, jnp.int64(0), dhi)
    dlo = jnp.where(dz, jnp.int64(1), dlo)
    s = (nhi < 0) ^ (dhi < 0)
    nh, nl = abs128(nhi, nlo)
    dh, dl = abs128(dhi, dlo)
    qh, ql, rh, rl = udivmod(nh, nl, dh, dl)
    r2h, r2l = shl(rh, rl, 1)
    up = uge(r2h, dh) & ((r2h != dh) | uge(r2l, dl))
    qh, ql = add(qh, ql, jnp.zeros_like(qh), up.astype(jnp.int64))
    nqh, nql = neg(qh, ql)
    return jnp.where(s, nqh, qh), jnp.where(s, nql, ql)


POW10 = [10**i for i in range(19)]


def rescale(hi, lo, from_scale: int, to_scale: int) -> I64Pair:
    """Decimal rescale in int128; scale-down is HALF_UP."""
    if to_scale == from_scale:
        return hi, lo
    k = abs(to_scale - from_scale)
    while k > 18:
        hi, lo = rescale(hi, lo, 0, 18 if to_scale > from_scale else -18)
        k -= 18
    if to_scale > from_scale:
        return mul_i64(hi, lo, np.int64(POW10[k]))
    return div_round_half_up(hi, lo, *from_i64(jnp.full_like(hi, POW10[k])))


def to_f64(hi, lo) -> jnp.ndarray:
    # value = (hi + [lo<0])·2^64 + signed(lo): keeps |addends| small near
    # zero (u(lo) form cancels catastrophically for tiny negatives)
    hi_adj = hi + (lo < 0).astype(jnp.int64)
    return hi_adj.astype(jnp.float64) * 2.0**64 + lo.astype(jnp.float64)


def to_i64_saturate(hi, lo) -> jnp.ndarray:
    """Low word when the value fits int64 (callers guarantee range, e.g.
    avg of int64-ranged inputs)."""
    return lo


def sort_keys(hi, lo):
    """Two int64 keys whose (signed, signed) lexicographic order equals
    signed int128 order: hi signed as-is, lo's sign bit flipped (unsigned
    order ≡ signed order after the flip)."""
    return [hi, lo ^ SIGN]


# ------------------------------------------------- segment / global sums

def seg_sum128_from_i64(values, group, mask, capacity):
    """Σ int64 addends per group, exact in int128: 32-bit limb split, two
    int64 segment sums (safe for <2^31 rows/group), recombine.
    Returns (hi[capacity], lo[capacity])."""
    from . import agg as A
    v = _i64(values)
    lo_limb = v & M32              # [0, 2^32)
    hi_limb = v >> 32              # signed
    L = A.seg_sum(lo_limb, group, mask, capacity, jnp.int64)
    H = A.seg_sum(hi_limb, group, mask, capacity, jnp.int64)
    return add(*shl(*from_i64(H), 32), *from_i64(L))


def seg_sum128_from_i128(vals2d, group, mask, capacity):
    """Σ int128 addends ([N,2]) per group: four 32-bit limb sums."""
    from . import agg as A
    hi, lo = unpack(vals2d)
    l0 = lo & M32
    l1 = lshr(lo, 32)
    h0 = hi & M32
    h1 = hi >> 32  # signed top limb
    S = [A.seg_sum(x, group, mask, capacity, jnp.int64)
         for x in (l0, l1, h0, h1)]
    r = from_i64(S[0])
    r = add(*r, *shl(*from_i64(S[1]), 32))
    # limb-2/3 contributions live entirely in the hi word (wrapping)
    hi_part = S[2] + (S[3] << 32)
    return add(*r, hi_part, jnp.zeros_like(hi_part))


def g_sum128_from_i64(values, mask):
    v = jnp.where(mask, _i64(values), 0)
    L = jnp.sum(v & M32)
    H = jnp.sum(v >> 32)
    return add(*shl(*from_i64(H), 32), *from_i64(L))


def g_sum128_from_i128(vals2d, mask):
    hi, lo = unpack(vals2d)
    z = jnp.int64(0)
    sel = lambda x: jnp.where(mask, x, z)  # noqa: E731
    S = [jnp.sum(sel(x)) for x in
         (lo & M32, lshr(lo, 32), hi & M32, hi >> 32)]
    r = from_i64(S[0])
    r = add(*r, *shl(*from_i64(S[1]), 32))
    hi_part = S[2] + (S[3] << 32)
    return add(*r, hi_part, jnp.zeros_like(hi_part))


# ------------------------------------------------- min/max reductions
#
# int128 order == lexicographic (hi signed, lo unsigned): reduce the hi
# word first, then the lo word among rows tied at the extreme hi.

def g_min128(vals2d, mask):
    hi, lo = unpack(vals2d)
    lo_u = lo ^ SIGN  # unsigned order as signed ints
    h = jnp.min(jnp.where(mask, hi, np.int64(2**63 - 1)))
    tied = mask & (hi == h)
    l = jnp.min(jnp.where(tied, lo_u, np.int64(2**63 - 1)))
    return h, l ^ SIGN


def g_max128(vals2d, mask):
    hi, lo = unpack(vals2d)
    lo_u = lo ^ SIGN
    h = jnp.max(jnp.where(mask, hi, SIGN))
    tied = mask & (hi == h)
    l = jnp.max(jnp.where(tied, lo_u, SIGN))
    return h, l ^ SIGN


def seg_min128(vals2d, group, mask, capacity):
    from . import agg as A
    hi, lo = unpack(vals2d)
    lo_u = lo ^ SIGN
    h = A.seg_min(hi, group, mask, capacity)
    tied = mask & (hi == h[jnp.maximum(group, 0)])
    l = A.seg_min(lo_u, group, tied, capacity)
    return h, l ^ SIGN


def seg_max128(vals2d, group, mask, capacity):
    from . import agg as A
    hi, lo = unpack(vals2d)
    lo_u = lo ^ SIGN
    h = A.seg_max(hi, group, mask, capacity)
    tied = mask & (hi == h[jnp.maximum(group, 0)])
    l = A.seg_max(lo_u, group, tied, capacity)
    return h, l ^ SIGN


# ------------------------------------------------- host conversion

def to_host_ints(values2d) -> np.ndarray:
    """[N,2] device/host array → 1-D object array of exact python ints."""
    a = np.asarray(values2d)
    hi = a[..., 0].astype(object)
    lo = a[..., 1].astype(object)
    lo_u = np.where(a[..., 1] < 0, lo + 2**64, lo)
    return hi * 2**64 + lo_u
