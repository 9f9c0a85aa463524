"""Dense HyperLogLog sketches as device register arrays.

The mergeable-state answer to the reference's approx_distinct
(``operator/aggregation/ApproximateCountDistinctAggregation.java``, backed
by airlift-stats HLL): registers are int8 arrays — ``[m]`` for a global
aggregate, ``[capacity, m]`` per group — built with one segment
scatter-max, merged with elementwise max (so PARTIAL→FINAL distribution
and any collective reduction are trivial), and estimated with the
standard bias-corrected harmonic mean + linear-counting small-range and
32-bit large-range corrections.

Default ``m = 2048`` registers mirrors the reference's default standard
error (1.04/sqrt(2048) ≈ 2.3%, ``ApproximateCountDistinctAggregation``'s
DEFAULT_STANDARD_ERROR = 0.023).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

P_DEFAULT = 11               # 2^11 = 2048 registers ⇒ ~2.3% std error
M_DEFAULT = 1 << P_DEFAULT


def _index_rho(h: jnp.ndarray, p: int):
    """Register index (low p bits) + rank of first set bit in the rest.

    ``h`` is a uint32 hash (ops.hashing murmur mix).  rho ∈ [1, 33-p]."""
    m = 1 << p
    idx = (h & jnp.uint32(m - 1)).astype(jnp.int32)
    w = (h >> p).astype(jnp.uint32)        # (32-p)-bit remainder
    clz = jax.lax.clz(w.astype(jnp.int32)) # leading zeros in 32-bit word
    rho = (clz - p + 1).astype(jnp.int8)   # w==0 → clz=32 → rho = 33-p
    return idx, rho


def global_state(h: jnp.ndarray, mask: jnp.ndarray,
                 p: int = P_DEFAULT) -> jnp.ndarray:
    """Registers [m] int8 of the masked rows' hashes."""
    m = 1 << p
    idx, rho = _index_rho(h, p)
    tgt = jnp.where(mask, idx, m)
    return jnp.zeros((m,), jnp.int8).at[tgt].max(rho, mode="drop")


def group_state(h: jnp.ndarray, slot: jnp.ndarray, mask: jnp.ndarray,
                capacity: int, p: int = P_DEFAULT) -> jnp.ndarray:
    """Per-group registers [capacity, m] int8 (one segment scatter-max).

    ``slot`` is each row's group slot (−1 = no group)."""
    m = 1 << p
    idx, rho = _index_rho(h, p)
    ok = mask & (slot >= 0)
    tgt = jnp.where(ok, slot * m + idx, capacity * m)
    flat = jnp.zeros((capacity * m,), jnp.int8).at[tgt].max(rho, mode="drop")
    return flat.reshape(capacity, m)


def merge(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """HLL union: elementwise register max."""
    return jnp.maximum(a, b)


def seg_merge(states: jnp.ndarray, slot: jnp.ndarray, mask: jnp.ndarray,
              capacity: int) -> jnp.ndarray:
    """Merge per-row register vectors [n, m] into [capacity, m] by group
    slot (the FINAL-step state⊕state over an exchange)."""
    n, m = states.shape
    tgt = jnp.where(mask & (slot >= 0), slot, capacity)
    out = jnp.zeros((capacity, m), jnp.int8)
    return out.at[tgt].max(states, mode="drop")


def estimate(regs: jnp.ndarray) -> jnp.ndarray:
    """Registers [..., m] → distinct-count estimate (int64, rounded).

    Bias-corrected E = alpha_m·m²/Σ2^(−reg); linear counting below 2.5m
    when empty registers remain; 32-bit-hash large-range correction."""
    m = regs.shape[-1]
    alpha = 0.7213 / (1.0 + 1.079 / m)
    s = jnp.sum(jnp.exp2(-regs.astype(jnp.float64)), axis=-1)
    e = alpha * m * m / s
    zeros = jnp.sum((regs == 0).astype(jnp.int32), axis=-1)
    lc = m * jnp.log(m / jnp.maximum(zeros, 1).astype(jnp.float64))
    est = jnp.where((e <= 2.5 * m) & (zeros > 0), lc, e)
    two32 = jnp.float64(2.0 ** 32)
    est = jnp.where(est > two32 / 30.0,
                    -two32 * jnp.log1p(-est / two32), est)
    return jnp.round(est).astype(jnp.int64)
