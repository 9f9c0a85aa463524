"""Grouped/global aggregation kernels: masked segment reductions.

Replaces the reference's accumulator framework
(``operator/aggregation/AccumulatorCompiler.java`` — per-function generated
classes updating BigArray state row-at-a-time): here every aggregate is a
masked scatter-reduce into a [capacity] state array, one fused XLA op per
aggregate.  Each function defines the same lifecycle as the reference's
partial/final steps (``sql/planner/plan/AggregationNode.java`` Step):
input→state (this module), state⊕state (sum over partials — same kernels),
state→output (finalization, e.g. avg = sum/count).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

I64_MAX = np.int64(2**63 - 1)
I64_MIN = np.int64(-(2**63))


def _scatter_idx(group: jnp.ndarray, mask: jnp.ndarray, capacity: int):
    """Group ids with masked-out rows redirected out of bounds (dropped)."""
    return jnp.where(mask & (group >= 0), group, capacity)


def seg_sum(values, group, mask, capacity, dtype=None):
    dtype = dtype or values.dtype
    out = jnp.zeros((capacity,), dtype)
    return out.at[_scatter_idx(group, mask, capacity)].add(
        values.astype(dtype), mode="drop")


def seg_count(group, mask, capacity):
    out = jnp.zeros((capacity,), jnp.int64)
    return out.at[_scatter_idx(group, mask, capacity)].add(
        jnp.int64(1), mode="drop")


def seg_min(values, group, mask, capacity):
    init = I64_MAX if jnp.issubdtype(values.dtype, jnp.integer) else jnp.inf
    out = jnp.full((capacity,), init, values.dtype)
    return out.at[_scatter_idx(group, mask, capacity)].min(values, mode="drop")


def seg_max(values, group, mask, capacity):
    init = I64_MIN if jnp.issubdtype(values.dtype, jnp.integer) else -jnp.inf
    out = jnp.full((capacity,), init, values.dtype)
    return out.at[_scatter_idx(group, mask, capacity)].max(values, mode="drop")


def seg_any(flags, group, mask, capacity):
    out = jnp.zeros((capacity,), jnp.bool_)
    return out.at[_scatter_idx(group, mask & flags, capacity)].set(
        True, mode="drop")


# --- global (no group-by) variants: one-slot reductions ---

def g_sum(values, mask, dtype=None):
    dtype = dtype or values.dtype
    return jnp.sum(jnp.where(mask, values, 0).astype(dtype))


def g_count(mask):
    return jnp.sum(mask.astype(jnp.int64))


def g_min(values, mask):
    init = I64_MAX if jnp.issubdtype(values.dtype, jnp.integer) else jnp.inf
    return jnp.min(jnp.where(mask, values, init))


def g_max(values, mask):
    init = I64_MIN if jnp.issubdtype(values.dtype, jnp.integer) else -jnp.inf
    return jnp.max(jnp.where(mask, values, init))
