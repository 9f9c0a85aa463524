"""Mergeable quantile sketch: per-group bottom-k priority sampling.

The reference's approx_percentile carries a qdigest/tdigest state
(``operator/aggregation/ApproximateLongPercentileAggregations.java``,
airlift qdigest) — a pointer-chasing tree, hostile to the VPU.  The
TPU-native state is a BOTTOM-K SAMPLE: every row gets a uniform hash
priority; a group's state is the k rows with smallest priority (a
uniform sample without replacement).  Merging two states is exact —
bottom-k of the union = bottom-k of the concatenation — so the state
rides the partial→final exchange like any sum.  Quantile error is
O(1/sqrt(k)); when a group has ≤ k rows the sample is the whole group
and the estimate is EXACT (nearest-rank), which also makes the
distributed result bit-equal to the exact local path at test scales.

Layouts (all static): values [capacity, k] in the argument's dtype,
priorities [capacity, k] int64 (+MAX = empty), counts [capacity] int64.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .hashing import hash_keys
from .hashtable import run_bounds

P_EMPTY = np.int64(2**62)   # empty-entry priority sentinel
DEFAULT_K = 8192


def k_for(capacity: int) -> int:
    """Sample size bounded so the state stays ≲64 MB per aggregate."""
    return max(256, min(DEFAULT_K, (1 << 22) // max(capacity, 1)))


def select_bottom_k(values: jnp.ndarray, prio: jnp.ndarray,
                    slot: jnp.ndarray, mask: jnp.ndarray,
                    capacity: int, k: int):
    """Per-group k smallest-priority entries.

    One stable sort by (group, priority) + boundary scatter — the same
    sort-based shape as ``hashtable.insert``.  Returns
    (vals [capacity,k], prio [capacity,k], counts [capacity])."""
    n = values.shape[0]
    gkey = jnp.where(mask & (slot >= 0), slot.astype(jnp.int32),
                     jnp.int32(capacity))
    pr = jnp.where(mask & (slot >= 0), prio.astype(jnp.int64), P_EMPTY)
    out = jax.lax.sort((gkey, pr, values), num_keys=2, is_stable=True)
    gk, ps, vs = out
    valid = gk < capacity
    newrun = valid & jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), gk[1:] != gk[:-1]])
    lo, hi = run_bounds(gk, newrun, valid, capacity)
    pos = jnp.arange(n, dtype=jnp.int32) - lo[jnp.minimum(gk, capacity - 1)]
    keep = valid & (pos < k)
    g = jnp.where(keep, gk, capacity)
    p = jnp.clip(pos, 0, k - 1)
    vals_m = jnp.zeros((capacity, k), values.dtype).at[g, p].set(
        vs, mode="drop")
    prio_m = jnp.full((capacity, k), P_EMPTY, jnp.int64).at[g, p].set(
        ps, mode="drop")
    counts = (hi - lo).astype(jnp.int64)
    return vals_m, prio_m, counts


def group_state(values: jnp.ndarray, slot: jnp.ndarray,
                mask: jnp.ndarray, capacity: int, k: int):
    """PARTIAL step: fresh priorities from (value bits, row index)."""
    n = values.shape[0]
    bits = values.astype(jnp.int64) if not jnp.issubdtype(
        values.dtype, jnp.floating) else \
        jax.lax.bitcast_convert_type(values.astype(jnp.float64), jnp.int64)
    prio = hash_keys([bits, jnp.arange(n, dtype=jnp.int64)]) \
        .astype(jnp.int64)
    return select_bottom_k(values, prio, slot, mask, capacity, k)


def merge_states(vals: jnp.ndarray, prio: jnp.ndarray, cnt: jnp.ndarray,
                 slot: jnp.ndarray, mask: jnp.ndarray, capacity: int):
    """FINAL step: rows carry [k]-entry partial states; flatten to
    entries and re-select bottom-k per destination group.  Counts sum."""
    r, k = vals.shape
    ev = vals.reshape(r * k)
    ep = prio.reshape(r * k)
    es = jnp.repeat(slot, k)
    em = jnp.repeat(mask, k) & (ep < P_EMPTY)
    mv, mp, _ = select_bottom_k(ev, ep, es, em, capacity, k)
    from . import agg as A
    mc = A.seg_sum(cnt, slot, mask, capacity, jnp.int64)
    return mv, mp, mc


def estimate(vals: jnp.ndarray, prio: jnp.ndarray, cnt: jnp.ndarray,
             q: float):
    """Nearest-rank quantile of each group's sample (matches the exact
    path's rule when the sample covers the whole group)."""
    k = vals.shape[1]
    big = (jnp.iinfo(jnp.int64).max if not jnp.issubdtype(
        vals.dtype, jnp.floating) else jnp.inf)
    ns = jnp.minimum(cnt, k)
    sv = jnp.sort(jnp.where(prio < P_EMPTY, vals, big), axis=1)
    idx = jnp.clip(jnp.ceil(q * ns.astype(jnp.float64)).astype(jnp.int64)
                   - 1, 0, k - 1)
    out = jnp.take_along_axis(sv, idx[:, None], axis=1)[:, 0]
    return out, ns > 0
