"""Window-function kernels: rank family, offsets, framed aggregates.

The reference's ``operator/WindowOperator.java`` accumulates rows into a
PagesIndex, sorts per partition, then runs per-partition framing row by row
(``operator/window/``).  On TPU the whole table is ONE sort by
(partition, order) keys and every window function becomes a vectorized
prefix computation over the sorted order, scattered back to input order:

- partition boundaries  → flag vector + running "segment start" index
- row_number            → position − partition start + 1
- rank                  → peer-run start − partition start + 1
- dense_rank            → prefix count of peer-run boundaries
- lead/lag              → shifted gather with boundary nulls
- running/total sum,cnt → prefix sums minus partition-start prefix
(min/max full-partition via segment reduce + gather)
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

import jax

from . import agg as A


def _cummax(x):
    return jax.lax.cummax(x)


def make_boundaries(sorted_keys: List[jnp.ndarray],
                    n_partition_keys: int, mask: jnp.ndarray):
    """(part_start[i], peer_start[i]) indices for each sorted position.

    A row starts a new partition when any partition key differs from the
    previous row; it starts a new peer run when any (partition or order)
    key differs."""
    n = mask.shape[0]
    idx = jnp.arange(n, dtype=jnp.int64)
    part_change = jnp.zeros((n,), jnp.bool_).at[0].set(True)
    peer_change = jnp.zeros((n,), jnp.bool_).at[0].set(True)
    for j, k in enumerate(sorted_keys):
        diff = jnp.concatenate([jnp.ones((1,), jnp.bool_),
                                k[1:] != k[:-1]])
        if j < n_partition_keys:
            part_change = part_change | diff
        peer_change = peer_change | diff
    part_start = _cummax(jnp.where(part_change, idx, jnp.int64(-1)))
    peer_start = _cummax(jnp.where(peer_change, idx, jnp.int64(-1)))
    return part_start, peer_start


def row_number(part_start: jnp.ndarray) -> jnp.ndarray:
    n = part_start.shape[0]
    return jnp.arange(n, dtype=jnp.int64) - part_start + 1


def rank(part_start: jnp.ndarray, peer_start: jnp.ndarray) -> jnp.ndarray:
    return peer_start - part_start + 1


def dense_rank(part_start: jnp.ndarray, peer_start: jnp.ndarray) -> jnp.ndarray:
    n = part_start.shape[0]
    idx = jnp.arange(n, dtype=jnp.int64)
    new_peer = (peer_start == idx).astype(jnp.int64)
    cs = jnp.cumsum(new_peer)
    # dense rank = peers seen in this partition up to here
    start_cs = cs[jnp.maximum(part_start, 0)] - new_peer[jnp.maximum(part_start, 0)]
    return cs - start_cs


def peer_ends(peer_start: jnp.ndarray) -> jnp.ndarray:
    """For each sorted position, the last index of its peer run."""
    n = peer_start.shape[0]
    idx = jnp.arange(n, dtype=jnp.int64)
    is_last = jnp.concatenate([peer_start[1:] != peer_start[:-1],
                               jnp.ones((1,), jnp.bool_)])
    marker = jnp.where(is_last, idx, n - 1)
    return jnp.flip(jax.lax.cummin(jnp.flip(marker)))


def partition_counts(part_start: jnp.ndarray) -> jnp.ndarray:
    """Rows in each position's partition (part_end - part_start + 1)."""
    return peer_ends(part_start) - part_start + 1


def percent_rank(part_start, peer_start) -> jnp.ndarray:
    cnt = partition_counts(part_start)
    rk = rank(part_start, peer_start)
    return jnp.where(cnt > 1, (rk - 1).astype(jnp.float64)
                     / jnp.maximum(cnt - 1, 1), 0.0)


def cume_dist(part_start, peer_start) -> jnp.ndarray:
    cnt = partition_counts(part_start)
    pe = peer_ends(peer_start)
    return (pe - part_start + 1).astype(jnp.float64) / jnp.maximum(cnt, 1)


def ntile(part_start, n: jnp.ndarray) -> jnp.ndarray:
    """Equal-height buckets; first (count mod n) buckets one row larger."""
    cnt = partition_counts(part_start)
    rn0 = row_number(part_start) - 1
    nn = jnp.minimum(n, jnp.maximum(cnt, 1))
    small = cnt // nn
    big = cnt % nn
    boundary = big * (small + 1)
    return jnp.where(
        rn0 < boundary,
        rn0 // jnp.maximum(small + 1, 1) + 1,
        big + (rn0 - boundary) // jnp.maximum(small, 1) + 1)


def shift_in_partition(values: jnp.ndarray, part_start: jnp.ndarray,
                       offset: int):
    """lead(+k)/lag(-k): value at position i+offset if same partition,
    else invalid.  Returns (values, valid)."""
    n = values.shape[0]
    idx = jnp.arange(n, dtype=jnp.int64)
    src = idx + offset
    inb = (src >= 0) & (src < n)
    src_c = jnp.clip(src, 0, n - 1)
    same = part_start[src_c] == part_start
    return values[src_c], inb & same


def running_sum(values: jnp.ndarray, part_start: jnp.ndarray,
                mask: jnp.ndarray) -> jnp.ndarray:
    """sum over rows from partition start to current row (RANGE/ROWS
    UNBOUNDED PRECEDING → CURRENT ROW with default peers handling done by
    caller via peer_start gather)."""
    acc = values.dtype if jnp.issubdtype(values.dtype, jnp.floating) \
        else jnp.int64
    v = jnp.where(mask, values, 0).astype(acc)
    cs = jnp.cumsum(v)
    before = jnp.where(part_start > 0, cs[jnp.maximum(part_start - 1, 0)], 0)
    return cs - before


def frame_bounds(part_start: jnp.ndarray, frame) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Clamped [lo, hi] sorted-position bounds of a ROWS frame per row."""
    n = part_start.shape[0]
    idx = jnp.arange(n, dtype=jnp.int64)
    part_end = peer_ends(part_start)

    def edge(spec, default):
        which, k = spec
        if which == "unbounded_preceding":
            return part_start
        if which == "unbounded_following":
            return part_end
        if which == "current":
            return idx
        if which == "preceding":
            return idx - k
        if which == "following":
            return idx + k
        raise ValueError(which)

    lo = jnp.maximum(edge(frame[1], part_start), part_start)
    hi = jnp.minimum(edge(frame[2], part_end), part_end)
    return lo, hi


def _first_geq(sorted_vals: jnp.ndarray, lo0: jnp.ndarray,
               hi0: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Per-row vectorized binary search: first index j in [lo0, hi0] with
    sorted_vals[j] >= target (hi0+1 if none).  sorted_vals must be
    non-decreasing inside each [lo0, hi0] range."""
    n = sorted_vals.shape[0]
    lo = lo0
    hi = hi0 + 1
    steps = max(1, int(np.ceil(np.log2(max(n, 2)))) + 1)
    for _ in range(steps):
        mid = (lo + hi) // 2
        mid_c = jnp.clip(mid, 0, n - 1)
        geq = (sorted_vals[mid_c] >= target) & (mid < hi)
        hi = jnp.where(geq, mid, hi)
        lo = jnp.where(geq | (lo >= hi), lo, jnp.minimum(mid + 1, hi))
    return lo


def range_frame_bounds(part_start: jnp.ndarray, peer_start: jnp.ndarray,
                       order_vals: jnp.ndarray, frame,
                       descending: bool) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[lo, hi] sorted-position bounds of a RANGE (value-offset) frame.

    The reference's RANGE framing (``operator/window/FrameInfo.java`` +
    PagesWindowIndex value comparisons) done as per-row binary searches over
    the partition's sorted order values: k PRECEDING/FOLLOWING are value
    offsets from the current row's order key, CURRENT ROW spans the peer
    run.  A descending order key is negated so one ascending search serves
    both directions."""
    n = part_start.shape[0]
    part_end = peer_ends(part_start)
    v = (-order_vals if descending else order_vals).astype(jnp.int64)
    pe = peer_ends(peer_start)

    def edge(spec, is_start):
        which, k = spec
        if which == "unbounded_preceding":
            return part_start
        if which == "unbounded_following":
            return part_end
        if which == "current":
            return peer_start if is_start else pe
        delta = -k if which == "preceding" else k
        target = v + delta
        if is_start:
            # first position with value >= target
            return _first_geq(v, part_start, part_end, target)
        # last position with value <= target = (first > target) - 1
        return _first_geq(v, part_start, part_end, target + 1) - 1

    lo = jnp.maximum(edge(frame[1], True), part_start)
    hi = jnp.minimum(edge(frame[2], False), part_end)
    return lo, hi


def groups_frame_bounds(part_start: jnp.ndarray, peer_start: jnp.ndarray,
                        frame) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[lo, hi] sorted-position bounds of a GROUPS frame.

    GROUPS offsets count PEER GROUPS (reference ``GroupsFraming``): ``k
    PRECEDING`` starts at the first row of the k-th group before the
    current row's group; CURRENT ROW spans the whole peer group.  Frames
    whose start group lies past the partition's last group (or end before
    its first) come out empty (lo > hi)."""
    n = part_start.shape[0]
    idx = jnp.arange(n, dtype=jnp.int64)
    part_end = peer_ends(part_start)
    pe = peer_ends(peer_start)
    new_peer = peer_start == idx
    gid = jnp.cumsum(new_peer.astype(jnp.int64)) - 1   # global group id
    tgt_idx = jnp.where(new_peer, gid, n)
    gsp = jnp.zeros((n + 1,), jnp.int64).at[tgt_idx].set(idx, mode="drop")
    gep = jnp.zeros((n + 1,), jnp.int64).at[tgt_idx].set(pe, mode="drop")
    first_gid = gid[jnp.maximum(part_start, 0)]
    last_gid = gid[part_end]

    def edge(spec, is_start):
        which, k = spec
        if which == "unbounded_preceding":
            return part_start
        if which == "unbounded_following":
            return part_end
        if which == "current":
            return peer_start if is_start else pe
        delta = -k if which == "preceding" else k
        tgt = gid + delta
        pos = jnp.where(is_start,
                        gsp[jnp.clip(tgt, first_gid, last_gid)],
                        gep[jnp.clip(tgt, first_gid, last_gid)])
        if is_start:
            return jnp.where(tgt > last_gid, part_end + 1, pos)
        return jnp.where(tgt < first_gid, part_start - 1, pos)

    lo = jnp.maximum(edge(frame[1], True), part_start)
    hi = jnp.minimum(edge(frame[2], False), part_end)
    return lo, hi


def kth_nonnull_shift(values: jnp.ndarray, valid: jnp.ndarray,
                      part_start: jnp.ndarray, offset: int):
    """lead/lag IGNORE NULLS: the |offset|-th NON-NULL value after
    (offset>0) / before (offset<0) each sorted position, same partition.
    Returns (values, found)."""
    n = values.shape[0]
    idx = jnp.arange(n, dtype=jnp.int64)
    nn = valid
    cnt = jnp.cumsum(nn.astype(jnp.int64))           # non-nulls ≤ i
    rank = cnt - 1                                    # own rank if nn
    # position of the r-th non-null (global dense table)
    nzpos = jnp.zeros((n + 1,), jnp.int64).at[
        jnp.where(nn, rank, n)].set(idx, mode="drop")
    before_part = jnp.where(part_start > 0,
                            cnt[jnp.maximum(part_start - 1, 0)], 0)
    if offset < 0:                                    # lag: k-th before
        tgt = cnt - nn.astype(jnp.int64) - (-offset) + 1 - 1
        found = tgt >= before_part
    else:                                             # lead: k-th after
        tgt = cnt + offset - 1
        part_end = peer_ends(part_start)
        found = tgt <= cnt[part_end] - 1
    pos = nzpos[jnp.clip(tgt, 0, n)]
    return values[jnp.clip(pos, 0, n - 1)], found


def nonnull_frame_edge(valid: jnp.ndarray, lo: jnp.ndarray,
                       hi: jnp.ndarray, first: bool):
    """Position of the first (or last) NON-NULL row inside [lo, hi]
    (first_value/last_value IGNORE NULLS).  Returns (pos, found)."""
    n = valid.shape[0]
    idx = jnp.arange(n, dtype=jnp.int64)
    nxt = jnp.flip(jax.lax.cummin(jnp.flip(
        jnp.where(valid, idx, n))))                  # next non-null ≥ i
    prv = _cummax(jnp.where(valid, idx, -1))         # prev non-null ≤ i
    if first:
        pos = nxt[jnp.clip(lo, 0, n - 1)]
        return pos, (pos <= hi) & (lo <= hi)
    pos = prv[jnp.clip(hi, 0, n - 1)]
    return pos, (pos >= lo) & (lo <= hi)


def framed_sum(values: jnp.ndarray, mask: jnp.ndarray,
               lo: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    """sum over sorted positions [lo, hi] via prefix sums (exact: clamped
    bounds never cross partition edges)."""
    acc = values.dtype if jnp.issubdtype(values.dtype, jnp.floating) \
        else jnp.int64
    v = jnp.where(mask, values, 0).astype(acc)
    cs = jnp.cumsum(v)
    hi_c = jnp.clip(hi, 0, v.shape[0] - 1)
    upper = jnp.where(hi >= lo, cs[hi_c], 0)
    lower = jnp.where((hi >= lo) & (lo > 0), cs[jnp.maximum(lo - 1, 0)], 0)
    return upper - lower


def segmented_cummin(values: jnp.ndarray, part_start: jnp.ndarray,
                     maximum: bool = False) -> jnp.ndarray:
    """Running min/max from each partition start (segmented prefix scan)."""
    n = values.shape[0]
    idx = jnp.arange(n, dtype=jnp.int64)
    flags = (part_start == idx)

    def combine(a, b):
        af, av = a
        bf, bv = b
        merged = jnp.where(bf, bv,
                           jnp.maximum(av, bv) if maximum
                           else jnp.minimum(av, bv))
        return af | bf, merged

    _, out = jax.lax.associative_scan(combine, (flags, values))
    return out


def partition_total(values: jnp.ndarray, part_start: jnp.ndarray,
                    mask: jnp.ndarray, func: str = "sum"):
    """Full-partition aggregate broadcast to each row (via segment reduce
    keyed on part_start, which is unique per partition)."""
    n = values.shape[0]
    # part ids: compact via part_start (same value for whole partition)
    seg = part_start.astype(jnp.int32)
    cap = n  # part_start < n
    if func == "sum":
        acc = values.dtype if jnp.issubdtype(values.dtype, jnp.floating) \
            else jnp.int64
        tot = A.seg_sum(values, seg, mask, cap, acc)
    elif func == "min":
        tot = A.seg_min(values, seg, mask, cap)
    elif func == "max":
        tot = A.seg_max(values, seg, mask, cap)
    elif func == "count":
        tot = A.seg_count(seg, mask, cap)
    else:
        raise NotImplementedError(func)
    return tot[seg]
