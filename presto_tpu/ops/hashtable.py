"""Vectorized open-addressing hash table over device arrays.

The TPU-native redesign of the reference's two hash-table kernels:

- ``operator/join/PagesHash.java:35``   (join build: linear probe, power-of-2
  capacity, murmur finalizer, duplicate chains via PositionLinks)
- ``operator/MultiChannelGroupByHash.java:55`` (group-by: open addressing,
  ``putIfAbsent:281``)

Both are scalar row-at-a-time loops there; here insertion is a data-parallel
fixpoint: every pending row scatter-min-races for its slot, winners claim it,
losers with equal keys adopt it, others advance to the next slot — all rows
advance together per round, so the number of rounds is the longest probe
sequence (O(log N) at load factor ≤ 1/2), not O(N).  Rows with equal keys
follow identical probe paths, which guarantees one slot per distinct key.
Duplicate build rows are organized into CSR "position links" with one stable
argsort instead of per-row chain updates.

Everything is jit-compatible with static shapes: `capacity` is a static
power of two; row validity is a mask.
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple, Sequence

import jax
import jax.numpy as jnp

from .hashing import hash_keys

import numpy as np

EMPTY = np.int32(2**31 - 1)  # slot-owner sentinel: no row claimed


class HashTable(NamedTuple):
    """Device hash table: slot -> representative build row (+ CSR links)."""

    owner: jnp.ndarray      # int32 [capacity]: row id of slot's first key, or EMPTY
    keys: List[jnp.ndarray]  # build key columns [N] (referenced, not copied)
    slot_of_row: jnp.ndarray  # int32 [N]: slot of each (masked-in) build row, -1 else
    counts: jnp.ndarray     # int32 [capacity]: rows per slot
    offsets: jnp.ndarray    # int32 [capacity]: CSR start per slot
    rows_csr: jnp.ndarray   # int32 [N]: build row ids grouped by slot

    @property
    def capacity(self) -> int:
        return self.owner.shape[0]


def _keys_equal(keys: Sequence[jnp.ndarray], rows_a, rows_b):
    eq = jnp.bool_(True)
    for k in keys:
        eq = eq & (k[rows_a] == k[rows_b])
    return eq


def insert(keys: Sequence[jnp.ndarray], mask: jnp.ndarray, capacity: int):
    """Assign one slot per distinct key.

    Returns (owner[capacity], slot_of_row[N], overflow): ``owner[s]`` is the
    lowest row id holding slot ``s``'s key (EMPTY if unused);
    ``slot_of_row[i]`` is the slot of row i's key (-1 for masked-out rows).
    ``overflow`` (bool scalar) is set when the table filled before all rows
    settled — the caller retries with doubled capacity (the shape-bucketing
    answer to ``MultiChannelGroupByHash.java:364`` rehash()).
    """
    n = keys[0].shape[0]
    cap_mask = jnp.uint32(capacity - 1)
    h = (hash_keys(keys) & cap_mask).astype(jnp.int32)
    rowid = jnp.arange(n, dtype=jnp.int32)

    owner0 = jnp.full((capacity,), EMPTY, dtype=jnp.int32)
    slot0 = h
    assigned0 = jnp.full((n,), -1, dtype=jnp.int32)
    pending0 = mask
    # Round budget: at load <= 1/2 with murmur-mixed hashes the longest
    # probe path is O(log n) whp, so a generous logarithmic budget settles
    # every row; when the table overflows, unsettleable rows would otherwise
    # spin for `capacity` O(n) rounds (minutes) before reporting — instead
    # exit early and let the caller's overflow-retry regrow the table.
    max_rounds = jnp.int32(min(capacity + 1,
                               96 + 16 * max(capacity.bit_length(), 1)))

    def cond(state):
        _, _, _, pending, rounds = state
        return pending.any() & (rounds < max_rounds)

    def body(state):
        owner, assigned, slot, pending, rounds = state
        # Only rows at a currently-empty slot race to claim it (a claimed
        # slot must never be re-claimed by a lower row id of another key).
        racing = pending & (owner[slot] == EMPTY)
        idx = jnp.where(racing, slot, capacity)  # OOB drops non-racers
        owner = owner.at[idx].min(jnp.where(racing, rowid, EMPTY), mode="drop")
        occ = owner[slot]
        won = pending & (occ == rowid)
        adopt = pending & ~won & (occ != EMPTY) & _keys_equal(
            keys, jnp.minimum(occ, n - 1), rowid)
        settled = won | adopt
        assigned = jnp.where(settled, slot, assigned)
        pending = pending & ~settled
        slot = jnp.where(pending, (slot + 1) & jnp.int32(capacity - 1), slot)
        return owner, assigned, slot, pending, rounds + 1

    owner, assigned, _, pending, _ = jax.lax.while_loop(
        cond, body, (owner0, assigned0, slot0, pending0, jnp.int32(0)))
    return owner, assigned, pending.any()


def lookup(table_owner: jnp.ndarray, build_keys: Sequence[jnp.ndarray],
           probe_keys: Sequence[jnp.ndarray], probe_mask: jnp.ndarray):
    """Find the slot of each probe key in a built table (no insertion).

    Returns slot[N_probe] int32, -1 where the key is absent or masked out.
    Linear probing stops at the first empty slot (no deletions ever happen).
    """
    capacity = table_owner.shape[0]
    n_build = build_keys[0].shape[0]
    h = (hash_keys(probe_keys) & jnp.uint32(capacity - 1)).astype(jnp.int32)

    # Pallas tier: single integer key + table small enough to pin in VMEM
    # (owner + key lo/hi words resident across the whole probe stream).
    from . import pallas_kernels as PK
    if (PK.enabled() and len(build_keys) == 1
            and build_keys[0].ndim == 1
            and jnp.issubdtype(build_keys[0].dtype, jnp.integer)
            and PK.LANES <= capacity <= PK.MAX_VMEM_TABLE_SLOTS):
        slot_keys = build_keys[0][jnp.minimum(table_owner, n_build - 1)]
        res = PK.hash_probe(table_owner, slot_keys,
                            probe_keys[0].astype(jnp.int64), h,
                            interpret=PK._interpret())
        return jnp.where(probe_mask, res, jnp.int32(-1))

    max_rounds = jnp.int32(capacity + 1)  # full sweep ⇒ key definitely absent

    def cond(state):
        _, _, pending, rounds = state
        return pending.any() & (rounds < max_rounds)

    def body(state):
        slot, result, pending, rounds = state
        occ = table_owner[slot]
        empty = occ == EMPTY
        occ_c = jnp.minimum(occ, n_build - 1)
        eq = jnp.bool_(True)
        for bk, pk in zip(build_keys, probe_keys):
            eq = eq & (bk[occ_c] == pk)
        found = pending & ~empty & eq
        missing = pending & empty
        result = jnp.where(found, slot, result)
        pending = pending & ~found & ~missing
        slot = jnp.where(pending, (slot + 1) & jnp.int32(capacity - 1), slot)
        return slot, result, pending, rounds + 1

    _, result, _, _ = jax.lax.while_loop(
        cond, body, (h, jnp.full_like(h, -1), probe_mask, jnp.int32(0)))
    return result


def build(keys: Sequence[jnp.ndarray], mask: jnp.ndarray, capacity: int) -> HashTable:
    """Build a join hash table with CSR duplicate links.

    Replaces ``PagesHash`` + ``ArrayPositionLinks``: one insert fixpoint,
    one segment count, one stable argsort.
    """
    n = keys[0].shape[0]
    owner, slot_of_row, _ = insert(keys, mask, capacity)
    slot_cl = jnp.where(slot_of_row >= 0, slot_of_row, capacity)
    counts = jnp.zeros((capacity,), jnp.int32).at[slot_cl].add(
        jnp.int32(1), mode="drop")
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)[:-1]])
    # stable sort by slot groups duplicate rows contiguously in row order
    rows_csr = jnp.argsort(slot_cl, stable=True).astype(jnp.int32)
    return HashTable(owner, list(keys), slot_of_row, counts, offsets, rows_csr)


def probe_unique(table: HashTable, probe_keys: Sequence[jnp.ndarray],
                 probe_mask: jnp.ndarray):
    """Probe assuming build keys are unique (PK side of a FK join).

    Returns (build_row[N_probe] int32 with -1 = no match).  This is the fast
    path for every PK–FK join in TPC-H: output shape == probe shape, fully
    static — the TPU answer to the reference's per-row join loop
    (``operator/join/DefaultPageJoiner.java:265``).
    """
    slot = lookup(table.owner, table.keys, probe_keys, probe_mask)
    return jnp.where(slot >= 0, table.owner[jnp.maximum(slot, 0)], -1)


def probe_counts(table: HashTable, probe_keys: Sequence[jnp.ndarray],
                 probe_mask: jnp.ndarray):
    """Per-probe-row match count (for two-pass expanding joins)."""
    slot = lookup(table.owner, table.keys, probe_keys, probe_mask)
    cnt = jnp.where(slot >= 0, table.counts[jnp.maximum(slot, 0)], 0)
    return slot, cnt.astype(jnp.int32)


@partial(jax.jit, static_argnames=("out_size", "left"))
def expand_matches(table: HashTable, slot: jnp.ndarray, cnt: jnp.ndarray,
                   out_size: int, left: bool = False,
                   probe_mask: jnp.ndarray = None):
    """Second pass of an expanding join: materialize (probe_row, build_row)
    pairs into a padded [out_size] buffer.

    ``out_size`` must be >= the effective pair count (host reads the count
    between passes — where the reference pages join output we bucket-pad).
    With ``left=True``, unmatched (but masked-in) probe rows emit one filler
    pair with ``matched=False`` (FULL/PROBE_OUTER semantics of
    ``operator/join/LookupJoinOperatorFactory.java:52``).
    Returns (probe_row, build_row, valid, matched), all [out_size].
    """
    if left:
        assert probe_mask is not None
        cnt_eff = jnp.where(probe_mask & (cnt == 0), 1, cnt)
    else:
        cnt_eff = cnt
    ends = jnp.cumsum(cnt_eff)
    starts = ends - cnt_eff
    total = ends[-1] if cnt_eff.shape[0] else jnp.int32(0)
    j = jnp.arange(out_size, dtype=ends.dtype)
    probe_row = jnp.searchsorted(ends, j, side="right").astype(jnp.int32)
    probe_cl = jnp.minimum(probe_row, cnt.shape[0] - 1)
    k = j - starts[probe_cl]
    s = jnp.maximum(slot[probe_cl], 0)
    build_row = table.rows_csr[
        jnp.minimum(table.offsets[s] + k.astype(jnp.int32),
                    table.rows_csr.shape[0] - 1)]
    valid = j < total
    matched = valid & (cnt[probe_cl] > 0)
    return (jnp.where(valid, probe_cl, 0),
            jnp.where(matched, build_row, 0),
            valid, matched)


def next_pow2(n: int) -> int:
    c = 1
    while c < n:
        c <<= 1
    return c


def capacity_for(n_keys: int, load: float = 0.5) -> int:
    """Power-of-2 capacity at fill factor <= load (PagesHash uses 0.75;
    we default to 0.5 to shorten vectorized probe fixpoints)."""
    return max(8, next_pow2(int(n_keys / load) + 1))
