"""Sort-based group/join tables over device arrays.

The TPU-native redesign of the reference's two hash-table kernels:

- ``operator/join/PagesHash.java:35``   (join build: linear probe, power-of-2
  capacity, murmur finalizer, duplicate chains via PositionLinks)
- ``operator/MultiChannelGroupByHash.java:55`` (group-by: open addressing,
  ``putIfAbsent:281``)

Both are scalar row-at-a-time loops there.  Round 2 replaced them with a
data-parallel scatter-race fixpoint; hardware measurement (TPU v5e, 6M
rows) showed XLA lowers the colliding scatters to ~0.5 Mrows/s — three
orders of magnitude off the sort unit.  This round's design uses the
TPU's fast primitives only — sort, cumsum, gather, searchsorted:

- ``insert`` (group-ids): stable lexicographic sort of the key columns
  (valid rows first), run-boundary detection, prefix-sum → DENSE group
  ids in [0, G).  One extra argsort inverts the permutation.  ~100 ms at
  6M rows vs 10.9 s for the fixpoint.
- ``build`` (join table): the same sort; the sorted order IS the CSR
  layout (rows of one key are contiguous, in row order, because the
  sort is stable), so "position links" cost nothing extra.
- probing: vectorized LEXICOGRAPHIC BINARY SEARCH over the sorted key
  columns — log2(N) rounds of gathers, no scatter, no data-dependent
  loop trips.  Works for any key arity; no hash collisions exist at all.

"Slots" are dense run ids in [0, capacity): ``owner[g]`` is the lowest
row id of group g (EMPTY beyond G), ``slot_of_row[i]`` its group id (-1
masked-out).  ``capacity`` stays a static power of two; ``overflow``
fires when G > capacity and the caller's retry logic regrows, exactly
like the fixpoint's contract (``MultiChannelGroupByHash.java:364``).
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple, Sequence

import jax
import jax.numpy as jnp

import numpy as np

EMPTY = np.int32(2**31 - 1)  # slot-owner sentinel: no row claimed


class HashTable(NamedTuple):
    """Device join table: dense key-runs over a sorted row permutation."""

    owner: jnp.ndarray      # int32 [capacity]: lowest row id per run, EMPTY beyond
    keys: List[jnp.ndarray]  # build key columns [N] (original row order)
    slot_of_row: jnp.ndarray  # int32 [N]: run id of each masked-in row, -1 else
    counts: jnp.ndarray     # int32 [capacity]: rows per run
    offsets: jnp.ndarray    # int32 [capacity]: CSR start per run
    rows_csr: jnp.ndarray   # int32 [N]: build row ids grouped by run (sorted perm)
    sorted_keys: List[jnp.ndarray]  # key columns in sorted order [N]
    run_of_pos: jnp.ndarray  # int32 [N]: run id at each sorted position
    n_valid: jnp.ndarray    # int64 scalar: count of masked-in build rows

    @property
    def capacity(self) -> int:
        return self.owner.shape[0]


def narrow_keys(keys: Sequence[jnp.ndarray]) -> list:
    """Split int64 key columns into order-preserving int32 word pairs.

    The VPU is natively 32-bit: lax.sort over 2k int32 operands beats k
    int64 operands (hardware-measured 1.25-1.5x at 6M rows,
    ``docs/PERF_width.json``).  hi = signed high word; lo = low word with
    the sign bit flipped so signed int32 order == unsigned low-word order.
    Equality is preserved exactly, so grouping, run detection, and the
    merged-rank lower bounds all work on the narrowed columns.  Keys
    already <= 32-bit pass through as int32.

    DEFAULT OFF after an A/B on hardware: the isolated 2-key int32
    lax.sort beats 1-key int64 by 1.47x, but in the REAL kernels the
    split arithmetic + doubled equality compares + extra sentinel
    selects give it back (insert 95 vs 90 ms, build 514 vs 461 ms at
    6M rows) — enable with PRESTO_TPU_NARROW_KEYS=1 to re-test on
    future hardware/XLA versions.
    """
    import os
    if os.environ.get("PRESTO_TPU_NARROW_KEYS", "0") == "0":
        return [k.astype(jnp.int64) for k in keys]
    out = []
    for k in keys:
        if k.dtype in (jnp.int32, jnp.uint8, jnp.int8, jnp.int16,
                       jnp.bool_):
            out.append(k.astype(jnp.int32))
            continue
        k = k.astype(jnp.int64)
        hi = (k >> 32).astype(jnp.int32)
        lo = (k & jnp.int64(0xFFFFFFFF)).astype(jnp.uint32)
        out.append(hi)
        out.append((lo ^ jnp.uint32(0x80000000)).astype(jnp.int32))
    return out


def _sort_rows(keys: Sequence[jnp.ndarray], mask: jnp.ndarray):
    """Stable variadic sort: valid rows first, then lexicographic by key
    columns.  Returns (valid_sorted, keys_sorted, perm).  One lax.sort
    carries the permutation as payload — sorting then gathering each
    column separately costs ~100 ms per 6M-row int64 gather on TPU."""
    n = keys[0].shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    nk = narrow_keys(keys)
    ops = ((~mask).astype(jnp.int32), *nk, iota)
    out = jax.lax.sort(ops, num_keys=1 + len(nk), is_stable=True)
    return out[0] == 0, list(out[1:-1]), out[-1]


def _run_starts(keys_sorted: Sequence[jnp.ndarray], mask_sorted):
    """bool [N]: position starts a new (valid) key run."""
    n = mask_sorted.shape[0]
    diff = jnp.zeros((n,), jnp.bool_).at[0].set(True)
    for k in keys_sorted:
        diff = diff | jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), k[1:] != k[:-1]])
    return mask_sorted & diff


def run_bounds(gid_sorted: jnp.ndarray, newrun: jnp.ndarray,
               valid_sorted: jnp.ndarray, capacity: int):
    """(starts, ends) int32 [capacity] of each dense-id run in a sorted id
    array; zero-length beyond the last id.  Scatter at run boundaries —
    O(1) per row; jnp.searchsorted would cost ~0.7 µs/slot on TPU (it
    lowers to a serial scan, measured 4 s for 6M queries)."""
    n = gid_sorted.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    is_end = valid_sorted & jnp.concatenate(
        [newrun[1:] | ~valid_sorted[1:], jnp.ones((1,), jnp.bool_)])
    gid_cl = jnp.minimum(gid_sorted, capacity)  # ids ≥ capacity dropped
    s_idx = jnp.where(newrun, gid_cl, capacity)
    e_idx = jnp.where(is_end, gid_cl, capacity)
    starts = jnp.zeros((capacity,), jnp.int32).at[s_idx].set(
        pos, mode="drop")
    ends = jnp.zeros((capacity,), jnp.int32).at[e_idx].set(
        pos + 1, mode="drop")
    return starts, ends


def insert(keys: Sequence[jnp.ndarray], mask: jnp.ndarray, capacity: int):
    """Assign one dense id per distinct key (sort → runs → prefix-sum).

    Returns (owner[capacity], slot_of_row[N], overflow): ``owner[g]`` is
    the lowest row id holding group ``g``'s key (EMPTY if unused);
    ``slot_of_row[i]`` is row i's group id (-1 for masked-out rows);
    ``overflow`` is set when more than ``capacity`` distinct keys exist
    (ids ≥ capacity are dropped by the segment kernels' OOB handling and
    the caller retries with a grown capacity).
    """
    n = keys[0].shape[0]
    if n == 0:
        return (jnp.full((capacity,), EMPTY, jnp.int32),
                jnp.zeros((0,), jnp.int32), jnp.bool_(False))
    sm, ks, perm = _sort_rows(keys, mask)
    newrun = _run_starts(ks, sm)
    gid_sorted = (jnp.cumsum(newrun.astype(jnp.int32)) - 1)
    total = jnp.where(sm.any(), gid_sorted[-1] + 1, 0)
    # inverse permutation applied directly: row → group id (unique-index
    # scatter; cheaper than argsort-invert + gather)
    slot_of_row = jnp.zeros((n,), jnp.int32).at[perm].set(
        jnp.where(sm, gid_sorted, -1))
    starts, _ = run_bounds(gid_sorted, newrun, sm, capacity)
    owner = jnp.where(jnp.arange(capacity) < total,
                      perm[starts].astype(jnp.int32), EMPTY)
    overflow = total > capacity
    return owner, slot_of_row, overflow


def _lex_search(sorted_keys: Sequence[jnp.ndarray],
                probe_keys: Sequence[jnp.ndarray],
                n_valid) -> jnp.ndarray:
    """First sorted position in [0, n_valid) whose key tuple >= probe
    (vectorized lexicographic binary search; log2(N) gather rounds)."""
    n = sorted_keys[0].shape[0]
    p = probe_keys[0].shape[0]
    lo = jnp.zeros((p,), jnp.int32)
    hi = jnp.broadcast_to(jnp.asarray(n_valid, jnp.int32), (p,))
    rounds = max(int(n).bit_length(), 1)

    def body(_, state):
        lo, hi = state
        mid = (lo + hi) >> 1
        midc = jnp.minimum(mid, n - 1)
        lt = jnp.zeros((p,), jnp.bool_)
        eq = jnp.ones((p,), jnp.bool_)
        for sk, pk in zip(sorted_keys, probe_keys):
            sv = sk[midc]
            pv = pk.astype(sv.dtype)
            lt = lt | (eq & (sv < pv))
            eq = eq & (sv == pv)
        go = lo < hi
        lo = jnp.where(go & lt, mid + 1, lo)
        hi = jnp.where(go & ~lt, mid, hi)
        return lo, hi

    lo, _ = jax.lax.fori_loop(0, rounds, body, (lo, hi))
    return lo


def _merged_lower_bound(sorted_cols: Sequence[jnp.ndarray],
                        probe_cols: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Lower-bound positions of probes in a sorted table via ONE stable
    sort of the concatenation (probe rows first, so ties resolve to the
    left).  For each probe at merged position p, its position in the
    table is p minus the number of probes at or before p.  O(sort) —
    jnp.searchsorted is ~30× slower on TPU at millions of queries."""
    nB = probe_cols[0].shape[0]
    n = nB + sorted_cols[0].shape[0]
    cols = [jnp.concatenate([p, s]) for p, s in zip(probe_cols, sorted_cols)]
    iota = jnp.arange(n, dtype=jnp.int32)
    out = jax.lax.sort((*cols, iota), num_keys=len(cols), is_stable=True)
    perm = out[-1]
    isB = (perm < nB).astype(jnp.int32)
    cntB = jnp.cumsum(isB)
    inv = jnp.zeros((n,), jnp.int32).at[perm].set(iota)
    p = inv[:nB]
    return p - cntB[p] + 1


def lookup(table: "HashTable", probe_keys: Sequence[jnp.ndarray],
           probe_mask: jnp.ndarray):
    """Find each probe key's run id in a built table (sorted lower-bound +
    exact-equality verification).  Returns int32 [P], -1 = absent."""
    n = table.sorted_keys[0].shape[0]
    nb = probe_keys[0].shape[0]
    nprobe = narrow_keys(probe_keys)
    from . import pallas_kernels as PK
    # Pallas VMEM tier applies to SINGLE-int64-key joins only.  The
    # widen() recombination is valid ONLY when the two narrowed columns
    # are the (hi, lo^sign) word pair of one int64 key — i.e. narrowing
    # is ON and the original key count is 1.  A genuine composite 2-key
    # join must NOT take it (widen would truncate each key to 32 bits
    # and miss matches for keys >= 2^31 or negative).
    narrowed_pair = (len(probe_keys) == 1 and len(nprobe) == 2
                     and len(table.sorted_keys) == 2)
    plain_single = (len(probe_keys) == 1 and len(nprobe) == 1
                    and len(table.sorted_keys) == 1)
    if (PK.enabled() and n <= PK.MAX_VMEM_TABLE_SLOTS
            and (narrowed_pair or plain_single)):
        # sorted table pinned in VMEM for the whole probe stream
        if narrowed_pair:
            def widen(hi, lo):
                lo_u = (lo.astype(jnp.uint32) ^ jnp.uint32(0x80000000))
                return (hi.astype(jnp.int64) << 32) | lo_u.astype(jnp.int64)
            skey = widen(table.sorted_keys[0], table.sorted_keys[1])
            pkey = widen(nprobe[0], nprobe[1])
        else:
            skey = table.sorted_keys[0].astype(jnp.int64)
            pkey = nprobe[0].astype(jnp.int64)
        pos = PK.sorted_probe(skey, pkey, table.n_valid,
                              interpret=PK._interpret())
    elif nb * 32 < n:
        # few probes, big table: log(n) gather rounds beat a merge sort
        pos = _lex_search(table.sorted_keys, nprobe, table.n_valid)
    else:
        pos = _merged_lower_bound(table.sorted_keys, nprobe)
    posc = jnp.minimum(pos, n - 1)
    eq = pos < jnp.asarray(table.n_valid, jnp.int32)
    for sk, pk in zip(table.sorted_keys, nprobe):
        eq = eq & (sk[posc] == pk.astype(sk.dtype))
    slot = jnp.where(probe_mask & eq, table.run_of_pos[posc], -1)
    return slot.astype(jnp.int32)


def build(keys: Sequence[jnp.ndarray], mask: jnp.ndarray,
          capacity: int) -> HashTable:
    """Build a join table: one stable sort gives runs AND the CSR layout
    (replaces ``PagesHash`` + ``ArrayPositionLinks``)."""
    n = keys[0].shape[0]
    keys64 = [k.astype(jnp.int64) for k in keys]
    sm, raw_sorted, perm = _sort_rows(keys64, mask)
    newrun = _run_starts(raw_sorted, sm)
    # invalid tail keys → +MAX sentinel so the full column is globally
    # sorted (probe lower-bounds that land in the tail map to run -1).
    # raw_sorted columns are the NARROWED int32 word pairs, so the
    # sentinel is per-dtype max.
    sorted_keys = [jnp.where(sm, k, jnp.iinfo(k.dtype).max)
                   for k in raw_sorted]
    gid_sorted = (jnp.cumsum(newrun.astype(jnp.int32)) - 1)
    total = jnp.where(sm.any(), gid_sorted[-1] + 1, 0)
    slot_of_row = jnp.zeros((n,), jnp.int32).at[perm].set(
        jnp.where(sm, gid_sorted, -1))
    starts, ends = run_bounds(gid_sorted, newrun, sm, capacity)
    in_range = jnp.arange(capacity, dtype=jnp.int32) < total
    owner = jnp.where(in_range, perm[starts].astype(jnp.int32), EMPTY)
    counts = jnp.where(in_range, ends - starts, 0)
    run_of_pos = jnp.where(sm, gid_sorted, -1).astype(jnp.int32)
    return HashTable(owner, list(keys64), slot_of_row, counts, starts,
                     perm.astype(jnp.int32), sorted_keys, run_of_pos,
                     jnp.sum(sm, dtype=jnp.int64))


def probe_unique(table: HashTable, probe_keys: Sequence[jnp.ndarray],
                 probe_mask: jnp.ndarray):
    """Probe assuming build keys are unique (PK side of a FK join).

    Returns build_row[P] int32 with -1 = no match — the fast path for
    every PK–FK join in TPC-H: output shape == probe shape, fully static
    (the TPU answer to ``operator/join/DefaultPageJoiner.java:265``)."""
    slot = lookup(table, probe_keys, probe_mask)
    return jnp.where(slot >= 0, table.owner[jnp.maximum(slot, 0)], -1)


def probe_counts(table: HashTable, probe_keys: Sequence[jnp.ndarray],
                 probe_mask: jnp.ndarray):
    """Per-probe-row match count (for two-pass expanding joins)."""
    slot = lookup(table, probe_keys, probe_mask)
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
    # probe_row[j] = #{i : ends[i] <= j} — a histogram of `ends` values
    # prefix-summed (searchsorted with millions of queries is ~0.7 µs each
    # on TPU; the scatter-add histogram is one pass)
    hist = jnp.zeros((out_size + 1,), jnp.int32).at[
        jnp.minimum(ends, out_size).astype(jnp.int32)].add(1, mode="drop")
    probe_row = jnp.cumsum(hist)[:out_size].astype(jnp.int32)
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
    """Power-of-2 capacity bound on distinct keys (kept ≥ 2× the estimate
    so under-estimates rarely trip the overflow retry)."""
    return max(8, next_pow2(int(n_keys / load) + 1))
