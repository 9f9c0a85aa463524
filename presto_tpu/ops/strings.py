"""Vectorized string predicates over fixed-width byte matrices.

The reference evaluates LIKE via compiled regex automata per row
(``operator/scalar/`` joni/re2j).  On TPU, a BYTES column is a [N, W] uint8
matrix; LIKE becomes a data-parallel sliding-window compare: every %-split
segment is located greedily left-to-right with one fori_loop over offsets,
all rows advancing together — O(W · |pattern|) VPU work, no per-row branches.
Dictionary-encoded columns evaluate predicates on the (tiny) dictionary and
gather through codes (the ``DictionaryAwarePageProjection`` trick).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BIG = np.int32(1 << 30)


def _seg_array(seg: bytes) -> jnp.ndarray:
    return jnp.asarray(np.frombuffer(seg, dtype=np.uint8))


def _find_from(values: jnp.ndarray, lengths: jnp.ndarray, seg: bytes,
               from_pos: jnp.ndarray) -> jnp.ndarray:
    """Earliest offset >= from_pos where seg matches; BIG if none."""
    n, w = values.shape
    m = len(seg)
    if m == 0:
        return from_pos
    if m > w:
        return jnp.full((n,), BIG, jnp.int32)
    s = _seg_array(seg)
    max_off = w - m

    def body(j, earliest):
        window = jax.lax.dynamic_slice_in_dim(values, j, m, axis=1)
        hit = jnp.all(window == s[None, :], axis=1)
        ok = hit & (j >= from_pos) & (j + m <= lengths)
        return jnp.where(ok & (earliest == BIG), j, earliest)

    earliest = jax.lax.fori_loop(
        0, max_off + 1, body, jnp.full((n,), BIG, jnp.int32))
    return earliest


def parse_like(pattern: str) -> Tuple[bool, bool, List[bytes]]:
    """Split a LIKE pattern into (anchored_start, anchored_end, segments).

    Supports '%' wildcards ('_' is not used by the TPC-H workload; the SQL
    frontend rejects it explicitly)."""
    if "_" in pattern:
        raise NotImplementedError("LIKE '_' wildcard not supported")
    anchored_start = not pattern.startswith("%")
    anchored_end = not pattern.endswith("%")
    segs = [s.encode("ascii") for s in pattern.split("%") if s]
    return anchored_start, anchored_end, segs


def like(values: jnp.ndarray, lengths: jnp.ndarray, pattern: str) -> jnp.ndarray:
    """bool[N] mask of rows matching the LIKE pattern."""
    n, w = values.shape
    a_start, a_end, segs = parse_like(pattern)
    ok = jnp.ones((n,), jnp.bool_)
    if not segs:
        # pattern of only '%'s matches everything; '' matches empty strings
        return ok if "%" in pattern else (lengths == 0)
    if a_start and a_end and len(segs) == 1:
        return eq_literal(values, lengths, segs[0].decode("ascii"))
    pos = jnp.zeros((n,), jnp.int32)
    start = 0
    if a_start:
        seg = segs[0]
        m = len(seg)
        if m > w:
            return jnp.zeros((n,), jnp.bool_)
        hit = jnp.all(values[:, :m] == _seg_array(seg)[None, :], axis=1)
        ok = ok & hit & (lengths >= m)
        pos = jnp.full((n,), m, jnp.int32)
        start = 1
    end = len(segs)
    last_seg = None
    if a_end and end > start:
        last_seg = segs[end - 1]
        end -= 1
    for seg in segs[start:end]:
        at = _find_from(values, lengths, seg, pos)
        ok = ok & (at != BIG)
        pos = jnp.where(at == BIG, pos, at + len(seg))
    if last_seg is not None:
        m = len(last_seg)
        off = lengths - m
        # gather the tail window per row
        idx = jnp.clip(off[:, None] + jnp.arange(m)[None, :], 0, w - 1)
        tail = jnp.take_along_axis(values, idx, axis=1)
        hit = jnp.all(tail == _seg_array(last_seg)[None, :], axis=1)
        ok = ok & hit & (off >= pos) & (lengths >= m)
    return ok


def eq_literal(values: jnp.ndarray, lengths: jnp.ndarray, lit: str) -> jnp.ndarray:
    b = lit.encode("ascii")
    n, w = values.shape
    m = len(b)
    if m > w:
        return jnp.zeros((n,), jnp.bool_)
    hit = jnp.all(values[:, :m] == _seg_array(b)[None, :], axis=1) if m else jnp.ones((n,), jnp.bool_)
    return hit & (lengths == m)


def substring(values: jnp.ndarray, lengths: jnp.ndarray, start: int, size: int):
    """1-based SUBSTRING(col FROM start FOR size) → ([N, size], lengths)."""
    n, w = values.shape
    s0 = start - 1
    idx = jnp.clip(s0 + jnp.arange(size)[None, :], 0, w - 1)
    out = jnp.take_along_axis(values, jnp.broadcast_to(idx, (n, size)), axis=1)
    new_len = jnp.clip(lengths - s0, 0, size)
    out = jnp.where(jnp.arange(size)[None, :] < new_len[:, None], out, jnp.uint8(0))
    return out, new_len.astype(jnp.int32)
