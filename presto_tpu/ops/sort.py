"""Sort kernels: stable multi-key ordering over device arrays.

Replaces ``operator/PagesIndex.java:389 sort()`` + compiled comparators
(``sql/gen/OrderingCompiler.java``).  Instead of comparator-driven
quicksort over row addresses, keys are normalized so XLA's native sort
applies: descending int64 via bitwise complement, strings via big-endian
8-byte packs (fixed-width zero-padded ASCII makes chunked int64 compare
exactly lexicographic).  Multi-key ordering = chain of stable argsorts from
least- to most-significant key.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

I64_MAX = np.int64(2**63 - 1)


def bytes_sort_keys(values: jnp.ndarray, lengths: jnp.ndarray) -> List[jnp.ndarray]:
    """Normalize a [N, W] ASCII byte matrix into int64 big-endian packs.

    Zero padding beyond ``lengths`` sorts shorter strings first, matching
    lexicographic order for ASCII (< 0x80 ⇒ packs stay non-negative).
    """
    n, w = values.shape
    w8 = (w + 7) // 8 * 8
    padded = jnp.zeros((n, w8), jnp.uint8)
    padded = padded.at[:, :w].set(values)
    mask = jnp.arange(w8)[None, :] < lengths[:, None]
    padded = jnp.where(mask, padded, jnp.uint8(0))
    packs = []
    for c in range(w8 // 8):
        chunk = padded[:, c * 8:(c + 1) * 8].astype(jnp.int64)
        word = jnp.zeros((n,), jnp.int64)
        for b in range(8):
            word = (word << 8) | chunk[:, b]
        packs.append(word)
    return packs


def float_sort_keys(v: jnp.ndarray) -> jnp.ndarray:
    """Order-preserving float64 → int64 key (sign-magnitude unfold)."""
    import jax
    b = jax.lax.bitcast_convert_type(v.astype(jnp.float64), jnp.int64)
    mag = b & jnp.int64(2**62 - 1 + 2**62)  # 0x7fff... without overflow
    return jnp.where(b < 0, jnp.int64(-(2**63)) + (I64_MAX - mag), b)


def value_sort_key(col) -> jnp.ndarray:
    """Normalize a numeric DCol's values to an ascending-sortable int64."""
    v = col.values
    if jnp.issubdtype(v.dtype, jnp.floating):
        return float_sort_keys(v)
    return v.astype(jnp.int64)


def argsort_multi(keys: Sequence[Tuple[jnp.ndarray, bool]],
                  mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Stable argsort by multiple (int-normalized) keys.

    ``keys``: list of (array[N], descending) in major-to-minor order.
    Masked-out rows sort to the end.  Returns int32 permutation.
    Empty ``keys`` (e.g. a window ``OVER ()``) sorts by validity only.
    """
    if not keys:
        assert mask is not None, "argsort_multi with no keys needs a mask"
        return jnp.argsort(~mask, stable=True).astype(jnp.int32)
    n = keys[0][0].shape[0]
    perm = jnp.arange(n, dtype=jnp.int32)
    for arr, desc in reversed(list(keys)):
        # naturally-narrow keys (dict codes, dates) sort as int32 — the
        # VPU is 32-bit and argsort int32 is ~1.1× int64 on v5e
        # (docs/PERF_width.json); int64 keys stay whole here because a
        # per-key argsort CHAIN would need two passes per split key
        if arr.dtype in (jnp.int32, jnp.int16, jnp.int8, jnp.uint8,
                         jnp.bool_):
            k = arr.astype(jnp.int32)
            sentinel = jnp.int32(2**31 - 1)
        else:
            k = arr.astype(jnp.int64)
            sentinel = I64_MAX
        if desc:
            k = ~k
        if mask is not None:
            k = jnp.where(mask, k, sentinel)  # invalid rows last
        perm = perm[jnp.argsort(k[perm], stable=True)]
    if mask is not None:
        # final pass: all valid rows before invalid, preserving key order
        valid = mask[perm]
        perm = perm[jnp.argsort(~valid, stable=True)]
    return perm
