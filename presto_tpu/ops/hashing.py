"""Vectorized key hashing for hash tables.

The reference hashes with a murmur3-style 64-bit finalizer per key column and
combines columns (``operator/join/PagesHash.java:225-241``,
``sql/gen/JoinCompiler.java`` generated hashRow).  TPU int64 multiply is
emulated, so we use the murmur3 32-bit finalizer over the two 32-bit halves
of each int64 key — same avalanche quality, native VPU ops.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

import numpy as np

_GOLDEN = np.uint32(0x9E3779B9)


def mix32(x: jnp.ndarray) -> jnp.ndarray:
    """murmur3 fmix32 finalizer (uint32 in/out)."""
    x = x.astype(jnp.uint32)
    x ^= x >> 16
    x = x * jnp.uint32(0x85EBCA6B)
    x ^= x >> 13
    x = x * jnp.uint32(0xC2B2AE35)
    x ^= x >> 16
    return x


def hash_i64(k: jnp.ndarray) -> jnp.ndarray:
    """uint32 hash of an int64 (or narrower) key array."""
    k = k.astype(jnp.int64)
    lo = (k & jnp.int64(0xFFFFFFFF)).astype(jnp.uint32)
    hi = ((k >> 32) & jnp.int64(0xFFFFFFFF)).astype(jnp.uint32)
    return mix32(lo ^ (mix32(hi) + _GOLDEN))


def hash_keys(keys: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Combined uint32 hash over multiple key columns."""
    h = hash_i64(keys[0])
    for k in keys[1:]:
        h = mix32(h + _GOLDEN + hash_i64(k))
    return h
