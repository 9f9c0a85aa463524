"""Pallas TPU kernels for the hottest inner loops (experimental tier).

The XLA-traced kernels in ``hashtable.py``/``agg.py`` are already fused and
HBM-bandwidth-bound for scan-shaped work; these Pallas versions exist for
the paths where explicit VMEM control wins:

- ``masked_sum``:     streaming blocked reduction (filter+sum fusion with
                      explicit [block, 128]-tiled accumulation — the Q6
                      inner loop shape)
- ``sorted_probe``:   vectorized binary search with the sorted key table
                      resident in VMEM (int64 keys carried as int32 lo/hi
                      pairs, since the VPU is natively 32-bit — the same
                      reasoning as the reference's byte-prefix filter in
                      PagesHash.java:50); every search round's gather hits
                      VMEM instead of HBM

The engine dispatches to them from ``ops/hashtable.lookup`` and
``ops/agg.g_sum`` when the tier is enabled — via
``EngineConfig.pallas_kernels`` (client API), ``configure()`` directly, or
the ``PRESTO_TPU_PALLAS`` env var (``on`` requires a TPU backend;
``interpret`` exercises the same dispatch on CPU for tests).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8
BLOCK = 8 * 1024  # rows per grid step

# VMEM is ~16 MB/core: cap resident probe tables well below it
# (owner + klo + khi = 12 B/slot plus blocked probe buffers).
MAX_VMEM_TABLE_SLOTS = 1 << 19

_MODE = os.environ.get("PRESTO_TPU_PALLAS", "off").lower()


def configure(mode) -> None:
    """'off' | 'on' (TPU hardware) | 'interpret' (CPU, for tests).
    Booleans map to on/off."""
    global _MODE
    if isinstance(mode, bool):
        mode = "on" if mode else "off"
    if mode not in ("off", "on", "interpret"):
        raise ValueError(f"pallas mode {mode!r}")
    _MODE = mode


def enabled() -> bool:
    if _MODE == "interpret":
        return True
    return _MODE == "on" and jax.default_backend() == "tpu"


def _interpret() -> bool:
    return _MODE == "interpret"


def _pad_to(x, n, fill=0):
    if x.shape[0] == n:
        return x
    return jnp.pad(x, (0, n - x.shape[0]), constant_values=fill)


# ---------------------------------------------------------------- masked sum

def _masked_sum_kernel(lo_ref, hi_ref, mask_ref, olo_ref, ohi_ref):
    # accumulate into one (SUBLANES, LANES) output tile revisited by every
    # grid step (TPU block shapes must be 8×128-aligned, so a (1, 128)
    # per-step output row is not legal — the old layout failed to lower)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        olo_ref[:] = jnp.zeros_like(olo_ref)
        ohi_ref[:] = jnp.zeros_like(ohi_ref)

    m = mask_ref[:]
    rows = lo_ref.shape[0]
    # dtype pinned: with x64 enabled jnp.sum would promote the int32
    # accumulator to int64 INSIDE the kernel, and this stack's mosaic
    # convert-lowering recurses forever on that cast (RecursionError at
    # lowering) — the split-word design needs no int64 here anyway
    plo = jnp.sum(jnp.where(m, lo_ref[:], jnp.int32(0)).reshape(
        SUBLANES, rows // SUBLANES, LANES), axis=1, dtype=jnp.int32)
    phi = jnp.sum(jnp.where(m, hi_ref[:], jnp.int32(0)).reshape(
        SUBLANES, rows // SUBLANES, LANES), axis=1, dtype=jnp.int32)
    olo_ref[:] = olo_ref[:] + plo
    ohi_ref[:] = ohi_ref[:] + phi


_SPLIT = 18  # low bits per int32 word


def masked_sum(values: jnp.ndarray, mask: jnp.ndarray,
               interpret: bool = False) -> jnp.ndarray:
    """sum(values where mask) via a blocked streaming Pallas reduction.

    TPU Pallas has no int64 reductions, so the int64 addends split into
    (hi<<18)+lo int32 words; each grid step emits per-lane int32 partial
    sums (64 rows/step keeps both words overflow-free for |v| < 2^43) and
    XLA recombines in int64.  Correct for |values| < 2^43 — the caller's
    addend domain (unscaled decimals of TPC-H magnitude)."""
    n = values.shape[0]
    padded = pl.cdiv(max(n, 1), BLOCK) * BLOCK
    v64 = _pad_to(values.astype(jnp.int64), padded)
    vlo = (v64 & ((1 << _SPLIT) - 1)).astype(jnp.int32).reshape(-1, LANES)
    vhi = (v64 >> _SPLIT).astype(jnp.int32).reshape(-1, LANES)
    m = _pad_to(mask, padded, False).reshape(-1, LANES)
    rows = BLOCK // LANES
    grid = vlo.shape[0] // rows
    olo, ohi = pl.pallas_call(
        _masked_sum_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((SUBLANES, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((SUBLANES, LANES), jnp.int32),
            jax.ShapeDtypeStruct((SUBLANES, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(vlo, vhi, m)
    return (jnp.sum(olo.astype(jnp.int64))
            + (jnp.sum(ohi.astype(jnp.int64)) << _SPLIT))


# ------------------------------------------------------------- sorted probe

def _lohi(x):
    """int64 → (signed hi word, unsigned-low-bits-as-int32).  Comparing
    (hi signed, lo unsigned) lexicographically == comparing the int64s;
    the VPU is natively 32-bit so the kernel works on word pairs."""
    x = x.astype(jnp.int64)
    return (((x >> 32)).astype(jnp.int32),
            (x & jnp.int64(0xFFFFFFFF)).astype(jnp.uint32).astype(jnp.int32))


def _bsearch_kernel(nvalid_ref, klo_ref, khi_ref, plo_ref, phi_ref,
                    out_ref, *, rounds):
    """Vectorized binary search with the SORTED key table VMEM-resident.

    For each probe lane: find the first sorted position whose key >=
    probe (the Pallas form of ``hashtable._lex_search`` — every round's
    gather hits VMEM instead of HBM)."""
    cap = khi_ref.shape[0] * khi_ref.shape[1]
    shape = phi_ref.shape
    lo = jnp.zeros(shape, jnp.int32)
    hi = jnp.full(shape, nvalid_ref[0], jnp.int32)
    phiv = phi_ref[:]
    plov = plo_ref[:].astype(jnp.uint32)

    def gather(ref, idx):
        # divisor pinned int32: a bare python int promotes to an int64
        # scalar under x64, and this stack's mosaic convert-lowering
        # recurses forever on the in-kernel i64 cast (same root cause as
        # the masked-sum literal — see _masked_sum_kernel)
        lanes = jnp.int32(LANES)
        return ref[idx // lanes, idx % lanes]

    def body(_, state):
        lo, hi = state
        mid = (lo + hi) >> 1
        midc = jnp.minimum(mid, jnp.int32(cap - 1))
        shi = gather(khi_ref, midc)
        slo = gather(klo_ref, midc).astype(jnp.uint32)
        lt = (shi < phiv) | ((shi == phiv) & (slo < plov))
        go = lo < hi
        lo = jnp.where(go & lt, mid + 1, lo)
        hi = jnp.where(go & ~lt, mid, hi)
        return lo, hi

    lo, _ = jax.lax.fori_loop(0, rounds, body, (lo, hi))
    out_ref[:] = lo


def sorted_probe(sorted_keys: jnp.ndarray, probe_keys: jnp.ndarray,
                 n_valid, interpret: bool = False) -> jnp.ndarray:
    """Lower-bound positions of probe keys in a sorted int64 key column,
    searching [0, n_valid).  The sorted table stays VMEM-resident across
    the whole probe stream (caller guarantees it fits:
    ``MAX_VMEM_TABLE_SLOTS``).  Returns int32 [P] positions; the caller
    verifies equality and maps positions to run ids."""
    cap = sorted_keys.shape[0]
    capp = pl.cdiv(max(cap, 1), LANES) * LANES
    n = probe_keys.shape[0]
    pn = pl.cdiv(max(n, 1), BLOCK) * BLOCK
    khi, klo = _lohi(_pad_to(sorted_keys, capp))
    phi, plo = _lohi(_pad_to(probe_keys, pn))
    rows = BLOCK // LANES
    grid = pn // BLOCK
    kernel = partial(_bsearch_kernel, rounds=max(int(cap).bit_length(), 1))
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((capp // LANES, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((capp // LANES, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((pn // LANES, LANES), jnp.int32),
        interpret=interpret,
    )(jnp.asarray(n_valid, jnp.int32).reshape(1),
      klo.reshape(-1, LANES), khi.reshape(-1, LANES),
      plo.reshape(-1, LANES), phi.reshape(-1, LANES))
    return out.reshape(-1)[:n]
