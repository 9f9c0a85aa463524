"""Device-resident columnar values + chunk container.

The runtime analogue of the reference's Page/Block on device
(``core/trino-spi/.../spi/Page.java:33``): a ``DCol`` is one column's device
arrays plus static metadata; a ``Chunk`` is an equal-length set of DCols
with a row-validity mask (selection is a mask, never an eager compaction —
the TPU replacement for ``SelectedPositions``).

DCol is registered as a JAX pytree whose static (aux) part carries dtype,
layout kind, and an interned ``Dictionary`` handle, so whole Chunks can flow
through ``jax.jit`` boundaries without recompilation churn.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import types as T
from ..data.column import Column, PLAIN, DICT, BYTES, ARRAY, MAP


class Dictionary:
    """Interned host-side string dictionary (hashable by identity, so jit
    treats two references to the same dictionary as equal static data)."""

    __slots__ = ("strings",)

    def __init__(self, strings: np.ndarray):
        self.strings = np.asarray(strings, dtype=object)

    def __len__(self):
        return len(self.strings)

    def __getitem__(self, i):
        return self.strings[i]

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


@jax.tree_util.register_pytree_node_class
@dataclass
class DCol:
    dtype: T.DataType
    kind: str                      # PLAIN | DICT | BYTES | ARRAY | MAP
    values: jnp.ndarray            # PLAIN:[N] | DICT codes:[N] | else:[N,W]
    lengths: Optional[jnp.ndarray] = None   # BYTES/ARRAY/MAP
    validity: Optional[jnp.ndarray] = None  # bool [N]; None = all valid
    dictionary: Optional[Dictionary] = None  # DICT / string keys (MAP)
    values2: Optional[jnp.ndarray] = None    # MAP: map values [N, W]
    dictionary2: Optional[Dictionary] = None  # MAP: string map-VALUE dict

    def tree_flatten(self):
        return ((self.values, self.lengths, self.validity, self.values2),
                (self.dtype, self.kind, self.dictionary, self.dictionary2))

    @classmethod
    def tree_unflatten(cls, aux, children):
        dtype, kind, dictionary, dictionary2 = aux
        values, lengths, validity, values2 = children
        return cls(dtype, kind, values, lengths, validity, dictionary,
                   values2, dictionary2)

    @property
    def n_rows(self) -> int:
        return int(self.values.shape[0])

    def valid_or_true(self) -> jnp.ndarray:
        if self.validity is None:
            return jnp.ones((self.values.shape[0],), jnp.bool_)
        return self.validity

    def take(self, idx: jnp.ndarray, valid: Optional[jnp.ndarray] = None) -> "DCol":
        """Gather rows by index; optional extra validity for padded gathers."""
        i = jnp.maximum(idx, 0)
        v = None if self.validity is None else self.validity[i]
        if valid is not None:
            v = valid if v is None else (v & valid)
        return DCol(self.dtype, self.kind, self.values[i],
                    None if self.lengths is None else self.lengths[i],
                    v, self.dictionary,
                    None if self.values2 is None else self.values2[i],
                    self.dictionary2)


def from_host(col: Column) -> DCol:
    if col.kind == "rle":
        # run-length upload: move R runs over the wire, expand on device
        # with ONE searchsorted gather (``RunLengthEncodedBlock`` made
        # HBM-bandwidth-aware: the dense vector never crosses host↔device)
        n = col.row_count
        ends = jnp.cumsum(jnp.asarray(col.lengths, dtype=jnp.int64))
        idx = jnp.searchsorted(ends, jnp.arange(n, dtype=jnp.int64),
                               side="right")
        vals = jnp.asarray(col.values)[idx]
        validity = None if col.validity is None else \
            jnp.asarray(col.validity)[idx]
        if col.dictionary is not None:
            return DCol(col.dtype, DICT, vals.astype(jnp.int32), None,
                        validity, Dictionary(col.dictionary))
        return DCol(col.dtype, PLAIN, vals, None, validity)
    validity = None if col.validity is None else jnp.asarray(col.validity)
    if col.kind == DICT:
        return DCol(col.dtype, DICT, jnp.asarray(col.values), None, validity,
                    Dictionary(col.dictionary))
    if col.kind == BYTES:
        return DCol(col.dtype, BYTES, jnp.asarray(col.values),
                    jnp.asarray(col.lengths), validity)
    if col.kind in (ARRAY, MAP):
        d = None if col.dictionary is None else Dictionary(col.dictionary)
        d2 = None if getattr(col, "dictionary2", None) is None else \
            Dictionary(col.dictionary2)
        v2 = None if col.values2 is None else jnp.asarray(col.values2)
        return DCol(col.dtype, col.kind, jnp.asarray(col.values),
                    jnp.asarray(col.lengths), validity, d, v2, d2)
    return DCol(col.dtype, PLAIN, jnp.asarray(col.values), None, validity)


def to_host(col: DCol, sel: np.ndarray) -> Column:
    """Materialize selected row indices back into a host Column."""
    vals = np.asarray(col.values)[sel]
    validity = None if col.validity is None else np.asarray(col.validity)[sel]
    if col.kind == DICT:
        return Column(col.dtype, vals.astype(np.int32), validity, DICT,
                      dictionary=col.dictionary.strings)
    if col.kind == BYTES:
        return Column(col.dtype, vals, validity, BYTES,
                      lengths=np.asarray(col.lengths)[sel])
    if col.kind in (ARRAY, MAP):
        d = None if col.dictionary is None else col.dictionary.strings
        d2 = None if col.dictionary2 is None else col.dictionary2.strings
        v2 = None if col.values2 is None else np.asarray(col.values2)[sel]
        return Column(col.dtype, vals, validity, col.kind, dictionary=d,
                      lengths=np.asarray(col.lengths)[sel], values2=v2,
                      dictionary2=d2)
    if vals.ndim == 2 and T.is_decimal(col.dtype):
        # long decimal (hi, lo) words → exact python ints
        from ..ops.int128 import to_host_ints
        return Column(col.dtype, to_host_ints(vals), validity, PLAIN)
    if T.is_timestamp_tz(col.dtype) and col.values2 is not None:
        return Column(col.dtype, vals, validity, PLAIN,
                      values2=np.asarray(col.values2)[sel])
    return Column(col.dtype, vals, validity, PLAIN)


def _leaf_to_bytes(x: jnp.ndarray) -> jnp.ndarray:
    if x.dtype == jnp.bool_:
        x = x.astype(jnp.uint8)
    flat = x.ravel()
    if flat.dtype != jnp.uint8:
        flat = jax.lax.bitcast_convert_type(flat, jnp.uint8)
    return flat.ravel()


@jax.jit
def _pack_kernel(tree):
    """Byte-pack every array leaf of a pytree into ONE uint8 vector.

    Device→host transfers through a high-latency link (the axon tunnel:
    ~35 ms per transfer regardless of size) must be batched: fetching a
    query result column-by-column pays one RTT per column.  This packs
    the whole result into a single buffer so materialization is exactly
    one transfer (reference analogue: one serialized Page over the wire,
    ``spi/Page.java`` + PagesSerde, rather than per-block fetches)."""
    leaves = jax.tree_util.tree_flatten(tree)[0]
    parts = [_leaf_to_bytes(x) for x in leaves]
    if not parts:
        return jnp.zeros((0,), jnp.uint8)
    return jnp.concatenate(parts) if len(parts) > 1 else parts[0]


def fetch_tree(tree):
    """Materialize a device pytree to host numpy with ONE device→host
    transfer (see ``_pack_kernel``).  Shapes/dtypes are read from the
    device arrays' metadata (no transfer) to slice the packed buffer."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    buf = np.asarray(_pack_kernel(tree))
    out = []
    off = 0
    for l in leaves:
        if l.dtype == jnp.bool_:
            nb = int(l.size)
            arr = buf[off:off + nb].reshape(l.shape).astype(bool)
        else:
            dt = np.dtype(l.dtype.name)
            nb = int(l.size) * dt.itemsize
            arr = buf[off:off + nb].view(dt).reshape(l.shape)
        off += nb
        out.append(arr)
    return jax.tree_util.tree_unflatten(treedef, out)


@jax.tree_util.register_pytree_node_class
@dataclass
class Chunk:
    """Equal-length device columns + row mask (all static-shape)."""

    cols: Dict[str, DCol]
    mask: jnp.ndarray  # bool [N]

    def tree_flatten(self):
        names = tuple(self.cols)  # preserve insertion (projection) order
        return (tuple(self.cols[n] for n in names) + (self.mask,), names)

    @classmethod
    def tree_unflatten(cls, names, children):
        return cls(dict(zip(names, children[:-1])), children[-1])

    @property
    def n_rows(self) -> int:
        return int(self.mask.shape[0])

    def with_cols(self, cols: Dict[str, DCol]) -> "Chunk":
        return Chunk(cols, self.mask)

    def with_mask(self, mask: jnp.ndarray) -> "Chunk":
        return Chunk(self.cols, mask)

    def select(self, names) -> "Chunk":
        return Chunk({n: self.cols[n] for n in names}, self.mask)
