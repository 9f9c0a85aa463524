"""Scan layer: TPC-H generator → cached device Chunks.

The analogue of the reference's connector page source for TPC-H
(``plugin/trino-tpch/.../TpchRecordSet.java:86``) with column pruning
(generation is per-column) and a device-resident table cache (scans of hot
tables cost zero host↔device transfers after first touch — the role the
reference's buffer pools play).  ``split=(k, n)`` scans the k-th of n row
slices (``TpchSplitManager.java:55`` partNumber/totalParts semantics).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp

from ..tpch import generator
from .columns import Chunk, DCol, from_host


class DataSource:
    def __init__(self, scale_factor: float, split: Tuple[int, int] = (0, 1)):
        self.sf = scale_factor
        self.split = split
        self._cols: Dict[Tuple[str, str], DCol] = {}
        self._nrows: Dict[str, int] = {}
        # writable in-memory catalog (the plugin/trino-memory analogue)
        self.memory: Dict[str, "Table"] = {}
        self.catalog_version = 0  # bumped on DDL/DML; invalidates plan caches

    def memory_schema(self, name: str):
        t = self.memory[name]
        return [(cname, col.dtype) for cname, col in t.columns.items()]

    def create_table(self, name: str, table) -> None:
        self.catalog_version += 1
        self.memory[name] = table
        # drop any cached device columns of a replaced table
        for key in [k for k in self._cols if k[0] == name]:
            del self._cols[key]

    def insert_into(self, name: str, table) -> None:
        import numpy as np
        from ..data.table import Table as HostTable
        from ..data.column import Column
        base = self.memory[name]
        assert len(base.names) == len(table.names), \
            "INSERT column count mismatch"
        merged = {}
        for cname, src in zip(base.names, table.names):  # positional
            a, b = base.columns[cname], table.columns[src]
            merged[cname] = _concat_host_cols(a, b)
        self.create_table(name, HostTable(merged))

    def drop_table(self, name: str) -> None:
        self.catalog_version += 1
        del self.memory[name]
        for key in [k for k in self._cols if k[0] == name]:
            del self._cols[key]

    def _split_range(self, table: str):
        k, n = self.split
        total = generator.total_unit_rows(table, self.sf)
        unit = 4 if table == "partsupp" else 1
        per = ((total // unit + n - 1) // n) * unit
        first = min(k * per, total)
        count = min(per, total - first)
        return first, count

    def scan(self, table: str, columns, alias_prefix: str = "") -> Chunk:
        missing = [c for c in columns
                   if (table, c) not in self._cols]
        if missing and table in self.memory:
            t = self.memory[table]
            for name, col in t.columns.items():
                self._cols[(table, name)] = from_host(col)
        elif missing:
            first, count = self._split_range(table)
            t = generator.generate(table, self.sf, columns=missing,
                                   first_row=first, n_rows=count)
            for name, col in t.columns.items():
                self._cols[(table, name)] = from_host(col)
                self._nrows[table] = col.row_count
        cols = {alias_prefix + c: self._cols[(table, c)] for c in columns}
        n = next(iter(cols.values())).n_rows
        return Chunk(cols, jnp.ones((n,), jnp.bool_))


def _concat_host_cols(a, b):
    import numpy as np
    from ..data.column import Column, PLAIN, DICT, BYTES
    if a.kind == PLAIN and b.kind == PLAIN:
        return Column(a.dtype, np.concatenate(
            [np.asarray(a.values), np.asarray(b.values)]),
            _cat_validity(a, b), PLAIN)
    # normalize strings to python then re-encode as BYTES
    vals = a.to_pylist() + b.to_pylist()
    from ..data.column import bytes_column
    return bytes_column(a.dtype, [v if v is not None else "" for v in vals])


def _cat_validity(a, b):
    import numpy as np
    if a.validity is None and b.validity is None:
        return None
    va = np.ones(a.row_count, bool) if a.validity is None else np.asarray(a.validity)
    vb = np.ones(b.row_count, bool) if b.validity is None else np.asarray(b.validity)
    return np.concatenate([va, vb])
