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

from ..data.column import BYTES as BYTES_KIND, DICT as DICT_KIND
from ..tpch import generator
from .columns import Chunk, DCol, from_host


class DataSource:
    def __init__(self, scale_factor: float, split: Tuple[int, int] = (0, 1),
                 device_budget_bytes: int = None,
                 ingest_slice_rows: int = None):
        from ..utils.memory import MemoryPool
        self.sf = scale_factor
        self.split = split
        self._cols: Dict[Tuple[str, str], DCol] = {}
        self._nrows: Dict[str, int] = {}
        # writable in-memory catalog (the plugin/trino-memory analogue)
        self.memory: Dict[str, "Table"] = {}
        self.catalog_version = 0  # bumped on DDL/DML; invalidates plan caches
        # HBM budget for the device column cache: cached columns are
        # revocable (drop to host tier, regenerate on next touch)
        self.pool = MemoryPool(device_budget_bytes)
        # generator→device ingest happens in row slices of this size so
        # host peak memory is bounded by the slice, not the table
        self.ingest_slice_rows = ingest_slice_rows
        self.ingest_slices = 0  # observability/testing counter

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
        fresh: Dict[str, DCol] = {}
        if missing and table in self.memory:
            t = self.memory[table]
            fresh = {name: from_host(col) for name, col in t.columns.items()}
        elif missing:
            first, count = self._split_range(table)
            fresh = self._ingest(table, missing, first, count)
            for dc in fresh.values():
                self._nrows[table] = dc.n_rows
        for name, dc in fresh.items():
            self._cache_col(table, name, dc)
        for c in columns:
            self.pool.touch((table, c))  # LRU refresh
        cols = {}
        for c in columns:
            dc = fresh.get(c) or self._cols.get((table, c))
            if dc is None:  # budget evicted it while caching siblings
                first, count = self._split_range(table)
                dc = self._ingest(table, [c], first, count)[c]
            cols[alias_prefix + c] = dc
        n = next(iter(cols.values())).n_rows
        return Chunk(cols, jnp.ones((n,), jnp.bool_))

    def _cache_col(self, table: str, name: str, dc: DCol) -> None:
        from ..utils.memory import col_bytes
        key = (table, name)
        self._cols[key] = dc
        self.pool.reserve(key, col_bytes(dc),
                          revoke=lambda k=key: self._cols.pop(k, None))

    def _ingest(self, table: str, columns, first: int,
                count: int) -> Dict[str, DCol]:
        """Generate + device_put in bounded row slices (chunked scan
        ingest: host peak is one slice, the reference's page-at-a-time
        cursor — ``TpchRecordSet.cursor():86``)."""
        step = self.ingest_slice_rows or count
        if step >= count:
            self.ingest_slices += 1
            t = generator.generate(table, self.sf, columns=list(columns),
                                   first_row=first, n_rows=count)
            return {n: from_host(c) for n, c in t.columns.items()}
        parts: Dict[str, list] = {c: [] for c in columns}
        got = 0
        while got < count:
            n = min(step, count - got)
            t = generator.generate(table, self.sf, columns=list(columns),
                                   first_row=first + got, n_rows=n)
            self.ingest_slices += 1
            for name, col in t.columns.items():
                parts[name].append(from_host(col))  # slice → device now
            got += n
        return {name: _concat_device_cols(cols)
                for name, cols in parts.items()}

    def scan_slice(self, table: str, columns, first: int,
                   count: int) -> Chunk:
        """Uncached row-range scan (streaming aggregation consumes slices
        and never materializes the whole table on device)."""
        t = generator.generate(table, self.sf, columns=list(columns),
                               first_row=first, n_rows=count)
        self.ingest_slices += 1
        cols = {c: from_host(t.columns[c]) for c in columns}
        n = next(iter(cols.values())).n_rows if cols else count
        return Chunk(cols, jnp.ones((n,), jnp.bool_))

    def table_rows(self, table: str) -> int:
        if table in self.memory:
            return self.memory[table].row_count
        first, count = self._split_range(table)
        return count


def _concat_device_cols(cols) -> DCol:
    """Vertically concatenate per-slice device columns of one table column."""
    import numpy as np
    if len(cols) == 1:
        return cols[0]
    a = cols[0]
    if a.kind == DICT_KIND:
        assert all(np.array_equal(c.dictionary.strings,
                                  a.dictionary.strings) for c in cols[1:]), \
            "slice dictionaries must agree (generator dictionaries are static)"
        vals = jnp.concatenate([c.values for c in cols])
        return DCol(a.dtype, a.kind, vals, None, _cat_dev_validity(cols),
                    a.dictionary)
    if a.kind == BYTES_KIND:
        w = max(c.values.shape[1] for c in cols)
        vals = jnp.concatenate(
            [jnp.pad(c.values, ((0, 0), (0, w - c.values.shape[1])))
             for c in cols])
        lens = jnp.concatenate([c.lengths for c in cols])
        return DCol(a.dtype, a.kind, vals, lens, _cat_dev_validity(cols))
    vals = jnp.concatenate([c.values for c in cols])
    return DCol(a.dtype, a.kind, vals, None, _cat_dev_validity(cols))


def _cat_dev_validity(cols):
    if all(c.validity is None for c in cols):
        return None
    return jnp.concatenate([c.valid_or_true() for c in cols])


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
