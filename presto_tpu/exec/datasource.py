"""Scan layer: connector SPI → cached device Chunks.

The engine side of the connector seam: resolves tables through the
``CatalogManager`` (tpch + memory by default, tpcds et al. by
registration), reads host columns via each connector's page source with
column pruning, and keeps a device-resident column cache (scans of hot
tables cost zero host↔device transfers after first touch — the role the
reference's buffer pools play).  ``split=(k, n)`` scans the k-th of n row
slices (``TpchSplitManager.java:55`` partNumber/totalParts semantics).

Reference: ``operator/ScanFilterAndProjectOperator.java:67`` consumes a
``ConnectorPageSource``; here the same seam feeds device ingest.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp

from ..connector import CatalogManager, memory_connector, tpch_connector
from ..data.column import BYTES as BYTES_KIND, DICT as DICT_KIND
from .columns import Chunk, DCol, from_host


class DataSource:
    def __init__(self, scale_factor: float, split: Tuple[int, int] = (0, 1),
                 device_budget_bytes: int = None,
                 ingest_slice_rows: int = None,
                 catalog: Optional[CatalogManager] = None):
        from ..utils.memory import MemoryPool
        self.sf = scale_factor
        self.split = split
        self._cols: Dict[Tuple[str, str], DCol] = {}
        self._nrows: Dict[str, int] = {}
        self.catalog_version = 0  # bumped on DDL/DML; invalidates plan caches
        # formal connector registry: tpch + writable memory by default;
        # additional connectors (tpcds, ...) register on self.catalog
        self.catalog = catalog or CatalogManager()
        if catalog is None:
            self.catalog.register(tpch_connector(scale_factor))
            self.catalog.register(memory_connector(self._bump))
        # back-compat view: the writable memory catalog's table dict
        mem = self.catalog._connectors.get("memory")
        self.memory = mem.metadata.tables if mem is not None else {}
        # HBM budget for the device column cache: cached columns are
        # revocable (drop to host tier, regenerate on next touch)
        self.pool = MemoryPool(device_budget_bytes)
        # connector→device ingest happens in row slices of this size so
        # host peak memory is bounded by the slice, not the table
        self.ingest_slice_rows = ingest_slice_rows
        self.ingest_slices = 0  # observability/testing counter

    def _bump(self) -> None:
        self.catalog_version += 1

    def register(self, connector) -> None:
        """Attach an additional connector (PluginManager.loadPlugins role)."""
        self.catalog.register(connector)
        self._bump()

    def _resolve(self, table: str):
        hit = self.catalog.resolve(table)
        if hit is None:
            raise KeyError(f"unknown table {table}")
        return hit

    def extra_schemas(self) -> Dict[str, list]:
        """Schemas of every non-tpch connector table (feeds the planner's
        ``extra_tables``)."""
        out: Dict[str, list] = {}
        for conn in self.catalog.connectors():
            if conn.name == "tpch":
                continue
            for t in conn.metadata.list_tables():
                out[t] = conn.metadata.columns(t)
        return out

    def extra_stats(self) -> Dict[str, tuple]:
        """{table: (row_count, primary_key)} for non-tpch connector tables
        (CBO inputs through the SPI's metadata stats hooks)."""
        out: Dict[str, tuple] = {}
        for conn in self.catalog.connectors():
            if conn.name == "tpch":
                continue
            for t in conn.metadata.list_tables():
                out[t] = (conn.metadata.row_count(t),
                          conn.metadata.primary_key(t))
        return out

    def memory_schema(self, name: str):
        t = self.memory[name]
        return [(cname, col.dtype) for cname, col in t.columns.items()]

    def _drop_cached(self, name: str) -> None:
        for key in [k for k in self._cols if k[0] == name]:
            del self._cols[key]

    @staticmethod
    def _shred_rows(table):
        """ROW columns store SHREDDED: each field becomes a dotted plain
        column (``r.x``) — the device never sees a struct; the planner's
        dotted-name resolution reads fields straight off the scan."""
        if not any(getattr(c, "kind", None) == "row"
                   for c in table.columns.values()):
            return table
        from ..data.table import Table
        out = {}
        for cname, col in table.columns.items():
            if getattr(col, "kind", None) == "row":
                for f, child in col.children:
                    out[f"{cname}.{f}"] = child
            else:
                out[cname] = col
        return Table(out)

    def create_table(self, name: str, table) -> None:
        sink = self.catalog.get("memory").page_sink
        sink.create_table(name, self._shred_rows(table))
        self._drop_cached(name)

    def insert_into(self, name: str, table) -> None:
        sink = self.catalog.get("memory").page_sink
        sink.insert(name, self._shred_rows(table))
        self._drop_cached(name)

    def drop_table(self, name: str) -> None:
        sink = self.catalog.get("memory").page_sink
        sink.drop_table(name)
        self._drop_cached(name)

    def _split_range(self, table: str):
        k, n = self.split
        conn, tbl = self._resolve(table)
        if not conn.splittable:
            # replicated scan: every process reads the whole table
            k, n = 0, 1
        sp = conn.split_manager.splits(tbl, n)[k]
        return sp.first_row, sp.row_count

    def scan(self, table: str, columns, alias_prefix: str = "") -> Chunk:
        missing = [c for c in columns
                   if (table, c) not in self._cols]
        fresh: Dict[str, DCol] = {}
        if missing:
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
        """Page-source read + device_put in bounded row slices (chunked
        scan ingest: host peak is one slice, the reference's
        page-at-a-time cursor — ``TpchRecordSet.cursor():86``)."""
        conn, tbl = self._resolve(table)
        src = conn.page_source
        step = self.ingest_slice_rows or count
        if step >= count:
            self.ingest_slices += 1
            cols = src.read(tbl, list(columns), first, count)
            return {n: from_host(c) for n, c in cols.items()}
        parts: Dict[str, list] = {c: [] for c in columns}
        got = 0
        while got < count:
            n = min(step, count - got)
            cols = src.read(tbl, list(columns), first + got, n)
            self.ingest_slices += 1
            for name, col in cols.items():
                parts[name].append(from_host(col))  # slice → device now
            got += n
        return {name: _concat_device_cols(cols)
                for name, cols in parts.items()}

    def scan_slice(self, table: str, columns, first: int,
                   count: int) -> Chunk:
        """Uncached row-range scan (streaming aggregation consumes slices
        and never materializes the whole table on device)."""
        conn, tbl = self._resolve(table)
        hcols = conn.page_source.read(tbl, list(columns), first, count)
        self.ingest_slices += 1
        cols = {c: from_host(hcols[c]) for c in columns}
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
