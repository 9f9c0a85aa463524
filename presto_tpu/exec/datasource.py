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
        if missing:
            first, count = self._split_range(table)
            t = generator.generate(table, self.sf, columns=missing,
                                   first_row=first, n_rows=count)
            for name, col in t.columns.items():
                self._cols[(table, name)] = from_host(col)
                self._nrows[table] = col.row_count
        cols = {alias_prefix + c: self._cols[(table, c)] for c in columns}
        n = next(iter(cols.values())).n_rows
        return Chunk(cols, jnp.ones((n,), jnp.bool_))
