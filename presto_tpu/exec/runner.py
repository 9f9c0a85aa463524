"""LocalRunner: single-process query execution + host materialization.

The analogue of the reference's ``testing/LocalQueryRunner.java:227`` (full
stack minus the distributed control plane): executes a physical plan against
a scale factor and returns a host Table, ready for oracle diffing
(``QueryAssertions.assertQuery`` style).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax

from ..data.table import Table
from ..tpch.schema import SCHEMAS
from .columns import Chunk, to_host
from .datasource import DataSource
from .physical import ExecContext, PhysOp, execute


def _ensure_x64():
    if not jax.config.jax_enable_x64:
        jax.config.update("jax_enable_x64", True)


class LocalRunner:
    def __init__(self, schema: str = "tiny", scale_factor: Optional[float] = None):
        _ensure_x64()
        sf = SCHEMAS[schema] if scale_factor is None else scale_factor
        self.datasource = DataSource(sf)
        self.ctx = ExecContext(self.datasource)

    def run_physical(self, plan: PhysOp) -> Table:
        chunk = execute(plan, self.ctx)
        return materialize(chunk)

    def plan_sql(self, sql: str) -> PhysOp:
        from ..sql.parser import parse
        from ..sql.planner.planner import Planner
        from ..sql.planner.pruning import prune
        query = parse(sql)
        plan = Planner(self.datasource.sf).plan(query)
        return prune(plan, None)

    def run_sql(self, sql: str) -> Table:
        return self.run_physical(self.plan_sql(sql))


def materialize(chunk: Chunk) -> Table:
    sel = np.nonzero(np.asarray(chunk.mask))[0]
    return Table({name: to_host(col, sel) for name, col in chunk.cols.items()})
