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
    # this environment pre-imports jax before user code runs, so the
    # JAX_PLATFORMS env var is not picked up at import time — honor it here
    import os
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            if jax.config.jax_platforms != plat:
                jax.config.update("jax_platforms", plat)
        except RuntimeError:
            pass  # backend already initialized
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
        extra = {name: self.datasource.memory_schema(name)
                 for name in self.datasource.memory}
        plan = Planner(self.datasource.sf, extra_tables=extra).plan(query)
        return prune(plan, None)

    def _maybe_ddl(self, sql: str) -> Optional[Table]:
        """CREATE TABLE AS / INSERT INTO / DROP TABLE (the writable memory
        connector path: TableWriterOperator/TableFinishOperator analogue)."""
        import re as _re

        def one_row(**kv):
            from ..data.column import Column
            import numpy as np
            from ..data import types as T
            return Table({k: Column(T.BIGINT, np.array([v], np.int64))
                          for k, v in kv.items()})

        m = _re.match(r"\s*create\s+table\s+(\w+)\s+as\s+(.*)$", sql,
                      _re.I | _re.S)
        if m:
            name, query = m.group(1).lower(), m.group(2)
            result = self.run_sql(query)
            self.datasource.create_table(name, result)
            return one_row(rows=result.row_count)
        m = _re.match(r"\s*insert\s+into\s+(\w+)\s+(.*)$", sql, _re.I | _re.S)
        if m:
            name, query = m.group(1).lower(), m.group(2)
            result = self.run_sql(query)
            self.datasource.insert_into(name, result)
            return one_row(rows=result.row_count)
        m = _re.match(r"\s*drop\s+table\s+(?:if\s+exists\s+)?(\w+)\s*;?\s*$",
                      sql, _re.I)
        if m:
            name = m.group(1).lower()
            if name in self.datasource.memory:
                self.datasource.drop_table(name)
            return one_row(dropped=1)
        m = _re.match(r"\s*show\s+tables\s*;?\s*$", sql, _re.I)
        if m:
            from ..tpch.schema import TABLE_SCHEMAS
            from ..data.column import bytes_column
            from ..data import types as T
            names = sorted(TABLE_SCHEMAS) + sorted(self.datasource.memory)
            return Table({"table": bytes_column(T.varchar(64), names)})
        return None

    def run_sql(self, sql: str, fused: Optional[bool] = None) -> Table:
        import re as _re
        m = _re.match(r"\s*explain(\s+analyze)?\s+", sql, _re.I)
        if m:
            return self._explain(sql[m.end():], analyze=bool(m.group(1)))
        ddl = self._maybe_ddl(sql)
        if ddl is not None:
            return ddl
        plan = self.plan_sql(sql)
        if fused is not False:
            try:
                return self.run_physical_fused(plan)
            except NotImplementedError:
                if fused:
                    raise
        return self.run_physical(plan)

    def _explain(self, sql: str, analyze: bool) -> Table:
        """EXPLAIN / EXPLAIN ANALYZE (reference: PlanPrinter +
        ExplainAnalyzeOperator)."""
        from ..data.column import Column, BYTES
        from ..data import types as T
        from ..utils.explain import explain as render
        import numpy as np
        plan = self.plan_sql(sql)
        stats = None
        if analyze:
            from .physical import ExecContext
            ctx = ExecContext(self.datasource, collect_stats=True)
            execute(plan, ctx)
            stats = ctx.node_stats
        text = render(plan, stats)
        lines = text.split("\n")
        width = max(len(l) for l in lines)
        vals = np.zeros((len(lines), width), np.uint8)
        lens = np.zeros(len(lines), np.int32)
        for i, l in enumerate(lines):
            b = l.encode()
            vals[i, :len(b)] = np.frombuffer(b, np.uint8)
            lens[i] = len(b)
        return Table({"Query Plan": Column(T.varchar(width), vals,
                                           kind=BYTES, lengths=lens)})

    def run_physical_fused(self, plan: PhysOp) -> Table:
        """Compile the WHOLE query into one XLA program (the design point:
        the reference compiles per-query bytecode for inner loops; we
        compile the entire dataflow — no per-operator dispatch, no
        intermediate HBM round-trips beyond pipeline breakers).

        Falls back (NotImplementedError) for plans with expansion joins or
        distinct aggregates; group capacities are static bounds with an
        overflow flag checked on the host, doubling hints and recompiling
        when an estimate was too low.
        """
        import jax
        from ..parallel.distributed import TraceCtx, execute_traced, _collect_scans

        tables = {}
        _collect_scans(plan, tables)
        shard_vals = {}
        meta = {}
        masks = {}
        import jax.numpy as jnp
        for table, cols in tables.items():
            chunk = self.datasource.scan(table, sorted(cols))
            for name, dc in chunk.cols.items():
                shard_vals[(table, name)] = (dc.values, dc.lengths)
                meta[(table, name)] = (dc.dtype, dc.kind, dc.dictionary)
            masks[table] = chunk.mask

        from ..exec.columns import DCol

        mult = 1
        while True:
            def stage(vals, msks, mult=mult):
                shards = {
                    k: DCol(meta[k][0], meta[k][1], v, l, None, meta[k][2])
                    for k, (v, l) in vals.items()}
                ctx = TraceCtx(shards, msks, self.datasource.sf,
                               single=True, cap_multiplier=mult, overflow=[])
                out, _ = execute_traced(plan, ctx)
                ovf = (jnp.stack(ctx.overflow).any() if ctx.overflow
                       else jnp.bool_(False))
                return out, ovf
            out_chunk, overflow = jax.jit(stage)(shard_vals, masks)
            if not bool(overflow):
                return materialize(out_chunk)
            mult *= 8


def materialize(chunk: Chunk) -> Table:
    sel = np.nonzero(np.asarray(chunk.mask))[0]
    return Table({name: to_host(col, sel) for name, col in chunk.cols.items()})
