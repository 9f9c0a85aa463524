"""Slice-at-a-time streaming aggregation (single host, bounded memory).

The grouped-lifespan execution shape of the reference
(``execution/SqlTaskExecution.java:225`` SchedulingLifespanManager; spill
consumers process partition-by-partition): the scan is consumed in row-range
slices (deterministic generator splits), each slice flows through
filter/project into PARTIAL aggregation states, and only the ndv-bounded
states stay resident — the table itself never materializes on device.
SF-scale group-bys therefore run in O(slice + ndv) HBM instead of O(table).

Eligible plans: an aggregation whose input subtree is Filter/Project over a
single Scan (no joins below), with mergeable aggregate states (no DISTINCT,
no whole-group order statistics).  Anything above the aggregation (HAVING
filter, projections, sort, limit) executes on the merged result.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

from ..ops import hashtable as HT
from . import physical as PH
from .columns import Chunk

# aggregation states that cannot merge across slices (variance / corr /
# bool moved OUT in round 3: their moment/bit states merge exactly)
_UNSTREAMABLE = frozenset({"min_by", "max_by", "approx_percentile"})


def find_streamable_agg(plan: PH.PhysOp
                        ) -> Optional[Tuple[List[PH.PhysOp],
                                            PH.PhysHashAggregate, str]]:
    """If the plan is [Sort|Limit|Project|Filter]* → Agg → [Filter|Project]*
    → Scan with mergeable aggs, return (path_above, agg, table)."""
    above: List[PH.PhysOp] = []
    node = plan
    while isinstance(node, (PH.PhysSort, PH.PhysLimit, PH.PhysProject,
                            PH.PhysFilter)):
        above.append(node)
        node = node.children()[0]
    if not isinstance(node, PH.PhysHashAggregate):
        return None
    agg = node
    if any(s.distinct or s.func in _UNSTREAMABLE for s in agg.aggs):
        return None
    below = agg.child
    while isinstance(below, (PH.PhysFilter, PH.PhysProject)):
        below = below.children()[0]
    if not isinstance(below, PH.PhysScan) or below.table is None:
        return None
    return above, agg, below.table


# tables whose named key is monotone in generator row/unit order — the
# split-pruning targets (``TpchMetadata`` orderkey/custkey… orderings)
MONOTONE_KEYS = {"orders": "o_orderkey", "lineitem": "l_orderkey",
                 "customer": "c_custkey", "part": "p_partkey",
                 "supplier": "s_suppkey"}


def pruned_unit_range(agg_child: PH.PhysOp, scan: PH.PhysScan, table: str,
                      total_units: int):
    """(first_unit, n_units) covering the scan filters' provable domain
    over the table's monotone key — TupleDomain-driven split pruning
    (reference: ``DomainTranslator`` + ``ConnectorMetadata.applyFilter``;
    here splits are generator unit ranges)."""
    from ..sql import ir
    from ..sql.planner import domains as DOM

    keycol = MONOTONE_KEYS.get(table)
    if keycol is None:
        return 0, total_units
    name = scan.alias_prefix + keycol
    dom = DOM.ALL
    node = agg_child
    while isinstance(node, (PH.PhysFilter, PH.PhysProject)):
        if isinstance(node, PH.PhysFilter):
            d = DOM.extract(node.predicate).get(name)
            if d is not None:
                dom = dom.intersect(d)
        else:
            passthrough = any(
                n == name and isinstance(e, ir.ColumnRef) and e.name == name
                for n, e in node.projections)
            if not passthrough:
                # the namespace above this projection doesn't contain the
                # key as-is: constraints gathered so far are unreliable
                dom = DOM.ALL
        node = node.children()[0]
    if dom.is_all:
        return 0, total_units
    if dom.none:
        return 0, 0
    if table in ("orders", "lineitem"):
        # invert the dbgen sparse orderkey (8 used keys per 32-key block)
        def inv(k):
            k = int(k)
            return (k >> 5) * 8 + min(k & 31, 7)
        lo_u = 0 if dom.lo is None else max(inv(dom.lo) - 1, 0)
        hi_u = total_units if dom.hi is None \
            else min(inv(dom.hi) + 1, total_units)
    else:  # dense 1-based keys: key = unit index + 1
        lo_u = 0 if dom.lo is None else max(int(dom.lo) - 1, 0)
        hi_u = total_units if dom.hi is None \
            else min(int(dom.hi), total_units)
    return lo_u, max(hi_u - lo_u, 0)


def _substitute_scan(node: PH.PhysOp, chunk: Chunk) -> PH.PhysOp:
    if isinstance(node, PH.PhysScan):
        # alias prefix is already applied by scan_slice caller
        return PH.PhysMaterial(chunk)
    return dataclasses.replace(node, child=_substitute_scan(
        node.child, chunk))


def run_streaming_agg(runner, plan: PH.PhysOp,
                      slice_rows: int = 1 << 22) -> Optional["Table"]:
    """Execute an eligible aggregation plan slice-at-a-time; None if the
    plan shape is not streamable (caller falls back)."""
    from ..parallel.distributed import (merge_agg_states,
                                        partial_agg_states)
    from .runner import materialize

    found = find_streamable_agg(plan)
    if found is None:
        return None
    above, agg, table = found
    ds = runner.datasource
    if table in ds.memory:
        return None  # memory tables are already resident; nothing to stream
    scan = agg.child
    while not isinstance(scan, PH.PhysScan):
        scan = scan.children()[0]
    total = ds.table_rows(table)
    ctx = PH.ExecContext(ds)
    lo, cnt = pruned_unit_range(agg.child, scan, table, total)
    if cnt == 0:
        # provably-empty domain: still run one unit through the real
        # filter so empty-aggregate semantics fall out naturally
        lo, cnt = 0, min(total, 1)
    end = lo + cnt

    if not agg.groups:
        return _stream_global(runner, plan, above, agg, scan, total,
                              slice_rows, ctx, lo, end)

    capacity = max(64, HT.capacity_for(agg.ndv_hint * 2))
    partials: List[Chunk] = []
    state_specs = None
    first = lo
    while first < end:
        n = min(slice_rows, end - first)
        slice_chunk = ds.scan_slice(table, sorted(set(scan.columns)), first,
                                    n)
        if scan.alias_prefix:
            slice_chunk = Chunk(
                {scan.alias_prefix + k: v
                 for k, v in slice_chunk.cols.items()}, slice_chunk.mask)
        sub = _substitute_scan(agg.child, slice_chunk)
        pre = PH.execute(sub, ctx)
        while True:
            part, state_specs, ovf = partial_agg_states(agg, pre, capacity)
            if not bool(ovf):
                break
            capacity *= 8  # rehash: regrow and redo this slice
            partials = _rebuild_partials(partials)
        partials.append(part)
        first += n
        # merge eagerly so resident state stays ndv-bounded even with
        # thousands of slices
        if len(partials) >= 8:
            partials = [_merge(agg, partials, state_specs, capacity,
                               keep_states=True)]
    merged = _merge(agg, partials, state_specs, capacity, keep_states=False)
    out = merged
    for node in reversed(above):
        out = PH.execute(_substitute_scan_top(node, out), ctx)
    return materialize(out)


def _substitute_scan_top(node: PH.PhysOp, chunk: Chunk) -> PH.PhysOp:
    return dataclasses.replace(node, child=PH.PhysMaterial(chunk))


def _rebuild_partials(partials: List[Chunk]) -> List[Chunk]:
    return partials  # states are capacity-independent; nothing to redo


def _merge(agg, partials: List[Chunk], state_specs, capacity: int,
           keep_states: bool) -> Chunk:
    from ..parallel.distributed import merge_agg_states
    cat = partials[0] if len(partials) == 1 else PH.concat_chunks(partials)
    while True:  # host retry: regrow on ndv-estimate miss (rehash)
        if keep_states:
            # intermediate merge: combine states but keep them as states
            merged, ovf = _merge_states_only(agg, cat, state_specs,
                                             capacity)
        else:
            merged, ovf = merge_agg_states(agg, cat, state_specs, capacity)
        if not bool(ovf):
            return merged
        capacity *= 8


def _merge_states_only(agg, partials: Chunk, state_specs, capacity: int):
    """Combine duplicate groups' states without finalizing (the reference's
    INTERMEDIATE step)."""
    import jax.numpy as jnp
    from ..ops import agg as A
    from ..ops import int128 as I128
    from ..sql import ir
    from .columns import DCol

    gkeys = tuple(ir.ColumnRef(n, e.dtype) for n, e in agg.groups)
    owner, slot, ovf = PH._insert_kernel(partials, gkeys, capacity)
    gvalid = owner != HT.EMPTY
    rep = jnp.minimum(owner, partials.n_rows - 1)
    out = {}
    for name, _ in agg.groups:
        out[name] = partials.cols[name].take(rep, valid=gvalid)
    for sname, sfunc in state_specs:
        c = partials.cols[sname]
        m = partials.mask & (slot >= 0) & c.valid_or_true()
        if sfunc == "hll":
            from ..ops import hll as HLL
            v = HLL.seg_merge(c.values, slot, m, capacity)
        elif sfunc == "sum":
            if c.values.ndim == 2:
                v = I128.pack(*I128.seg_sum128_from_i128(
                    c.values, slot, m, capacity))
            else:
                acc = (jnp.float64 if jnp.issubdtype(c.values.dtype,
                                                     jnp.floating)
                       else jnp.int64)
                v = A.seg_sum(c.values, slot, m, capacity, acc)
        elif sfunc == "min":
            v = (I128.pack(*I128.seg_min128(c.values, slot, m, capacity))
                 if c.values.ndim == 2
                 else A.seg_min(c.values, slot, m, capacity))
        else:
            v = (I128.pack(*I128.seg_max128(c.values, slot, m, capacity))
                 if c.values.ndim == 2
                 else A.seg_max(c.values, slot, m, capacity))
        nonempty = A.seg_count(slot, m, capacity) > 0
        out[sname] = DCol(c.dtype, c.kind, v, validity=gvalid & nonempty,
                          dictionary=c.dictionary)
    return Chunk(out, gvalid), ovf


def _stream_global(runner, plan, above, agg, scan, total, slice_rows, ctx,
                   lo=0, end=None):
    """Global (no GROUP BY) streaming: per-slice one-row partials, merged
    by a final global aggregation over the concatenated partial rows."""
    from ..sql import ir
    from .runner import materialize

    ds = runner.datasource
    # expand avg into sum/count partials (the reference's PARTIAL step)
    expanded, avg_specs, merge_specs = [], [], []
    for spec in agg.aggs:
        if spec.func == "avg":
            avg_specs.append(spec)
            expanded.append(PH.AggSpec(f"{spec.name}#sum", "sum", spec.arg))
            expanded.append(PH.AggSpec(f"{spec.name}#cnt", "count",
                                       spec.arg))
        else:
            expanded.append(spec)
    part_plan = PH.PhysHashAggregate(None, (), tuple(expanded), 1)

    parts: List[Chunk] = []
    first = lo
    end = total if end is None else end
    while first < end:
        n = min(slice_rows, end - first)
        slice_chunk = ds.scan_slice(scan.table, sorted(set(scan.columns)),
                                    first, n)
        if scan.alias_prefix:
            slice_chunk = Chunk(
                {scan.alias_prefix + k: v
                 for k, v in slice_chunk.cols.items()}, slice_chunk.mask)
        sub = _substitute_scan(agg.child, slice_chunk)
        pre = PH.execute(sub, ctx)
        parts.append(PH._exec_global_agg(part_plan, pre))
        first += n
    cat = parts[0] if len(parts) == 1 else PH.concat_chunks(parts)

    # merge partial rows: counts/sums merge as SUM, min/max as themselves
    merge_map = {"count": "sum", "count_star": "sum", "sum": "sum",
                 "min": "min", "max": "max"}
    mspecs = []
    for spec in expanded:
        mfunc = merge_map.get(spec.func)
        if mfunc is None:
            return None  # unmergeable global state: fall back
        ot = PH._agg_output_type(spec)
        mspecs.append(PH.AggSpec(spec.name, mfunc,
                                 ir.ColumnRef(spec.name, ot)))
    merged = PH._exec_global_agg(
        PH.PhysHashAggregate(None, (), tuple(mspecs), 1), cat)

    # finalize avg from merged sum/count
    out_cols = {}
    for spec in agg.aggs:
        if spec.func == "avg":
            import jax.numpy as jnp
            from ..data import types as T
            from ..ops import int128 as I128
            from .columns import DCol
            s = merged.cols[f"{spec.name}#sum"]
            cnum = merged.cols[f"{spec.name}#cnt"]
            ot = PH._agg_output_type(spec)
            cnt = jnp.maximum(cnum.values, 1)
            if T.is_decimal(spec.arg.dtype):
                if s.values.ndim == 2:
                    hi, lo = I128.unpack(s.values)
                else:
                    hi, lo = I128.from_i64(s.values)
                qhi, qlo = I128.div_round_half_up(hi, lo,
                                                  *I128.from_i64(cnt))
                v = I128.pack(qhi, qlo) if T.is_long_decimal(ot) else qlo
            else:
                v = s.values.astype(jnp.float64) / cnt
            out_cols[spec.name] = DCol(ot, PH.PLAIN, v,
                                       validity=cnum.values > 0)
        else:
            out_cols[spec.name] = merged.cols[spec.name]
    out = Chunk(out_cols, merged.mask)
    for node in reversed(above):
        out = PH.execute(_substitute_scan_top(node, out), ctx)
    return materialize(out)
