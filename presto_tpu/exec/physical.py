"""Physical operators: a query plan fragment → fused XLA programs.

The TPU redesign of the reference's operator/driver engine
(``operator/Operator.java:21``, ``operator/Driver.java:270``): there is no
per-page pull loop on device — each physical operator contributes a pure
traced function over whole Chunks, jit-compiled per (operator, input
layout).  Selection is a row mask; data-dependent output sizes (join
fan-out, group counts) are resolved at host stage boundaries by reading one
scalar and bucket-padding to a power of two — the shape-bucketing answer to
the reference's adaptive batching (``operator/project/PageProcessor.java:268``).

Operators implemented here ↔ reference:
- PhysScan            ← TableScanOperator + TPC-H connector page source
- PhysFilter/Project  ← FilterAndProjectOperator + compiled PageProcessor
- PhysHashAggregate   ← HashAggregationOperator + InMemoryHashAggregationBuilder
- PhysHashJoin        ← HashBuilderOperator + LookupJoinOperator (+ semi/anti:
                        HashSemiJoinOperator/SetBuilderOperator)
- PhysSort/Limit      ← OrderByOperator (PagesIndex.sort) / TopN / Limit
- PhysScalarBind      ← uncorrelated scalar subquery (EnforceSingleRow + join)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data import types as T
from ..data.column import PLAIN, DICT, BYTES
from ..data.column import ARRAY as COL_ARRAY, MAP as COL_MAP
from ..ops import agg as A
from ..ops import hashtable as HT
from ..ops import hll as HLL
from ..ops import sort as SORT
from ..ops import decimal as DEC
from ..ops import int128 as I128
from ..sql import ir
from .columns import Chunk, DCol, from_host, to_host
from .expreval import eval_expr, eval_predicate, _scale_of


# ---------------------------------------------------------------- plan nodes

@dataclass
class PhysOp:
    def children(self) -> Sequence["PhysOp"]:
        return ()


@dataclass
class PhysScan(PhysOp):
    table: str
    columns: Tuple[str, ...]
    alias_prefix: str = ""  # rename columns on scan (self-join disambiguation)


@dataclass
class PhysFilter(PhysOp):
    child: PhysOp
    predicate: ir.Expr

    def children(self):
        return (self.child,)


@dataclass
class PhysProject(PhysOp):
    child: PhysOp
    projections: Tuple[Tuple[str, ir.Expr], ...]  # output = exactly these

    def children(self):
        return (self.child,)


@dataclass(frozen=True)
class AggSpec:
    name: str
    func: str                       # sum|count|count_star|min|max|avg|min_by|…
    arg: Optional[ir.Expr] = None
    distinct: bool = False
    arg2: Optional[ir.Expr] = None  # ordering key for min_by/max_by
    param: Optional[float] = None   # percentile for approx_percentile


@dataclass
class PhysHashAggregate(PhysOp):
    child: PhysOp
    groups: Tuple[Tuple[str, ir.Expr], ...]
    aggs: Tuple[AggSpec, ...]
    ndv_hint: int = 1024
    # True when the hint derives from exact key statistics over an
    # UNFILTERED input (e.g. GROUP BY a primary key with no WHERE): the
    # traced path then allocates the hint directly instead of starting
    # optimistic and paying a guaranteed overflow-retry recompile
    ndv_reliable: bool = False

    def children(self):
        return (self.child,)


@dataclass
class PhysMaterial(PhysOp):
    """An already-materialized chunk as a leaf (streaming slices, stage
    results fed back into a residual plan)."""

    chunk: object  # Chunk

    def children(self):
        return ()


@dataclass
class PhysHashJoin(PhysOp):
    probe: PhysOp
    build: PhysOp
    probe_keys: Tuple[ir.Expr, ...]
    build_keys: Tuple[ir.Expr, ...]
    kind: str = "inner"             # inner | left | semi | anti | mark
    unique_build: bool = True       # build keys unique (PK side)
    # kind == "mark": existence bit emitted as this boolean output column
    # instead of filtering (reference: SemiJoinNode's semiJoinOutput)
    mark_name: str = ""
    build_payload: Tuple[Tuple[str, str], ...] = ()  # (out_name, build_col)
    filter: Optional[ir.Expr] = None  # non-equi residual over probe+payload
    build_est: float = -1.0         # planner's build-side row estimate (CBO)
    probe_est: float = -1.0         # planner's probe-side row estimate
    # static BUFFER bound of the build subtree (filters only mask rows in
    # traced programs, so broadcast memory follows the unfiltered scan
    # cardinality, not the selectivity-discounted estimate)
    build_cap_est: float = -1.0
    # planner's estimate of LIVE output rows (selectivity-discounted):
    # the traced path compacts the output buffer down to ~this capacity
    # when it is far below the probe buffer, so downstream sorts/groups
    # run over the surviving rows, not the padded scan shape (the
    # reference streams probe pages so its downstream operators never
    # see dead rows; one compaction pass is the whole-program analogue)
    out_est: float = -1.0
    # distribution (reference: JoinNode.DistributionType, set by the
    # add_exchanges pass — sql/planner/distribution.py):
    dist_type: str = "replicated"   # replicated | partitioned

    def children(self):
        return (self.probe, self.build)


@dataclass
class PhysSort(PhysOp):
    child: PhysOp
    keys: Tuple[Tuple[ir.Expr, bool], ...]  # (expr, descending)
    limit: Optional[int] = None

    def children(self):
        return (self.child,)


@dataclass
class PhysLimit(PhysOp):
    child: PhysOp
    n: int

    def children(self):
        return (self.child,)


@dataclass(frozen=True)
class WindowSpec:
    name: str                        # output column
    func: str                        # row_number|rank|dense_rank|lead|lag|
    #                                  first_value|sum|count|min|max|avg
    arg: Optional[ir.Expr] = None
    offset: int = 1                  # lead/lag distance
    frame: Optional[tuple] = None    # ("rows"|"range"|"groups", lo, hi)
    ignore_nulls: bool = False       # lead/lag/first/last/nth


@dataclass
class PhysMatchRecognize(PhysOp):
    """Row-pattern recognition, ONE ROW PER MATCH / SKIP PAST LAST ROW.

    Replaces ``operator/window/PatternRecognitionPartition.java``'s
    per-row backtracking: DEFINE predicates evaluate vectorized into a
    per-row bitmask, the pattern's DFA advances for every candidate start
    in lockstep (``ops/pattern.py``), skip resolution is one while_loop."""

    child: PhysOp
    partition: Tuple[ir.Expr, ...]
    order: Tuple[Tuple[ir.Expr, bool], ...]
    # (output name, func, arg): func ∈ first|last|count|match_number
    measures: Tuple[Tuple[str, str, Optional[ir.Expr]], ...]
    pattern: object                  # ops.pattern AST
    defines: Tuple[Tuple[str, ir.Expr], ...]
    window: int = 256                # max rows per match (static bound)
    # ALL ROWS PER MATCH: emit every matched row (RUNNING measure
    # semantics), not just one row per match
    all_rows: bool = False
    # pass-through columns for ALL ROWS (all source columns)
    passthrough: Tuple[str, ...] = ()

    def children(self):
        return (self.child,)


@dataclass
class PhysWindow(PhysOp):
    """Window functions over (PARTITION BY, ORDER BY) specs.

    Replaces ``operator/WindowOperator.java`` + ``operator/window/``: one
    global sort by (partition, order) keys, vectorized prefix computations,
    scatter back to input order (no per-partition row loop)."""

    child: PhysOp
    partition: Tuple[ir.Expr, ...]
    order: Tuple[Tuple[ir.Expr, bool], ...]
    functions: Tuple[WindowSpec, ...]

    def children(self):
        return (self.child,)


@dataclass
class PhysConcat(PhysOp):
    """Vertical concatenation (UNION ALL).  Reference: UnionNode →
    LocalExchange merging of sources."""

    inputs: Tuple[PhysOp, ...]

    def children(self):
        return self.inputs


@dataclass
class PhysGroupId(PhysOp):
    """GROUPING SETS row expansion (reference:
    ``operator/GroupIdOperator.java``): each input row replicates once per
    grouping set; grouping-set key columns are NULLed where the set does
    not contain them; ``gid_name`` carries the set ordinal.  ONE scan of
    the input feeds every grouping set (the round-3 plan-level
    flatten+UNION re-scanned the input per set).  TPU shape: a static
    N×S tile + per-copy validity masks — no per-row loop."""

    child: PhysOp
    keys: Tuple[Tuple[str, ir.Expr], ...]   # (out_name, key expr)
    sets: Tuple[Tuple[bool, ...], ...]      # per set: key participation
    gid_name: str = "$groupid"

    def children(self):
        return (self.child,)


@dataclass
class PhysUnnest(PhysOp):
    """Lateral array/map expansion (reference:
    ``operator/unnest/UnnestOperator.java:47``).  TPU shape: the output is
    a static ``N×W`` grid (W = array capacity), masked by element validity
    — no per-row cursor, one gather per column."""

    child: PhysOp
    exprs: Tuple[ir.Expr, ...]
    # output column names per expr: 1 name for arrays, 2 for maps
    names: Tuple[Tuple[str, ...], ...]
    ordinality: Optional[str] = None   # WITH ORDINALITY output name

    def children(self):
        return (self.child,)


@dataclass
class PhysScalarBind(PhysOp):
    """Bind single-row subplan results as broadcast columns of the child."""

    child: PhysOp
    bindings: Tuple[Tuple[str, "PhysOp"], ...]

    def children(self):
        return (self.child,) + tuple(p for _, p in self.bindings)


# ---------------------------------------------------------------- jitted cores

@partial(jax.jit, static_argnames=("expr",))
def _filter_kernel(chunk: Chunk, expr: ir.Expr) -> jnp.ndarray:
    return eval_predicate(expr, chunk) & chunk.mask


@partial(jax.jit, static_argnames=("projections",))
def _project_kernel(chunk: Chunk, projections) -> Chunk:
    cols = {name: eval_expr(e, chunk) for name, e in projections}
    return Chunk(cols, chunk.mask)


@partial(jax.jit, static_argnames=("bucket",))
def _compact_kernel(chunk: Chunk, bucket: int) -> Chunk:
    """Gather masked-in rows to the front and truncate to ``bucket`` rows."""
    perm = jnp.argsort(~chunk.mask, stable=True)[:bucket]
    cols = {n: c.take(perm) for n, c in chunk.cols.items()}
    return Chunk(cols, chunk.mask[perm])


def _key_arrays(chunk: Chunk, exprs: Sequence[ir.Expr]) -> List[jnp.ndarray]:
    """Normalize key expressions into int64 arrays for hashing/sorting
    (join-equality semantics: validity does NOT participate — NULL join
    keys are handled by the callers' masks)."""
    out: List[jnp.ndarray] = []
    for e in exprs:
        c = eval_expr(e, chunk)
        if c.kind == BYTES:
            out.extend(SORT.bytes_sort_keys(c.values, c.lengths))
        elif c.values.ndim == 2:  # long decimal: both words key
            out.extend(I128.unpack(c.values))
        else:
            out.append(c.values.astype(jnp.int64))
    return out


def _group_key_arrays(chunk: Chunk,
                      exprs: Sequence[ir.Expr]) -> List[jnp.ndarray]:
    """Key arrays with SQL GROUP BY null semantics: a nullable key
    contributes its validity bit as an extra key array and zeroes the
    value where invalid, so all NULLs form ONE group distinct from every
    real value (reference ``MultiChannelGroupByHash`` hashes the null
    flag into the group; GROUPING SETS NULLed key copies depend on it)."""
    out: List[jnp.ndarray] = []
    for e in exprs:
        c = eval_expr(e, chunk)
        nullable = c.validity is not None
        if nullable:
            out.append(c.validity.astype(jnp.int64))

        def nz(a, c=c, nullable=nullable):
            if not nullable:
                return a
            v = c.validity
            while v.ndim < a.ndim:
                v = v[:, None]
            return jnp.where(v, a, 0)

        if c.kind == BYTES:
            out.extend(nz(p) for p in
                       SORT.bytes_sort_keys(c.values, c.lengths))
        elif c.values.ndim == 2:  # long decimal: both words key
            out.extend(nz(p) for p in I128.unpack(c.values))
        else:
            out.append(nz(c.values.astype(jnp.int64)))
    return out


def _direct_group_ids(chunk: Chunk, exprs, capacity: int):
    """Perfect-hash group ids for statically-small key domains.

    When every group key is a dictionary-coded string or a boolean, the
    group id is the composite code — no sort, no table (the
    ``BigintGroupByHash`` small-domain specialization,
    ``operator/BigintGroupByHash.java:53``).  Domain sizes are static
    (dictionary length), so this is a trace-time decision.  Returns None
    when any key's domain is unknown or the product exceeds the bcast
    budget."""
    cols, sizes = [], []
    for e in exprs:
        c = eval_expr(e, chunk)
        if c.kind == DICT:
            sizes.append(max(len(c.dictionary), 1))
        elif isinstance(c.dtype, T.BooleanType):
            sizes.append(2)
        else:
            return None
        cols.append(c.values.astype(jnp.int32))
    prod = 1
    for s in sizes:
        prod *= s
    if prod > capacity or prod > A.SEG_BCAST_CAP:
        return None
    n = chunk.n_rows
    gid = jnp.zeros((n,), jnp.int32)
    for c, s in zip(cols, sizes):
        gid = gid * s + jnp.clip(c, 0, s - 1)
    slot_of_row = jnp.where(chunk.mask, gid, -1)
    rowid = jnp.arange(n, dtype=jnp.int32)
    sel = (gid[None, :] == jnp.arange(prod, dtype=jnp.int32)[:, None]) \
        & chunk.mask[None, :]
    first = jnp.min(jnp.where(sel, rowid[None, :], n), axis=1)
    owner_small = jnp.where(first < n, first, HT.EMPTY).astype(jnp.int32)
    owner = jnp.full((capacity,), HT.EMPTY, jnp.int32).at[:prod].set(
        owner_small)
    return owner, slot_of_row, jnp.bool_(False)


@partial(jax.jit, static_argnames=("exprs", "capacity"))
def _insert_kernel(chunk: Chunk, exprs, capacity: int):
    direct = _direct_group_ids(chunk, exprs, capacity)
    if direct is not None:
        return direct
    keys = _group_key_arrays(chunk, exprs)
    return HT.insert(keys, chunk.mask, capacity)


@partial(jax.jit, static_argnames=("exprs", "capacity"))
def _build_kernel(chunk: Chunk, exprs, capacity: int):
    keys = _key_arrays(chunk, exprs)
    return HT.build(keys, chunk.mask, capacity)


@partial(jax.jit, static_argnames=("exprs",))
def _probe_counts_kernel(table: HT.HashTable, chunk: Chunk, exprs):
    keys = _key_arrays(chunk, exprs)
    return HT.probe_counts(table, keys, chunk.mask)


@partial(jax.jit, static_argnames=("exprs",))
def _probe_unique_kernel(table: HT.HashTable, chunk: Chunk, exprs):
    keys = _key_arrays(chunk, exprs)
    return HT.probe_unique(table, keys, chunk.mask)


# ---------------------------------------------------------------- executor

@dataclass
class ExecContext:
    datasource: object                      # DataSource
    compact_threshold: float = 0.25         # compact when selectivity below
    min_rows_for_compaction: int = 1 << 14
    stats: Dict[str, float] = field(default_factory=dict)
    collect_stats: bool = False             # EXPLAIN ANALYZE mode
    node_stats: Dict[int, dict] = field(default_factory=dict)
    # operator-state budget (HBM tier): when a join/agg's working set
    # would exceed the pool's remaining budget, execution switches to
    # partition-at-a-time (the reference's GenericPartitioningSpiller +
    # PartitionedConsumption shape, minus the disk — partitions that are
    # not in flight simply aren't materialized)
    pool: object = None                     # utils.memory.MemoryPool
    spill_partitions: int = 0               # observability: partitioned runs


def execute(plan: PhysOp, ctx: ExecContext) -> Chunk:
    """Operator-at-a-time execution with optional per-node stats
    (the reference's OperationTimer per getOutput/addInput,
    ``operator/Driver.java:388`` → OperatorStats)."""
    if not ctx.collect_stats:
        return _execute_node(plan, ctx)
    import time as _time
    import jax as _jax
    t0 = _time.perf_counter()
    out = _execute_node(plan, ctx)
    _jax.block_until_ready(out.mask)
    wall = (_time.perf_counter() - t0) * 1000
    import jax.numpy as _jnp
    rows = int(_jnp.sum(out.mask))
    nbytes = sum(int(c.values.size) * c.values.dtype.itemsize
                 + (0 if c.lengths is None else int(c.lengths.nbytes))
                 for c in out.cols.values()) + int(out.mask.nbytes)
    self_ms = wall - sum(ctx.node_stats.get(id(c), {}).get("tree_ms", 0)
                         for c in plan.children())
    ctx.node_stats[id(plan)] = {
        "rows": rows, "wall_ms": max(self_ms, 0.0), "tree_ms": wall,
        "bytes": nbytes}
    return out


def _execute_node(plan: PhysOp, ctx: ExecContext) -> Chunk:
    if isinstance(plan, PhysMaterial):
        return plan.chunk
    if isinstance(plan, PhysScan):
        return ctx.datasource.scan(plan.table, plan.columns, plan.alias_prefix)
    if isinstance(plan, PhysFilter):
        child = execute(plan.child, ctx)
        try:
            mask = _filter_kernel(child, plan.predicate)
        except NotImplementedError:
            # host-evaluated string function (regex/JSON over raw bytes):
            # run the expression eagerly instead of tracing it
            mask = eval_predicate(plan.predicate, child) & child.mask
        return _maybe_compact(Chunk(child.cols, mask), ctx)
    if isinstance(plan, PhysProject):
        child = execute(plan.child, ctx)
        try:
            return _project_kernel(child, plan.projections)
        except NotImplementedError:
            cols = {name: eval_expr(e, child)
                    for name, e in plan.projections}
            return Chunk(cols, child.mask)
    if isinstance(plan, PhysHashAggregate):
        return _exec_agg(plan, ctx)
    if isinstance(plan, PhysHashJoin):
        return _exec_join(plan, ctx)
    if isinstance(plan, PhysSort):
        return _exec_sort(plan, ctx)
    if isinstance(plan, PhysLimit):
        child = execute(plan.child, ctx)
        return _exec_limit(child, plan.n)
    if isinstance(plan, PhysScalarBind):
        return _exec_scalar_bind(plan, ctx)
    if isinstance(plan, PhysWindow):
        return _exec_window(plan, ctx)
    if isinstance(plan, PhysMatchRecognize):
        return _exec_match_recognize(plan, ctx)
    if isinstance(plan, PhysConcat):
        return concat_chunks([execute(c, ctx) for c in plan.inputs])
    if isinstance(plan, PhysUnnest):
        return _exec_unnest(plan, ctx)
    if isinstance(plan, PhysGroupId):
        return _groupid_kernel(execute(plan.child, ctx), plan.keys,
                               plan.sets, plan.gid_name)
    raise NotImplementedError(type(plan).__name__)


@partial(jax.jit, static_argnames=("keys", "sets", "gid_name"))
def _groupid_kernel(chunk: Chunk, keys, sets, gid_name) -> Chunk:
    """Row expansion for GROUPING SETS: output row ``r*S + j`` is input
    row ``r`` under grouping set ``j`` (static tile, no data-dependent
    shapes).  Key column copies get validity &= participation[j]."""
    n = chunk.n_rows
    s = len(sets)
    rep = jnp.repeat(jnp.arange(n), s)            # [n*s] input row ids
    setid = jnp.tile(jnp.arange(s), n)            # [n*s] grouping set ids
    cols = {name: c.take(rep) for name, c in chunk.cols.items()}
    for ki, (out_name, e) in enumerate(keys):
        kc = eval_expr(e, chunk).take(rep)
        part = jnp.asarray([bool(st[ki]) for st in sets])[setid]
        v = part if kc.validity is None else (kc.validity & part)
        cols[out_name] = DCol(kc.dtype, kc.kind, kc.values, kc.lengths,
                              v, kc.dictionary, kc.values2, kc.dictionary2)
    cols[gid_name] = DCol(T.BIGINT, PLAIN, setid.astype(jnp.int64))
    return Chunk(cols, chunk.mask[rep])


@partial(jax.jit, static_argnames=("exprs", "names", "ordinality"))
def _unnest_kernel(chunk: Chunk, exprs, names, ordinality) -> Chunk:
    from ..data.column import ARRAY as _ARR, MAP as _MAP
    arrs = [eval_expr(e, chunk) for e in exprs]
    n = chunk.n_rows
    w = max((a.values.shape[1] for a in arrs), default=1)
    w = max(w, 1)
    row = jnp.repeat(jnp.arange(n), w)          # [n*w]
    pos = jnp.tile(jnp.arange(w), n)            # [n*w]
    # zip semantics (multiple UNNEST args): expand to the MAX length,
    # shorter arrays pad with NULL elements.  A NULL array contributes
    # ZERO rows (Trino: UNNEST of NULL emits nothing), so each
    # argument's row validity gates its length's contribution to maxlen.
    def eff_len(a):
        if a.validity is None:
            return a.lengths
        return jnp.where(a.validity, a.lengths, 0)

    maxlen = eff_len(arrs[0])
    for a in arrs[1:]:
        maxlen = jnp.maximum(maxlen, eff_len(a))
    out_mask = chunk.mask[row] & (pos < maxlen[row])
    cols = {nm: c.take(row) for nm, c in chunk.cols.items()}
    for a, outs in zip(arrs, names):
        elem_valid = (pos < a.lengths[row])
        if a.validity is not None:
            elem_valid &= a.validity[row]
        ev = a.values[row, jnp.minimum(pos, a.values.shape[1] - 1)] \
            if a.values.shape[1] else jnp.zeros((n * w,), a.values.dtype)
        kind = DICT if a.dictionary is not None else PLAIN
        if a.kind == _MAP:
            kt, vt = a.dtype.key, a.dtype.value
            ev2 = a.values2[row, jnp.minimum(pos, a.values2.shape[1] - 1)] \
                if a.values2.shape[1] else jnp.zeros((n * w,),
                                                     a.values2.dtype)
            cols[outs[0]] = DCol(kt, kind if T.is_string(kt) else PLAIN,
                                 ev, validity=elem_valid,
                                 dictionary=a.dictionary
                                 if T.is_string(kt) else None)
            vdict = a.dictionary2 if a.dictionary2 is not None \
                else a.dictionary
            cols[outs[1]] = DCol(vt, (DICT if vdict is not None else PLAIN)
                                 if T.is_string(vt) else PLAIN,
                                 ev2, validity=elem_valid,
                                 dictionary=vdict
                                 if T.is_string(vt) else None)
        else:
            cols[outs[0]] = DCol(a.dtype.element, kind, ev,
                                 validity=elem_valid,
                                 dictionary=a.dictionary)
    if ordinality:
        cols[ordinality] = DCol(T.BIGINT, PLAIN,
                                (pos + 1).astype(jnp.int64))
    return Chunk(cols, out_mask)


def _exec_unnest(plan: PhysUnnest, ctx: ExecContext) -> Chunk:
    child = execute(plan.child, ctx)
    out = _unnest_kernel(child, plan.exprs, plan.names, plan.ordinality)
    return _maybe_compact(out, ctx)


def _maybe_compact(chunk: Chunk, ctx: ExecContext) -> Chunk:
    n = chunk.n_rows
    if n < ctx.min_rows_for_compaction:
        return chunk
    count = int(jnp.sum(chunk.mask))  # host sync at stage boundary
    if count > n * ctx.compact_threshold:
        return chunk
    bucket = max(HT.next_pow2(max(count, 1)), 1 << 10)
    if bucket >= n:
        return chunk
    return _compact_kernel(chunk, bucket)


def _exec_limit(child: Chunk, n: int) -> Chunk:
    # rows must be mask-compacted in order for a static slice to be correct;
    # limit after sort satisfies this (sort moves valid rows to the front).
    if n >= child.n_rows:
        return child
    cols = {name: DCol(c.dtype, c.kind, c.values[:n],
                       None if c.lengths is None else c.lengths[:n],
                       None if c.validity is None else c.validity[:n],
                       c.dictionary,
                       None if c.values2 is None else c.values2[:n])
            for name, c in child.cols.items()}
    return Chunk(cols, child.mask[:n])


def _sort_key_arrays(chunk: Chunk, keys) -> List[Tuple[jnp.ndarray, bool]]:
    """Normalize sort-key exprs to (int64 array, descending) pairs.

    NULL keys sort as larger than any non-null value (Trino default:
    NULLS LAST ascending, NULLS FIRST descending) — applied by replacing
    null key values with +max BEFORE the descending bit-complement."""
    karrs: List[Tuple[jnp.ndarray, bool]] = []
    for e, desc in keys:
        c = eval_expr(e, chunk)
        if c.kind == BYTES:
            packs = SORT.bytes_sort_keys(c.values, c.lengths)
        elif c.values.ndim == 2:  # long decimal: (hi signed, lo unsigned)
            packs = I128.sort_keys(*I128.unpack(c.values))
        elif c.kind == DICT:
            # order by string value: host-computed rank of each code
            rank = np.argsort(np.argsort(
                [str(s) for s in c.dictionary.strings]))
            packs = [jnp.asarray(rank)[c.values]]
        elif jnp.issubdtype(c.values.dtype, jnp.floating):
            # DOUBLE keys: order-preserving bit unfold (astype(int64)
            # would truncate every fraction into one peer group)
            packs = [SORT.float_sort_keys(c.values)]
        else:
            packs = [c.values]
        for p in packs:
            if c.validity is not None:
                p = jnp.where(c.validity, p.astype(jnp.int64), SORT.I64_MAX)
            karrs.append((p, desc))
    return karrs


def _sort_traced(chunk: Chunk, keys) -> Chunk:
    """Traced sort body (shared by local jit path and shard_map path)."""
    perm = SORT.argsort_multi(_sort_key_arrays(chunk, keys), chunk.mask)
    cols = {n: c.take(perm) for n, c in chunk.cols.items()}
    return Chunk(cols, chunk.mask[perm])


_sort_kernel = partial(jax.jit, static_argnames=("keys",))(_sort_traced)


def _exec_sort(plan: PhysSort, ctx: ExecContext) -> Chunk:
    child = execute(plan.child, ctx)
    pool = getattr(ctx, "pool", None)
    if pool is not None and pool.budget is not None:
        from ..utils.memory import chunk_bytes
        need = 3 * chunk_bytes(child)
        avail = max(pool.budget - pool.used, 1)
        if need > avail:
            k = min(max(2, HT.next_pow2(-(-need // avail))), 64)
            return _exec_sort_partitioned(plan, child, ctx, k)
    out = _sort_kernel(child, plan.keys)
    if plan.limit is not None:
        out = _exec_limit(out, plan.limit)
    return out


def _lex_ge(arrays: List[jnp.ndarray], pivot: List[jnp.ndarray]):
    """Row-wise lexicographic (arrays tuple) >= (pivot scalars tuple)."""
    ge = jnp.ones_like(arrays[0], dtype=jnp.bool_)
    out = jnp.zeros_like(ge)
    for a, p in zip(arrays, pivot):
        out = out | (ge & (a > p))
        ge = ge & (a == p)
    return out | ge


@partial(jax.jit, static_argnames=("keys", "k"))
def _sort_partition_ids(chunk: Chunk, keys, k: int) -> jnp.ndarray:
    """Range-partition ids (0..k-1) from sampled splitters over the
    normalized sort keys + a row-index tiebreak (equal-key runs split
    deterministically so partitions stay balanced under duplicates)."""
    normed = []
    for a, desc in _sort_key_arrays(chunk, keys):
        a = a.astype(jnp.int64)
        if desc:
            a = ~a
        normed.append(jnp.where(chunk.mask, a, SORT.I64_MAX))
    n = chunk.n_rows
    normed.append(jnp.arange(n, dtype=jnp.int64))
    s = min(4096, n)
    idx = (jnp.arange(s, dtype=jnp.int32) * max(n // max(s, 1), 1)) % n
    samples = [a[idx] for a in normed]
    sperm = SORT.argsort_multi([(g, False) for g in samples])
    part = jnp.zeros((n,), jnp.int32)
    for i in range(1, k):
        pos = sperm[(i * s) // k]
        pivot = [g[pos] for g in samples]
        part = part + _lex_ge(normed, pivot).astype(jnp.int32)
    return part


def _exec_sort_partitioned(plan: PhysSort, child: Chunk, ctx: ExecContext,
                           k: int) -> Chunk:
    """Sort under memory pressure: sample-based range partitioning + one
    partition sorted at a time; partition-order concatenation IS the
    merge (the reference spills sorted runs and N-way-merges them —
    ``operator/OrderByOperator.java`` + ``util/MergeSortedPages``; range
    partitioning designs the merge away)."""
    part = _sort_partition_ids(child, plan.keys, k)
    ctx.spill_partitions += k
    outs = []
    for p in range(k):
        sel = child.mask & (part == p)
        cnt = int(jnp.sum(sel))
        if cnt == 0:
            continue
        sub = _compact_kernel(Chunk(child.cols, sel),
                              max(HT.next_pow2(cnt), 64))
        outs.append(_sort_kernel(sub, plan.keys))
    out = (concat_chunks(outs) if outs
           else Chunk(dict(child.cols), child.mask & False))
    if plan.limit is not None:
        out = _exec_limit(out, plan.limit)
    return out


def dcol_to_bytes(c: DCol) -> DCol:
    """Decode a DICT column into fixed-width bytes (for concat/compare
    across unrelated dictionaries)."""
    if c.kind == BYTES:
        return c
    assert c.kind == DICT
    strs = [str(s).encode("ascii") for s in c.dictionary.strings]
    w = max((len(b) for b in strs), default=1)
    mat = np.zeros((len(strs), w), np.uint8)
    lens = np.zeros(len(strs), np.int32)
    for i, b in enumerate(strs):
        mat[i, :len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)
    codes = c.values
    return DCol(c.dtype, BYTES, jnp.asarray(mat)[codes],
                jnp.asarray(lens)[codes], c.validity)


def concat_chunks(chunks: List[Chunk]) -> Chunk:
    """Static-shape vertical concat; harmonizes layouts per column."""
    names = list(chunks[0].cols.keys())
    total_cols: Dict[str, DCol] = {}
    for name in names:
        cols = [ch.cols[name] for ch in chunks]
        kinds = {c.kind for c in cols}
        if kinds == {DICT} and all(c.dictionary is cols[0].dictionary
                                   for c in cols):
            pass  # same dictionary: concat codes directly
        elif DICT in kinds or kinds == {BYTES}:
            cols = [dcol_to_bytes(c) if c.kind != PLAIN else c for c in cols]
        n_total = sum(c.values.shape[0] for c in cols)
        if cols[0].kind == BYTES or (cols[0].kind == DICT and False):
            w = max(c.values.shape[1] for c in cols)
            vals = jnp.concatenate(
                [jnp.pad(c.values, ((0, 0), (0, w - c.values.shape[1])))
                 for c in cols])
            lens = jnp.concatenate([c.lengths for c in cols])
            validity = _concat_validity(cols)
            total_cols[name] = DCol(cols[0].dtype, BYTES, vals, lens, validity)
        else:
            if any(c.values.ndim == 2 for c in cols) \
                    and not all(c.values.ndim == 2 for c in cols):
                # harmonize long-decimal int128 word pairs with int64
                # branches (scales already aligned by planner casts)
                from ..ops import int128 as I128

                def _wide(c):
                    if c.values.ndim == 2:
                        return c
                    hi, lo = I128.from_i64(c.values.astype(jnp.int64))
                    return DCol(c.dtype, c.kind, I128.pack(hi, lo),
                                None, c.validity, c.dictionary)
                cols = [_wide(c) for c in cols]
            vals = jnp.concatenate([c.values for c in cols])
            validity = _concat_validity(cols)
            wide = next((c for c in cols if c.values.ndim == 2), cols[0])
            v2 = None
            if any(c.values2 is not None for c in cols):
                # zoned timestamps: concat presentation offsets (0 for
                # plain-timestamp branches coerced to the session zone)
                v2 = jnp.concatenate(
                    [c.values2 if c.values2 is not None
                     else jnp.zeros((c.values.shape[0],), jnp.int32)
                     for c in cols])
            total_cols[name] = DCol(wide.dtype, cols[0].kind, vals,
                                    None, validity, cols[0].dictionary,
                                    values2=v2)
    mask = jnp.concatenate([ch.mask for ch in chunks])
    return Chunk(total_cols, mask)


def _concat_validity(cols):
    if all(c.validity is None for c in cols):
        return None
    return jnp.concatenate([c.valid_or_true() for c in cols])


def _window_norm_keys(chunk: Chunk, exprs, descs=None):
    """Normalize window key exprs to int64 arrays (BYTES→packs, DICT→rank)."""
    out = []
    for i, e in enumerate(exprs):
        desc = descs[i] if descs else False
        c = eval_expr(e, chunk)
        if c.kind == BYTES:
            for p in SORT.bytes_sort_keys(c.values, c.lengths):
                out.append((p, desc))
        elif c.kind == DICT:
            rank = np.argsort(np.argsort(
                [str(s) for s in c.dictionary.strings]))
            out.append((jnp.asarray(rank)[c.values].astype(jnp.int64), desc))
        elif c.values.ndim == 2 and T.is_long_decimal(c.dtype):
            # int128 (hi, lo) word pairs sort as two chained int64 keys
            for p in I128.sort_keys(*I128.unpack(c.values)):
                out.append((p, desc))
        elif jnp.issubdtype(c.values.dtype, jnp.floating):
            out.append((SORT.float_sort_keys(c.values), desc))
        else:
            out.append((c.values.astype(jnp.int64), desc))
    return out


def _window_traced(chunk: Chunk, plan: PhysWindow) -> Chunk:
    from ..ops import window as W
    pk = _window_norm_keys(chunk, plan.partition)
    ok = _window_norm_keys(chunk, tuple(e for e, _ in plan.order),
                           [d for _, d in plan.order])
    n_part_arrays = len(pk)
    keys = pk + ok
    perm = SORT.argsort_multi(keys, chunk.mask)
    sorted_keys = [k[perm] for k, _ in keys]
    smask = chunk.mask[perm]
    part_start, peer_start = W.make_boundaries(sorted_keys, n_part_arrays,
                                               smask)
    has_order = len(plan.order) > 0
    pe = W.peer_ends(peer_start) if has_order else None
    n = chunk.n_rows
    out_cols = dict(chunk.cols)

    def frame_lo_hi(frame):
        if frame[0] == "rows":
            return W.frame_bounds(part_start, frame)
        if frame[0] == "groups":
            if not has_order:
                raise ValueError("GROUPS frame requires ORDER BY")
            return W.groups_frame_bounds(part_start, peer_start, frame)
        # RANGE: value offsets over the single numeric ORDER BY key
        if len(plan.order) != 1:
            raise NotImplementedError(
                "RANGE frames require exactly one ORDER BY key")
        oexpr, desc = plan.order[0]
        oc = eval_expr(oexpr, chunk)
        if oc.values.ndim != 1 or not jnp.issubdtype(
                oc.values.dtype, jnp.integer):
            raise NotImplementedError(
                "RANGE frames require an integer-valued order key")
        scale = 10 ** _scale_of(oc.dtype) if T.is_decimal(oc.dtype) else 1

        def scaled(spec):
            which, k = spec
            return (which, int(k) * scale)

        return W.range_frame_bounds(
            part_start, peer_start, oc.values[perm],
            (frame[0], scaled(frame[1]), scaled(frame[2])), desc)
    for spec in plan.functions:
        if spec.func == "row_number":
            res, valid = W.row_number(part_start), None
            ot = T.BIGINT
        elif spec.func == "percent_rank":
            res, valid = W.percent_rank(part_start, peer_start), None
            ot = T.DOUBLE
        elif spec.func == "cume_dist":
            res, valid = W.cume_dist(part_start, peer_start), None
            ot = T.DOUBLE
        elif spec.func == "ntile":
            res = W.ntile(part_start, jnp.int64(spec.offset))
            valid, ot = None, T.BIGINT
        elif spec.func == "rank":
            res, valid = W.rank(part_start, peer_start), None
            ot = T.BIGINT
        elif spec.func == "dense_rank":
            res, valid = W.dense_rank(part_start, peer_start), None
            ot = T.BIGINT
        elif spec.func in ("lead", "lag"):
            c = eval_expr(spec.arg, chunk)
            sv = c.values[perm]
            v = c.valid_or_true()[perm] & smask
            off = spec.offset if spec.func == "lead" else -spec.offset
            if spec.ignore_nulls:
                res, valid = W.kth_nonnull_shift(sv, v, part_start, off)
            else:
                res, valid = W.shift_in_partition(sv, part_start, off)
                valid = valid & v[jnp.clip(jnp.arange(n) + off, 0, n - 1)]
            ot = c.dtype
        elif spec.func == "first_value":
            c = eval_expr(spec.arg, chunk)
            sv = c.values[perm]
            v = c.valid_or_true()[perm]
            if spec.ignore_nulls:
                pe2 = W.peer_ends(peer_start) if has_order \
                    else W.peer_ends(part_start)
                pos, valid = W.nonnull_frame_edge(
                    v & smask, jnp.maximum(part_start, 0), pe2, True)
                res = sv[jnp.clip(pos, 0, n - 1)]
            else:
                res = sv[jnp.maximum(part_start, 0)]
                valid = v[jnp.maximum(part_start, 0)]
            ot = c.dtype
        elif spec.func == "last_value":
            # default frame ends at the current peer run
            c = eval_expr(spec.arg, chunk)
            sv = c.values[perm]
            v = c.valid_or_true()[perm]
            pe2 = W.peer_ends(peer_start) if has_order \
                else W.peer_ends(part_start)
            if spec.ignore_nulls:
                pos, valid = W.nonnull_frame_edge(
                    v & smask, jnp.maximum(part_start, 0), pe2, False)
                res = sv[jnp.clip(pos, 0, n - 1)]
            else:
                res = sv[pe2]
                valid = v[pe2]
            ot = c.dtype
        elif spec.func == "nth_value":
            c = eval_expr(spec.arg, chunk)
            sv = c.values[perm]
            pe2 = W.peer_ends(peer_start) if has_order \
                else W.peer_ends(part_start)
            if spec.ignore_nulls:
                # n-th non-null from the frame start (partition start)
                v = c.valid_or_true()[perm] & smask
                # n-th non-null counting from the partition start
                idx64 = jnp.arange(n, dtype=jnp.int64)
                cnt = jnp.cumsum(v.astype(jnp.int64))
                before_part = jnp.where(part_start > 0,
                                        cnt[jnp.maximum(part_start - 1, 0)],
                                        0)
                rank = cnt - 1
                nzpos = jnp.zeros((n + 1,), jnp.int64).at[
                    jnp.where(v, rank, n)].set(idx64, mode="drop")
                tgt = before_part + spec.offset - 1
                pos = nzpos[jnp.clip(tgt, 0, n)]
                valid = (tgt < cnt[pe2]) & (pos <= pe2)
                res = sv[jnp.clip(pos, 0, n - 1)]
            else:
                pos = part_start + spec.offset - 1
                inframe = pos <= pe2
                pos_c = jnp.clip(pos, 0, n - 1)
                res = sv[pos_c]
                valid = inframe & c.valid_or_true()[perm][pos_c]
            ot = c.dtype
        elif spec.func in ("sum", "count", "min", "max", "avg", "count_star"):
            if spec.func == "count_star":
                vals = jnp.ones((n,), jnp.int64)
                vmask = smask
                adt = T.BIGINT
            else:
                c = eval_expr(spec.arg, chunk)
                if c.values.ndim == 2:
                    # long-decimal (int128 word-pair) input: window
                    # accumulators are int64 — fold to double (the
                    # ratio/share shapes these feed are approximate;
                    # reference returns decimal(38) — documented gap)
                    hi, lo = I128.unpack(c.values)
                    fv = hi.astype(jnp.float64) * (2.0 ** 64) + \
                        jnp.where(lo < 0, lo.astype(jnp.float64)
                                  + 2.0 ** 64, lo.astype(jnp.float64))
                    vals = (fv / 10 ** _scale_of(c.dtype))[perm]
                    vmask = smask & c.valid_or_true()[perm]
                    adt = T.DOUBLE
                else:
                    acc = (c.values.dtype if jnp.issubdtype(
                        c.values.dtype, jnp.floating) else jnp.int64)
                    vals = c.values[perm].astype(acc)
                    vmask = smask & c.valid_or_true()[perm]
                    adt = c.dtype
            if spec.frame is not None:
                lo, hi = frame_lo_hi(spec.frame)
                rsum = W.framed_sum(vals, vmask, lo, hi)
                rcnt = W.framed_sum(vmask.astype(jnp.int64), smask, lo, hi)
            elif has_order:
                # default frame: RANGE UNBOUNDED PRECEDING → CURRENT ROW,
                # peers included → running value gathered at peer-run end
                rsum = W.running_sum(vals, part_start, vmask)[pe]
                rcnt = W.running_sum(vmask.astype(jnp.int64),
                                     part_start, smask)[pe]
            else:
                rsum = W.partition_total(vals, part_start, vmask, "sum")
                rcnt = W.partition_total(vals, part_start, vmask, "count")
            if spec.func in ("count", "count_star"):
                res, valid, ot = rcnt, None, T.BIGINT
            elif spec.func == "sum":
                res, valid = rsum, rcnt > 0
                ot = (T.DOUBLE if isinstance(adt, T.DoubleType)
                      else T.decimal(38, _scale_of(adt))
                      if T.is_decimal(adt) else T.BIGINT)
            elif spec.func == "avg":
                if isinstance(adt, T.DoubleType):
                    res = rsum / jnp.maximum(rcnt, 1)
                else:
                    res = DEC.div_round_half_up(rsum, jnp.maximum(rcnt, 1))
                valid, ot = rcnt > 0, adt
            else:  # min/max
                mxm = spec.func == "max"
                sentinel = A.I64_MIN if mxm else A.I64_MAX
                guarded = jnp.where(vmask, vals, sentinel)
                if spec.frame is not None:
                    start = spec.frame[1][0]
                    if start != "unbounded_preceding":
                        raise NotImplementedError(
                            "min/max frames must start UNBOUNDED PRECEDING")
                    run = W.segmented_cummin(guarded, part_start, maximum=mxm)
                    lo2, hi = frame_lo_hi(spec.frame)
                    res = run[jnp.clip(hi, 0, n - 1)]
                    # all-NULL frames must yield NULL, not the sentinel
                    nn = W.framed_sum(vmask.astype(jnp.int64), smask,
                                      lo2, hi) > 0
                    valid = (hi >= lo2) & nn
                elif has_order:
                    run = W.segmented_cummin(guarded, part_start, maximum=mxm)
                    res = run[pe]
                    valid = W.running_sum(vmask.astype(jnp.int64),
                                          part_start, smask)[pe] > 0
                else:
                    res = W.partition_total(vals, part_start, vmask,
                                            spec.func)
                    valid = W.partition_total(
                        vmask.astype(jnp.int64), part_start, vmask,
                        "count") > 0
                ot = adt
        else:
            raise NotImplementedError(f"window function {spec.func}")
        # scatter back to input row order
        out_v = jnp.zeros((n,), res.dtype).at[perm].set(res)
        out_valid = None
        if valid is not None:
            out_valid = jnp.zeros((n,), jnp.bool_).at[perm].set(valid)
        out_cols[spec.name] = DCol(ot, PLAIN, out_v, validity=out_valid)
    return Chunk(out_cols, chunk.mask)


def _replace_shifted(e: ir.Expr, names: Dict[ir.Shifted, str]) -> ir.Expr:
    """Swap Shifted nodes for the materialized shifted-column refs."""
    import dataclasses as _dc
    if isinstance(e, ir.Shifted):
        return ir.ColumnRef(names[e], e.dtype)
    if isinstance(e, ir.Case):
        return ir.Case(
            tuple((_replace_shifted(c, names), _replace_shifted(v, names))
                  for c, v in e.whens),
            None if e.default is None else _replace_shifted(e.default,
                                                            names),
            e._dtype)
    kids = e.children()
    if not kids:
        return e
    new_kids = [_replace_shifted(k, names) for k in kids]
    if all(a is b for a, b in zip(kids, new_kids)):
        return e
    repl = {}
    i = 0
    for f in _dc.fields(e):
        v = getattr(e, f.name)
        if isinstance(v, ir.Expr):
            repl[f.name] = new_kids[i]
            i += 1
        elif isinstance(v, tuple) and v and all(
                isinstance(x, ir.Expr) for x in v):
            repl[f.name] = tuple(new_kids[i:i + len(v)])
            i += len(v)
    return _dc.replace(e, **repl)


def _exec_match_recognize(plan: PhysMatchRecognize,
                          ctx: ExecContext) -> Chunk:
    """ONE ROW PER MATCH / SKIP PAST LAST ROW row-pattern matching: sort
    by (partition, order), evaluate DEFINE predicates vectorized, run the
    compiled DFA for every start in lockstep, resolve skips, gather
    measures (see ``ops/pattern.py`` for the design)."""
    from ..ops import pattern as PT
    from ..ops import window as W

    child = execute(plan.child, ctx)
    count = int(jnp.sum(child.mask))
    child = _compact_kernel(child, max(HT.next_pow2(max(count, 1)), 64))

    pk = _window_norm_keys(child, plan.partition)
    ok = _window_norm_keys(child, tuple(e for e, _ in plan.order),
                           [d for _, d in plan.order])
    keys = pk + ok
    perm = SORT.argsort_multi(keys, child.mask)
    scols = {n: c.take(perm) for n, c in child.cols.items()}
    smask = child.mask[perm]
    n = smask.shape[0]
    part_start, _ = W.make_boundaries([k[perm] for k, _ in keys],
                                      len(pk), smask)
    idx = jnp.arange(n, dtype=jnp.int64)
    new_part = part_start == idx

    # materialize PREV/NEXT columns (NULL across partition boundaries)
    aug = dict(scols)
    shifted_names: Dict[ir.Shifted, str] = {}
    for _, pred in plan.defines:
        for sub in ir.walk(pred):
            if isinstance(sub, ir.Shifted) and sub not in shifted_names:
                name = f"#sh{sub.offset}_{sub.arg.name}"
                shifted_names[sub] = name
                if name not in aug:
                    src = idx + sub.offset
                    inb = (src >= 0) & (src < n)
                    src_c = jnp.clip(src, 0, n - 1)
                    same = part_start[src_c] == part_start
                    c = aug[sub.arg.name]
                    valid = (inb & same & smask[src_c]
                             & c.valid_or_true()[src_c])
                    aug[name] = c.take(src_c, valid=valid)
    aug_chunk = Chunk(aug, smask)

    # per-row predicate bitmask
    code = jnp.zeros((n,), jnp.int32)
    for i, (_, pred) in enumerate(plan.defines):
        b = eval_predicate(_replace_shifted(pred, shifted_names),
                           aug_chunk) & smask
        code = code | (b.astype(jnp.int32) << i)
    code = jnp.where(smask, code, -1)

    compiled = plan.__dict__.get("_compiled")
    if compiled is None:
        compiled = PT.compile_pattern(plan.pattern,
                                      [s for s, _ in plan.defines])
        plan.__dict__["_compiled"] = compiled
    mlen = PT.match_lengths(code, new_part, compiled, plan.window)
    sel = PT.select_matches(mlen, smask)
    if bool(jnp.any(sel & (mlen >= plan.window))):
        raise NotImplementedError(
            f"match exceeds the {plan.window}-row window bound")

    match_number = jnp.cumsum(sel.astype(jnp.int64))
    last_i = jnp.clip(idx + mlen.astype(jnp.int64) - 1, 0, n - 1)
    out: Dict[str, DCol] = {}
    if plan.all_rows:
        # ALL ROWS PER MATCH: a row belongs to the match whose selected
        # start is the latest start s <= row with row < s + len(s).
        # cummax of selected start indices gives s per row; RUNNING
        # measure semantics (count = rows so far, last = current row —
        # reference default for ALL ROWS measures).
        start_idx = jnp.where(sel, idx, jnp.int64(-1))
        s_r = jax.lax.associative_scan(jnp.maximum, start_idx)
        s_c = jnp.clip(s_r, 0, n - 1)
        belongs = (s_r >= 0) & (idx < s_r + mlen[s_c].astype(jnp.int64)) \
            & (part_start[s_c] == part_start) & smask
        for pe in plan.partition:
            out[pe.name] = aug_chunk.cols[pe.name]
        for mname, func, arg in plan.measures:
            if func == "count":          # RUNNING count(*)
                out[mname] = DCol(T.BIGINT, PLAIN, idx - s_r + 1)
            elif func == "match_number":
                out[mname] = DCol(T.BIGINT, PLAIN, match_number[s_c])
            else:
                c = eval_expr(arg, aug_chunk)
                if func == "first":
                    out[mname] = c.take(s_c, valid=belongs)
                else:                    # RUNNING last = current row
                    out[mname] = c
        for name in plan.passthrough:
            out[name] = aug_chunk.cols[name]
        return _maybe_compact(Chunk(out, belongs), ctx)
    for pe in plan.partition:
        out[pe.name] = aug_chunk.cols[pe.name]
    for mname, func, arg in plan.measures:
        if func == "count":
            out[mname] = DCol(T.BIGINT, PLAIN, mlen.astype(jnp.int64))
        elif func == "match_number":
            out[mname] = DCol(T.BIGINT, PLAIN, match_number)
        else:
            c = eval_expr(arg, aug_chunk)
            if func == "first":
                out[mname] = c
            else:  # last
                out[mname] = c.take(last_i, valid=sel)
    return _maybe_compact(Chunk(out, sel & smask), ctx)


def _exec_window(plan: PhysWindow, ctx: ExecContext) -> Chunk:
    child = execute(plan.child, ctx)
    kernel = partial(jax.jit, static_argnames=("plan",))(
        lambda chunk, plan: _window_traced(chunk, plan))
    return kernel(child, _freeze_window(plan))


def _freeze_window(plan: PhysWindow):
    """Hashable copy for jit static arg."""
    return _FrozenWindow(plan.partition, plan.order, plan.functions)


@dataclass(frozen=True)
class _FrozenWindow:
    partition: Tuple[ir.Expr, ...]
    order: Tuple[Tuple[ir.Expr, bool], ...]
    functions: Tuple[WindowSpec, ...]


def _exec_scalar_bind(plan: PhysScalarBind, ctx: ExecContext) -> Chunk:
    child = execute(plan.child, ctx)
    n = child.n_rows
    cols = dict(child.cols)
    for name, sub in plan.bindings:
        sc = execute(sub, ctx)
        sel = np.nonzero(np.asarray(sc.mask))[0]
        assert len(sc.cols) == 1, "scalar subquery must have one column"
        (cname, c), = sc.cols.items()
        if len(sel) == 0:
            cols[name] = DCol(c.dtype, PLAIN, jnp.zeros((n,), jnp.int64),
                              validity=jnp.zeros((n,), jnp.bool_))
        else:
            assert len(sel) == 1, "scalar subquery returned >1 row"
            v = np.asarray(c.values)[sel[0]]
            if v.ndim == 1:  # long decimal (hi, lo) words
                vals = jnp.broadcast_to(jnp.asarray(v, jnp.int64), (n, 2))
            else:
                vals = jnp.full((n,), int(v), jnp.int64)
            cols[name] = DCol(c.dtype, PLAIN, vals)
    return Chunk(cols, child.mask)


# ---------------------------------------------------------------- aggregation

_SUM_LIKE = {"sum", "avg"}


VARIANCE_FUNCS = {"stddev", "stddev_samp", "stddev_pop", "variance",
                  "var_samp", "var_pop"}

# two-argument moment aggregates (reference: operator/aggregation/
# CorrelationAggregation, CovarianceAggregation, RegrSlope/Intercept);
# states are plain sums, so they distribute partial→final like sum
CORR_FUNCS = {"corr", "covar_samp", "covar_pop", "regr_slope",
              "regr_intercept"}


def _corr_finalize(func: str, n, sx, sy, sxy, sxx, syy):
    """(value, validity) from the six moment sums (y = arg, x = arg2)."""
    nf = jnp.maximum(n, 1.0)
    dxy = sxy - sx * sy / nf
    dxx = sxx - sx * sx / nf
    dyy = syy - sy * sy / nf
    if func == "covar_pop":
        return dxy / nf, n >= 1
    if func == "covar_samp":
        return dxy / jnp.maximum(n - 1.0, 1.0), n >= 2
    if func == "corr":
        den = jnp.sqrt(jnp.maximum(dxx * dyy, 0.0))
        return dxy / jnp.maximum(den, 1e-300), (n >= 1) & (den > 0)
    slope = dxy / jnp.maximum(dxx, 1e-300)
    ok = (n >= 1) & (dxx > 0)
    if func == "regr_slope":
        return slope, ok
    return (sy - slope * sx) / nf, ok  # regr_intercept


def _fvals(c: DCol) -> jnp.ndarray:
    """Column values as float64 in logical units (decimals unscaled)."""
    return c.values.astype(jnp.float64) / (10 ** _scale_of(c.dtype))


def _agg_output_type(spec: AggSpec) -> T.DataType:
    if spec.func in ("count", "count_star", "approx_distinct",
                     "checksum", "bitwise_and_agg", "bitwise_or_agg"):
        return T.BIGINT
    if spec.func == "geometric_mean":
        return T.DOUBLE
    if spec.func in ("min_n", "max_n"):
        return T.array(spec.arg.dtype)
    if spec.func in VARIANCE_FUNCS or spec.func in CORR_FUNCS:
        return T.DOUBLE
    if spec.func in ("bool_and", "bool_or"):
        return T.BOOLEAN
    at = spec.arg.dtype
    if spec.func in ("min_by", "max_by", "approx_percentile"):
        return at  # value argument's type
    if spec.func == "array_agg":
        return T.array(at)
    if spec.func == "map_agg":
        return T.map_(at, spec.arg2.dtype)
    if spec.func == "histogram":
        return T.map_(at, T.BIGINT)
    if spec.func == "sum":
        if isinstance(at, T.DoubleType):
            return T.DOUBLE
        return T.decimal(38, _scale_of(at)) if T.is_decimal(at) else T.BIGINT
    if spec.func == "avg":
        return at if T.is_decimal(at) else T.DOUBLE
    return at  # min/max/arbitrary


def _exec_agg(plan: PhysHashAggregate, ctx: ExecContext) -> Chunk:
    child = execute(plan.child, ctx)
    if not plan.groups:
        packs = [s for s in plan.aggs if s.func in _PACK_AGGS]
        if not packs:
            return _exec_global_agg(plan, child)
        # nested-value aggregates over the whole input: one implicit group
        rest = PhysHashAggregate(
            plan.child, (), tuple(s for s in plan.aggs
                                  if s.func not in _PACK_AGGS),
            plan.ndv_hint)
        out = _exec_global_agg(rest, child) if rest.aggs else \
            Chunk({}, jnp.ones((1,), jnp.bool_))
        slot0 = jnp.zeros((child.n_rows,), jnp.int32)
        cols = dict(out.cols)
        for spec in packs:
            cols[spec.name] = _agg_pack(spec, child, slot0, 1, out.mask)
        return Chunk(cols, out.mask)
    pool = getattr(ctx, "pool", None)
    if pool is not None and pool.budget is not None:
        from ..utils.memory import chunk_bytes
        need = 3 * chunk_bytes(child)
        avail = max(pool.budget - pool.used, 1)
        if need > avail:
            return _exec_agg_partitioned(
                plan, child, ctx, min(max(2, HT.next_pow2(
                    -(-need // avail))), 64))
    return _agg_core(plan, child, ctx)


def _exec_agg_partitioned(plan: PhysHashAggregate, child: Chunk,
                          ctx: ExecContext, k: int) -> Chunk:
    """Partition-at-a-time aggregation under memory pressure: rows
    partition by GROUP-key hash (high bits), so every group lives in
    exactly one partition and per-partition results concatenate with no
    merge — the HBM-tier shape of the reference's
    ``SpillableHashAggregationBuilder`` (spill by group-id hash, merge by
    ``MergeHashSort``), with the merge designed away."""
    from ..ops.hashing import hash_keys
    bits = max(k.bit_length() - 1, 1)
    gh = hash_keys(_group_key_arrays(child, tuple(e for _, e in plan.groups)))
    part = (gh >> jnp.uint32(32 - bits)).astype(jnp.int32)
    ctx.spill_partitions += k
    outs = []
    for p in range(k):
        sel = child.mask & (part == p)
        cnt = int(jnp.sum(sel))
        if cnt == 0:
            continue
        sub = _compact_kernel(Chunk(child.cols, sel),
                              max(HT.next_pow2(cnt), 64))
        outs.append(_agg_core(plan, sub, ctx))
    if not outs:
        sub = _compact_kernel(Chunk(child.cols, child.mask & False), 64)
        return _agg_core(plan, sub, ctx)
    return concat_chunks(outs)


def _agg_core(plan: PhysHashAggregate, child: Chunk,
              ctx: ExecContext) -> Chunk:
    group_exprs = tuple(e for _, e in plan.groups)
    # group count can't exceed the ACTUAL row count — a host read here
    # (op path, stage boundary) keeps every [capacity]-shaped kernel
    # proportional to the data, not to the planner's ndv guess (Q3: the
    # hint says 2.4M groups, the filtered join feeds 30k rows)
    live = int(jnp.sum(child.mask))
    capacity = max(64, HT.capacity_for(min(plan.ndv_hint, live + 1)))
    while True:
        owner, slot, overflow = _insert_kernel(child, group_exprs, capacity)
        if not bool(overflow):
            break
        capacity *= 2

    @partial(jax.jit, static_argnames=("groups", "aggs", "capacity"))
    def finish(chunk: Chunk, owner, slot, groups, aggs, capacity):
        gvalid = owner != HT.EMPTY
        rep = jnp.minimum(owner, chunk.n_rows - 1)
        out: Dict[str, DCol] = {}
        for name, e in groups:
            c = eval_expr(e, chunk)
            out[name] = c.take(rep, valid=gvalid)
        for spec in aggs:
            if spec.distinct or spec.func in _PACK_AGGS:
                continue  # handled outside (extra insert / host-read pass)
            out[spec.name] = _agg_col(spec, chunk, slot, capacity, gvalid)
        return Chunk(out, gvalid)

    out = finish(child, owner, slot, plan.groups, plan.aggs, capacity)

    distinct_specs = [s for s in plan.aggs if s.distinct]
    if distinct_specs:
        out_cols = dict(out.cols)
        for spec in distinct_specs:
            out_cols[spec.name] = _agg_distinct(
                spec, child, slot, capacity, out.mask, group_exprs)
        out = Chunk(out_cols, out.mask)
    pack_specs = [s for s in plan.aggs
                  if s.func in _PACK_AGGS and not s.distinct]
    if pack_specs:
        out_cols = dict(out.cols)
        for spec in pack_specs:
            out_cols[spec.name] = _agg_pack(
                spec, child, slot, capacity, out.mask)
        out = Chunk(out_cols, out.mask)
    return _maybe_compact(out, ctx)


# group aggregates returning nested values: need a host-read of the max
# group cardinality (static width), so they run outside the fused trace
_PACK_AGGS = frozenset({"array_agg", "map_agg", "histogram"})


@partial(jax.jit, static_argnames=("capacity",))
def _group_positions(slot, vmask, capacity):
    """(pos_in_group [N], counts [capacity]): each masked-in row's rank
    within its group (row order) — one stable sort + boundary scatter."""
    n = slot.shape[0]
    key = jnp.where(vmask, slot, capacity).astype(jnp.int32)
    perm = jnp.argsort(key, stable=True)
    sk = key[perm]
    valid = sk < capacity
    newrun = valid & jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), sk[1:] != sk[:-1]])
    lo, hi = HT.run_bounds(sk, newrun, valid, capacity)
    pos_sorted = jnp.arange(n, dtype=jnp.int32) - \
        lo[jnp.minimum(sk, capacity - 1)]
    inv = jnp.argsort(perm)
    return jnp.where(vmask, pos_sorted[inv], -1), hi - lo


@partial(jax.jit, static_argnames=("capacity", "width"))
def _group_pack_kernel(vals, slot, pos, vmask, capacity, width):
    """[capacity, width]: group g's masked-in values packed left in row
    order (the device form of ``ArrayAggregationState`` accumulation)."""
    ok = vmask & (pos >= 0) & (pos < width)
    g = jnp.where(ok, slot, capacity).astype(jnp.int32)
    p = jnp.clip(pos, 0, max(width - 1, 0)).astype(jnp.int32)
    out = jnp.zeros((capacity, max(width, 1)), vals.dtype)
    return out.at[g, p].set(vals, mode="drop")[:, :width] if width else \
        jnp.zeros((capacity, 0), vals.dtype)


def _agg_pack_traced(spec: AggSpec, chunk: Chunk, slot, capacity,
                     gvalid, width: int):
    """Traced twin of ``_agg_pack``: array_agg/map_agg/histogram with a
    STATIC per-group width bound instead of the host-read max
    cardinality.  Returns (DCol, overflow) — a group wider than ``width``
    trips the flag and the host retry loop regrows it (the same shape
    discipline as every other capacity in the traced engine)."""
    c = _pack_scalarize(eval_expr(spec.arg, chunk))
    ot = _agg_output_type(spec)
    if spec.func == "histogram":
        vmask = chunk.mask & (slot >= 0) & c.valid_or_true()
        pair_keys = [slot.astype(jnp.int64)] + _key_arrays(
            Chunk({"v": c}, vmask), (ir.ColumnRef("v", c.dtype),))
        pair_cap = HT.next_pow2(2 * chunk.n_rows)
        powner, pslot, _ = HT.insert(pair_keys, vmask, pair_cap)
        pair_cnt = A.seg_count(pslot, vmask, pair_cap)
        rep_valid = powner != HT.EMPTY
        rep = jnp.minimum(powner, chunk.n_rows - 1)
        rep_group = jnp.where(rep_valid, slot[rep], -1)
        rep_val = c.values[rep]
        pos, counts = _group_positions(rep_group, rep_valid, capacity)
        ovf = (counts > width).any()
        keys_m = _group_pack_kernel(rep_val, rep_group, pos, rep_valid,
                                    capacity, width)
        cnts_m = _group_pack_kernel(pair_cnt.astype(jnp.int64), rep_group,
                                    pos, rep_valid, capacity, width)
        return DCol(ot, COL_MAP, keys_m,
                    jnp.minimum(counts, width).astype(jnp.int32),
                    gvalid, c.dictionary, cnts_m), ovf
    vmask = chunk.mask & (slot >= 0) & c.valid_or_true()
    pos, counts = _group_positions(slot, vmask, capacity)
    ovf = (counts > width).any()
    vals_m = _group_pack_kernel(c.values, slot, pos, vmask, capacity,
                                width)
    if spec.func == "map_agg":
        v2 = _pack_scalarize(eval_expr(spec.arg2, chunk))
        vals2_m = _group_pack_kernel(v2.values, slot, pos, vmask,
                                     capacity, width)
        return DCol(ot, COL_MAP, vals_m,
                    jnp.minimum(counts, width).astype(jnp.int32),
                    gvalid, c.dictionary, vals2_m,
                    dictionary2=v2.dictionary), ovf
    return DCol(ot, COL_ARRAY, vals_m,
                jnp.minimum(counts, width).astype(jnp.int32),
                gvalid, c.dictionary), ovf


def _pack_scalarize(col: DCol) -> DCol:
    """BYTES strings → dictionary codes (eager host interning; raises
    inside a trace — dictionary-encoded strings fuse, raw byte columns
    stay on the op path)."""
    if col.kind != BYTES:
        return col
    import jax.core as _jc
    if isinstance(col.values, _jc.Tracer):
        raise NotImplementedError(
            "array_agg/map_agg over a raw byte column inside a fused "
            "program (dictionary-encoded columns fuse)")
    from ..data.column import strings_from_bytes
    from .columns import Dictionary
    strs = np.asarray(
        strings_from_bytes(np.asarray(col.values),
                           np.asarray(col.lengths)), dtype=object)
    uniq, codes = np.unique(strs.astype(str), return_inverse=True)
    return DCol(col.dtype, DICT, jnp.asarray(codes.astype(np.int32)),
                validity=col.validity,
                dictionary=Dictionary(uniq.astype(object)))


def _agg_pack(spec: AggSpec, chunk: Chunk, slot, capacity,
              gvalid) -> DCol:
    """array_agg / map_agg / histogram: nested-value group aggregates
    (reference: ``operator/aggregation/arrayagg``, ``mapagg``,
    ``Histogram.java``).  The group width (max cardinality) is read on the
    host, making the pack a static-shape scatter."""
    def scalarize(col: DCol) -> DCol:
        """BYTES strings → dictionary codes (this path is eager, so the
        host can intern the distinct strings)."""
        if col.kind != BYTES:
            return col
        from ..data.column import strings_from_bytes
        from .columns import Dictionary
        strs = np.asarray(
            strings_from_bytes(np.asarray(col.values),
                               np.asarray(col.lengths)), dtype=object)
        uniq, codes = np.unique(strs.astype(str), return_inverse=True)
        return DCol(col.dtype, DICT, jnp.asarray(codes.astype(np.int32)),
                    validity=col.validity,
                    dictionary=Dictionary(uniq.astype(object)))

    c = scalarize(eval_expr(spec.arg, chunk))
    ot = _agg_output_type(spec)
    if spec.func == "histogram":
        # dedup (group, value) pairs, count each, then pack the
        # representative pairs per group as a value→count map
        vmask = chunk.mask & (slot >= 0) & c.valid_or_true()
        pair_keys = [slot.astype(jnp.int64)] + _key_arrays(
            Chunk({"v": c}, vmask), (ir.ColumnRef("v", c.dtype),))
        pair_cap = HT.next_pow2(2 * chunk.n_rows)
        powner, pslot, _ = HT.insert(pair_keys, vmask, pair_cap)
        pair_cnt = A.seg_count(pslot, vmask, pair_cap)
        rep_valid = powner != HT.EMPTY
        rep = jnp.minimum(powner, chunk.n_rows - 1)
        rep_group = jnp.where(rep_valid, slot[rep], -1)
        rep_val = c.values[rep]
        rep_n = pair_cnt  # count per pair id == per representative
        pos, counts = _group_positions(rep_group, rep_valid, capacity)
        width = int(jnp.max(counts)) if counts.shape[0] else 0
        keys_m = _group_pack_kernel(rep_val, rep_group, pos, rep_valid,
                                    capacity, width)
        cnts_m = _group_pack_kernel(rep_n.astype(jnp.int64), rep_group,
                                    pos, rep_valid, capacity, width)
        return DCol(ot, COL_MAP, keys_m, counts.astype(jnp.int32),
                    gvalid, c.dictionary, cnts_m)
    vmask = chunk.mask & (slot >= 0) & c.valid_or_true()
    pos, counts = _group_positions(slot, vmask, capacity)
    width = int(jnp.max(counts)) if counts.shape[0] else 0
    vals_m = _group_pack_kernel(c.values, slot, pos, vmask, capacity, width)
    if spec.func == "map_agg":
        v2 = scalarize(eval_expr(spec.arg2, chunk))
        vals2_m = _group_pack_kernel(v2.values, slot, pos, vmask,
                                     capacity, width)
        # keys and values carry SEPARATE dictionaries: decoding values
        # through the key dictionary (the old shared-dict layout) returned
        # wrong strings for map_agg(varchar, varchar)
        return DCol(ot, COL_MAP, vals_m, counts.astype(jnp.int32),
                    gvalid, c.dictionary, vals2_m,
                    dictionary2=v2.dictionary)
    return DCol(ot, COL_ARRAY, vals_m, counts.astype(jnp.int32),
                gvalid, c.dictionary)


def _seg_sum128(vals, slot, vmask, capacity):
    """Exact int128 segment sum of int64 or packed-int128 addends."""
    if vals.ndim == 2:
        return I128.seg_sum128_from_i128(vals, slot, vmask, capacity)
    return I128.seg_sum128_from_i64(vals, slot, vmask, capacity)


def _g_sum128(vals, mask):
    if vals.ndim == 2:
        return I128.g_sum128_from_i128(vals, mask)
    return I128.g_sum128_from_i64(vals, mask)


def _agg_col(spec: AggSpec, chunk: Chunk, slot, capacity, gvalid) -> DCol:
    mask = chunk.mask & (slot >= 0)
    if spec.func == "count_star":
        return DCol(T.BIGINT, PLAIN, A.seg_count(slot, mask, capacity),
                    validity=gvalid)
    c = eval_expr(spec.arg, chunk)
    vmask = mask & c.valid_or_true()
    vals = c.values
    ot = _agg_output_type(spec)
    if spec.func == "count":
        return DCol(T.BIGINT, PLAIN, A.seg_count(slot, vmask, capacity),
                    validity=gvalid)
    if spec.func == "approx_distinct":
        from ..ops.hashing import hash_keys
        h = hash_keys(_key_arrays(chunk, (spec.arg,)))
        regs = HLL.group_state(h, slot, vmask, capacity)
        return DCol(T.BIGINT, PLAIN, HLL.estimate(regs), validity=gvalid)
    if spec.func == "sum0":
        # COUNT-carrying sum: groups with no valid inputs read 0, not NULL
        s = A.seg_sum(vals, slot, vmask, capacity, jnp.int64)
        return DCol(T.BIGINT, PLAIN, s, validity=gvalid)
    if spec.func == "sum":
        nonempty = A.seg_count(slot, vmask, capacity) > 0
        if T.is_long_decimal(ot):
            # DECIMAL sums accumulate in int128 like the reference
            # (LongDecimalWithOverflowState) — int64 wraps at scale
            hi, lo = _seg_sum128(vals, slot, vmask, capacity)
            return DCol(ot, PLAIN, I128.pack(hi, lo),
                        validity=gvalid & nonempty)
        if isinstance(c.dtype, T.DoubleType):
            s = A.seg_sum(vals, slot, vmask, capacity, jnp.float64)
            return DCol(T.DOUBLE, PLAIN, s, validity=gvalid & nonempty)
        s = A.seg_sum(vals, slot, vmask, capacity, jnp.int64)
        return DCol(ot, PLAIN, s, validity=gvalid & nonempty)
    if spec.func == "avg":
        cnt = A.seg_count(slot, vmask, capacity)
        if isinstance(c.dtype, T.DoubleType):
            s = A.seg_sum(vals, slot, vmask, capacity, jnp.float64)
            v = s / jnp.maximum(cnt, 1)
        elif T.is_decimal(c.dtype):
            hi, lo = _seg_sum128(vals, slot, vmask, capacity)
            qhi, qlo = I128.div_round_half_up(
                hi, lo, *I128.from_i64(jnp.maximum(cnt, 1)))
            v = I128.pack(qhi, qlo) if T.is_long_decimal(ot) else qlo
        else:
            s = A.seg_sum(vals, slot, vmask, capacity, jnp.int64)
            v = s.astype(jnp.float64) / jnp.maximum(cnt, 1)
        return DCol(ot, PLAIN, v, validity=gvalid & (cnt > 0))
    if spec.func in VARIANCE_FUNCS:
        fv = vals.astype(jnp.float64) / (10 ** _scale_of(c.dtype))
        s1 = A.seg_sum(fv, slot, vmask, capacity, jnp.float64)
        s2 = A.seg_sum(fv * fv, slot, vmask, capacity, jnp.float64)
        cnt = A.seg_count(slot, vmask, capacity).astype(jnp.float64)
        pop = spec.func.endswith("_pop")
        den = jnp.maximum(cnt if pop else cnt - 1, 1.0)
        var = jnp.maximum((s2 - s1 * s1 / jnp.maximum(cnt, 1.0)) / den, 0.0)
        v = var if "var" in spec.func else jnp.sqrt(var)
        minc = 1 if pop else 2
        return DCol(T.DOUBLE, PLAIN, v,
                    validity=gvalid & (A.seg_count(slot, vmask, capacity)
                                       >= minc))
    if spec.func in ("bool_and", "bool_or"):
        b = vals.astype(jnp.bool_)
        if spec.func == "bool_and":
            v = ~A.seg_any(~b, slot, vmask, capacity)
        else:
            v = A.seg_any(b, slot, vmask, capacity)
        nonempty = A.seg_count(slot, vmask, capacity) > 0
        return DCol(T.BOOLEAN, PLAIN, v, validity=gvalid & nonempty)
    if spec.func in CORR_FUNCS:
        x = eval_expr(spec.arg2, chunk)
        both = vmask & x.valid_or_true()
        yf, xf = _fvals(c), _fvals(x)
        nn = A.seg_count(slot, both, capacity).astype(jnp.float64)
        sx = A.seg_sum(xf, slot, both, capacity, jnp.float64)
        sy = A.seg_sum(yf, slot, both, capacity, jnp.float64)
        sxy = A.seg_sum(xf * yf, slot, both, capacity, jnp.float64)
        sxx = A.seg_sum(xf * xf, slot, both, capacity, jnp.float64)
        syy = A.seg_sum(yf * yf, slot, both, capacity, jnp.float64)
        v, ok = _corr_finalize(spec.func, nn, sx, sy, sxy, sxx, syy)
        return DCol(T.DOUBLE, PLAIN, v, validity=gvalid & ok)
    if spec.func in ("min_by", "max_by"):
        # winner row per group = first row attaining the key extreme
        # (reference: operator/aggregation/minmaxby/*).  Rows with a NULL
        # key are ignored; the value may be NULL and is returned as such.
        k = eval_expr(spec.arg2, chunk)
        kmask = mask & k.valid_or_true()
        seg_ext = A.seg_min if spec.func == "min_by" else A.seg_max
        ext = seg_ext(k.values, slot, kmask, capacity)
        is_win = kmask & (k.values == ext[jnp.maximum(slot, 0)])
        ridx = jnp.arange(chunk.n_rows, dtype=jnp.int64)
        widx = A.seg_min(ridx, slot, is_win, capacity)
        nonempty = A.seg_count(slot, kmask, capacity) > 0
        return c.take(jnp.minimum(widx, chunk.n_rows - 1),
                      valid=gvalid & nonempty)
    if spec.func == "approx_percentile":
        # exact percentile via per-group sorted runs (the reference's
        # qdigest/tdigest sketch — exactness is a legal approximation)
        slotk = jnp.where(vmask, slot, capacity).astype(jnp.int64)
        perm = SORT.argsort_multi([(slotk, False),
                                   (SORT.value_sort_key(c), False)])
        cnt = A.seg_count(slot, vmask, capacity)
        offs = jnp.cumsum(cnt) - cnt
        idx_in = jnp.clip(
            jnp.ceil(spec.param * cnt.astype(jnp.float64)).astype(jnp.int64)
            - 1, 0, jnp.maximum(cnt - 1, 0))
        widx = perm[jnp.minimum(offs + idx_in, chunk.n_rows - 1)]
        return c.take(widx, valid=gvalid & (cnt > 0))
    if spec.func == "checksum":
        # order-independent checksum: wrapping int64 sum of per-row value
        # hashes (reference: ``ChecksumAggregationFunction`` — xor/sum of
        # XxHash64; ours is a murmur-mixed golden-ratio product, same
        # order-independence and merge-by-addition property)
        from ..ops.hashing import hash_keys
        h = hash_keys(_key_arrays(chunk, (spec.arg,))).astype(jnp.int64)
        contrib = (h + 1) * jnp.int64(0x9E3779B97F4A7C15 - (1 << 64))
        v = A.seg_sum(contrib, slot, vmask, capacity, jnp.int64)
        nonempty = A.seg_count(slot, vmask, capacity) > 0
        return DCol(T.BIGINT, PLAIN, v, validity=gvalid & nonempty)
    if spec.func == "geometric_mean":
        fv = _fvals(c)
        sl = A.seg_sum(jnp.log(jnp.maximum(fv, 1e-300)), slot, vmask,
                       capacity, jnp.float64)
        cnt = A.seg_count(slot, vmask, capacity).astype(jnp.float64)
        v = jnp.exp(sl / jnp.maximum(cnt, 1.0))
        return DCol(T.DOUBLE, PLAIN, v, validity=gvalid & (cnt > 0))
    if spec.func in ("bitwise_and_agg", "bitwise_or_agg"):
        f = A.seg_bitand if spec.func == "bitwise_and_agg" else A.seg_bitor
        v = f(vals, slot, vmask, capacity)
        nonempty = A.seg_count(slot, vmask, capacity) > 0
        return DCol(T.BIGINT, PLAIN, v, validity=gvalid & nonempty)
    if spec.func in ("min_n", "max_n"):
        # n smallest/largest per group as an ARRAY: sort by (group, ±value),
        # keep positions < n (static width from the literal)
        width = int(spec.param)
        vk = SORT.value_sort_key(c)
        if spec.func == "max_n":
            vk = ~vk
        slotk = jnp.where(vmask, slot, capacity).astype(jnp.int64)
        perm = SORT.argsort_multi([(slotk, False), (vk, False)])
        sk = slotk[perm]
        valid = sk < capacity
        newrun = valid & jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), sk[1:] != sk[:-1]])
        lo, hi = HT.run_bounds(sk.astype(jnp.int32), newrun, valid,
                               capacity)
        n_rows = chunk.n_rows
        pos_sorted = jnp.arange(n_rows, dtype=jnp.int32) -             lo[jnp.minimum(sk, capacity - 1).astype(jnp.int32)]
        inv = jnp.argsort(perm)
        pos = jnp.where(vmask, pos_sorted[inv], -1)
        packed = _group_pack_kernel(c.values, slot, pos,
                                    vmask & (pos >= 0) & (pos < width),
                                    capacity, width)
        counts = jnp.minimum(A.seg_count(slot, vmask, capacity),
                             width).astype(jnp.int32)
        return DCol(_agg_output_type(spec), COL_ARRAY, packed, counts,
                    gvalid & (counts > 0), c.dictionary)
    if spec.func in ("arbitrary", "any_value"):
        # first row of each group, gathered whole — preserves every
        # layout (DICT codes, BYTES matrices+lengths, ARRAY/MAP)
        ridx = jnp.arange(chunk.n_rows, dtype=jnp.int64)
        widx = A.seg_min(ridx, slot, vmask, capacity)
        nonempty = A.seg_count(slot, vmask, capacity) > 0
        return c.take(jnp.minimum(widx, chunk.n_rows - 1).astype(
            jnp.int32), valid=gvalid & nonempty)
    if spec.func == "min":
        v = (I128.pack(*I128.seg_min128(vals, slot, vmask, capacity))
             if vals.ndim == 2 else A.seg_min(vals, slot, vmask, capacity))
    elif spec.func == "max":
        v = (I128.pack(*I128.seg_max128(vals, slot, vmask, capacity))
             if vals.ndim == 2 else A.seg_max(vals, slot, vmask, capacity))
    else:
        raise NotImplementedError(spec.func)
    nonempty = A.seg_count(slot, vmask, capacity) > 0
    return DCol(ot, c.kind, v, validity=gvalid & nonempty,
                dictionary=c.dictionary) if c.kind == DICT else DCol(
                    ot, PLAIN, v, validity=gvalid & nonempty)


def _agg_distinct(spec: AggSpec, chunk: Chunk, slot, capacity,
                  gvalid, group_exprs) -> DCol:
    """count(distinct x): second dedup pass over (group, x) pairs."""
    assert spec.func == "count", "only count(distinct) supported"
    c = eval_expr(spec.arg, chunk)
    pair_mask = chunk.mask & (slot >= 0) & c.valid_or_true()
    pair_cap = capacity
    while True:
        pkeys = [slot.astype(jnp.int64), c.values.astype(jnp.int64)]
        owner2, _, overflow = HT.insert(pkeys, pair_mask, pair_cap)
        if not bool(overflow):
            break
        pair_cap *= 2
    rep = jnp.minimum(owner2, chunk.n_rows - 1)
    rep_valid = owner2 != HT.EMPTY
    rep_group = jnp.where(rep_valid, slot[rep], -1)
    cnt = A.seg_count(rep_group, rep_valid, capacity)
    return DCol(T.BIGINT, PLAIN, cnt, validity=gvalid)


def _exec_global_agg(plan: PhysHashAggregate, child: Chunk) -> Chunk:
    @partial(jax.jit, static_argnames=("aggs",))
    def kernel(chunk: Chunk, aggs) -> Chunk:
        out: Dict[str, DCol] = {}
        for spec in aggs:
            if spec.func == "count_star":
                v = A.g_count(chunk.mask)
                out[spec.name] = DCol(T.BIGINT, PLAIN, v[None])
                continue
            if spec.distinct:
                assert spec.func == "count", "only count(distinct) supported"
                keys = _key_arrays(chunk, (spec.arg,))
                cap = HT.next_pow2(2 * chunk.n_rows)  # static: no overflow
                c0 = eval_expr(spec.arg, chunk)
                m0 = chunk.mask & c0.valid_or_true()
                owner, _, _ = HT.insert(keys, m0, cap)
                v = jnp.sum((owner != HT.EMPTY).astype(jnp.int64))
                out[spec.name] = DCol(T.BIGINT, PLAIN, v[None])
                continue
            c = eval_expr(spec.arg, chunk)
            m = chunk.mask & c.valid_or_true()
            ot = _agg_output_type(spec)
            nonempty = A.g_count(m) > 0
            if spec.func in ("approx_distinct", "hll_state"):
                from ..ops.hashing import hash_keys
                h = hash_keys(_key_arrays(chunk, (spec.arg,)))
                regs = HLL.global_state(h, m)
                # hll_state: raw registers [1, m] (distributed PARTIAL step
                # — merged with elementwise max across devices)
                v = (regs[None] if spec.func == "hll_state"
                     else HLL.estimate(regs)[None])
                out[spec.name] = DCol(T.BIGINT, PLAIN, v)
                continue
            if spec.func == "count":
                out[spec.name] = DCol(T.BIGINT, PLAIN, A.g_count(m)[None])
            elif spec.func == "sum0":
                # COUNT-carrying sum: empty input → 0, never NULL
                v = A.g_sum(c.values, m, jnp.int64)[None]
                out[spec.name] = DCol(T.BIGINT, PLAIN, v)
            elif spec.func == "sum":
                if T.is_long_decimal(ot):
                    v = I128.pack(*_g_sum128(c.values, m))[None]
                elif isinstance(c.dtype, T.DoubleType):
                    v = A.g_sum(c.values, m, jnp.float64)[None]
                else:
                    v = A.g_sum(c.values, m, jnp.int64)[None]
                out[spec.name] = DCol(ot, PLAIN, v, validity=nonempty[None])
            elif spec.func == "avg":
                cnt = jnp.maximum(A.g_count(m), 1)
                if isinstance(c.dtype, T.DoubleType):
                    v = (A.g_sum(c.values, m, jnp.float64) / cnt)[None]
                elif T.is_decimal(c.dtype):
                    hi, lo = _g_sum128(c.values, m)
                    qhi, qlo = I128.div_round_half_up(
                        hi[None], lo[None], *I128.from_i64(cnt[None]))
                    v = (I128.pack(qhi, qlo)
                         if T.is_long_decimal(ot) else qlo)
                else:
                    s = A.g_sum(c.values, m, jnp.int64)
                    v = (s.astype(jnp.float64) / cnt)[None]
                out[spec.name] = DCol(ot, PLAIN, v, validity=nonempty[None])
            elif spec.func == "min":
                v = (I128.pack(*I128.g_min128(c.values, m))
                     if c.values.ndim == 2 else A.g_min(c.values, m))
                out[spec.name] = DCol(ot, PLAIN, v[None],
                                      validity=nonempty[None])
            elif spec.func == "max":
                v = (I128.pack(*I128.g_max128(c.values, m))
                     if c.values.ndim == 2 else A.g_max(c.values, m))
                out[spec.name] = DCol(ot, PLAIN, v[None],
                                      validity=nonempty[None])
            elif spec.func in ("min_by", "max_by"):
                k = eval_expr(spec.arg2, chunk)
                kmask = chunk.mask & k.valid_or_true()
                g_ext = A.g_min if spec.func == "min_by" else A.g_max
                ext = g_ext(k.values, kmask)
                is_win = kmask & (k.values == ext)
                ridx = jnp.arange(chunk.n_rows, dtype=jnp.int64)
                widx = jnp.min(jnp.where(is_win, ridx,
                                         jnp.int64(chunk.n_rows)))
                ne = A.g_count(kmask) > 0
                out[spec.name] = c.take(
                    jnp.minimum(widx, chunk.n_rows - 1)[None],
                    valid=ne[None])
            elif spec.func == "approx_percentile":
                perm = SORT.argsort_multi(
                    [(SORT.value_sort_key(c), False)], m)
                cnt = A.g_count(m)
                idx = jnp.clip(
                    jnp.ceil(spec.param * cnt.astype(jnp.float64))
                    .astype(jnp.int64) - 1, 0, jnp.maximum(cnt - 1, 0))
                out[spec.name] = c.take(perm[jnp.minimum(
                    idx, chunk.n_rows - 1)][None], valid=(cnt > 0)[None])
            elif spec.func in VARIANCE_FUNCS:
                fv = c.values.astype(jnp.float64) / (10 ** _scale_of(c.dtype))
                s1 = A.g_sum(fv, m, jnp.float64)
                s2 = A.g_sum(fv * fv, m, jnp.float64)
                cntf = A.g_count(m).astype(jnp.float64)
                pop = spec.func.endswith("_pop")
                den = jnp.maximum(cntf if pop else cntf - 1, 1.0)
                var = jnp.maximum(
                    (s2 - s1 * s1 / jnp.maximum(cntf, 1.0)) / den, 0.0)
                v = var if "var" in spec.func else jnp.sqrt(var)
                minc = 1 if pop else 2
                out[spec.name] = DCol(
                    T.DOUBLE, PLAIN, v[None],
                    validity=(A.g_count(m) >= minc)[None])
            elif spec.func == "checksum":
                from ..ops.hashing import hash_keys
                h = hash_keys(_key_arrays(chunk, (spec.arg,))).astype(
                    jnp.int64)
                contrib = (h + 1) * jnp.int64(0x9E3779B97F4A7C15
                                              - (1 << 64))
                v = A.g_sum(contrib, m, jnp.int64)
                out[spec.name] = DCol(T.BIGINT, PLAIN, v[None],
                                      validity=nonempty[None])
            elif spec.func == "geometric_mean":
                fv = _fvals(c)
                sl = A.g_sum(jnp.log(jnp.maximum(fv, 1e-300)), m,
                             jnp.float64)
                cntf = jnp.maximum(A.g_count(m).astype(jnp.float64), 1.0)
                out[spec.name] = DCol(T.DOUBLE, PLAIN,
                                      jnp.exp(sl / cntf)[None],
                                      validity=nonempty[None])
            elif spec.func in ("bitwise_and_agg", "bitwise_or_agg"):
                f = A.g_bitand if spec.func == "bitwise_and_agg"                     else A.g_bitor
                out[spec.name] = DCol(T.BIGINT, PLAIN,
                                      f(c.values, m)[None],
                                      validity=nonempty[None])
            elif spec.func in ("min_n", "max_n"):
                width = int(spec.param)
                vk = SORT.value_sort_key(c)
                if spec.func == "max_n":
                    vk = ~vk
                perm = SORT.argsort_multi([(vk, False)], m)
                cnt = jnp.minimum(A.g_count(m), width).astype(jnp.int32)
                take = c.values[perm[:width]]
                grid = jnp.arange(width, dtype=jnp.int32)[None, :] <                     cnt[None, None][0]
                out[spec.name] = DCol(
                    _agg_output_type(spec), COL_ARRAY,
                    jnp.where(grid, take[None, :], 0), cnt[None],
                    (cnt > 0)[None], c.dictionary)
            elif spec.func in ("bool_and", "bool_or"):
                b = c.values.astype(jnp.bool_)
                if spec.func == "bool_and":
                    v = ~jnp.any(m & ~b)
                else:
                    v = jnp.any(m & b)
                out[spec.name] = DCol(T.BOOLEAN, PLAIN, v[None],
                                      validity=nonempty[None])
            elif spec.func in CORR_FUNCS:
                x = eval_expr(spec.arg2, chunk)
                both = m & x.valid_or_true()
                yf, xf = _fvals(c), _fvals(x)
                nn = A.g_count(both).astype(jnp.float64)
                sx = A.g_sum(jnp.where(both, xf, 0.0), both, jnp.float64)
                sy = A.g_sum(jnp.where(both, yf, 0.0), both, jnp.float64)
                sxy = A.g_sum(jnp.where(both, xf * yf, 0.0), both,
                              jnp.float64)
                sxx = A.g_sum(jnp.where(both, xf * xf, 0.0), both,
                              jnp.float64)
                syy = A.g_sum(jnp.where(both, yf * yf, 0.0), both,
                              jnp.float64)
                v, ok = _corr_finalize(spec.func, nn, sx, sy, sxy, sxx,
                                       syy)
                out[spec.name] = DCol(T.DOUBLE, PLAIN, v[None],
                                      validity=ok[None])
            else:
                raise NotImplementedError(spec.func)
        return Chunk(out, jnp.ones((1,), jnp.bool_))

    return kernel(child, plan.aggs)


# ---------------------------------------------------------------- joins

def _exec_join(plan: PhysHashJoin, ctx: ExecContext) -> Chunk:
    build = execute(plan.build, ctx)
    probe = execute(plan.probe, ctx)
    k = _partition_count(plan, probe, build, ctx)
    if k > 1:
        return _exec_join_partitioned(plan, probe, build, ctx, k)
    return _join_core(plan, probe, build, ctx)


def _join_core(plan: PhysHashJoin, probe: Chunk, build: Chunk,
               ctx: ExecContext) -> Chunk:
    build_count = int(jnp.sum(build.mask))
    capacity = HT.capacity_for(max(build_count, 1))
    if plan.kind == "mark":
        # NULL build keys never equal anything — exclude them from the
        # table (their existence is carried by the mark's has-null flag,
        # not by raw-value matches)
        nn, has_null = mark_build_nn(plan, build)
        table = HT.build(_key_arrays(build, plan.build_keys), nn, capacity)
        return _join_mark(plan, probe, build, table, has_null)
    table = _build_kernel(build, plan.build_keys, capacity)
    probe = _dynamic_filter(plan, probe, build, ctx)
    if plan.kind == "full":
        return _join_full(plan, probe, build, table, ctx)
    fast_unique = plan.unique_build and plan.filter is None
    if fast_unique and plan.kind in ("inner", "left", "semi", "anti"):
        return _join_unique(plan, probe, build, table, ctx)
    return _join_expand(plan, probe, build, table, ctx)


def _partition_count(plan: PhysHashJoin, probe: Chunk, build: Chunk,
                     ctx: ExecContext) -> int:
    """How many hash partitions the join needs to fit the memory budget
    (1 = in-memory).  Working-set estimate: build table + CSR links ≈ 3×
    build bytes, probe + expansion output ≈ 3× probe bytes."""
    pool = getattr(ctx, "pool", None)
    if pool is None or pool.budget is None or not plan.probe_keys:
        return 1
    if plan.kind not in ("inner", "left", "semi", "anti"):
        return 1
    from ..utils.memory import chunk_bytes
    need = 3 * chunk_bytes(build) + 3 * chunk_bytes(probe)
    avail = max(pool.budget - pool.used, 1)
    if need <= avail:
        return 1
    return min(max(2, HT.next_pow2(-(-need // avail))), 64)


def _exec_join_partitioned(plan: PhysHashJoin, probe: Chunk, build: Chunk,
                           ctx: ExecContext, k: int) -> Chunk:
    """Partition-at-a-time join under memory pressure.

    Hash-partitions BOTH sides on the join keys (high hash bits, so
    partition choice is independent of the table's low-bit slot hashing)
    and runs one partition's build+probe at a time — peak operator state is
    ~1/k of the in-memory join.  The HBM-tier redesign of the reference's
    spilled join (``spiller/GenericPartitioningSpiller.java``,
    ``operator/join/HashBuilderOperator.java:59`` SPILLING_INPUT states,
    ``PartitionedConsumption.java`` partition-by-partition probe replay).
    Every key lives in exactly one partition, so inner/left/semi/anti
    results concatenate without dedup or merge."""
    from ..ops.hashing import hash_keys
    bits = max(k.bit_length() - 1, 1)
    ph = hash_keys(_key_arrays(probe, plan.probe_keys))
    bh = hash_keys(_key_arrays(build, plan.build_keys))
    ppart = (ph >> jnp.uint32(32 - bits)).astype(jnp.int32)
    bpart = (bh >> jnp.uint32(32 - bits)).astype(jnp.int32)
    ctx.spill_partitions += k
    outs = []
    for p in range(k):
        bsel = build.mask & (bpart == p)
        psel = probe.mask & (ppart == p)
        bcnt = int(jnp.sum(bsel))
        pcnt = int(jnp.sum(psel))
        if pcnt == 0 and (bcnt == 0 or plan.kind in ("semi", "anti",
                                                     "inner", "left")):
            continue  # no probe rows ⇒ no output rows for these kinds
        sub_b = _compact_kernel(Chunk(build.cols, bsel),
                                max(HT.next_pow2(max(bcnt, 1)), 64))
        sub_p = _compact_kernel(Chunk(probe.cols, psel),
                                max(HT.next_pow2(max(pcnt, 1)), 64))
        outs.append(_join_core(plan, sub_p, sub_b, ctx))
    if not outs:  # degenerate: no probe rows anywhere — keep output schema
        sub_p = _compact_kernel(Chunk(probe.cols, probe.mask & False), 64)
        sub_b = _compact_kernel(Chunk(build.cols, build.mask & False), 64)
        return _join_core(plan, sub_p, sub_b, ctx)
    return concat_chunks(outs)


@partial(jax.jit, static_argnames=("probe_key", "build_key"))
def _dyn_filter_kernel(probe: Chunk, build: Chunk, probe_key, build_key):
    """Build-side min/max domain → probe row mask narrowing."""
    bk = eval_expr(build_key, build)
    pk = eval_expr(probe_key, probe)
    bmask = build.mask & bk.valid_or_true()
    bv = bk.values.astype(jnp.int64)
    bmin = A.g_min(bv, bmask)
    bmax = A.g_max(bv, bmask)
    pv = pk.values.astype(jnp.int64)
    return probe.mask & (pv >= bmin) & (pv <= bmax)


def _dynamic_filter(plan: PhysHashJoin, probe: Chunk, build: Chunk,
                    ctx: ExecContext) -> Chunk:
    """Dynamic filtering (reference: ``DynamicFilterSourceOperator`` +
    ``server/DynamicFilterService.java``): narrow the probe side by the
    build keys' min/max domain before probing — pays off when the filtered
    build side covers a small key range (e.g. a dimension slice) and lets
    the compaction pass shrink the probe chunk."""
    if plan.kind not in ("inner", "semi") or not plan.probe_keys:
        return probe  # outer/anti joins must keep unmatched probe rows
    if probe.n_rows < ctx.min_rows_for_compaction:
        return probe  # not worth the extra pass on small probes
    pk, bk = plan.probe_keys[0], plan.build_keys[0]
    try:
        pkc = eval_expr(pk, probe)
        bkc = eval_expr(bk, build)
    except Exception:  # noqa: BLE001 - key not evaluable here
        return probe
    if pkc.kind != PLAIN or bkc.kind != PLAIN:
        return probe
    mask = _dyn_filter_kernel(probe, build, pk, bk)
    return _maybe_compact(Chunk(probe.cols, mask), ctx)


@partial(jax.jit, static_argnames=("probe_keys", "payload", "kind"))
def _join_unique_kernel(table, probe: Chunk, build: Chunk,
                        probe_keys, payload, kind) -> Chunk:
    match = _probe_unique_kernel(table, probe, probe_keys)
    found = match >= 0
    if kind == "semi":
        return Chunk(dict(probe.cols), probe.mask & found)
    if kind == "anti":
        return Chunk(dict(probe.cols), probe.mask & ~found)
    cols = dict(probe.cols)
    for out_name, bcol in payload:
        cols[out_name] = build.cols[bcol].take(match, valid=found)
    mask = probe.mask & found if kind == "inner" else probe.mask
    return Chunk(cols, mask)


@partial(jax.jit, static_argnames=("probe_keys", "mark_name"))
def _join_mark_kernel(table, probe: Chunk, probe_keys, mark_name,
                      build_has_null) -> Chunk:
    slot, _ = _probe_counts_kernel(table, probe, probe_keys)
    # SQL 3-valued IN: a row with no match is FALSE only when both the
    # probe key and the entire build key set are NULL-free; otherwise
    # the comparison to the NULL(s) is unknown → mark is NULL.  Matters
    # under OR/NOT where a mark of FALSE and NULL diverge (ADVICE r4;
    # reference semantics: SetContains with hasNull).
    probe_valid = jnp.ones_like(slot, dtype=jnp.bool_)
    for e in probe_keys:
        c = eval_expr(e, probe)
        if c.validity is not None:
            probe_valid = probe_valid & c.validity
    found = (slot >= 0) & probe_valid  # NULL probe key matches nothing
    mark_valid = found | (probe_valid & ~build_has_null)
    cols = dict(probe.cols)
    cols[mark_name] = DCol(T.BOOLEAN, PLAIN, found, validity=mark_valid)
    return Chunk(cols, probe.mask)


def mark_build_nn(plan, build: Chunk):
    """(non-NULL build mask, local has-null flag) for a mark join —
    NULL build keys are excluded from the table and folded into the
    mark's validity instead."""
    nn = build.mask
    for e in plan.build_keys:
        c = eval_expr(e, build)
        if c.validity is not None:
            nn = nn & c.validity
    return nn, jnp.any(build.mask & ~nn)


def _join_mark(plan, probe, build, table, has_null) -> Chunk:
    """MARK semi-join: keep every probe row, append the existence bit as
    a boolean column (consumed by OR-composed predicates)."""
    return _join_mark_kernel(table, probe, plan.probe_keys,
                             plan.mark_name, has_null)


def _join_unique(plan, probe, build, table, ctx) -> Chunk:
    out = _join_unique_kernel(table, probe, build, plan.probe_keys,
                              plan.build_payload, plan.kind)
    return _maybe_compact(out, ctx)


def _join_expand(plan: PhysHashJoin, probe: Chunk, build: Chunk,
                 table, ctx: ExecContext) -> Chunk:
    slot, cnt = _probe_counts_kernel(table, probe, plan.probe_keys)
    left_like = plan.kind in ("left", "full", "semi", "anti")
    # semi/anti with a residual filter expand too (then reduce per probe row)
    if plan.kind in ("semi", "anti") and plan.filter is None:
        found = slot >= 0
        mask = probe.mask & (found if plan.kind == "semi" else ~found)
        return _maybe_compact(Chunk(dict(probe.cols), mask), ctx)

    eff = jnp.where(probe.mask & (cnt == 0), 1, cnt) if left_like else cnt
    total = int(jnp.sum(jnp.where(probe.mask, eff, 0)))  # host read: exact
    out_size = max(HT.next_pow2(max(total, 1)), 64)
    out, _ = _join_expand_pairs(plan, probe, build, table, slot, cnt,
                                out_size)
    return _maybe_compact(out, ctx)


def _join_expand_pairs(plan: PhysHashJoin, probe: Chunk, build: Chunk,
                       table, slot, cnt, out_size: int):
    """Expansion-join pair materialization with a STATIC output capacity.

    Pure-traced core shared by the local path (which host-reads the exact
    pair count between passes) and the distributed ``shard_map`` path
    (which sizes ``out_size`` from planner estimates and retries on the
    returned overflow flag — the two-pass count→materialize answer to the
    reference's paged ``LookupJoinPageBuilder`` output,
    ``operator/join/DefaultPageJoiner.java:63``).

    Returns ``(chunk, overflow)`` — chunk is NOT compacted."""
    left_like = plan.kind in ("left", "full", "semi", "anti")
    eff = jnp.where(probe.mask & (cnt == 0), 1, cnt) if left_like else cnt
    total = jnp.sum(jnp.where(probe.mask, eff, 0))
    overflow = total > out_size
    probe_row, build_row, valid, matched = HT.expand_matches(
        table, slot, jnp.where(probe.mask, cnt, 0), out_size,
        left=left_like, probe_mask=probe.mask)

    @partial(jax.jit, static_argnames=("payload",))
    def gather(probe: Chunk, build: Chunk, probe_row, build_row, valid,
               matched, payload) -> Chunk:
        cols = {n: c.take(probe_row, valid=valid)
                for n, c in probe.cols.items()}
        for out_name, bcol in payload:
            cols[out_name] = build.cols[bcol].take(build_row, valid=matched)
        return Chunk(cols, valid)

    pairs = gather(probe, build, probe_row, build_row, valid, matched,
                   plan.build_payload)
    pair_mask = pairs.mask
    if plan.filter is not None:
        fm = _filter_kernel(pairs, plan.filter)
        keep_pair = fm & matched
    else:
        keep_pair = pair_mask & matched

    if plan.kind in ("semi", "anti"):
        n_probe = probe.n_rows
        hit = jnp.zeros((n_probe,), jnp.bool_).at[
            jnp.where(keep_pair, probe_row, n_probe)].max(True, mode="drop")
        mask = probe.mask & (hit if plan.kind == "semi" else ~hit)
        return Chunk(dict(probe.cols), mask), overflow

    if plan.kind in ("left", "full"):
        # outer semantics with residual filter (reference:
        # operator/join/DefaultPageJoiner.java:296 outerJoinCurrentPosition):
        # a probe row whose matches ALL fail the filter is null-extended —
        # its first pair is kept with the build payload nulled out.
        n_probe = probe.n_rows
        hit = jnp.zeros((n_probe,), jnp.bool_).at[
            jnp.where(keep_pair, probe_row, n_probe)].max(True, mode="drop")
        first_pair = jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), probe_row[1:] != probe_row[:-1]])
        null_extend = (pair_mask & matched & first_pair
                       & ~hit[jnp.minimum(probe_row, n_probe - 1)])
        mask = keep_pair | (pair_mask & ~matched) | null_extend
        if plan.filter is not None:
            cols = dict(pairs.cols)
            payload_names = {o for o, _ in plan.build_payload}
            for name in payload_names:
                c = cols[name]
                cols[name] = DCol(c.dtype, c.kind, c.values, c.lengths,
                                  c.valid_or_true() & ~null_extend,
                                  c.dictionary)
            return Chunk(cols, mask), overflow
        return Chunk(pairs.cols, mask), overflow

    return Chunk(pairs.cols, keep_pair), overflow


def _full_join_tail(plan: PhysHashJoin, probe: Chunk, build: Chunk,
                    pcap: int) -> Chunk:
    """Unmatched-build rows of a FULL join, probe columns null-extended
    (reference: ``operator/join/LookupJoinOperatorFactory.java:52``
    FULL_OUTER — unvisited build positions are emitted by
    LookupOuterOperator after the probe finishes).  Found by a REVERSE
    semi-probe: build keys against a table over the non-NULL probe keys
    (equi-only; planner rejects FULL with residual filters)."""
    pnn = probe.mask
    for e in plan.probe_keys:
        c = eval_expr(e, probe)
        if c.validity is not None:
            pnn = pnn & c.validity
    ptable = HT.build(_key_arrays(probe, plan.probe_keys), pnn, pcap)
    slot, _ = HT.probe_counts(ptable, _key_arrays(build, plan.build_keys),
                              build.mask)
    bnn = build.mask
    for e in plan.build_keys:
        c = eval_expr(e, build)
        if c.validity is not None:
            bnn = bnn & c.validity
    unmatched = build.mask & ~((slot >= 0) & bnn)
    nb = build.n_rows
    zeros = jnp.zeros((nb,), jnp.int32)
    never = jnp.zeros((nb,), jnp.bool_)
    cols = {n: c.take(zeros, valid=never) for n, c in probe.cols.items()}
    for out_name, bcol in plan.build_payload:
        cols[out_name] = build.cols[bcol]
    return Chunk(cols, unmatched)


def _join_full(plan: PhysHashJoin, probe: Chunk, build: Chunk, table,
               ctx: ExecContext) -> Chunk:
    """FULL OUTER join = probe-outer expansion + null-extended
    unmatched-build tail, concatenated (both halves static-shape)."""
    if plan.filter is not None:
        raise NotImplementedError("FULL JOIN with residual filter")
    pairs = _join_expand(plan, probe, build, table, ctx)
    pcap = HT.capacity_for(max(int(jnp.sum(probe.mask)), 1))
    tail = _full_join_tail(plan, probe, build, pcap)
    return concat_chunks([pairs, tail])
