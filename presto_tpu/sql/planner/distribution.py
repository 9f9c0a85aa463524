"""Join distribution selection (DetermineJoinDistributionType + AddExchanges).

The TPU analogue of the reference's distribution planning
(``sql/planner/iterative/rule/DetermineJoinDistributionType.java`` +
``sql/planner/optimizations/AddExchanges.java:120-245``): walk the physical
plan and stamp each hash join REPLICATED (build side broadcast over ICI via
``all_gather``) or PARTITIONED (both sides hash-repartitioned on the join
keys via ``all_to_all`` so build + probe are device-local).  The "exchange"
itself lowers to collectives inside the one compiled stage program
(``parallel/distributed.py``), so this pass only decides the property.
"""

from __future__ import annotations

from ...exec import physical as P
from ...sql import ir


def _constant_keys(keys) -> bool:
    return all(isinstance(k, ir.Literal) for k in keys)


def add_exchanges(plan: P.PhysOp, broadcast_row_limit: float) -> P.PhysOp:
    """Stamp ``dist_type`` on every PhysHashJoin in place.

    PARTITIONED when the planner's build-side row estimate exceeds
    ``broadcast_row_limit`` (reference default decision: size-based
    AUTOMATIC, ``join_max_broadcast_table_size``).  Joins with unknown
    estimates or constant keys (cross joins — hashing a constant would
    route every row to one device) stay REPLICATED.
    """
    if isinstance(plan, P.PhysHashJoin):
        big = plan.build_est > broadcast_row_limit
        if big and not _constant_keys(plan.build_keys):
            plan.dist_type = "partitioned"
        else:
            plan.dist_type = "replicated"
    for c in plan.children():  # PhysScalarBind.children() includes bindings
        add_exchanges(c, broadcast_row_limit)
    return plan
