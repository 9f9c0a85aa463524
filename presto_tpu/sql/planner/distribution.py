"""Join distribution selection (DetermineJoinDistributionType + AddExchanges).

The TPU analogue of the reference's distribution planning
(``sql/planner/iterative/rule/DetermineJoinDistributionType.java`` +
``sql/planner/optimizations/AddExchanges.java:120-245``): stamp each hash
join REPLICATED (build side broadcast over ICI via ``all_gather``) or
PARTITIONED (both sides hash-repartitioned on the join keys via
``all_to_all`` so build + probe are device-local).  The "exchange" itself
lowers to collectives inside the one compiled stage program
(``parallel/distributed.py``), so this pass only decides the property.

The decision is a cost-hooked rule (``rules.DetermineJoinDistributionType``)
run through the iterative engine; this module keeps the pass-style entry
point the runners call.
"""

from __future__ import annotations

from ...exec import physical as P
from .rules import DetermineJoinDistributionType, IterativeOptimizer


def add_exchanges(plan: P.PhysOp, broadcast_row_limit: float) -> P.PhysOp:
    """PARTITIONED when the planner's build-side row estimate exceeds
    ``broadcast_row_limit`` (reference default decision: size-based
    AUTOMATIC, ``join_max_broadcast_table_size``).  Joins with unknown
    estimates or constant keys (cross joins — hashing a constant would
    route every row to one device) stay REPLICATED."""
    rule = DetermineJoinDistributionType(broadcast_row_limit)
    return IterativeOptimizer([rule]).optimize(plan)
