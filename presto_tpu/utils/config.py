"""Two-tier configuration: static engine config + per-session properties.

Mirrors the reference's split (``@Config`` POJOs from etc/config.properties
vs the 91 per-query session properties in ``SystemSessionProperties.java``):
``EngineConfig`` is process-static; ``Session`` carries per-query overrides
resolved through ``Session.get``.
"""

from __future__ import annotations

from dataclasses import dataclass, field, fields
from typing import Any, Dict, Optional


@dataclass
class EngineConfig:
    """Static engine configuration (analogue of TaskManagerConfig /
    QueryManagerConfig / FeaturesConfig)."""

    # execution
    fused_execution: bool = True          # whole-query single-program compile
    compact_threshold: float = 0.25       # op-path selectivity compaction
    min_rows_for_compaction: int = 1 << 14
    agg_capacity_limit: int = 1 << 22
    # exchange
    repartition_slack: int = 4            # FIXED_HASH bucket padding factor
    broadcast_join_limit: int = 1 << 26   # build rows before hash exchange
    # memory
    max_partial_agg_capacity: int = 1 << 20
    # text pool
    text_pool_bytes: int = 8 * 1024 * 1024
    # kernels: dispatch hot probes/reductions to the Pallas VMEM tier
    # (ops/pallas_kernels.py); requires a TPU backend at query time
    pallas_kernels: bool = False

    @classmethod
    def from_properties(cls, props: Dict[str, str]) -> "EngineConfig":
        cfg = cls()
        for f in fields(cls):
            if f.name in props:
                v = props[f.name]
                t = type(getattr(cfg, f.name))
                setattr(cfg, f.name, t(v) if t is not bool
                        else v.lower() in ("1", "true", "yes"))
        return cfg


# session properties and their defaults (SystemSessionProperties.java
# equivalents relevant to this engine)
SESSION_PROPERTY_DEFAULTS: Dict[str, Any] = {
    "fused_execution": True,            # ≈ per-query codegen toggles
    "join_distribution_type": "AUTOMATIC",  # BROADCAST | PARTITIONED
    "hash_partition_count": None,       # devices used for FIXED_HASH
    "scale_factor_schema": "tiny",
    "query_max_run_time_s": 600,
}


@dataclass
class Session:
    """Per-query session: schema + property overrides
    (reference ``Session`` + X-Trino-Session headers)."""

    schema: str = "tiny"
    user: str = "presto_tpu"
    properties: Dict[str, Any] = field(default_factory=dict)

    def get(self, name: str, default: Any = None) -> Any:
        if name in self.properties:
            return self.properties[name]
        if name in SESSION_PROPERTY_DEFAULTS:
            v = SESSION_PROPERTY_DEFAULTS[name]
            return default if v is None and default is not None else v
        return default

    def set(self, name: str, value: Any) -> None:
        if name not in SESSION_PROPERTY_DEFAULTS:
            raise KeyError(f"unknown session property {name!r}")
        self.properties[name] = value
