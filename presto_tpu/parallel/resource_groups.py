"""Resource groups: admission queueing + concurrency limits.

The reference's ``execution/resourcegroups/InternalResourceGroup.java`` +
``dispatcher/DispatchManager`` admission step, reduced to the shapes this
single-controller engine needs: named groups with hard concurrency and
queue-length limits, FIFO admission within a group, and selector rules
mapping (user, source) → group (``ResourceGroupConfigurationManager``
role).  CPU-time accounting per group feeds a soft limit check.
"""

from __future__ import annotations

import threading
import time
from collections import deque
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple


class QueryQueueFullError(RuntimeError):
    """Group queue at max_queued (reference: QUERY_QUEUE_FULL)."""


class AdmissionTimeout(RuntimeError):
    pass


@dataclass
class ResourceGroup:
    """One admission group (``InternalResourceGroup`` leaf)."""

    name: str
    hard_concurrency_limit: int = 4
    max_queued: int = 64
    soft_cpu_limit_s: Optional[float] = None  # penalize over-consumers

    running: int = 0
    queued: "deque[threading.Event]" = field(default_factory=deque)
    cpu_seconds: float = 0.0      # accumulated query wall (soft accounting)
    admitted: int = 0
    rejected: int = 0

    def over_cpu(self) -> bool:
        return (self.soft_cpu_limit_s is not None
                and self.cpu_seconds > self.soft_cpu_limit_s)


class ResourceGroupManager:
    """Groups + selector rules + FIFO admission.

    ``selectors`` is an ordered list of (user_pattern, group_name); the
    first match wins, '*' matches anyone (the static-rule subset of the
    reference's configurable selectors)."""

    def __init__(self, groups: Optional[List[ResourceGroup]] = None,
                 selectors: Optional[List[Tuple[str, str]]] = None):
        gs = groups or [ResourceGroup("global")]
        self.groups: Dict[str, ResourceGroup] = {g.name: g for g in gs}
        self.selectors = selectors or [("*", gs[0].name)]
        self._lock = threading.Lock()

    def select(self, user: str = "presto") -> ResourceGroup:
        for pattern, gname in self.selectors:
            if pattern == "*" or pattern == user:
                return self.groups[gname]
        return next(iter(self.groups.values()))

    def acquire(self, user: str = "presto",
                timeout_s: float = 30.0) -> "_Slot":
        """Block until the user's group grants a run slot (FIFO), raising
        QueryQueueFullError when the group's queue is saturated."""
        g = self.select(user)
        me: Optional[threading.Event] = None
        with self._lock:
            if g.running < g.hard_concurrency_limit and not g.queued \
                    and not g.over_cpu():
                g.running += 1
                g.admitted += 1
                return _Slot(self, g)
            if len(g.queued) >= g.max_queued:
                g.rejected += 1
                raise QueryQueueFullError(
                    f"group '{g.name}' queue full "
                    f"({len(g.queued)}/{g.max_queued})")
            me = threading.Event()
            g.queued.append(me)
        if not me.wait(timeout_s):
            with self._lock:
                try:
                    g.queued.remove(me)
                except ValueError:
                    # granted concurrently with the timeout: release it
                    self._release(g, 0.0)
            raise AdmissionTimeout(
                f"group '{g.name}' admission timed out after {timeout_s}s")
        return _Slot(self, g)

    def _release(self, g: ResourceGroup, cpu_s: float):
        with self._lock:
            g.running -= 1
            g.cpu_seconds += cpu_s
            while g.queued and g.running < g.hard_concurrency_limit \
                    and not g.over_cpu():
                nxt = g.queued.popleft()
                g.running += 1
                g.admitted += 1
                nxt.set()

    def info(self) -> List[dict]:
        """REST-shape group states (``ResourceGroupInfo`` role)."""
        with self._lock:
            return [{"name": g.name, "running": g.running,
                     "queued": len(g.queued), "admitted": g.admitted,
                     "rejected": g.rejected,
                     "cpuSeconds": round(g.cpu_seconds, 3)}
                    for g in self.groups.values()]


class _Slot:
    """Held run slot; context manager releases + accounts wall time."""

    def __init__(self, mgr: ResourceGroupManager, group: ResourceGroup):
        self.mgr = mgr
        self.group = group
        self._t0 = time.monotonic()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.mgr._release(self.group, time.monotonic() - self._t0)
        return False
