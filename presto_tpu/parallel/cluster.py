"""Cluster supervision: heartbeats, admission gating, restart-on-failure —
wired into real query execution.

The single-controller analogue of the reference's coordinator services:

- ``failuredetector/HeartbeatFailureDetector.java:78`` — every worker runs
  a heartbeat thread; the detector's decayed-ratio/staleness logic decides
  liveness (`parallel/failure.py`)
- ``execution/ClusterSizeMonitor.java`` — queries are admitted only while
  >= min_workers are alive
- v359 recovery model (no intra-query task retry): a worker death during a
  query invalidates the in-flight attempt; the query is deterministically
  replayed on the surviving mesh (scans are generator row-ranges, so replay
  is bit-exact) — ``RestartOnFailure``

On hardware, "worker" means a host in the multi-host mesh and death is a
failed collective / missed heartbeat over DCN; here workers are simulated
heartbeat sources over the virtual device mesh, and the completion barrier
treats an attempt's result as lost if any participant died while it ran
(a real collective would have failed or hung).
"""

from __future__ import annotations

import threading
import time
from typing import Callable, Dict, List, Optional

from .distributed import DistributedRunner, make_mesh
from .failure import (ClusterSizeMonitor, HeartbeatFailureDetector,
                      RestartOnFailure)


class WorkerLostError(RuntimeError):
    """An attempt's participant died mid-query; the result is lost."""

    def __init__(self, dead: List[str]):
        super().__init__(f"workers lost during query: {dead}")
        self.dead = dead


class SimulatedWorker:
    """Heartbeat source for one mesh participant (stand-in for a host's
    announcer loop; ``server/Server.java:138``)."""

    def __init__(self, worker_id: str, detector: HeartbeatFailureDetector,
                 interval_s: float = 0.05):
        self.worker_id = worker_id
        self.detector = detector
        self.interval_s = interval_s
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._beat, daemon=True,
                                        name=f"heartbeat-{worker_id}")

    def start(self):
        self.detector.register(self.worker_id)
        self._thread.start()

    def _beat(self):
        while not self._stop.is_set():
            self.detector.heartbeat(self.worker_id, ok=True)
            self._stop.wait(self.interval_s)

    def kill(self):
        """Simulate host death: heartbeats stop; the detector marks the
        worker dead after the staleness timeout."""
        self._stop.set()

    @property
    def alive(self) -> bool:
        return not self._stop.is_set()


class ClusterSupervisor:
    """Runs queries under failure supervision over a device mesh.

    Owns one ``DistributedRunner`` per surviving-worker count (meshes are
    rebuilt over the remaining devices after a death, like the reference
    rebuilding its node map from discovery announcements)."""

    def __init__(self, scale_factor: float, n_workers: Optional[int] = None,
                 min_workers: int = 1, heartbeat_timeout_s: float = 0.5,
                 heartbeat_interval_s: float = 0.05, max_attempts: int = 3,
                 admission_timeout_s: float = 5.0,
                 resource_groups=None, **runner_opts):
        import jax
        # optional per-group admission (resource_groups.ResourceGroupManager)
        self.resource_groups = resource_groups
        n = n_workers or len(jax.devices())
        self.sf = scale_factor
        self.min_workers = min_workers
        self.max_attempts = max_attempts
        self.admission_timeout_s = admission_timeout_s
        self.runner_opts = runner_opts
        self.detector = HeartbeatFailureDetector(
            heartbeat_timeout_s=heartbeat_timeout_s)
        self.monitor = ClusterSizeMonitor(self.detector, min_workers)
        self.workers = [SimulatedWorker(f"worker-{i}", self.detector,
                                        heartbeat_interval_s)
                        for i in range(n)]
        for w in self.workers:
            w.start()
        self._runners: Dict[int, DistributedRunner] = {}
        self.attempts = 0          # total attempts across queries
        self.restarts = 0          # attempts invalidated by worker loss
        # fault-injection hook (reference tests inject at this level too,
        # e.g. StatefulSleepingSum): called with the participant list after
        # the attempt snapshot, i.e. logically mid-query
        self.on_attempt_start: List[Callable[[List[str]], None]] = []

    def kill_worker(self, i: int):
        self.workers[i].kill()

    def shutdown(self):
        """Stop all heartbeat threads (GracefulShutdownHandler analogue)."""
        for w in self.workers:
            w.kill()
        for w in self.workers:
            w._thread.join(timeout=1.0)

    def _runner_for(self, n: int) -> DistributedRunner:
        r = self._runners.get(n)
        if r is None:
            r = DistributedRunner(make_mesh(n), self.sf, **self.runner_opts)
            self._runners[n] = r
        return r

    def _await_admission(self):
        deadline = time.monotonic() + self.admission_timeout_s
        while not self.monitor.ready():
            if time.monotonic() >= deadline:
                raise RuntimeError(
                    f"cluster below min_workers={self.min_workers} "
                    f"(active: {self.detector.active()})")
            time.sleep(0.01)

    def run_sql(self, sql: str, user: str = "presto"):
        """Admission gates (cluster size, then resource group) → attempt
        loop; a lost worker invalidates the attempt and replays on the
        surviving mesh."""
        self._await_admission()
        if self.resource_groups is not None:
            with self.resource_groups.acquire(
                    user, timeout_s=self.admission_timeout_s):
                return self._run_attempts(sql)
        return self._run_attempts(sql)

    def _run_attempts(self, sql: str):
        def attempt(participants: List[str]):
            self.attempts += 1
            for hook in self.on_attempt_start:
                hook(list(participants))
            runner = self._runner_for(len(participants))
            result = runner.run_sql(sql)
            # completion barrier: if any participant died while the
            # program ran, its shard outputs are untrustworthy — a real
            # multi-host collective would have failed outright
            dead = [w for w in participants
                    if not self.detector.is_alive(w)]
            if dead:
                self.restarts += 1
                raise WorkerLostError(dead)
            return result

        return RestartOnFailure(
            attempt, self.detector, max_attempts=self.max_attempts,
            retryable=lambda e: isinstance(e, WorkerLostError)).execute()
