"""Failure detector tests with a virtual clock (reference:
``TestHeartbeatFailureDetector`` + TestingTicker pattern)."""

import pytest

from presto_tpu.parallel.failure import (
    ClusterSizeMonitor, DecayedRatio, HeartbeatFailureDetector,
    RestartOnFailure)


class Clock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def test_decayed_ratio():
    r = DecayedRatio(decay_seconds=10)
    r.record(False, 0.0)
    assert r.ratio(0.0) == 1.0
    for i in range(1, 20):
        r.record(True, float(i))
    assert r.ratio(20.0) < 0.1


def test_detector_excludes_failing_worker():
    clk = Clock()
    d = HeartbeatFailureDetector(failure_ratio_threshold=0.2,
                                 heartbeat_timeout_s=30, clock=clk)
    d.register("w0")
    d.register("w1")
    for i in range(10):
        clk.t += 1
        d.heartbeat("w0", ok=True)
        d.heartbeat("w1", ok=(i % 2 == 0))  # w1 fails half its pings
    assert "w0" in d.active()
    assert "w1" not in d.active()


def test_stale_heartbeat_times_out():
    clk = Clock()
    d = HeartbeatFailureDetector(heartbeat_timeout_s=5, clock=clk)
    d.register("w0")
    d.heartbeat("w0")
    clk.t = 10.0
    assert d.active() == []


def test_cluster_size_gate_and_restart():
    clk = Clock()
    d = HeartbeatFailureDetector(clock=clk)
    d.register("w0")
    d.register("w1")
    d.heartbeat("w0")
    d.heartbeat("w1")
    assert ClusterSizeMonitor(d, 2).ready()

    attempts = []

    def run(workers):
        attempts.append(list(workers))
        if len(attempts) == 1:
            raise RuntimeError("worker died mid-query")
        return "ok"

    out = RestartOnFailure(run, d).execute()
    assert out == "ok"
    assert len(attempts) == 2
