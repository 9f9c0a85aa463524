"""Failure supervision wired into real query execution: a worker dying
mid-query invalidates the attempt and the query replays, bit-exact, on the
surviving mesh (VERDICT r1 item 7; reference model:
``failuredetector/HeartbeatFailureDetector.java:78`` + v359 restart)."""

import time

import pandas as pd
import pytest

from presto_tpu.exec.runner import LocalRunner
from presto_tpu.parallel.cluster import ClusterSupervisor, WorkerLostError
from presto_tpu.tpch.queries import QUERIES

SF = 0.01
Q = ("select o_orderpriority, count(*) as order_count from orders "
     "where o_orderdate >= date '1993-07-01' group by o_orderpriority "
     "order by o_orderpriority")


def _norm(df: pd.DataFrame):
    return sorted(repr(tuple(t)) for t in df.itertuples(index=False))


@pytest.fixture()
def expected():
    return _norm(LocalRunner(scale_factor=SF).run_sql(Q).to_pandas())


def _wait_dead(sup, wid, timeout=5.0):
    deadline = time.monotonic() + timeout
    while sup.detector.is_alive(wid):
        assert time.monotonic() < deadline, "worker never marked dead"
        time.sleep(0.02)


@pytest.fixture()
def supervisors():
    sups = []
    yield sups
    for s in sups:
        s.shutdown()


def test_worker_death_mid_query_replays_on_survivors(expected, supervisors):
    sup = ClusterSupervisor(SF, n_workers=8, min_workers=2,
                            broadcast_row_limit=3000)
    supervisors.append(sup)
    state = {"killed": False}

    def kill_mid_query(participants):
        # fires inside the first attempt, after its participant snapshot —
        # i.e. while the query is logically in flight
        if not state["killed"]:
            state["killed"] = True
            sup.kill_worker(3)
            _wait_dead(sup, "worker-3")

    sup.on_attempt_start.append(kill_mid_query)
    got = _norm(sup.run_sql(Q).to_pandas())
    assert got == expected
    assert sup.attempts == 2, "first attempt must be invalidated"
    assert sup.restarts == 1
    # the replay ran on the 7 survivors
    assert 7 in sup._runners and sup._runners[7].nd == 7


def test_healthy_cluster_single_attempt(expected, supervisors):
    sup = ClusterSupervisor(SF, n_workers=8, min_workers=2)
    supervisors.append(sup)
    got = _norm(sup.run_sql(Q).to_pandas())
    assert got == expected
    assert sup.attempts == 1 and sup.restarts == 0


def test_admission_gate_blocks_below_min_workers(supervisors):
    sup = ClusterSupervisor(SF, n_workers=3, min_workers=3,
                            heartbeat_timeout_s=0.2,
                            admission_timeout_s=0.5)
    supervisors.append(sup)
    sup.kill_worker(0)
    _wait_dead(sup, "worker-0", timeout=2.0)
    with pytest.raises(RuntimeError, match="min_workers"):
        sup.run_sql(Q)


def test_user_error_is_not_retried(supervisors):
    sup = ClusterSupervisor(SF, n_workers=4, min_workers=1)
    supervisors.append(sup)
    with pytest.raises(Exception) as ei:
        sup.run_sql("select nope from nowhere")
    assert not isinstance(ei.value, WorkerLostError)
    assert sup.attempts == 1, "user errors must not replay"


def test_repeated_deaths_exhaust_attempts(expected, supervisors):
    sup = ClusterSupervisor(SF, n_workers=8, min_workers=1, max_attempts=2,
                            broadcast_row_limit=3000)
    supervisors.append(sup)
    state = {"n": 0}

    def always_kill(participants):
        sup.kill_worker(state["n"])
        _wait_dead(sup, f"worker-{state['n']}")
        state["n"] += 1

    sup.on_attempt_start.append(always_kill)
    with pytest.raises(RuntimeError, match="failed after 2 attempts"):
        sup.run_sql(Q)
    assert sup.attempts == 2 and sup.restarts == 2


def test_tpch_q5_survives_death(expected, supervisors):
    """A partitioned multi-join query replays correctly too."""
    sup = ClusterSupervisor(SF, n_workers=8, min_workers=2,
                            broadcast_row_limit=3000)
    supervisors.append(sup)
    exp = _norm(LocalRunner(scale_factor=SF).run_sql(QUERIES[5]).to_pandas())
    state = {"killed": False}

    def kill_once(participants):
        if not state["killed"]:
            state["killed"] = True
            sup.kill_worker(5)
            _wait_dead(sup, "worker-5")

    sup.on_attempt_start.append(kill_once)
    got = _norm(sup.run_sql(QUERIES[5]).to_pandas())
    assert got == exp
    assert sup.restarts == 1
