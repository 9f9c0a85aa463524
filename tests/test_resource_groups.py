"""Resource-group admission: concurrency limits, FIFO queueing, queue
caps, selectors (reference: InternalResourceGroup + DispatchManager)."""

import threading
import time

import pytest

from presto_tpu.parallel.resource_groups import (
    AdmissionTimeout, QueryQueueFullError, ResourceGroup,
    ResourceGroupManager)


def test_concurrency_limit_and_fifo():
    mgr = ResourceGroupManager([ResourceGroup("g", hard_concurrency_limit=2,
                                              max_queued=10)],
                               [("*", "g")])
    order = []
    gate = threading.Event()

    def worker(i, hold):
        with mgr.acquire():
            order.append(i)
            hold.wait(2)

    h1, h2 = threading.Event(), threading.Event()
    t1 = threading.Thread(target=worker, args=(1, h1))
    t2 = threading.Thread(target=worker, args=(2, h2))
    t1.start(), t2.start()
    time.sleep(0.1)
    assert mgr.groups["g"].running == 2
    t3 = threading.Thread(target=worker, args=(3, gate))
    t3.start()
    time.sleep(0.1)
    assert order == [1, 2] and len(mgr.groups["g"].queued) == 1
    h1.set()          # release one slot → queued query admitted FIFO
    time.sleep(0.2)
    assert order == [1, 2, 3]
    gate.set(), h2.set()
    for t in (t1, t2, t3):
        t.join(2)


def test_queue_full_rejects():
    mgr = ResourceGroupManager([ResourceGroup("g", hard_concurrency_limit=1,
                                              max_queued=1)], [("*", "g")])
    hold = threading.Event()

    def worker():
        with mgr.acquire():
            hold.wait(2)

    t = threading.Thread(target=worker)
    t.start()
    time.sleep(0.05)
    t2 = threading.Thread(target=worker)   # fills the single queue slot
    t2.start()
    time.sleep(0.05)
    with pytest.raises(QueryQueueFullError):
        mgr.acquire()
    hold.set()
    t.join(2), t2.join(2)
    assert mgr.groups["g"].rejected == 1


def test_selectors_and_info():
    mgr = ResourceGroupManager(
        [ResourceGroup("etl", hard_concurrency_limit=1),
         ResourceGroup("adhoc", hard_concurrency_limit=2)],
        [("etl_user", "etl"), ("*", "adhoc")])
    assert mgr.select("etl_user").name == "etl"
    assert mgr.select("bob").name == "adhoc"
    with mgr.acquire("etl_user"):
        info = {g["name"]: g for g in mgr.info()}
        assert info["etl"]["running"] == 1
        assert info["adhoc"]["running"] == 0


def test_admission_timeout():
    mgr = ResourceGroupManager([ResourceGroup("g", hard_concurrency_limit=1,
                                              max_queued=5)], [("*", "g")])
    hold = threading.Event()

    def worker():
        with mgr.acquire():
            hold.wait(2)

    t = threading.Thread(target=worker)
    t.start()
    time.sleep(0.05)
    with pytest.raises(AdmissionTimeout):
        mgr.acquire(timeout_s=0.2)
    hold.set()
    t.join(2)


def test_supervisor_integration():
    """ClusterSupervisor honors the group's concurrency limit."""
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs a mesh")
    from presto_tpu.parallel.cluster import ClusterSupervisor
    mgr = ResourceGroupManager([ResourceGroup("g", hard_concurrency_limit=1,
                                              max_queued=4)], [("*", "g")])
    sup = ClusterSupervisor(0.002, resource_groups=mgr)
    try:
        out = sup.run_sql("select count(*) c from nation")
        assert out.to_pydict()["c"] == [25]
        assert mgr.groups["g"].admitted == 1
        assert mgr.groups["g"].running == 0  # released
    finally:
        sup.shutdown()
