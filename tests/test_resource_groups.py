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


def test_hierarchy_parent_limit():
    """A parent's concurrency cap binds its children (reference:
    InternalResourceGroup tree limits)."""
    from presto_tpu.parallel.resource_groups import (ResourceGroup,
                                                     ResourceGroupManager)
    mgr = ResourceGroupManager([
        ResourceGroup("root", hard_concurrency_limit=2),
        ResourceGroup("a", parent="root", hard_concurrency_limit=2),
        ResourceGroup("b", parent="root", hard_concurrency_limit=2),
    ], selectors=[("ua", "a"), ("ub", "b")])
    s1 = mgr.acquire("ua")
    s2 = mgr.acquire("ub")
    # parent root at 2/2: a third query queues even though leaf 'a' has
    # capacity
    import pytest as _pytest
    from presto_tpu.parallel.resource_groups import AdmissionTimeout
    with _pytest.raises(AdmissionTimeout):
        mgr.acquire("ua", timeout_s=0.2)
    s1.__exit__()
    s3 = mgr.acquire("ua", timeout_s=5)
    s3.__exit__()
    s2.__exit__()


def test_weighted_fair_prefers_underweighted():
    from presto_tpu.parallel.resource_groups import (ResourceGroup,
                                                     ResourceGroupManager)
    import threading
    mgr = ResourceGroupManager([
        ResourceGroup("root", hard_concurrency_limit=1,
                      scheduling_policy="weighted_fair"),
        ResourceGroup("small", parent="root", weight=1,
                      hard_concurrency_limit=1),
        ResourceGroup("big", parent="root", weight=3,
                      hard_concurrency_limit=1),
    ], selectors=[("us", "small"), ("ub", "big")])
    held = mgr.acquire("us")
    order = []

    def worker(user, tag):
        with mgr.acquire(user, timeout_s=10):
            order.append(tag)

    ts = [threading.Thread(target=worker, args=("us", "small")),
          threading.Thread(target=worker, args=("ub", "big"))]
    for t in ts:
        t.start()
    import time
    time.sleep(0.3)          # both queued behind `held`
    held.__exit__()
    for t in ts:
        t.join(10)
    # big has weight 3 vs small 1 and both had 0 running: weighted_fair
    # ties on running/weight=0 — the deterministic tiebreak (name) picks
    # 'big' first
    assert order[0] == "big"


def test_query_priority_order():
    from presto_tpu.parallel.resource_groups import (ResourceGroup,
                                                     ResourceGroupManager)
    import threading, time
    mgr = ResourceGroupManager([
        ResourceGroup("g", hard_concurrency_limit=1,
                      scheduling_policy="query_priority"),
    ], selectors=[("*", "g")])
    held = mgr.acquire("u")
    order = []

    def worker(prio):
        with mgr.acquire("u", timeout_s=10, priority=prio):
            order.append(prio)

    ts = [threading.Thread(target=worker, args=(p,)) for p in (1, 5, 3)]
    for t in ts:
        t.start()
        time.sleep(0.1)
    held.__exit__()
    for t in ts:
        t.join(10)
    assert order[0] == 5  # highest priority first
