"""Long-decimal (int128) end-to-end: sums/avgs that WRAP int64 must be
bit-exact vs Python big-int reference (VERDICT r1 item 9).

``l_extendedprice^3`` is typed DECIMAL(38,6); its unscaled row values are
~1e21 > 2^63, so both the row-level product and the aggregation state
exceed int64 — any 64-bit shortcut produces silently wrong numbers."""

import numpy as np
import pytest

from presto_tpu.exec.runner import LocalRunner
from presto_tpu.parallel import distributed as D

SF = 0.01
CUBE = "l_extendedprice * l_extendedprice * l_extendedprice"
PRED = "l_orderkey < 4000"


@pytest.fixture(scope="module")
def runner():
    return LocalRunner(scale_factor=SF)


@pytest.fixture(scope="module")
def rows(runner):
    t = runner.run_sql(
        f"select l_returnflag f, l_extendedprice p from lineitem "
        f"where {PRED}")
    d = t.to_pydict()
    return list(zip(d["f"], (int(v) for v in d["p"])))


def _half_up(n, d):
    q, r = divmod(abs(n), abs(d))
    q += 1 if 2 * r >= abs(d) else 0
    return -q if (n < 0) != (d < 0) else q


def test_global_sum_beyond_int64(runner, rows):
    exp = sum(p**3 for _, p in rows)
    assert exp > 2**63, "test data must actually exceed int64"
    t = runner.run_sql(
        f"select sum({CUBE}) s from lineitem where {PRED}")
    assert t.to_pydict()["s"] == [exp]


def test_grouped_sum_avg_beyond_int64(runner, rows):
    t = runner.run_sql(
        f"select l_returnflag f, sum({CUBE}) s, avg({CUBE}) a, "
        f"count(*) c from lineitem where {PRED} group by l_returnflag")
    d = t.to_pydict()
    got = {f: (s, a, c) for f, s, a, c in
           zip(d["f"], d["s"], d["a"], d["c"])}
    groups = sorted({f for f, _ in rows})
    assert set(got) == set(groups)
    for g in groups:
        vals = [p**3 for f, p in rows if f == g]
        exp_sum = sum(vals)
        assert got[g][0] == exp_sum, f"group {g} sum"
        assert got[g][1] == _half_up(exp_sum, len(vals)), f"group {g} avg"
        assert got[g][2] == len(vals)


def test_having_and_order_by_on_int128(runner, rows):
    by_group = {}
    for f, p in rows:
        by_group.setdefault(f, []).append(p**3)
    sums = {g: sum(v) for g, v in by_group.items()}
    # SQL literal is a logical value; the engine's unscaled sums carry
    # scale 6 — pick a logical threshold between the group sums
    thresh = sorted(sums.values())[len(sums) // 2] // 10**6
    t = runner.run_sql(
        f"select l_returnflag f, sum({CUBE}) s from lineitem "
        f"where {PRED} group by l_returnflag "
        f"having sum({CUBE}) >= {thresh} order by sum({CUBE}) desc")
    d = t.to_pydict()
    exp = sorted(((g, s) for g, s in sums.items() if s >= thresh * 10**6),
                 key=lambda x: -x[1])
    assert list(zip(d["f"], d["s"])) == exp


def test_distributed_sum_beyond_int64(rows):
    mesh = D.make_mesh(8)
    dist = D.DistributedRunner(mesh, SF, broadcast_row_limit=3000)
    t = dist.run_sql(
        f"select l_returnflag f, sum({CUBE}) s from lineitem "
        f"where {PRED} group by l_returnflag")
    d = t.to_pydict()
    exp = {}
    for f, p in rows:
        exp[f] = exp.get(f, 0) + p**3
    assert {f: s for f, s in zip(d["f"], d["s"])} == exp


def test_big_literal_comparison(runner, rows):
    """A literal beyond int64 compares correctly against int64 columns."""
    n_all = len(rows)
    t = runner.run_sql(
        f"select count(*) c from lineitem where {PRED} "
        f"and l_orderkey < 99999999999999999999999999")
    assert t.to_pydict()["c"] == [n_all]
    t2 = runner.run_sql(
        f"select count(*) c from lineitem where {PRED} "
        f"and l_orderkey > 99999999999999999999999999")
    assert t2.to_pydict()["c"] == [0]


def test_min_max_int128(runner, rows):
    t = runner.run_sql(
        f"select l_returnflag f, min({CUBE}) lo, max({CUBE}) hi "
        f"from lineitem where {PRED} group by l_returnflag")
    d = t.to_pydict()
    for f, lo, hi in zip(d["f"], d["lo"], d["hi"]):
        vals = [p**3 for g, p in rows if g == f]
        assert lo == min(vals) and hi == max(vals)


def test_scalar_arithmetic_on_int128(runner, rows):
    """division of two int128 sums (the Q14 shape) + negation."""
    exp_n = sum(p**3 for f, p in rows if f == "A")
    exp_d = sum(p**3 for _, p in rows)
    t = runner.run_sql(
        "select sum(case when l_returnflag = 'A' then "
        f"{CUBE} else cast(0 as decimal(38,6)) end) / sum({CUBE}) r "
        f"from lineitem where {PRED}")
    got = t.to_pydict()["r"][0]
    # result scale follows the engine's decimal-division typing; verify
    # against HALF_UP at that scale
    scale = 6
    exp = _half_up(exp_n * 10**scale, exp_d)
    assert got == exp
