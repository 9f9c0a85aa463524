"""MATCH_RECOGNIZE: vectorized DFA row-pattern matching vs a regex oracle.

Reference: ``operator/window/PatternRecognitionPartition.java`` +
``AbstractTestQueries`` pattern tests.  The fixtures use mutually
exclusive DEFINE predicates so each row classifies to exactly one symbol
letter; the oracle is then Python ``re.finditer`` over the per-partition
letter string — identical leftmost / non-overlapping / skip-past-last-row
semantics."""

import re

import numpy as np
import pytest

from presto_tpu.exec.runner import LocalRunner

import tpch_oracle as O

SF = 0.01


@pytest.fixture(scope="module")
def runner():
    return LocalRunner(scale_factor=SF)


def _oracle_matches(df, pattern_re):
    """Per o_custkey partition (ordered by o_orderkey): classify rows as
    D/U/X against prev price, regex-match, return per-match dicts."""
    out = []
    for ck, part in df.sort_values(["o_custkey", "o_orderkey"]) \
                      .groupby("o_custkey"):
        px = part.o_totalprice.to_numpy()
        letters = ["X"]  # first row: PREV is null → both defines false
        for i in range(1, len(px)):
            letters.append("D" if px[i] < px[i - 1]
                           else ("U" if px[i] > px[i - 1] else "X"))
        s = "".join(letters)
        for m in re.finditer(pattern_re, s):
            rows = part.iloc[m.start():m.end()]
            out.append({"c": int(ck), "len": m.end() - m.start(),
                        "fp": int(rows.o_totalprice.iloc[0]),
                        "lp": int(rows.o_totalprice.iloc[-1])})
    return out


MR_SQL = """
select c, mno, mlen, fp, lp from orders match_recognize (
  partition by o_custkey
  order by o_orderkey
  measures o_custkey as c, match_number() as mno, count(*) as mlen,
           first(o_totalprice) as fp, last(o_totalprice) as lp
  one row per match
  after match skip past last row
  pattern (d+ u+)
  define d as o_totalprice < prev(o_totalprice),
         u as o_totalprice > prev(o_totalprice)
)
"""


def test_v_shape_vs_regex_oracle(runner):
    got = runner.run_sql(MR_SQL).to_pandas()
    o = O.load("orders", SF)
    want = _oracle_matches(o[o.o_custkey <= 10_000], r"D+U+")
    assert len(got) == len(want)
    got_set = sorted((int(r.c), int(r.mlen), int(r.fp), int(r.lp))
                     for r in got.itertuples())
    want_set = sorted((w["c"], w["len"], w["fp"], w["lp"]) for w in want)
    assert got_set == want_set
    # match_number is 1-based and strictly increasing
    assert got.mno.min() == 1 and got.mno.is_monotonic_increasing


def test_quantifiers_and_alternation(runner):
    """(D U) | (D D) on a constructed sequence via the memory catalog."""
    runner.run_sql("create table mr_t as select o_orderkey k, "
                   "mod(o_orderkey, 7) v, 1 p from orders "
                   "where o_orderkey <= 200")
    try:
        got = runner.run_sql("""
          select mlen, fk from mr_t match_recognize (
            partition by p
            order by k
            measures count(*) as mlen, first(k) as fk
            pattern (d u?)
            define d as v < prev(v), u as v > prev(v)
          )
        """).to_pandas()
        assert (got.mlen >= 1).all() and (got.mlen <= 2).all()
        assert len(got) > 0
    finally:
        runner.run_sql("drop table mr_t")


def test_matches_stay_inside_partitions(runner):
    """A match never spans two o_custkey partitions."""
    got = runner.run_sql(MR_SQL).to_pandas()
    o = O.load("orders", SF).sort_values(["o_custkey", "o_orderkey"])
    sizes = o.groupby("o_custkey").size()
    for r in got.itertuples():
        assert int(r.mlen) <= int(sizes[int(r.c)])


def test_explain_renders(runner):
    out = runner.run_sql("explain " + MR_SQL)
    text = "\n".join(c.to_pylist()[0] if False else "" for c in [])
    df = out.to_pandas()
    joined = "\n".join(df.iloc[:, 0].tolist())
    assert "MatchRecognize" in joined


MR_ALL_SQL = """
select c, mno, rcount, price from orders match_recognize (
  partition by o_custkey
  order by o_orderkey
  measures o_custkey as c, match_number() as mno, count(*) as rcount,
           o_totalprice as price
  all rows per match
  after match skip past last row
  pattern (d+ u+)
  define d as o_totalprice < prev(o_totalprice),
         u as o_totalprice > prev(o_totalprice)
)
"""


def test_all_rows_per_match(runner):
    """ALL ROWS PER MATCH: one output row per MATCHED INPUT ROW with
    RUNNING measure semantics (count = rows so far in the match)."""
    got = runner.run_sql(MR_ALL_SQL).to_pandas()
    one = runner.run_sql(MR_SQL).to_pandas()
    # total matched rows = sum of the per-match lengths from ONE ROW mode
    assert len(got) == int(one.mlen.sum())
    # per-match: running count ends at the match length; prices are the
    # actual rows of the match
    o = O.load("orders", SF)
    want = _oracle_matches(o, r"D+U+")
    by_len = sorted(w["len"] for w in want)
    ends = got[got.rcount == got.groupby(
        ["c", "mno"]).rcount.transform("max")]
    assert sorted(int(v) for v in ends.rcount) == by_len
    # running count within each (c, mno) is 1..len
    for (_, _), grp in got.groupby(["c", "mno"]):
        assert grp.rcount.tolist() == list(range(1, len(grp) + 1))
