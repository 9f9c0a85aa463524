"""Regression tests for the round-4 advisor findings (ADVICE.md).

Each test pins a bug the round-4 code review found:
 1. (high) FD group-key pruning fired on memory/CTAS tables that merely
    reuse tpch column names — silently wrong GROUP BY results.  Pruning
    is now gated on tracked base-table provenance.
 2. (medium) the Pallas sorted-probe tier truncated genuine composite
    2-key int64 joins through the narrow-key widen() recombination.
 3. (low) mark semi-join NULL semantics: `x IN (subq)` under OR must
    yield NULL (not FALSE) when x is NULL or the build side holds NULLs
    and no match exists.
"""

import pytest

from presto_tpu.exec.runner import LocalRunner

SF = 0.01


@pytest.fixture(scope="module")
def runner():
    return LocalRunner(scale_factor=SF)


def test_fd_pruning_not_by_column_name(runner):
    # CTAS reusing tpch names: c_name here holds c_mktsegment values
    # plus inserted 'ZZZ' rows where custkey -> name is NOT functional.
    runner.run_sql(
        "create table fdprune_t as select c_custkey, c_mktsegment c_name "
        "from customer where c_custkey <= 3")
    runner.run_sql(
        "insert into fdprune_t select c_custkey, 'ZZZ' from customer "
        "where c_custkey <= 3")
    got = runner.run_sql(
        "select c_custkey, c_name from fdprune_t "
        "group by c_custkey, c_name order by c_custkey, c_name").to_pandas()
    assert len(got) == 6  # name-prefix pruning collapsed this to 3
    assert (got.groupby("c_custkey").size() == 2).all()


def test_fd_pruning_still_fires_on_base_scan():
    # Q10-shape grouping on a real customer scan still prunes dependents
    from presto_tpu.sql.parser import parse
    from presto_tpu.sql.planner.planner import Planner
    from presto_tpu.tpch.queries import QUERIES
    import presto_tpu.exec.physical as P

    plan = Planner(0.01).plan(parse(QUERIES[10]))
    aggs = []

    def walk(n):
        if isinstance(n, P.PhysHashAggregate):
            aggs.append(n)
        for ch in n.__dict__.values():
            if isinstance(ch, P.PhysOp):
                walk(ch)
            elif isinstance(ch, tuple):
                for c in ch:
                    if isinstance(c, P.PhysOp):
                        walk(c)

    walk(plan)
    assert any(len(a.groups) == 2 and
               sum(1 for s in a.aggs if s.func == "arbitrary") == 5
               for a in aggs)


def test_fd_pruning_subquery_rename_is_safe(runner):
    # a derived table renaming a non-FD column INTO a tpch name must not
    # be treated as the base column
    got = runner.run_sql(
        "select c_custkey, c_name from "
        "(select o_custkey c_custkey, o_orderpriority c_name from orders) t "
        "group by c_custkey, c_name order by c_custkey, c_name").to_pandas()
    # oracle: pandas over the generated orders table
    import pandas as pd
    oracle = runner.run_sql(
        "select o_custkey, o_orderpriority from orders").to_pandas()
    exp = (oracle.drop_duplicates().sort_values(
        ["o_custkey", "o_orderpriority"]).reset_index(drop=True))
    assert len(got) == len(exp)
    assert got.c_custkey.tolist() == exp.o_custkey.tolist()


def test_mark_semi_join_null_semantics(runner):
    # `NOT (a IN (subq)) OR ...` with a NULL in the build side: SQL says
    # the IN is UNKNOWN for non-matching rows, so NOT keeps UNKNOWN and
    # the row is dropped (a 2-valued mark kept it).
    runner.run_sql(
        "create table mk_probe as select c_custkey a from customer "
        "where c_custkey <= 3")
    runner.run_sql(
        "create table mk_build as select nullif(c_custkey, 2) b "
        "from customer where c_custkey <= 2")
    got = runner.run_sql(
        "select a from mk_probe where not (a in (select b from mk_build)) "
        "or a = 2 order by a").to_pandas()
    assert got.a.tolist() == [2]
    got2 = runner.run_sql(
        "select a from mk_probe where a in (select b from mk_build) "
        "or a = 2 order by a").to_pandas()
    assert got2.a.tolist() == [1, 2]


def test_inventory_pk_unique():
    import numpy as np
    from presto_tpu.tpcds.generator import generate
    t = generate("inventory", 0.01)
    trip = np.stack([np.asarray(t.columns[c].values) for c in
                     ("inv_date_sk", "inv_item_sk", "inv_warehouse_sk")], 1)
    assert len(np.unique(trip, axis=0)) == len(trip)
