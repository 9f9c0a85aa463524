"""Differential testing vs SQLite (second independent oracle).

The reference cross-checks engines via H2 + the verifier service
(``service/trino-verifier``); here a battery of general SQL shapes runs on
both this engine and SQLite over identical data, comparing row multisets.
Decimals are loaded as unscaled ints on both sides so results are exact.
"""

import sqlite3

import numpy as np
import pytest

from presto_tpu.exec.runner import LocalRunner

import tpch_oracle as O

SF = 0.01
TABLES = ["region", "nation", "supplier", "customer", "orders"]


@pytest.fixture(scope="module")
def runner():
    return LocalRunner(scale_factor=SF)


@pytest.fixture(scope="module")
def sqlite_db():
    conn = sqlite3.connect(":memory:")
    for t in TABLES:
        df = O.load(t, SF)
        cols = ", ".join(f'"{c}"' for c in df.columns)
        ph = ", ".join("?" * len(df.columns))
        conn.execute(f"CREATE TABLE {t} ({cols})")
        conn.executemany(f"INSERT INTO {t} VALUES ({ph})",
                         [tuple(int(v) if isinstance(v, (int, np.integer))
                                else v for v in row)
                          for row in df.itertuples(index=False)])
    conn.commit()
    return conn


QUERIES = [
    "select n_regionkey, count(*) from nation group by n_regionkey",
    "select r_name, n_name from region, nation "
    "  where r_regionkey = n_regionkey and r_name like 'A%'",
    "select count(*) from supplier where s_acctbal < 0",
    "select s_nationkey, min(s_acctbal), max(s_acctbal), sum(s_acctbal) "
    "  from supplier group by s_nationkey having count(*) > 2",
    "select n_name from nation where n_regionkey in (1, 3) "
    "  and n_name not like '%A'",
    "select case when n_regionkey < 2 then 'low' else 'high' end b, count(*)"
    "  from nation group by case when n_regionkey < 2 then 'low' else 'high' end",
    "select c_mktsegment, count(distinct c_nationkey) from customer "
    "  group by c_mktsegment",
    "select n_name from nation n where exists ("
    "  select * from supplier s where s.s_nationkey = n.n_nationkey "
    "  and s.s_acctbal > 900000)",
    "select n_name from nation n where not exists ("
    "  select * from supplier s where s.s_nationkey = n.n_nationkey)",
    "select o_orderpriority, sum(o_totalprice) from orders "
    "  where o_orderdate between 8766 and 9131 group by o_orderpriority",
    "select c_nationkey, count(*) from customer "
    "  where c_custkey % 2 = 1 group by c_nationkey",
    "select abs(s_acctbal), length(s_name) from supplier "
    "  where s_suppkey <= 3",
    "select n_regionkey from nation union select r_regionkey from region",
    "select n_regionkey from nation where n_regionkey < 3 "
    "  intersect select r_regionkey from region",
    "select r_regionkey from region except "
    "  select n_regionkey from nation where n_name like 'A%'",
    "select upper(n_name), lower(n_name) from nation where n_nationkey < 4",
    "select coalesce(nullif(n_regionkey, 0), 99) from nation",
    "select s_suppkey + s_nationkey * 2 - 1 from supplier "
    "  where s_suppkey <= 5",
    "select count(*) from orders o, customer c "
    "  where o.o_custkey = c.c_custkey and c.c_nationkey = 7",
    "select c.c_custkey, count(o.o_orderkey) from customer c "
    "  left outer join orders o on c.c_custkey = o.o_custkey "
    "  where c.c_custkey <= 9 group by c.c_custkey",
    "select count(*) from nation, region",
    "select r_name, n_name from region cross join nation "
    "  where n_regionkey = 0 and r_regionkey = 4",
    "select r_name, count(*) from region cross join nation group by r_name",
]

# engine-side rewrites: '%' → mod(); decimal literals scale-adjusted (the
# sqlite copy stores decimals as raw unscaled ints)
ENGINE_REWRITE = {
    "select c_nationkey, count(*) from customer "
    "  where c_custkey % 2 = 1 group by c_nationkey":
    "select c_nationkey, count(*) from customer "
    "  where mod(c_custkey, 2) = 1 group by c_nationkey",
    "select n_name from nation n where exists ("
    "  select * from supplier s where s.s_nationkey = n.n_nationkey "
    "  and s.s_acctbal > 900000)":
    "select n_name from nation n where exists ("
    "  select * from supplier s where s.s_nationkey = n.n_nationkey "
    "  and s.s_acctbal > 9000.00)",
}


def _norm(rows):
    out = []
    for r in rows:
        out.append(tuple(int(v) if isinstance(v, (int, np.integer, bool))
                         else v for v in r))
    return sorted(map(repr, out))


@pytest.mark.parametrize("sql", QUERIES)
def test_vs_sqlite(sql, runner, sqlite_db):
    engine_sql = ENGINE_REWRITE.get(sql, sql)
    got = runner.run_sql(engine_sql)
    got_rows = list(zip(*[got.to_pydict()[n] for n in got.names])) \
        if got.names else []
    exp_rows = sqlite_db.execute(sql).fetchall()
    assert _norm(got_rows) == _norm(exp_rows), sql


@pytest.fixture(scope="module")
def dist_runner():
    import jax
    from presto_tpu.parallel import distributed as D
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    return D.DistributedRunner(D.make_mesh(), SF)


@pytest.mark.parametrize("sql", QUERIES)
def test_vs_sqlite_distributed(sql, dist_runner, sqlite_db):
    """The same battery through the 8-device mesh path (general joins —
    expanding, filtered, outer — all execute inside the traced program)."""
    engine_sql = ENGINE_REWRITE.get(sql, sql)
    got = dist_runner.run_sql(engine_sql)
    got_rows = list(zip(*[got.to_pydict()[n] for n in got.names])) \
        if got.names else []
    exp_rows = sqlite_db.execute(sql).fetchall()
    assert _norm(got_rows) == _norm(exp_rows), sql
