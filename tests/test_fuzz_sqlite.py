"""Randomized differential SQL testing vs SQLite.

A seeded generator emits queries from the grammar subset both engines share
(select/arith/case/predicates/joins/group-by/having), runs both, and
compares row multisets.  The property-based complement to the handwritten
suites (reference analogue: trino-verifier replaying query corpora)."""

import random
import sqlite3

import numpy as np
import pytest

from presto_tpu.exec.runner import LocalRunner

import tpch_oracle as O

SF = 0.01
N_QUERIES = 120

TABLES = {
    "nation": ["n_nationkey", "n_regionkey"],
    "region": ["r_regionkey"],
    "supplier": ["s_suppkey", "s_nationkey", "s_acctbal"],
    "customer": ["c_custkey", "c_nationkey", "c_acctbal"],
    # fact-scale table (15k rows at SF0.01): exercises join fan-out and
    # aggregation capacities the dimension-only corpus could not
    "orders": ["o_orderkey", "o_custkey", "o_shippriority",
               "o_totalprice"],
}
# decimal columns: loaded into SQLite in VALUE space (v / 10^scale) so
# literals mean the same thing to both engines; engine outputs scale
# back through their result dtypes (the oracle-encoding bridge the
# round-3 fuzzer dodged by excluding the type)
DEC_COLS = {"s_acctbal": 2, "c_acctbal": 2, "o_totalprice": 2}
STR_COLS = {
    "nation": ["n_name"], "region": ["r_name"],
    "supplier": ["s_name"], "customer": ["c_mktsegment", "c_name"],
    "orders": ["o_orderpriority"],
}
JOINS = [  # (left table, left col, right table, right col)
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
]


@pytest.fixture(scope="module")
def runner():
    return LocalRunner(scale_factor=SF)


@pytest.fixture(scope="module")
def sqlite_db():
    conn = sqlite3.connect(":memory:")
    conn.execute("PRAGMA case_sensitive_like = ON")
    for t in list(TABLES) :
        df = O.load(t, SF)
        cols = ", ".join(f'"{c}"' for c in df.columns)
        ph = ", ".join("?" * len(df.columns))
        conn.execute(f"CREATE TABLE {t} ({cols})")
        def enc(c, v):
            if c in DEC_COLS and isinstance(v, (int, np.integer)):
                return int(v) / 10 ** DEC_COLS[c]
            return int(v) if isinstance(v, (int, np.integer)) else v
        conn.executemany(
            f"INSERT INTO {t} VALUES ({ph})",
            [tuple(enc(c, v) for c, v in zip(df.columns, row))
             for row in df.itertuples(index=False)])
    conn.commit()
    return conn


class Gen:
    def __init__(self, rng: random.Random):
        self.r = rng

    def num_expr(self, cols, depth=0):
        r = self.r
        if depth > 1 or r.random() < 0.4:
            if cols and r.random() < 0.75:
                return r.choice(cols)
            return str(r.randint(0, 20))
        op = r.choice(["+", "-", "*"])
        return (f"({self.num_expr(cols, depth + 1)} {op} "
                f"{self.num_expr(cols, depth + 1)})")

    def predicate(self, cols, scols, depth=0):
        r = self.r
        kind = r.randrange(6 if depth == 0 else 4)
        if kind == 0:
            return (f"{self.num_expr(cols)} "
                    f"{r.choice(['=', '<>', '<', '<=', '>', '>='])} "
                    f"{self.num_expr(cols)}")
        if kind == 1 and cols:
            vals = ", ".join(str(r.randint(0, 24)) for _ in range(3))
            neg = "not " if r.random() < 0.3 else ""
            return f"{r.choice(cols)} {neg}in ({vals})"
        if kind == 2 and cols:
            a, b = sorted([r.randint(0, 15), r.randint(0, 15)])
            return f"{r.choice(cols)} between {a} and {b}"
        if kind == 3 and scols:
            pat = r.choice(["%A%", "A%", "%a", "%AR%", "%e%i%"])
            neg = "not " if r.random() < 0.3 else ""
            return f"{r.choice(scols)} {neg}like '{pat}'"
        glue = r.choice(["and", "or"])
        return (f"({self.predicate(cols, scols, depth + 1)} {glue} "
                f"{self.predicate(cols, scols, depth + 1)})")

    def query(self):
        r = self.r
        if r.random() < 0.12:
            return self.window_query()
        if r.random() < 0.5:
            t = r.choice(list(TABLES))
            from_ = t
            cols = TABLES[t]
            scols = STR_COLS[t]
        else:
            lt, lc, rt, rc = r.choice(JOINS)
            kind = r.choice(["join", "left outer join"])
            from_ = f"{lt} {kind} {rt} on {lc} = {rc}"
            cols = TABLES[lt] + TABLES[rt]
            scols = STR_COLS[lt] + STR_COLS[rt]
        where = ""
        if r.random() < 0.8:
            where = f" where {self.predicate(cols, scols)}"
        if r.random() < 0.5:
            # aggregation query
            nkeys = r.randint(0, 2)
            keys = r.sample(cols + scols, k=nkeys) if nkeys else []
            aggs = []
            for _ in range(r.randint(1, 3)):
                f = r.choice(["count(*)", "sum", "min", "max", "count"])
                if f == "count(*)":
                    aggs.append("count(*)")
                else:
                    aggs.append(f"{f}({r.choice(cols)})")
            sel = ", ".join(keys + aggs)
            gb = f" group by {', '.join(keys)}" if keys else ""
            having = ""
            if keys and r.random() < 0.3:
                having = f" having count(*) > {r.randint(0, 3)}"
            return f"select {sel} from {from_}{where}{gb}{having}"
        # projection query
        items = []
        for _ in range(r.randint(1, 4)):
            if r.random() < 0.3 and scols:
                items.append(r.choice(scols))
            elif r.random() < 0.3:
                c = r.choice(cols)
                items.append(
                    f"case when {c} > {r.randint(0, 10)} then {c} "
                    f"else {-r.randint(0, 5)} end")
            else:
                items.append(self.num_expr(cols))
        return f"select {', '.join(items)} from {from_}{where}"

    def window_query(self):
        """Window functions over one table (tie-safe shapes only: rank /
        dense_rank and default-RANGE-frame sum/min/max include peers, so
        row order within ties cannot change the value)."""
        r = self.r
        t = r.choice(list(TABLES))
        cols = TABLES[t]
        scols = STR_COLS[t]
        part = r.choice(cols + scols)
        order = r.choice([c for c in cols if c != part] or cols)
        fn = r.choice([f"rank() over (partition by {part} "
                       f"order by {order})",
                       f"dense_rank() over (partition by {part} "
                       f"order by {order})",
                       f"sum({r.choice(cols)}) over (partition by {part})",
                       f"min({r.choice(cols)}) over (partition by {part} "
                       f"order by {order})",
                       f"count(*) over (partition by {part})"])
        where = ""
        if r.random() < 0.6:
            where = f" where {self.predicate(cols, scols)}"
        return (f"select {part} p, {order} o, {fn} w "
                f"from {t}{where}")


def _norm(rows):
    out = []
    for row in rows:
        vals = []
        for v in row:
            if v is None:
                vals.append(None)
            elif isinstance(v, (int, np.integer, bool, float)):
                # one numeric tower: sqlite returns int for an all-int
                # CASE branch where the engine types the whole CASE as
                # decimal (float after value-space scaling)
                vals.append(round(float(v), 4))
            else:
                vals.append(v)
        out.append(tuple(vals))
    return sorted(map(repr, out))


def _run_fuzz(run_sql, sqlite_db, seed, n_queries):
    rng = random.Random(seed)
    gen = Gen(rng)
    failures = []
    for i in range(n_queries):
        sql = gen.query()
        try:
            exp = sqlite_db.execute(sql).fetchall()
        except sqlite3.Error:
            continue  # generator produced something sqlite rejects
        try:
            got = run_sql(sql)
            from presto_tpu.data import types as T
            gcols = []
            for n in got.names:
                col = got.columns[n]
                vals = col.to_pylist()
                if T.is_decimal(col.dtype):
                    sc = 10 ** col.dtype.scale
                    vals = [None if v is None else v / sc for v in vals]
                gcols.append(vals)
            got_rows = list(zip(*gcols)) if got.names else []
        except Exception as e:  # noqa: BLE001
            failures.append((sql, f"engine error: {type(e).__name__}: {e}"))
            continue
        if _norm(got_rows) != _norm(exp):
            failures.append(
                (sql, f"mismatch: {len(got_rows)} vs {len(exp)} rows; "
                      f"first: {_norm(got_rows)[:1]} vs {_norm(exp)[:1]}"))
    assert not failures, "\n\n".join(f"{s}\n  -> {e}" for s, e in failures[:5])


def test_fuzz_vs_sqlite(runner, sqlite_db):
    _run_fuzz(runner.run_sql, sqlite_db, 20260817, N_QUERIES)


def test_fuzz_vs_sqlite_distributed(sqlite_db):
    """A fuzz slice through the 8-device mesh (general joins, outer joins,
    unions — whatever the grammar emits — all inside the traced program).
    Smaller count than the local run: each distinct query compiles its own
    shard_map program."""
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    from presto_tpu.parallel import distributed as D
    dist = D.DistributedRunner(D.make_mesh(), SF)
    _run_fuzz(dist.run_sql, sqlite_db, 20260817, 30)
