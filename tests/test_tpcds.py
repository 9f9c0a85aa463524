"""TPC-DS connector: generator shape + SQLite differential battery
(reference: ``plugin/trino-tpcds``; correctness over the spec-shaped
generated data is established differentially, see tpcds/generator.py)."""

import sqlite3

import numpy as np
import pytest

from presto_tpu.exec.runner import LocalRunner
from presto_tpu.tpcds import generator as G
from presto_tpu.tpcds import schema as S
from presto_tpu.tpcds.queries import QUERIES

SF = 0.02


@pytest.fixture(scope="module")
def runner():
    r = LocalRunner(scale_factor=0.01)
    G.attach(r, SF)
    return r


@pytest.fixture(scope="module")
def sqlite_db():
    conn = sqlite3.connect(":memory:")
    for t in S.TABLE_SCHEMAS:
        tbl = G.generate(t, SF)
        names = list(tbl.names)
        conn.execute(f"CREATE TABLE {t} ({', '.join(names)})")
        rows = list(zip(*[_raw(tbl.columns[c]) for c in names]))
        conn.executemany(
            f"INSERT INTO {t} VALUES ({', '.join('?' * len(names))})", rows)
    conn.commit()
    return conn


def _raw(col):
    """Raw comparable values: decimals/dates as ints, strings as str."""
    from presto_tpu.data.column import DICT, BYTES
    if col.kind == DICT:
        return [str(col.dictionary[c]) for c in np.asarray(col.values)]
    if col.kind == BYTES:
        return col.to_pylist()
    return [int(v) for v in np.asarray(col.values)]


def test_generator_shapes():
    for t in S.TABLE_SCHEMAS:
        tbl = G.generate(t, SF)
        assert tbl.row_count == S.row_count(t, SF)
        assert list(tbl.names) == [c for c, _ in S.TABLE_SCHEMAS[t]]
    # determinism
    a = G.generate("store_sales", SF).columns["ss_item_sk"]
    b = G.generate("store_sales", SF).columns["ss_item_sk"]
    assert np.array_equal(np.asarray(a.values), np.asarray(b.values))
    # FK ranges
    ss = G.generate("store_sales", SF)
    assert np.asarray(ss.columns["ss_item_sk"].values).max() \
        <= S.row_count("item", SF)
    dd = G.generate("date_dim", SF)
    assert int(np.asarray(dd.columns["d_year"].values)[0]) == 1900


def _norm(rows):
    out = []
    for r in rows:
        vals = []
        for v in r:
            if isinstance(v, (int, np.integer, bool)):
                vals.append(int(v))
            elif isinstance(v, float):
                vals.append(round(v, 4))
            else:
                vals.append(v)
        out.append(tuple(vals))
    return sorted(map(repr, out))


@pytest.mark.parametrize("qid", sorted(QUERIES))
def test_tpcds_vs_sqlite(qid, runner, sqlite_db):
    sql = QUERIES[qid]
    got = runner.run_sql(sql)
    got_rows = list(zip(*[got.to_pydict()[n] for n in got.names])) \
        if got.names else []
    exp_rows = sqlite_db.execute(sql).fetchall()
    if qid == 7:
        # avg: engine returns exact decimals (round-half-up ints at the
        # argument scale), sqlite returns floats — compare per cell
        assert len(got_rows) == len(exp_rows)
        for g, e in zip(sorted(got_rows), sorted(exp_rows)):
            assert g[0] == e[0]
            for gv, ev in zip(g[1:], e[1:]):
                assert abs(float(gv) - float(ev)) <= 1.0, (g, e)
        return
    assert _norm(got_rows) == _norm(exp_rows), qid
