"""TPC-DS connector: generator shape + SQLite differential battery
(reference: ``plugin/trino-tpcds``; correctness over the spec-shaped
generated data is established differentially, see tpcds/generator.py)."""

import sqlite3

import numpy as np
import pytest

from presto_tpu.exec.runner import LocalRunner
from presto_tpu.tpcds import generator as G
from presto_tpu.tpcds import schema as S
from presto_tpu.tpcds.queries import FUZZY, QUERIES

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


def _sqlite_sql(sql):
    """SQLite holds dates as epoch-day ints and has no typed literals:
    rewrite ``date 'YYYY-MM-DD'`` to the day number (the oracle-encoding
    bridge, built instead of excluding the type)."""
    import datetime as dt
    import re

    def _d(m):
        y, mo, d = int(m.group(1)), int(m.group(2)), int(m.group(3))
        return str((dt.date(y, mo, d) - dt.date(1970, 1, 1)).days)

    return re.sub(r"date '(\d+)-(\d+)-(\d+)'", _d, sql)


def _raw(col):
    """Value-space comparables: decimals as value floats (v/10^s), dates
    as epoch-day ints, strings as str, NULLs as None.  Decimal columns
    go in as REALs so predicates like ``price > 50`` mean dollars on
    both engines."""
    from presto_tpu.data.column import DICT, BYTES
    from presto_tpu.data import types as T
    valid = None if col.validity is None else np.asarray(col.validity)

    def mask(vals):
        if valid is None:
            return list(vals)
        return [v if ok else None for v, ok in zip(vals, valid)]

    if col.kind == DICT:
        return mask([str(col.dictionary[c]) for c in np.asarray(col.values)])
    if col.kind == BYTES:
        return col.to_pylist()
    if T.is_decimal(col.dtype):
        s = 10 ** col.dtype.scale
        return mask([int(v) / s for v in np.asarray(col.values)])
    return mask([int(v) for v in np.asarray(col.values)])


def _engine_rows(got):
    """Engine Table -> value-space rows (decimals scaled to floats)."""
    from presto_tpu.data import types as T
    cols = []
    for n in got.names:
        c = got.columns[n]
        vals = c.to_pylist()
        if T.is_decimal(c.dtype):
            s = 10 ** c.dtype.scale
            vals = [None if v is None else v / s for v in vals]
        cols.append(vals)
    return list(zip(*cols)) if cols else []


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
            if isinstance(v, (bool, int, float, np.integer)):
                # one numeric tower: sqlite returns int 0 where a decimal
                # sum is empty, the engine returns 0.0 — canonicalize to
                # float rounded at 4dp (REAL accumulation error margin)
                vals.append(round(float(v), 4))
            else:
                vals.append(v)
        out.append(tuple(vals))
    return sorted(map(repr, out))


@pytest.mark.parametrize("qid", sorted(QUERIES))
def test_tpcds_vs_sqlite(qid, runner, sqlite_db):
    sql = QUERIES[qid]
    got = runner.run_sql(sql)
    got_rows = _engine_rows(got)
    exp_rows = sqlite_db.execute(_sqlite_sql(sql)).fetchall()
    if qid in FUZZY:
        # avg/ratio columns: engine returns exact decimals (round-half-up
        # ints at the argument scale), sqlite returns floats — compare
        # numeric cells with tolerance, everything else exactly
        assert len(got_rows) == len(exp_rows), qid
        for g, e in zip(sorted(got_rows, key=repr),
                        sorted(exp_rows, key=repr)):
            for gv, ev in zip(g, e):
                if isinstance(gv, (int, float)) and \
                        isinstance(ev, (int, float)):
                    assert abs(float(gv) - float(ev)) <= \
                        max(1.0, 0.001 * abs(float(ev))), (qid, g, e)
                else:
                    assert gv == ev, (qid, g, e)
        return
    assert _norm(got_rows) == _norm(exp_rows), qid
