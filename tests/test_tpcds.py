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


# sqlite has no ROLLUP/GROUPING(): hand-expanded union-all equivalents
# keep those queries in the differential battery
SQLITE_REWRITE = {
    27: """
with base as (
  select i_item_id, s_state, ss_quantity, ss_list_price,
         ss_coupon_amt, ss_sales_price
  from store_sales, customer_demographics, date_dim, store, item
  where ss_sold_date_sk = d_date_sk and ss_item_sk = i_item_sk
    and ss_store_sk = s_store_sk and ss_cdemo_sk = cd_demo_sk
    and cd_gender = 'M' and cd_marital_status = 'S'
    and cd_education_status = 'College' and d_year = 2002)
select * from (
  select i_item_id, s_state, 0 g_state, avg(ss_quantity) agg1,
         avg(ss_list_price) agg2, avg(ss_coupon_amt) agg3,
         avg(ss_sales_price) agg4
  from base group by i_item_id, s_state
  union all
  select i_item_id, null, 1, avg(ss_quantity), avg(ss_list_price),
         avg(ss_coupon_amt), avg(ss_sales_price)
  from base group by i_item_id
  union all
  select null, null, 1, avg(ss_quantity), avg(ss_list_price),
         avg(ss_coupon_amt), avg(ss_sales_price)
  from base)
order by i_item_id is null, i_item_id, s_state is null, s_state
limit 100
""",
    36: """
with base as (
  select ss_net_profit np, ss_ext_sales_price sp, i_category, i_class
  from store_sales, date_dim, item, store
  where d_year = 2001 and d_date_sk = ss_sold_date_sk
    and i_item_sk = ss_item_sk and s_store_sk = ss_store_sk
    and s_state in ('TN', 'KY')),
 lv as (
  select i_category, i_class, 0 loch,
         sum(np) * 1.0 / sum(sp) gm
  from base group by i_category, i_class
  union all
  select i_category, null, 1, sum(np) * 1.0 / sum(sp)
  from base group by i_category
  union all
  select null, null, 2, sum(np) * 1.0 / sum(sp) from base)
select gm gross_margin, i_category, i_class, loch lochierarchy,
       rank() over (
         partition by loch, case when loch = 0 then i_category end
         order by gm asc) rank_within_parent
from lv
order by loch desc, rank_within_parent
limit 100
""",
    # sqlite rejects parenthesized compound-select operands
    87: """
select count(*) c
from (select distinct c_last_name, c_first_name, d_date
      from store_sales, date_dim, customer
      where store_sales.ss_sold_date_sk = date_dim.d_date_sk
        and store_sales.ss_customer_sk = customer.c_customer_sk
        and d_month_seq between 1200 and 1200 + 11
      except
      select distinct c_last_name, c_first_name, d_date
      from catalog_sales, date_dim, customer
      where catalog_sales.cs_sold_date_sk = date_dim.d_date_sk
        and catalog_sales.cs_bill_customer_sk = customer.c_customer_sk
        and d_month_seq between 1200 and 1200 + 11
      except
      select distinct c_last_name, c_first_name, d_date
      from web_sales, date_dim, customer
      where web_sales.ws_sold_date_sk = date_dim.d_date_sk
        and web_sales.ws_bill_customer_sk = customer.c_customer_sk
        and d_month_seq between 1200 and 1200 + 11) cool_cust
""",
}


@pytest.mark.parametrize("qid", sorted(QUERIES))
def test_tpcds_vs_sqlite(qid, runner, sqlite_db):
    sql = QUERIES[qid]
    got = runner.run_sql(sql)
    got_rows = _engine_rows(got)
    exp_rows = sqlite_db.execute(
        _sqlite_sql(SQLITE_REWRITE.get(qid, sql))).fetchall()
    if qid in FUZZY:
        # float-producing queries (avg/ratio/threshold filters): the
        # engine accumulates exactly where sqlite accumulates REALs, so
        # rows at a ratio/LIMIT boundary can flip membership — require
        # identical cardinality and >= 95% multiset overlap of rows
        # rounded to cents (everything non-numeric must match exactly
        # inside a matching row)
        from collections import Counter

        def canon(rows):
            out = []
            for r in rows:
                out.append(tuple(
                    round(float(v), 1) if isinstance(v, (int, float,
                                                         np.integer))
                    else v for v in r))
            return Counter(out)

        assert len(got_rows) == len(exp_rows), qid
        if not got_rows:
            return  # both empty: agreed
        cg, ce = canon(got_rows), canon(exp_rows)
        overlap = sum((cg & ce).values())
        need = max(1, int(0.95 * len(got_rows)))
        assert overlap >= need, (
            qid, f"{overlap}/{len(got_rows)} rows match",
            list((cg - ce).items())[:3], list((ce - cg).items())[:3])
        return
    assert _norm(got_rows) == _norm(exp_rows), qid
