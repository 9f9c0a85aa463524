"""Parquet ingestion connector: files → SPI → SQL end-to-end.

The first external-format connector through the PageSource seam
(reference: ``lib/trino-parquet`` + hive ParquetPageSource; round-4
verdict item 8)."""

import datetime as dt
import decimal

import numpy as np
import pytest

pa = pytest.importorskip("pyarrow")
import pyarrow.parquet as pq  # noqa: E402

from presto_tpu.connector.parquet import parquet_connector
from presto_tpu.exec.runner import LocalRunner


@pytest.fixture(scope="module")
def pq_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pqcat")
    n = 5000
    rng = np.random.default_rng(7)
    sales = pa.table({
        "sale_id": pa.array(np.arange(n, dtype=np.int64)),
        "cust_id": pa.array(rng.integers(0, 500, n).astype(np.int64)),
        "amount": pa.array(
            [decimal.Decimal(int(v)) / 100
             for v in rng.integers(100, 100000, n)],
            type=pa.decimal128(10, 2)),
        "rate": pa.array(rng.random(n)),
        "sold_day": pa.array([dt.date(2024, 1, 1) + dt.timedelta(days=int(v))
                         for v in rng.integers(0, 300, n)]),
        "region": pa.array(
            [["north", "south", "east", "west"][v]
             for v in rng.integers(0, 4, n)]),
        "flag": pa.array((rng.random(n) < 0.5)),
    })
    # multiple row groups so split/row-group pruning is exercised
    pq.write_table(sales, d / "pq_sales.parquet", row_group_size=1024)
    cust = pa.table({
        "cust_id": pa.array(np.arange(500, dtype=np.int64)),
        "cust_name": pa.array([f"customer#{k}" for k in range(500)]),
    })
    pq.write_table(cust, d / "pq_cust.parquet")
    return d


@pytest.fixture(scope="module")
def runner(pq_dir):
    r = LocalRunner(scale_factor=0.01)
    r.datasource.register(parquet_connector(str(pq_dir)))
    return r


def test_show_and_count(runner):
    tables = runner.run_sql("show tables").to_pandas()
    names = tables.iloc[:, 0].tolist()
    assert "pq_sales" in names and "pq_cust" in names
    c = runner.run_sql("select count(*) c from pq_sales").to_pandas()
    assert int(c.c[0]) == 5000


def test_aggregate_group_filter(runner, pq_dir):
    got = runner.run_sql(
        "select region, count(*) c, sum(amount) s from pq_sales "
        "where flag group by region order by region").to_pandas()
    # oracle: pandas over the same files
    import pandas as pd
    df = pq.read_table(pq_dir / "pq_sales.parquet").to_pandas()
    df["amount"] = df.amount.astype(float)
    exp = (df[df.flag].groupby("region")
           .agg(c=("sale_id", "size"), s=("amount", "sum")).reset_index()
           .sort_values("region"))
    assert got.region.tolist() == exp.region.tolist()
    assert got.c.tolist() == exp.c.tolist()
    # engine sums exact cents
    np.testing.assert_allclose(
        [v / 100 for v in got.s.tolist()], exp.s.tolist(), rtol=1e-9)


def test_join_parquet_tables(runner, pq_dir):
    got = runner.run_sql(
        "select cust_name, sum(amount) s from pq_sales, pq_cust "
        "where pq_sales.cust_id = pq_cust.cust_id and rate > 0.5 "
        "group by cust_name order by s desc limit 5").to_pandas()
    import pandas as pd
    s = pq.read_table(pq_dir / "pq_sales.parquet").to_pandas()
    c = pq.read_table(pq_dir / "pq_cust.parquet").to_pandas()
    s["amount"] = s.amount.astype(float)
    j = s[s.rate > 0.5].merge(c, on="cust_id")
    exp = (j.groupby("cust_name").amount.sum()
           .sort_values(ascending=False).head(5))
    np.testing.assert_allclose(
        [v / 100 for v in got.s.tolist()], exp.tolist(), rtol=1e-9)


def test_dates_and_ranges(runner):
    got = runner.run_sql(
        "select min(sold_day) mn, max(sold_day) mx from pq_sales "
        "where sold_day >= date '2024-06-01'").to_pandas()
    assert got.mn[0] >= (dt.date(2024, 6, 1) - dt.date(1970, 1, 1)).days


def test_join_with_tpch_catalog(runner):
    # cross-catalog join: parquet table against the tpch generator
    got = runner.run_sql(
        "select count(*) c from pq_cust, region "
        "where pq_cust.cust_id = r_regionkey").to_pandas()
    assert int(got.c[0]) == 5
