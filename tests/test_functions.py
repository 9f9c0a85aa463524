"""Scalar-function + extended-aggregate tests (reference: per-function
assertions via ``FunctionAssertions`` and the aggregation test suites)."""

import numpy as np
import pytest

from presto_tpu.exec.runner import LocalRunner

import tpch_oracle as O

SF = 0.01


@pytest.fixture(scope="module")
def runner():
    return LocalRunner(scale_factor=SF)


def test_extended_aggregates(runner):
    got = runner.run_sql("""
     select o_orderpriority, stddev(o_totalprice) sd, var_pop(o_totalprice) vp,
            variance(o_totalprice) vs, stddev_pop(o_totalprice) sp,
            bool_and(o_totalprice > 0) ba, bool_or(o_shippriority = 1) bo,
            approx_distinct(o_custkey) ad, count(distinct o_custkey) cd
     from orders group by o_orderpriority order by o_orderpriority
    """).to_pandas()
    o = O.load("orders", SF)
    g = o.groupby("o_orderpriority")
    # engine reports decimal units (dollars); oracle holds unscaled cents
    assert np.allclose(got.sd.values * 100, g.o_totalprice.std(ddof=1).values)
    assert np.allclose(got.vp.values * 1e4, g.o_totalprice.var(ddof=0).values)
    assert np.allclose(got.vs.values * 1e4, g.o_totalprice.var(ddof=1).values)
    assert np.allclose(got.sp.values * 100, g.o_totalprice.std(ddof=0).values)
    # approx_distinct is a real HLL sketch now (m=2048 → ~2.3% std error);
    # count(distinct) stays exact
    nunique = np.asarray(g.o_custkey.nunique().tolist(), dtype=float)
    assert np.all(np.abs(got.ad.values - nunique) <= 0.05 * nunique + 1)
    assert got.cd.tolist() == g.o_custkey.nunique().tolist()
    assert got.ba.all() and not got.bo.any()


def test_scalar_functions(runner):
    got = runner.run_sql(
        "select abs(-5) a, mod(7, 3) m, mod(-7, 3) mn, round(2.345, 2) r2, "
        "round(2.5) r0, coalesce(null, 4) c, length('hello') l, "
        "upper('abC') u, lower('AbC') lo, nullif(3, 3) nn, nullif(3, 4) nv, "
        "greatest(1, 5, 3) g, least(2.5, 1.75) ls, "
        "concat('foo', 'bar') cc, substr('hello', 2, 3) ss "
        "from region limit 1").to_pandas()
    r = got.iloc[0]
    assert r.a == 5 and r.m == 1 and r.mn == -1
    assert r.r2 == 235          # 2.35 unscaled at scale 2 (HALF_UP)
    assert r.r0 == 3            # 2.5 → 3 (HALF_UP)
    assert r.c == 4
    assert r.l == 5 and r.u == "ABC" and r.lo == "abc"
    assert r.nn is None and r.nv == 3
    assert r.g == 5 and r.ls == 175   # 1.75 at scale 2
    assert r.cc == "foobar" and r.ss == "ell"


def test_date_parts(runner):
    got = runner.run_sql(
        "select extract(year from o_orderdate) y, month(o_orderdate) m, "
        "day(o_orderdate) d, o_orderdate from orders limit 5").to_pandas()
    import datetime as dt
    for _, r in got.iterrows():
        d = dt.date(1970, 1, 1) + dt.timedelta(days=int(r.o_orderdate))
        assert (r.y, r.m, r.d) == (d.year, d.month, d.day)


def test_grouping_sets(runner):
    got = runner.run_sql(
        "select n_regionkey, n_nationkey, count(*) c from nation "
        "group by rollup(n_regionkey, n_nationkey) order by 1, 2").to_pandas()
    assert len(got) == 31  # 25 detail + 5 per-region + 1 grand total
    assert int(got[got.n_regionkey.isna()].c.iloc[0]) == 25
    per_region = got[got.n_regionkey.notna() & got.n_nationkey.isna()]
    assert per_region.c.sum() == 25
    cube = runner.run_sql(
        "select n_regionkey, count(*) c from nation "
        "group by cube(n_regionkey)").to_pandas()
    assert len(cube) == 6
    gs = runner.run_sql(
        "select r_name, count(*) c from region, nation "
        "where r_regionkey = n_regionkey "
        "group by grouping sets ((r_name), ())").to_pandas()
    assert len(gs) == 6


def test_show_stats_and_global_distinct(runner):
    got = runner.run_sql("show stats for nation").to_pandas()
    row = got[got.column_name == "n_nationkey"].iloc[0]
    assert (row.distinct_values_count, row.low_value, row.high_value,
            row.row_count) == (25, 0, 24, 25)
    d = runner.run_sql(
        "select count(distinct o_custkey) c from orders").to_pydict()
    o = O.load("orders", SF)
    assert d["c"][0] == o.o_custkey.nunique()


def test_min_by_max_by(runner):
    got = runner.run_sql("""
     select o_orderpriority p, min_by(o_orderkey, o_totalprice) mnk,
            max_by(o_orderkey, o_totalprice) mxk,
            min(o_totalprice) mn, max(o_totalprice) mx
     from orders group by o_orderpriority order by o_orderpriority
    """).to_pandas()
    o = O.load("orders", SF)
    for _, r in got.iterrows():
        grp = o[o.o_orderpriority == r.p]
        assert grp.loc[grp.o_orderkey == r.mnk, "o_totalprice"].iloc[0] == \
            grp.o_totalprice.min() == r.mn
        assert grp.loc[grp.o_orderkey == r.mxk, "o_totalprice"].iloc[0] == \
            grp.o_totalprice.max() == r.mx


def test_min_by_global(runner):
    got = runner.run_sql(
        "select min_by(o_orderkey, o_totalprice) k, max_by(o_orderkey, "
        "o_totalprice) mk from orders").to_pandas()
    o = O.load("orders", SF)
    assert got.k[0] == o.loc[o.o_totalprice.idxmin(), "o_orderkey"]
    assert got.mk[0] == o.loc[o.o_totalprice.idxmax(), "o_orderkey"]


def test_approx_percentile(runner):
    got = runner.run_sql("""
     select o_orderpriority p, approx_percentile(o_totalprice, 0.5) med,
            approx_percentile(o_totalprice, 0.99) p99
     from orders group by o_orderpriority order by o_orderpriority
    """).to_pandas()
    o = O.load("orders", SF)
    for _, r in got.iterrows():
        vals = np.sort(o[o.o_orderpriority == r.p].o_totalprice.values)
        n = len(vals)
        assert r.med == vals[max(int(np.ceil(0.5 * n)) - 1, 0)]
        assert r.p99 == vals[max(int(np.ceil(0.99 * n)) - 1, 0)]


def test_approx_percentile_global(runner):
    got = runner.run_sql(
        "select approx_percentile(o_totalprice, 0.25) q1 "
        "from orders").to_pandas()
    o = O.load("orders", SF)
    vals = np.sort(o.o_totalprice.values)
    assert got.q1[0] == vals[int(np.ceil(0.25 * len(vals))) - 1]


def test_corr_family(runner):
    """corr/covar/regr (reference: CorrelationAggregation etc.) vs pandas."""
    got = runner.run_sql("""
     select o_orderpriority,
            corr(o_totalprice, o_custkey) c,
            covar_samp(o_totalprice, o_custkey) cs,
            covar_pop(o_totalprice, o_custkey) cp,
            regr_slope(o_totalprice, o_custkey) rs,
            regr_intercept(o_totalprice, o_custkey) ri
     from orders group by o_orderpriority order by o_orderpriority
    """).to_pandas()
    o = O.load("orders", SF)
    for i, (pri, g) in enumerate(sorted(o.groupby("o_orderpriority"),
                                        key=lambda kv: kv[0])):
        y = g.o_totalprice.astype(float) / 100  # engine reports dollars
        x = g.o_custkey.astype(float)
        assert np.isclose(got.c[i], y.corr(x), rtol=1e-6), pri
        assert np.isclose(got.cs[i], y.cov(x), rtol=1e-6)
        assert np.isclose(got.cp[i], y.cov(x) * (len(g) - 1) / len(g),
                          rtol=1e-6)
        slope = y.cov(x) / x.var(ddof=1)
        assert np.isclose(got.rs[i], slope, rtol=1e-6)
        assert np.isclose(got.ri[i], y.mean() - slope * x.mean(),
                          rtol=1e-6)


def test_moment_aggs_distribute_partial_final():
    """Grouped variance/corr/bool now ride the partial→final exchange
    (moment states) instead of whole-group FIXED_HASH routes; results must
    match the local path to float tolerance."""
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs a mesh")
    from presto_tpu.exec.runner import LocalRunner
    from presto_tpu.parallel import distributed as D
    sql = """
     select o_orderpriority, stddev(o_totalprice) sd, var_pop(o_totalprice) vp,
            corr(o_totalprice, o_custkey) c, bool_and(o_totalprice > 0) ba,
            bool_or(o_shippriority = 1) bo
     from orders group by o_orderpriority order by o_orderpriority
    """
    loc = LocalRunner(scale_factor=SF).run_sql(sql).to_pandas()
    dist = D.DistributedRunner(D.make_mesh(), SF).run_sql(sql).to_pandas()
    for col in ("sd", "vp", "c"):
        assert np.allclose(loc[col].values.astype(float),
                           dist[col].values.astype(float), rtol=1e-9), col
    assert loc.ba.tolist() == dist.ba.tolist()
    assert loc.bo.tolist() == dist.bo.tolist()


class TestScalarBreadth:
    """Round-3 scalar-function family additions (reference:
    StringFunctions/JoniRegexpFunctions/DateTimeFunctions/JsonFunctions)."""

    def test_regex_like_extract_replace(self, runner):
        d = runner.run_sql(
            "select count(*) c from region where "
            "regexp_like(r_name, '^A.*A$')").to_pydict()
        assert d["c"][0] == 3  # AFRICA, AMERICA, ASIA
        d = runner.run_sql(
            "select regexp_extract(r_name, '([A-Z]+)PE', 1) x from region "
            "where r_regionkey = 3").to_pydict()
        assert d["x"] == ["EURO"]
        d = runner.run_sql(
            "select regexp_replace(r_name, 'A', 'x') x from region "
            "order by r_regionkey limit 1").to_pydict()
        assert d["x"] == ["xFRICx"]

    def test_string_helpers(self, runner):
        d = runner.run_sql(
            "select replace(r_name, 'AFRICA', 'AF') x, reverse(r_name) y, "
            "strpos(r_name, 'FR') p, starts_with(r_name, 'AF') sw "
            "from region where r_regionkey = 0").to_pydict()
        assert d["x"] == ["AF"] and d["y"] == ["ACIRFA"]
        assert d["p"] == [2] and d["sw"] == [True]

    def test_split_and_split_part(self, runner):
        d = runner.run_sql(
            "select split_part(o_orderpriority, '-', 2) x, "
            "split(o_orderpriority, '-') a from orders "
            "where o_orderkey = 1").to_pydict()
        assert len(d["x"]) == 1
        assert d["a"][0][1] == d["x"][0]  # 2nd split part == split_part(2)

    def test_date_functions(self, runner):
        d = runner.run_sql(
            "select day_of_week(date '2026-08-20') dw, "
            "day_of_year(date '2026-03-01') dy, "
            "quarter(date '2026-08-20') q, "
            "week(date '2026-01-01') w, "
            "date_trunc('month', date '2026-08-20') tm, "
            "date_add('month', 1, date '2026-01-31') am, "
            "date_diff('day', date '2026-01-01', date '2026-08-20') dd "
            "from region limit 1").to_pydict()
        assert d["dw"][0] == 4          # Thursday
        assert d["dy"][0] == 60         # 2026 not a leap year
        assert d["q"][0] == 3
        assert d["w"][0] == 1
        import datetime as dt
        epoch = dt.date(1970, 1, 1)
        assert d["tm"][0] == (dt.date(2026, 8, 1) - epoch).days
        assert d["am"][0] == (dt.date(2026, 2, 28) - epoch).days
        assert d["dd"][0] == 231

    def test_json_extract_scalar(self, runner):
        t = runner.run_sql(
            "select json_extract_scalar('{\"a\": {\"b\": [1, 2]}}', "
            "'$.a.b[1]') x from region limit 1")
        assert t.to_pydict()["x"] == ["2"]

    def test_date_format(self, runner):
        d = runner.run_sql(
            "select date_format(date '2026-08-20', '%Y-%m-%d') a, "
            "date_format(date '2026-08-20', '%W') w, "
            "format_datetime(date '2026-08-20', 'yyyy/MM') f "
            "from region limit 1").to_pydict()
        assert d["a"] == ["2026-08-20"]
        assert d["w"] == ["Thursday"]
        assert d["f"] == ["2026/08"]


def test_minn_maxn_checksum_bitwise_geomean(runner):
    """Round-4 aggregate breadth (reference:
    ``operator/aggregation/MinMaxNAggregations``,
    ``ChecksumAggregationFunction``, ``BitwiseAndAggregation``,
    ``GeometricMeanAggregations``)."""
    o = O.load("orders", SF)
    t = runner.run_sql(
        "select o_orderpriority p, min(o_totalprice, 3) mn, "
        "max(o_totalprice, 2) mx, bitwise_and_agg(o_custkey) ba, "
        "bitwise_or_agg(o_custkey) bo, checksum(o_orderkey) ck, "
        "geometric_mean(o_shippriority + 1) gm "
        "from orders group by o_orderpriority order by p").to_pandas()
    for row in t.itertuples():
        grp = o[o.o_orderpriority == row.p]
        assert row.mn == sorted(grp.o_totalprice)[:3]
        assert row.mx == sorted(grp.o_totalprice, reverse=True)[:2]
        assert row.ba == int(np.bitwise_and.reduce(grp.o_custkey.values))
        assert row.bo == int(np.bitwise_or.reduce(grp.o_custkey.values))
        assert abs(row.gm - 1.0) < 1e-9
    # checksum is order-independent and deterministic: recompute matches
    t2 = runner.run_sql(
        "select o_orderpriority p, checksum(o_orderkey) ck from orders "
        "group by o_orderpriority order by p").to_pandas()
    assert t.ck.tolist() == t2.ck.tolist()
    # global forms
    g = runner.run_sql(
        "select min(o_totalprice, 3) mn, bitwise_or_agg(o_custkey) bo "
        "from orders").to_pandas()
    assert g.mn.iloc[0] == sorted(o.o_totalprice)[:3]
    assert g.bo.iloc[0] == int(np.bitwise_or.reduce(o.o_custkey.values))


def test_interval_types_and_timestamp_precision(runner):
    """INTERVAL DAY TO SECOND / YEAR TO MONTH as first-class values and
    interval arithmetic over COLUMNS (reference:
    ``spi/type/IntervalDayTimeType``, ``DateTimeOperators``)."""
    t = runner.run_sql(
        "select interval '3' day d, interval '14' month m, "
        "interval '90' minute mi from region limit 1")
    assert str(t.columns["d"].dtype) == "interval day to second"
    assert str(t.columns["m"].dtype) == "interval year to month"
    assert t.columns["d"].to_pylist() == [3 * 86_400_000_000]
    assert t.columns["m"].to_pylist() == [14]
    assert t.columns["mi"].to_pylist() == [90 * 60_000_000]
    # column + interval month uses calendar arithmetic
    got = runner.run_sql(
        "select count(*) c from orders "
        "where o_orderdate + interval '1' month > o_orderdate").to_pandas()
    o = O.load("orders", SF)
    assert got.c.iloc[0] == len(o)
    # timestamp precision cast + rendering
    t3 = runner.run_sql(
        "select cast(timestamp '2024-01-02 03:04:05.678901' "
        "as timestamp(3)) t from region limit 1")
    assert str(t3.columns["t"].dtype) == "timestamp(3)"
    from presto_tpu.client.cli import _fmt
    assert _fmt(t3.columns["t"].to_pylist()[0],
                "timestamp(3)") == "2024-01-02 03:04:05.678"
    assert _fmt(3 * 86_400_000_000 + 3_600_000_000,
                "interval day to second") == "3 01:00:00.000"
    assert _fmt(14, "interval year to month") == "1-2"


def test_row_comparisons_and_tuple_in(runner):
    """ROW value expressions decompose at plan time (reference:
    ``sql/tree/Row.java`` + RowComparisonOperators): fieldwise =/<>,
    lexicographic ordering, tuple IN lists, multi-column IN subqueries."""
    o = O.load("orders", SF)
    n = O.load("nation", SF)
    t = runner.run_sql(
        "select count(*) c from orders "
        "where (o_orderstatus, o_shippriority) = ('F', 0)").to_pandas()
    assert t.c.iloc[0] == int(
        ((o.o_orderstatus == "F") & (o.o_shippriority == 0)).sum())
    t2 = runner.run_sql(
        "select count(*) c from nation "
        "where (n_regionkey, n_nationkey) < (2, 10)").to_pandas()
    assert t2.c.iloc[0] == int(
        ((n.n_regionkey < 2)
         | ((n.n_regionkey == 2) & (n.n_nationkey < 10))).sum())
    t3 = runner.run_sql(
        "select count(*) c from nation where (n_regionkey, n_nationkey) "
        "in ((0, 0), (1, 1), (2, 100))").to_pandas()
    assert t3.c.iloc[0] == 2
    t4 = runner.run_sql(
        "select count(*) c from orders where (o_custkey, o_orderstatus) "
        "in (select o_custkey, o_orderstatus from orders "
        "    where o_totalprice > 4000000)").to_pandas()
    big = o[o.o_totalprice > 400000000][
        ["o_custkey", "o_orderstatus"]].drop_duplicates()
    pairs = set(map(tuple, big.values))
    assert t4.c.iloc[0] == sum(
        1 for x in zip(o.o_custkey, o.o_orderstatus) if x in pairs)


def test_url_hex_base64_pad_functions(runner):
    """Scalar breadth batch (reference: ``operator/scalar/UrlFunctions``,
    ``StringFunctions`` lpad/rpad/translate, ``VarbinaryFunctions``
    to_hex/base64)."""
    t = runner.run_sql(
        "select lpad('ab', 5, '*') lp, rpad('ab', 5, 'x') rp, "
        "translate('hello', 'el', 'ip') tr, to_hex('AB') th, "
        "from_hex('4142') fh, to_base64('hi') tb, from_base64('aGk=') fb, "
        "url_extract_host('https://example.com:8080/p?q=1') h, "
        "url_extract_protocol('https://example.com/p') pr, "
        "url_extract_path('https://example.com/a/b?x=1') pa, "
        "url_extract_port('https://example.com:8080/') po, "
        "url_extract_query('https://example.com/p?q=1&r=2') uq, "
        "url_encode('a b&c') ue, url_decode('a%20b') ud "
        "from region limit 1").to_pandas()
    r = t.iloc[0]
    assert r.lp == "***ab" and r.rp == "abxxx" and r.tr == "hippo"
    assert r.th == "4142" and r.fh == "AB"
    assert r.tb == "aGk=" and r.fb == "hi"
    assert (r.h, r.pr, r.pa, r.po) == ("example.com", "https", "/a/b", 8080)
    assert r.uq == "q=1&r=2" and r.ue == "a+b%26c"  # form-encoding: space -> + (Trino UrlFunctions) and r.ud == "a b"
    # url_extract_port without a port is NULL
    t2 = runner.run_sql(
        "select url_extract_port('https://example.com/') p "
        "from region limit 1")
    assert t2.columns["p"].to_pylist() == [None]
