"""ARRAY/MAP types + UNNEST (reference: ``spi/block/ArrayBlock.java``,
``operator/unnest/UnnestOperator.java``, ``operator/scalar/`` array family).
"""

import pytest

from presto_tpu.exec.runner import LocalRunner


@pytest.fixture(scope="module")
def runner():
    return LocalRunner(scale_factor=0.01)


def one(runner, sql):
    d = runner.run_sql(sql).to_pydict()
    return {k: v[0] for k, v in d.items()}


def test_array_literal_and_cardinality(runner):
    r = one(runner, "select cardinality(array[1,2,3]) c, array[1,2,3] a "
                    "from region limit 1")
    assert r["c"] == 3
    assert r["a"] == [1, 2, 3]


def test_subscript_and_element_at(runner):
    r = one(runner, "select array[10,20,30][2] x, "
                    "element_at(array[10,20,30], -1) y, "
                    "element_at(array[10,20,30], 7) z "
                    "from region limit 1")
    assert r["x"] == 20
    assert r["y"] == 30
    assert r["z"] is None


def test_contains_position_minmax(runner):
    r = one(runner, "select contains(array[5,7], 7) c1, "
                    "contains(array[5,7], 8) c2, "
                    "array_position(array[5,7,9], 9) p, "
                    "array_min(array[5,7,9]) mn, "
                    "array_max(array[5,7,9]) mx "
                    "from region limit 1")
    assert r["c1"] is True and r["c2"] is False
    assert r["p"] == 3
    assert r["mn"] == 5 and r["mx"] == 9


def test_array_sort_distinct(runner):
    r = one(runner, "select array_sort(array[3,1,2]) s, "
                    "array_distinct(array[3,1,3,1]) d from region limit 1")
    assert r["s"] == [1, 2, 3]
    assert sorted(r["d"]) == [1, 3]


def test_sequence(runner):
    r = one(runner, "select sequence(2, 6) s from region limit 1")
    assert r["s"] == [2, 3, 4, 5, 6]


def test_unnest_basic(runner):
    t = runner.run_sql(
        "select r_regionkey k, x from region "
        "cross join unnest(array[1,2]) as u(x) order by k, x")
    d = t.to_pydict()
    assert d["k"] == [0, 0, 1, 1, 2, 2, 3, 3, 4, 4]
    assert d["x"] == [1, 2] * 5


def test_unnest_with_ordinality(runner):
    t = runner.run_sql(
        "select x, o from region cross join "
        "unnest(array[7,8,9]) with ordinality as u(x, o) "
        "where r_regionkey = 0 order by o")
    d = t.to_pydict()
    assert d["x"] == [7, 8, 9]
    assert d["o"] == [1, 2, 3]


def test_unnest_sequence_agg(runner):
    t = runner.run_sql(
        "select sum(x) s, count(*) c from region "
        "cross join unnest(sequence(1, 10)) as u(x) "
        "where r_regionkey < 2")
    d = t.to_pydict()
    assert d["c"][0] == 20
    assert d["s"][0] == 110


def test_map_literal(runner):
    r = one(runner, "select map(array[1,2], array[10,20]) m, "
                    "cardinality(map(array[1,2], array[10,20])) c, "
                    "map(array[1,2], array[10,20])[2] v "
                    "from region limit 1")
    assert r["m"] == {1: 10, 2: 20}
    assert r["c"] == 2
    assert r["v"] == 20


def test_map_keys_values_element_at(runner):
    r = one(runner, "select map_keys(map(array[1,2], array[10,20])) ks, "
                    "map_values(map(array[1,2], array[10,20])) vs, "
                    "element_at(map(array[1,2], array[10,20]), 3) miss "
                    "from region limit 1")
    assert r["ks"] == [1, 2]
    assert r["vs"] == [10, 20]
    assert r["miss"] is None


def test_unnest_map(runner):
    t = runner.run_sql(
        "select k, v from region cross join "
        "unnest(map(array[1,2], array[10,20])) as u(k, v) "
        "where r_regionkey = 0 order by k")
    d = t.to_pydict()
    assert d["k"] == [1, 2]
    assert d["v"] == [10, 20]


def test_unnest_zip_pads_shorter_with_null(runner):
    t = runner.run_sql(
        "select a, b from region cross join "
        "unnest(array[1,2,3], array[7,8]) as u(a, b) "
        "where r_regionkey = 0 order by a")
    d = t.to_pydict()
    assert d["a"] == [1, 2, 3]
    assert d["b"] == [7, 8, None]


def test_array_agg(runner):
    t = runner.run_sql(
        "select r_regionkey k, array_agg(n_nationkey) a from nation "
        "join region on n_regionkey = r_regionkey "
        "group by r_regionkey order by r_regionkey")
    d = t.to_pydict()
    assert d["k"] == [0, 1, 2, 3, 4]
    assert all(len(a) == 5 for a in d["a"])
    assert sorted(d["a"][0]) == sorted(
        runner.run_sql("select n_nationkey from nation where n_regionkey=0")
        .to_pydict()["n_nationkey"])


def test_array_agg_global(runner):
    t = runner.run_sql("select array_agg(r_regionkey) a from region")
    assert sorted(t.to_pydict()["a"][0]) == [0, 1, 2, 3, 4]


def test_map_agg(runner):
    t = runner.run_sql(
        "select map_agg(r_regionkey, r_name) m from region")
    m = t.to_pydict()["m"][0]
    assert m[0] == "AFRICA" and m[2] == "ASIA" and len(m) == 5


def test_histogram(runner):
    t = runner.run_sql(
        "select histogram(n_regionkey) h from nation")
    h = t.to_pydict()["h"][0]
    assert h == {0: 5, 1: 5, 2: 5, 3: 5, 4: 5}


def test_histogram_grouped(runner):
    t = runner.run_sql(
        "select o_orderstatus s, histogram(o_orderpriority) h from orders "
        "group by o_orderstatus order by o_orderstatus")
    d = t.to_pydict()
    # cross-check against plain group-by counts
    ref = runner.run_sql(
        "select o_orderstatus s, o_orderpriority p, count(*) c from orders "
        "group by o_orderstatus, o_orderpriority").to_pydict()
    want = {}
    for s, p, c in zip(ref["s"], ref["p"], ref["c"]):
        want.setdefault(s, {})[p] = c
    got = dict(zip(d["s"], d["h"]))
    assert got == want


def test_array_in_where(runner):
    t = runner.run_sql(
        "select count(*) c from region where contains(array[1,3], "
        "r_regionkey)")
    assert t.to_pydict()["c"][0] == 2
