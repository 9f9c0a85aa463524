"""Regression tests for the round-3 advisor findings (ADVICE.md).

Each test pins a bug the round-3 code review found:
 1. date_format %i minutes rendered as full month name (replace-chain
    aliasing %i->%M->%B).
 2. string transforms over DICT columns did not re-unique collapsed
    dictionary entries, so GROUP BY trim(c) could emit duplicate groups.
 3. map element_at compared probe-key dictionary codes against the map's
    unrelated key dictionary, and decoded values through the KEY
    dictionary.
 4. UNNEST of a NULL array row emitted NULL-element rows instead of
    zero rows (Trino: NULL array unnests to nothing).
"""

import pytest

from presto_tpu.exec.runner import LocalRunner

SF = 0.01


@pytest.fixture(scope="module")
def runner():
    return LocalRunner(scale_factor=SF)


def test_date_format_minutes_not_month(runner):
    got = runner.run_sql(
        "select date_format(timestamp '2024-08-14 14:07:09', '%H:%i') a, "
        "date_format(timestamp '2024-08-14 14:07:09', '%M') b, "
        "date_format(timestamp '2024-08-14 14:07:09', '%Y-%m-%d %H:%i:%s') c "
        "from region limit 1").to_pandas()
    r = got.iloc[0]
    assert r.a == "14:07"
    assert r.b == "August"
    assert r.c == "2024-08-14 14:07:09"


def test_dict_transform_reuniques(runner):
    # r_name values are distinct; concat with a collapsing transform:
    # substr(r_name, 1, 1) keeps 'ASIA'/'AFRICA'/'AMERICA' apart only if
    # re-uniquing merges equal outputs into ONE dictionary code.
    got = runner.run_sql(
        "select substr(r_name, 1, 1) p, count(*) c from region "
        "group by substr(r_name, 1, 1) order by p").to_pandas()
    # AFRICA/AMERICA/ASIA -> 'A' x3; EUROPE -> 'E'; MIDDLE EAST -> 'M'
    assert got.p.tolist() == ["A", "E", "M"]
    assert got.c.tolist() == [3, 1, 1]


def test_map_string_values_decode_through_value_dict(runner):
    got = runner.run_sql(
        "select element_at(map(array['x', 'y'], array['vx', 'vy']), 'y') v "
        "from region limit 1").to_pandas()
    assert got.v.iloc[0] == "vy"


def test_map_agg_varchar_varchar(runner):
    got = runner.run_sql(
        "select map_agg(r_name, r_comment) m from region").to_pandas()
    m = got.m.iloc[0]
    assert set(m.keys()) == {"AFRICA", "AMERICA", "ASIA", "EUROPE",
                             "MIDDLE EAST"}
    # values must be the comments (decoded through the VALUE dictionary),
    # not re-decoded region names
    assert not set(m.values()) & set(m.keys())


def test_unnest_null_array_emits_no_rows(runner):
    got = runner.run_sql(
        "select t.x from region r "
        "cross join unnest(case when r.r_regionkey = 0 "
        "then array[1, 2] else cast(null as array(integer)) end) as t(x)"
    ).to_pandas()
    assert sorted(got.x.tolist()) == [1, 2]
