"""TIMESTAMP WITH TIME ZONE: literals, AT TIME ZONE, instant semantics.

Reference: ``spi/type/TimestampWithTimeZoneType`` packs (millisUtc,
zoneKey) into one long; the TPU layout keeps the UTC instant (values,
int64 micros) and the presentation offset (values2, int32 minutes) as
separate dense arrays.  Comparison/ordering use the instant alone
(``TimestampWithTimeZoneOperators``); extraction runs in the value's
zone; rendering shows local wall time + offset.
"""

import pytest

from presto_tpu.exec.runner import LocalRunner


@pytest.fixture(scope="module")
def runner():
    return LocalRunner(scale_factor=0.01)


def _one(runner, expr):
    df = runner.run_sql(f"select {expr} as v from region limit 1").to_pandas()
    return df.iloc[0]["v"]


def test_tz_literal_renders_local_wall_time(runner):
    v = _one(runner, "timestamp '2020-06-10 15:30:00 +05:30'")
    assert str(v) == "2020-06-10 15:30:00.000 +05:30"


def test_tz_negative_offset(runner):
    v = _one(runner, "timestamp '2020-06-10 15:30:00 -08:00'")
    assert str(v) == "2020-06-10 15:30:00.000 -08:00"


def test_at_time_zone_preserves_instant(runner):
    # 12:00 UTC shown at +02:00 is 14:00 local, same instant
    v = _one(runner, "timestamp '2020-01-01 12:00:00' at time zone '+02:00'")
    assert str(v) == "2020-01-01 14:00:00.000 +02:00"


def test_at_time_zone_rezone(runner):
    # rezoning a zoned value keeps the instant: 15:30+05:30 = 10:00 UTC
    v = _one(runner, "timestamp '2020-06-10 15:30:00 +05:30' "
                     "at time zone 'UTC'")
    assert str(v) == "2020-06-10 10:00:00.000 +00:00"


def test_comparison_is_by_instant(runner):
    # 10:00 +05:00 (=05:00 UTC) < 06:00 UTC
    v = _one(runner, "timestamp '2020-01-01 10:00:00 +05:00' < "
                     "timestamp '2020-01-01 06:00:00 +00:00'")
    assert bool(v) is True
    v = _one(runner, "timestamp '2020-01-01 10:00:00 +05:00' = "
                     "timestamp '2020-01-01 05:00:00 +00:00'")
    assert bool(v) is True


def test_extraction_in_value_zone(runner):
    # 23:30 at +05:30 is the NEXT day in that zone vs UTC 18:00 same day
    assert int(_one(runner, "hour(timestamp '2020-06-10 23:30:00 +05:30')")) \
        == 23
    assert int(_one(runner, "day(timestamp '2020-06-10 23:30:00 +05:30')")) \
        == 10
    assert int(_one(runner, "year(timestamp '2019-12-31 23:30:00 +05:30')")) \
        == 2019


def test_cast_to_timestamp_gives_local(runner):
    # plain timestamps surface as raw micros at the library layer;
    # 2020-06-10 15:30:00 (LOCAL wall time of the zoned value)
    import datetime as dt
    v = _one(runner, "cast(timestamp '2020-06-10 15:30:00 +05:30' "
                     "as timestamp)")
    want = (dt.datetime(2020, 6, 10, 15, 30) - dt.datetime(1970, 1, 1))
    assert int(v) == int(want.total_seconds() * 1_000_000)


def test_cast_to_date_gives_local_day(runner):
    import datetime as dt
    v = _one(runner, "cast(timestamp '2020-06-10 23:30:00 +05:30' as date)")
    assert int(v) == (dt.date(2020, 6, 10) - dt.date(1970, 1, 1)).days


def test_cast_timestamp_to_tz_session_zone(runner):
    v = _one(runner, "cast(timestamp '2020-06-10 12:00:00' as "
                     "timestamp with time zone)")
    assert str(v) == "2020-06-10 12:00:00.000 +00:00"


def test_cast_type_name_with_precision(runner):
    v = _one(runner, "cast(timestamp '2020-06-10 12:00:00.123456' as "
                     "timestamp(6) with time zone)")
    assert str(v) == "2020-06-10 12:00:00.123456 +00:00"


def test_order_by_instant(runner):
    df = runner.run_sql(
        "select t from ("
        "(select timestamp '2020-01-01 10:00:00 +05:00' as t "
        "from region limit 1) "
        "union all "
        "(select timestamp '2020-01-01 06:00:00 +00:00' as t "
        "from region limit 1)) x order by t").to_pandas()
    # 10:00+05:00 is 05:00Z, sorts first
    assert list(df["t"].astype(str)) == [
        "2020-01-01 10:00:00.000 +05:00",
        "2020-01-01 06:00:00.000 +00:00",
    ]
