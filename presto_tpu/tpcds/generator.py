"""Deterministic TPC-DS-shaped data generator (vectorized).

The reference vendors the Teradata Java dsdgen
(``plugin/trino-tpcds`` → io.trino.tpcds); byte-faithful regeneration is
out of scope, so this generator is spec-SHAPED: the same star-schema key
relationships, realistic domains and skews, deterministic per (table,
sf).  Every column derives from counter-based hashing (splitmix-style),
so generation is order-independent and reproducible — correctness of
query execution over it is established differentially against SQLite.
"""

from __future__ import annotations

import numpy as np

from ..data import types as T
from ..data.column import Column, PLAIN, bytes_column, dict_column
from ..data.table import Table
from . import schema as S

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _mix(x: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64 over a counter + salt: uniform uint64."""
    stream = np.uint64((salt * 0x9E3779B97F4A7C15) % (1 << 64))
    z = (x.astype(np.uint64) + stream) & _MASK
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9) & _MASK
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB) & _MASK
    return z ^ (z >> np.uint64(31))


def _uni(ids, salt, lo, hi):
    """Uniform int64 in [lo, hi]."""
    span = np.uint64(hi - lo + 1)
    return (lo + (_mix(ids, salt) % span).astype(np.int64)).astype(np.int64)


def _pick(ids, salt, options):
    codes = (_mix(ids, salt) % np.uint64(len(options))).astype(np.int32)
    return codes


_DAY_NAMES = ["Sunday", "Monday", "Tuesday", "Wednesday", "Thursday",
              "Friday", "Saturday"]
_MEALS = ["breakfast", "lunch", "dinner", ""]
_CATEGORIES = ["Books", "Children", "Electronics", "Home", "Jewelry",
               "Men", "Music", "Shoes", "Sports", "Women"]
_CLASSES = ["accent", "classical", "dresses", "fiction", "pants",
            "romance", "self-help"]
_EDU = ["Primary", "Secondary", "College", "2 yr Degree", "4 yr Degree",
        "Advanced Degree", "Unknown"]
_STATES = ["TN", "GA", "AL", "SC", "NC", "VA", "KY", "MO"]
_YN = ["Y", "N"]

# d_date_sk convention: spec starts at 2415022 (1900-01-01 julian)
DATE_SK0 = 2415022
EPOCH_OFFSET_DAYS = 25567  # days from 1900-01-01 to 1970-01-01


def generate(table: str, sf: float) -> Table:
    n = S.row_count(table, sf)
    ids = np.arange(n, dtype=np.uint64)
    cols = {}

    def dec(name, salt, lo, hi):
        cols[name] = Column(T.decimal(7, 2), _uni(ids, salt, lo, hi), None,
                            PLAIN)

    if table == "date_dim":
        days = np.arange(n, dtype=np.int64) - EPOCH_OFFSET_DAYS
        cols["d_date_sk"] = Column(T.BIGINT, DATE_SK0 + np.arange(n))
        cols["d_date"] = Column(T.DATE, days.astype(np.int32))
        # civil calendar pieces (Hinnant, vectorized)
        z = days + 719468
        era = z // 146097
        doe = z - era * 146097
        yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
        y = yoe + era * 400
        doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
        mp = (5 * doy + 2) // 153
        dom = doy - (153 * mp + 2) // 5 + 1
        moy = np.where(mp < 10, mp + 3, mp - 9)
        year = y + (moy <= 2)
        cols["d_year"] = Column(T.BIGINT, year.astype(np.int64))
        cols["d_moy"] = Column(T.BIGINT, moy.astype(np.int64))
        cols["d_dom"] = Column(T.BIGINT, dom.astype(np.int64))
        cols["d_qoy"] = Column(T.BIGINT, ((moy + 2) // 3).astype(np.int64))
        dow = ((days % 7) + 7 + 4) % 7  # 1970-01-01 = Thursday = idx 4
        cols["d_dow"] = Column(T.BIGINT, dow.astype(np.int64))
        cols["d_day_name"] = dict_column(T.varchar(9), dow.astype(np.int32),
                                         _DAY_NAMES)
    elif table == "time_dim":
        t = np.arange(n, dtype=np.int64)
        cols["t_time_sk"] = Column(T.BIGINT, t)
        hour = t // 3600
        cols["t_hour"] = Column(T.BIGINT, hour)
        cols["t_minute"] = Column(T.BIGINT, (t // 60) % 60)
        cols["t_second"] = Column(T.BIGINT, t % 60)
        meal = np.select([(hour >= 6) & (hour <= 9),
                          (hour >= 11) & (hour <= 14),
                          (hour >= 17) & (hour <= 21)],
                         [0, 1, 2], default=3).astype(np.int32)
        cols["t_meal_time"] = dict_column(T.varchar(20), meal, _MEALS)
    elif table == "item":
        cols["i_item_sk"] = Column(T.BIGINT, 1 + np.arange(n))
        cols["i_item_id"] = bytes_column(
            T.varchar(16), [f"AAAAAAAA{k:08d}" for k in range(n)])
        brand_id = _uni(ids, 11, 1, 1000)
        cols["i_brand_id"] = Column(T.BIGINT, brand_id)
        cols["i_brand"] = bytes_column(
            T.varchar(50), [f"brand#{b}" for b in brand_id])
        cat = _pick(ids, 12, _CATEGORIES)
        cols["i_category_id"] = Column(T.BIGINT, cat.astype(np.int64) + 1)
        cols["i_category"] = dict_column(T.varchar(50), cat, _CATEGORIES)
        cls = _pick(ids, 13, _CLASSES)
        cols["i_class_id"] = Column(T.BIGINT, cls.astype(np.int64) + 1)
        cols["i_class"] = dict_column(T.varchar(50), cls, _CLASSES)
        man = _uni(ids, 14, 1, 1000)
        cols["i_manufact_id"] = Column(T.BIGINT, man)
        cols["i_manufact"] = bytes_column(
            T.varchar(50), [f"manufact#{m}" for m in man])
        cols["i_manager_id"] = Column(T.BIGINT, _uni(ids, 15, 1, 100))
        dec("i_current_price", 16, 99, 9999)
    elif table == "store":
        cols["s_store_sk"] = Column(T.BIGINT, 1 + np.arange(n))
        cols["s_store_id"] = bytes_column(
            T.varchar(16), [f"AAAAAAAA{k:08d}" for k in range(n)])
        cols["s_store_name"] = dict_column(
            T.varchar(50), _pick(ids, 21, ["ought", "able", "pri", "ese",
                                           "anti", "cally", "ation"]),
            ["ought", "able", "pri", "ese", "anti", "cally", "ation"])
        cols["s_number_employees"] = Column(
            T.BIGINT, _uni(ids, 22, 200, 300))
        cols["s_city"] = dict_column(
            T.varchar(60), _pick(ids, 23, ["Midway", "Fairview", "Oakland",
                                           "Salem"]),
            ["Midway", "Fairview", "Oakland", "Salem"])
        cols["s_state"] = dict_column(T.varchar(2), _pick(ids, 24, _STATES),
                                      _STATES)
        cols["s_zip"] = bytes_column(
            T.varchar(10), [f"{z:05d}" for z in _uni(ids, 25, 10000, 99999)])
        cols["s_gmt_offset"] = Column(
            T.decimal(5, 2), np.full(n, -500, np.int64), None, PLAIN)
    elif table == "promotion":
        cols["p_promo_sk"] = Column(T.BIGINT, 1 + np.arange(n))
        for name, salt in (("p_channel_dmail", 31), ("p_channel_email", 32),
                           ("p_channel_tv", 33)):
            cols[name] = dict_column(T.varchar(1), _pick(ids, salt, _YN),
                                     _YN)
    elif table == "customer_demographics":
        cols["cd_demo_sk"] = Column(T.BIGINT, 1 + np.arange(n))
        cols["cd_gender"] = dict_column(
            T.varchar(1), (ids % np.uint64(2)).astype(np.int32), ["M", "F"])
        cols["cd_marital_status"] = dict_column(
            T.varchar(1), ((ids // np.uint64(2)) % np.uint64(5))
            .astype(np.int32), ["M", "S", "D", "W", "U"])
        cols["cd_education_status"] = dict_column(
            T.varchar(20), ((ids // np.uint64(10)) % np.uint64(7))
            .astype(np.int32), _EDU)
    elif table == "household_demographics":
        cols["hd_demo_sk"] = Column(T.BIGINT, 1 + np.arange(n))
        cols["hd_dep_count"] = Column(T.BIGINT, _uni(ids, 41, 0, 9))
        cols["hd_vehicle_count"] = Column(T.BIGINT, _uni(ids, 42, -1, 4))
    elif table == "customer":
        cols["c_customer_sk"] = Column(T.BIGINT, 1 + np.arange(n))
        cols["c_customer_id"] = bytes_column(
            T.varchar(16), [f"AAAAAAAA{k:08d}" for k in range(n)])
        cols["c_current_addr_sk"] = Column(
            T.BIGINT, _uni(ids, 71, 1, S.row_count("customer_address", sf)))
        cols["c_birth_year"] = Column(T.BIGINT, _uni(ids, 72, 1924, 1992))
    elif table == "customer_address":
        cols["ca_address_sk"] = Column(T.BIGINT, 1 + np.arange(n))
        cols["ca_zip"] = bytes_column(
            T.varchar(10), [f"{z:05d}" for z in _uni(ids, 81, 10000, 99999)])
        cols["ca_state"] = dict_column(T.varchar(2), _pick(ids, 82, _STATES),
                                       _STATES)
        cols["ca_city"] = dict_column(
            T.varchar(60), _pick(ids, 83, ["Midway", "Fairview", "Oakland",
                                           "Salem"]),
            ["Midway", "Fairview", "Oakland", "Salem"])
    elif table == "store_sales":
        # sold dates concentrate on the spec window 1998-2003
        lo_sk = DATE_SK0 + 35795   # 1998-01-01
        hi_sk = DATE_SK0 + 37621   # 2002-12-31
        cols["ss_sold_date_sk"] = Column(
            T.BIGINT, _uni(ids, 51, lo_sk, hi_sk))
        cols["ss_sold_time_sk"] = Column(
            T.BIGINT, _uni(ids, 52, 28800, 75600))
        cols["ss_item_sk"] = Column(
            T.BIGINT, _uni(ids, 53, 1, S.row_count("item", sf)))
        cols["ss_customer_sk"] = Column(
            T.BIGINT, _uni(ids, 66, 1, S.row_count("customer", sf)))
        cols["ss_cdemo_sk"] = Column(
            T.BIGINT, _uni(ids, 54, 1, S.CDEMO_ROWS))
        cols["ss_hdemo_sk"] = Column(
            T.BIGINT, _uni(ids, 55, 1, S.HDEMO_ROWS))
        cols["ss_store_sk"] = Column(
            T.BIGINT, _uni(ids, 56, 1, S.row_count("store", sf)))
        cols["ss_promo_sk"] = Column(
            T.BIGINT, _uni(ids, 57, 1, S.row_count("promotion", sf)))
        cols["ss_quantity"] = Column(T.BIGINT, _uni(ids, 58, 1, 100))
        dec("ss_list_price", 59, 100, 20000)
        dec("ss_sales_price", 60, 50, 20000)
        dec("ss_ext_sales_price", 61, 50, 400000)
        dec("ss_ext_discount_amt", 62, 0, 10000)
        dec("ss_coupon_amt", 63, 0, 5000)
        dec("ss_wholesale_cost", 64, 50, 10000)
        cols["ss_net_profit"] = Column(
            T.decimal(7, 2), _uni(ids, 65, -50000, 150000), None, PLAIN)
    else:
        raise KeyError(table)
    order = [c for c, _ in S.TABLE_SCHEMAS[table]]
    return Table({c: cols[c] for c in order})


def attach(runner, sf: float = 0.1, tables=None) -> None:
    """Register generated TPC-DS tables in a runner's memory catalog
    (the plugin-loading analogue of ``TpcdsPlugin``)."""
    for t in (tables or S.TABLE_SCHEMAS):
        runner.datasource.create_table(t, generate(t, sf))
