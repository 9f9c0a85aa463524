"""TPC-DS logical schemas (decision-support star schema).

The analogue of the reference's ``plugin/trino-tpcds`` metadata
(``TpcdsMetadata.java``; the reference wraps the Teradata dsdgen port).
This module carries the column subset exercised by the shipped query set
(``queries.py``) — the full spec defines 24 tables × 425 columns; the
generator (``generator.py``) is deterministic and spec-SHAPED (row
counts, key relationships, domains) but not byte-identical to dsdgen,
which is why correctness is established by the SQLite differential
battery over the generated data rather than by canned answer sets.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from ..data import types as T

_D = T.decimal

TABLE_SCHEMAS: Dict[str, List[Tuple[str, T.DataType]]] = {
    "date_dim": [
        ("d_date_sk", T.BIGINT), ("d_date", T.DATE),
        ("d_year", T.BIGINT), ("d_moy", T.BIGINT), ("d_dom", T.BIGINT),
        ("d_qoy", T.BIGINT), ("d_day_name", T.varchar(9)),
        ("d_dow", T.BIGINT),
    ],
    "time_dim": [
        ("t_time_sk", T.BIGINT), ("t_hour", T.BIGINT),
        ("t_minute", T.BIGINT), ("t_second", T.BIGINT),
        ("t_meal_time", T.varchar(20)),
    ],
    "item": [
        ("i_item_sk", T.BIGINT), ("i_item_id", T.varchar(16)),
        ("i_brand_id", T.BIGINT), ("i_brand", T.varchar(50)),
        ("i_category_id", T.BIGINT), ("i_category", T.varchar(50)),
        ("i_class_id", T.BIGINT), ("i_class", T.varchar(50)),
        ("i_manufact_id", T.BIGINT), ("i_manufact", T.varchar(50)),
        ("i_manager_id", T.BIGINT), ("i_current_price", _D(7, 2)),
    ],
    "store": [
        ("s_store_sk", T.BIGINT), ("s_store_id", T.varchar(16)),
        ("s_store_name", T.varchar(50)), ("s_number_employees", T.BIGINT),
        ("s_city", T.varchar(60)), ("s_state", T.varchar(2)),
        ("s_zip", T.varchar(10)), ("s_gmt_offset", _D(5, 2)),
    ],
    "promotion": [
        ("p_promo_sk", T.BIGINT), ("p_channel_dmail", T.varchar(1)),
        ("p_channel_email", T.varchar(1)), ("p_channel_tv", T.varchar(1)),
    ],
    "customer_demographics": [
        ("cd_demo_sk", T.BIGINT), ("cd_gender", T.varchar(1)),
        ("cd_marital_status", T.varchar(1)),
        ("cd_education_status", T.varchar(20)),
    ],
    "household_demographics": [
        ("hd_demo_sk", T.BIGINT), ("hd_dep_count", T.BIGINT),
        ("hd_vehicle_count", T.BIGINT),
    ],
    "customer": [
        ("c_customer_sk", T.BIGINT), ("c_customer_id", T.varchar(16)),
        ("c_current_addr_sk", T.BIGINT), ("c_birth_year", T.BIGINT),
    ],
    "customer_address": [
        ("ca_address_sk", T.BIGINT), ("ca_zip", T.varchar(10)),
        ("ca_state", T.varchar(2)), ("ca_city", T.varchar(60)),
    ],
    "store_sales": [
        ("ss_sold_date_sk", T.BIGINT), ("ss_sold_time_sk", T.BIGINT),
        ("ss_item_sk", T.BIGINT), ("ss_customer_sk", T.BIGINT),
        ("ss_cdemo_sk", T.BIGINT),
        ("ss_hdemo_sk", T.BIGINT), ("ss_store_sk", T.BIGINT),
        ("ss_promo_sk", T.BIGINT), ("ss_quantity", T.BIGINT),
        ("ss_list_price", _D(7, 2)), ("ss_sales_price", _D(7, 2)),
        ("ss_ext_sales_price", _D(7, 2)), ("ss_ext_discount_amt", _D(7, 2)),
        ("ss_coupon_amt", _D(7, 2)), ("ss_wholesale_cost", _D(7, 2)),
        ("ss_net_profit", _D(7, 2)),
    ],
}

# spec row counts (dsdgen scaling, ``TpcdsTableName``): dimensions are
# fixed or step-scaled; store_sales scales linearly
DATE_ROWS = 73049            # 1900-01-01 .. 2100-01-01
TIME_ROWS = 86400
ITEM_BASE = 18000
STORE_BASE = 12
PROMO_BASE = 300
CDEMO_ROWS = 1920800
HDEMO_ROWS = 7200
CUSTOMER_BASE = 100000
ADDRESS_BASE = 50000
STORE_SALES_BASE = 2880404


def row_count(table: str, sf: float) -> int:
    fixed = {"date_dim": DATE_ROWS, "time_dim": TIME_ROWS,
             "customer_demographics": CDEMO_ROWS,
             "household_demographics": HDEMO_ROWS}
    if table in fixed:
        return fixed[table]
    if table == "item":
        return max(int(ITEM_BASE * min(max(sf, 0.01), 1) ** 0.5), 1000) \
            if sf < 1 else ITEM_BASE * max(int(sf ** 0.5), 1)
    if table == "store":
        return max(int(STORE_BASE * max(sf, 0.01) ** 0.5), 2)
    if table == "promotion":
        return max(int(PROMO_BASE * min(sf, 1)), 30)
    if table == "customer":
        return max(int(CUSTOMER_BASE * min(sf, 1)), 1000) if sf < 1 \
            else int(CUSTOMER_BASE * max(sf ** 0.5, 1))
    if table == "customer_address":
        return max(row_count("customer", sf) // 2, 500)
    if table == "store_sales":
        return max(int(STORE_SALES_BASE * sf), 1000)
    raise KeyError(table)
