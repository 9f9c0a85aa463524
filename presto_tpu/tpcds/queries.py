"""TPC-DS query texts (the subset runnable on the shipped column set).

Adapted from the public TPC-DS specification queries (same shapes the
reference ships in ``plugin/trino-tpcds``); queries whose tables/columns
are outside the generated subset are not included yet.
"""

QUERIES = {
    3: """
select d_year, i_brand_id, i_brand, sum(ss_ext_sales_price) sum_agg
from date_dim, store_sales, item
where d_date_sk = ss_sold_date_sk and ss_item_sk = i_item_sk
  and i_manufact_id = 128 and d_moy = 11
group by d_year, i_brand_id, i_brand
order by d_year, sum_agg desc, i_brand_id
limit 100
""",
    7: """
select i_item_id, avg(ss_quantity) agg1, avg(ss_list_price) agg2,
       avg(ss_coupon_amt) agg3, avg(ss_sales_price) agg4
from store_sales, customer_demographics, date_dim, item, promotion
where ss_sold_date_sk = d_date_sk and ss_item_sk = i_item_sk
  and ss_cdemo_sk = cd_demo_sk and ss_promo_sk = p_promo_sk
  and cd_gender = 'M' and cd_marital_status = 'S'
  and cd_education_status = 'College'
  and (p_channel_email = 'N' or p_channel_tv = 'N') and d_year = 2000
group by i_item_id
order by i_item_id
limit 100
""",
    19: """
select i_brand_id, i_brand, i_manufact_id, i_manufact,
       sum(ss_ext_sales_price) ext_price
from date_dim, store_sales, item, customer, customer_address, store
where d_date_sk = ss_sold_date_sk and ss_item_sk = i_item_sk
  and i_manager_id = 8 and d_moy = 11 and d_year = 1998
  and ss_customer_sk = c_customer_sk
  and c_current_addr_sk = ca_address_sk
  and substr(ca_zip, 1, 5) <> substr(s_zip, 1, 5)
  and ss_store_sk = s_store_sk
group by i_brand_id, i_brand, i_manufact_id, i_manufact
order by ext_price desc, i_brand, i_brand_id, i_manufact_id, i_manufact
limit 100
""",
    42: """
select d_year, i_category_id, i_category, sum(ss_ext_sales_price) s
from date_dim, store_sales, item
where d_date_sk = ss_sold_date_sk and ss_item_sk = i_item_sk
  and i_manager_id = 1 and d_moy = 11 and d_year = 2000
group by d_year, i_category_id, i_category
order by s desc, d_year, i_category_id, i_category
limit 100
""",
    52: """
select d_year, i_brand_id brand_id, i_brand brand,
       sum(ss_ext_sales_price) ext_price
from date_dim, store_sales, item
where d_date_sk = ss_sold_date_sk and ss_item_sk = i_item_sk
  and i_manager_id = 1 and d_moy = 11 and d_year = 2000
group by d_year, i_brand_id, i_brand
order by d_year, ext_price desc, brand_id
limit 100
""",
    55: """
select i_brand_id brand_id, i_brand brand,
       sum(ss_ext_sales_price) ext_price
from date_dim, store_sales, item
where d_date_sk = ss_sold_date_sk and ss_item_sk = i_item_sk
  and i_manager_id = 28 and d_moy = 11 and d_year = 1999
group by i_brand_id, i_brand
order by ext_price desc, brand_id
limit 100
""",
    96: """
select count(*) cnt
from store_sales, household_demographics, time_dim, store
where ss_sold_time_sk = t_time_sk and ss_hdemo_sk = hd_demo_sk
  and ss_store_sk = s_store_sk
  and t_hour = 20 and t_minute >= 30 and hd_dep_count = 7
  and s_store_name = 'ese'
""",
    13: """
select avg(ss_quantity) q, sum(ss_ext_sales_price) s,
       sum(ss_ext_wholesale_cost) w
from store_sales, store, customer_demographics, household_demographics,
     customer_address, date_dim
where s_store_sk = ss_store_sk and ss_sold_date_sk = d_date_sk
  and d_year = 2001
  and ss_hdemo_sk = hd_demo_sk and ss_cdemo_sk = cd_demo_sk
  and cd_marital_status = 'M' and cd_education_status = 'College'
  and hd_dep_count = 3
  and ss_addr_sk = ca_address_sk and ca_country = 'United States'
  and ca_state in ('TN', 'GA', 'AL')
""",
    15: """
select ca_zip, sum(cs_sales_price) s
from catalog_sales, customer, customer_address, date_dim
where cs_bill_customer_sk = c_customer_sk
  and c_current_addr_sk = ca_address_sk
  and (substr(ca_zip, 1, 5) in ('85669', '86197', '88274', '83405',
                                '86475', '85392', '85460', '80348')
       or ca_state in ('CA', 'WA', 'GA')
       or cs_sales_price > 50)
  and cs_sold_date_sk = d_date_sk and d_qoy = 2 and d_year = 2001
group by ca_zip
order by ca_zip
limit 100
""",
    25: """
select i_item_id, i_item_desc, s_store_id, s_store_name,
       sum(ss_net_profit) store_sales_profit,
       sum(sr_net_loss) store_returns_loss
from store_sales, store_returns, date_dim d1, date_dim d2, store, item
where d1.d_moy = 4 and d1.d_year = 2001
  and d1.d_date_sk = ss_sold_date_sk and i_item_sk = ss_item_sk
  and s_store_sk = ss_store_sk
  and ss_customer_sk = sr_customer_sk and ss_item_sk = sr_item_sk
  and ss_ticket_number = sr_ticket_number
  and sr_returned_date_sk = d2.d_date_sk
  and d2.d_moy between 4 and 10 and d2.d_year = 2001
group by i_item_id, i_item_desc, s_store_id, s_store_name
order by i_item_id, i_item_desc, s_store_id, s_store_name
limit 100
""",
    26: """
select i_item_id, avg(cs_quantity) agg1, avg(cs_list_price) agg2,
       avg(cs_coupon_amt) agg3, avg(cs_sales_price) agg4
from catalog_sales, customer_demographics, date_dim, item, promotion
where cs_sold_date_sk = d_date_sk and cs_item_sk = i_item_sk
  and cs_bill_cdemo_sk = cd_demo_sk and cs_promo_sk = p_promo_sk
  and cd_gender = 'M' and cd_marital_status = 'S'
  and cd_education_status = 'College'
  and (p_channel_email = 'N' or p_channel_event = 'N') and d_year = 2000
group by i_item_id
order by i_item_id
limit 100
""",
    29: """
select i_item_id, i_item_desc, s_store_id, s_store_name,
       sum(ss_quantity) store_sales_quantity,
       sum(sr_return_quantity) store_returns_quantity
from store_sales, store_returns, date_dim d1, date_dim d2, store, item
where d1.d_moy = 9 and d1.d_year = 1999
  and d1.d_date_sk = ss_sold_date_sk and i_item_sk = ss_item_sk
  and s_store_sk = ss_store_sk
  and ss_customer_sk = sr_customer_sk and ss_item_sk = sr_item_sk
  and ss_ticket_number = sr_ticket_number
  and sr_returned_date_sk = d2.d_date_sk
  and d2.d_moy between 9 and 12 and d2.d_year = 1999
group by i_item_id, i_item_desc, s_store_id, s_store_name
order by i_item_id, i_item_desc, s_store_id, s_store_name
limit 100
""",
    37: """
select i_item_id, i_item_desc, i_current_price
from item, inventory, date_dim, catalog_sales
where i_current_price between 20 and 50
  and inv_item_sk = i_item_sk and d_date_sk = inv_date_sk
  and d_year = 1998
  and i_manufact_id in (800, 801, 802, 803)
  and inv_quantity_on_hand between 100 and 500
  and cs_item_sk = i_item_sk
group by i_item_id, i_item_desc, i_current_price
order by i_item_id
limit 100
""",
    40: """
select w_state, i_item_id,
       sum(case when d_date < date '2000-03-11'
           then cs_sales_price - coalesce(cr_refunded_cash, 0)
           else 0 end) sales_before,
       sum(case when d_date >= date '2000-03-11'
           then cs_sales_price - coalesce(cr_refunded_cash, 0)
           else 0 end) sales_after
from catalog_sales
     left join catalog_returns
       on cs_order_number = cr_order_number and cs_item_sk = cr_item_sk,
     warehouse, item, date_dim
where i_current_price between 99 and 1500
  and i_item_sk = cs_item_sk and cs_warehouse_sk = w_warehouse_sk
  and cs_sold_date_sk = d_date_sk
  and d_date between date '2000-02-10' and date '2000-04-10'
group by w_state, i_item_id
order by w_state, i_item_id
limit 100
""",
    43: """
select s_store_name, s_store_id,
       sum(case when d_day_name = 'Sunday' then ss_sales_price
           else null end) sun_sales,
       sum(case when d_day_name = 'Monday' then ss_sales_price
           else null end) mon_sales,
       sum(case when d_day_name = 'Friday' then ss_sales_price
           else null end) fri_sales,
       sum(case when d_day_name = 'Saturday' then ss_sales_price
           else null end) sat_sales
from date_dim, store_sales, store
where d_date_sk = ss_sold_date_sk and s_store_sk = ss_store_sk
  and s_gmt_offset = -5 and d_year = 2000
group by s_store_name, s_store_id
order by s_store_name, s_store_id
limit 100
""",
    45: """
select ca_zip, ca_city, sum(ws_sales_price) s
from web_sales, customer, customer_address, date_dim, item
where ws_bill_customer_sk = c_customer_sk
  and c_current_addr_sk = ca_address_sk
  and ws_item_sk = i_item_sk
  and (substr(ca_zip, 1, 5) in ('85669', '86197', '88274', '83405',
                                '86475', '85392', '85460', '80348')
       or i_item_id in (select i_item_id from item
                        where i_item_sk in (2, 3, 5, 7, 11, 13, 17, 19)))
  and ws_sold_date_sk = d_date_sk and d_qoy = 2 and d_year = 2001
group by ca_zip, ca_city
order by ca_zip, ca_city
limit 100
""",
    50: """
select s_store_name, s_company_id, s_street_number, s_street_name,
       s_street_type, s_suite_number, s_city, s_county, s_state, s_zip,
       sum(case when sr_returned_date_sk - ss_sold_date_sk <= 30
           then 1 else 0 end) days_30,
       sum(case when sr_returned_date_sk - ss_sold_date_sk > 30
            and sr_returned_date_sk - ss_sold_date_sk <= 60
           then 1 else 0 end) days_31_60,
       sum(case when sr_returned_date_sk - ss_sold_date_sk > 60
           then 1 else 0 end) days_over_60
from store_sales, store_returns, store, date_dim d1, date_dim d2
where d2.d_year = 2001 and d2.d_moy = 8
  and ss_ticket_number = sr_ticket_number and ss_item_sk = sr_item_sk
  and ss_sold_date_sk = d1.d_date_sk
  and sr_returned_date_sk = d2.d_date_sk
  and ss_customer_sk = sr_customer_sk and ss_store_sk = s_store_sk
group by s_store_name, s_company_id, s_street_number, s_street_name,
         s_street_type, s_suite_number, s_city, s_county, s_state, s_zip
order by s_store_name, s_company_id
limit 100
""",
    62: """
select substr(w_warehouse_name, 1, 20) wname, sm_type, web_name,
       sum(case when ws_ship_date_sk - ws_sold_date_sk <= 30
           then 1 else 0 end) days_30,
       sum(case when ws_ship_date_sk - ws_sold_date_sk > 30
            and ws_ship_date_sk - ws_sold_date_sk <= 60
           then 1 else 0 end) days_31_60,
       sum(case when ws_ship_date_sk - ws_sold_date_sk > 60
           then 1 else 0 end) days_over_60
from web_sales, warehouse, ship_mode, web_site, date_dim
where d_year = 2001
  and ws_ship_date_sk = d_date_sk
  and ws_warehouse_sk = w_warehouse_sk
  and ws_ship_mode_sk = sm_ship_mode_sk
  and ws_web_site_sk = web_site_sk
group by substr(w_warehouse_name, 1, 20), sm_type, web_name
order by wname, sm_type, web_name
limit 100
""",
    65: """
select s_store_name, i_item_desc, sc.revenue, i_current_price,
       i_wholesale_cost, i_brand
from store, item,
     (select ss_store_sk, avg(revenue) as ave
      from (select ss_store_sk, ss_item_sk, sum(ss_sales_price) as revenue
            from store_sales, date_dim
            where ss_sold_date_sk = d_date_sk and d_year = 2001
            group by ss_store_sk, ss_item_sk) sa
      group by ss_store_sk) sb,
     (select ss_store_sk, ss_item_sk, sum(ss_sales_price) as revenue
      from store_sales, date_dim
      where ss_sold_date_sk = d_date_sk and d_year = 2001
      group by ss_store_sk, ss_item_sk) sc
where sb.ss_store_sk = sc.ss_store_sk
  and sc.revenue <= 0.1 * sb.ave
  and s_store_sk = sc.ss_store_sk and i_item_sk = sc.ss_item_sk
order by s_store_name, i_item_desc, sc.revenue
limit 100
""",
    79: """
select c_last_name, c_first_name, s_city, profit
from (select ss_ticket_number, ss_customer_sk, s_city,
             sum(ss_coupon_amt) amt, sum(ss_net_profit) profit
      from store_sales, date_dim, store, household_demographics
      where ss_sold_date_sk = d_date_sk and ss_store_sk = s_store_sk
        and ss_hdemo_sk = hd_demo_sk
        and (hd_dep_count = 6 or hd_vehicle_count > 2)
        and d_dow = 1 and d_year = 1999
        and s_number_employees between 200 and 295
      group by ss_ticket_number, ss_customer_sk, ss_addr_sk, s_city) ms,
     customer
where ss_customer_sk = c_customer_sk
order by c_last_name, c_first_name, s_city, profit, ss_ticket_number
limit 100
""",
    82: """
select i_item_id, i_item_desc, i_current_price
from item, inventory, date_dim, store_sales
where i_current_price between 30 and 60
  and inv_item_sk = i_item_sk and d_date_sk = inv_date_sk
  and d_year = 1998
  and i_manufact_id in (437, 129, 727, 663)
  and inv_quantity_on_hand between 100 and 500
  and ss_item_sk = i_item_sk
group by i_item_id, i_item_desc, i_current_price
order by i_item_id
limit 100
""",
    88: """
select *
from (select count(*) h8_30_to_9 from store_sales, household_demographics,
      time_dim, store
      where ss_sold_time_sk = t_time_sk and ss_hdemo_sk = hd_demo_sk
        and ss_store_sk = s_store_sk and t_hour = 8 and t_minute >= 30
        and hd_dep_count = 2 and s_store_name = 'ese') s1,
     (select count(*) h9_to_9_30 from store_sales, household_demographics,
      time_dim, store
      where ss_sold_time_sk = t_time_sk and ss_hdemo_sk = hd_demo_sk
        and ss_store_sk = s_store_sk and t_hour = 9 and t_minute < 30
        and hd_dep_count = 2 and s_store_name = 'ese') s2,
     (select count(*) h12_to_12_30 from store_sales,
      household_demographics, time_dim, store
      where ss_sold_time_sk = t_time_sk and ss_hdemo_sk = hd_demo_sk
        and ss_store_sk = s_store_sk and t_hour = 12 and t_minute < 30
        and hd_dep_count = 2 and s_store_name = 'ese') s3
""",
    91: """
select cc_call_center_id, cc_name, cc_manager,
       sum(cr_net_loss) returns_loss
from call_center, catalog_returns, date_dim, customer,
     customer_demographics, household_demographics
where cr_call_center_sk = cc_call_center_sk
  and cr_returned_date_sk = d_date_sk
  and cr_returning_customer_sk = c_customer_sk
  and cd_demo_sk = c_current_cdemo_sk
  and hd_demo_sk = c_current_hdemo_sk
  and d_year = 1998 and d_moy = 11
  and cd_marital_status = 'M' and cd_education_status = 'Unknown'
  and hd_buy_potential like 'Unknown%'
group by cc_call_center_id, cc_name, cc_manager
order by returns_loss desc, cc_call_center_id
limit 100
""",
    93: """
select ss_customer_sk, sum(act_sales) sumsales
from (select ss_item_sk, ss_ticket_number, ss_customer_sk,
             case when sr_return_quantity is not null
                  then (ss_quantity - sr_return_quantity) * ss_sales_price
                  else ss_quantity * ss_sales_price end act_sales
      from store_sales
           left join store_returns
             on sr_item_sk = ss_item_sk
            and sr_ticket_number = ss_ticket_number,
           reason
      where sr_reason_sk = r_reason_sk and r_reason_desc = 'reason 1'
     ) t
group by ss_customer_sk
order by sumsales, ss_customer_sk
limit 100
""",
    99: """
select substr(w_warehouse_name, 1, 20) wname, sm_type, cc_name,
       sum(case when cs_ship_date_sk - cs_sold_date_sk <= 30
           then 1 else 0 end) days_30,
       sum(case when cs_ship_date_sk - cs_sold_date_sk > 30
            and cs_ship_date_sk - cs_sold_date_sk <= 60
           then 1 else 0 end) days_31_60,
       sum(case when cs_ship_date_sk - cs_sold_date_sk > 60
           then 1 else 0 end) days_over_60
from catalog_sales, warehouse, ship_mode, call_center, date_dim
where d_year = 2001
  and cs_ship_date_sk = d_date_sk
  and cs_warehouse_sk = w_warehouse_sk
  and cs_ship_mode_sk = sm_ship_mode_sk
  and cs_call_center_sk = cc_call_center_sk
group by substr(w_warehouse_name, 1, 20), sm_type, cc_name
order by wname, sm_type, cc_name
limit 100
""",
}

# queries whose outputs include float-producing aggregates (avg, ratios):
# the differential test compares those columns with a tolerance instead
# of exactly (engine = exact decimal, SQLite = float)
FUZZY = {7, 13, 26, 65}
