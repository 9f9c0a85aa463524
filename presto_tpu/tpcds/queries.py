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
    12: """
select i_item_id, i_item_desc, i_category, i_class, i_current_price,
       sum(ws_ext_sales_price) itemrevenue,
       sum(ws_ext_sales_price) * 100 / sum(sum(ws_ext_sales_price))
           over (partition by i_class) revenueratio
from web_sales, item, date_dim
where ws_item_sk = i_item_sk
  and i_category in ('Sports', 'Books', 'Home')
  and ws_sold_date_sk = d_date_sk
  and d_date between date '1999-02-22' and date '1999-03-24'
group by i_item_id, i_item_desc, i_category, i_class, i_current_price
order by i_category, i_class, i_item_id, i_item_desc, revenueratio
limit 100
""",
    16: """
select count(distinct cs_order_number) order_count,
       sum(cs_ext_ship_cost) total_shipping_cost,
       sum(cs_net_profit) total_net_profit
from catalog_sales cs1, date_dim, customer_address, call_center
where d_date between date '2002-02-01' and date '2002-04-02'
  and cs1.cs_ship_date_sk = d_date_sk
  and cs1.cs_ship_addr_sk = ca_address_sk
  and ca_state = 'GA'
  and cs1.cs_call_center_sk = cc_call_center_sk
  and exists (select 1 from catalog_sales cs2
              where cs1.cs_order_number = cs2.cs_order_number
                and cs1.cs_warehouse_sk <> cs2.cs_warehouse_sk)
  and not exists (select 1 from catalog_returns cr1
                  where cs1.cs_order_number = cr1.cr_order_number)
""",
    20: """
select i_item_id, i_item_desc, i_category, i_class, i_current_price,
       sum(cs_ext_sales_price) itemrevenue,
       sum(cs_ext_sales_price) * 100 / sum(sum(cs_ext_sales_price))
           over (partition by i_class) revenueratio
from catalog_sales, item, date_dim
where cs_item_sk = i_item_sk
  and i_category in ('Sports', 'Books', 'Home')
  and cs_sold_date_sk = d_date_sk
  and d_date between date '1999-02-22' and date '1999-03-24'
group by i_item_id, i_item_desc, i_category, i_class, i_current_price
order by i_category, i_class, i_item_id, i_item_desc, revenueratio
limit 100
""",
    21: """
select w_warehouse_name, i_item_id,
       sum(case when d_date < date '2000-03-11'
           then inv_quantity_on_hand else 0 end) inv_before,
       sum(case when d_date >= date '2000-03-11'
           then inv_quantity_on_hand else 0 end) inv_after
from inventory, warehouse, item, date_dim
where i_current_price between 0.99 and 1.49
  and i_item_sk = inv_item_sk
  and inv_warehouse_sk = w_warehouse_sk
  and inv_date_sk = d_date_sk
  and d_date between date '2000-02-10' and date '2000-04-10'
group by w_warehouse_name, i_item_id
having sum(case when d_date < date '2000-03-11'
           then inv_quantity_on_hand else 0 end) > 0
order by w_warehouse_name, i_item_id
limit 100
""",
    27: """
select i_item_id, s_state, grouping(s_state) g_state,
       avg(ss_quantity) agg1, avg(ss_list_price) agg2,
       avg(ss_coupon_amt) agg3, avg(ss_sales_price) agg4
from store_sales, customer_demographics, date_dim, store, item
where ss_sold_date_sk = d_date_sk
  and ss_item_sk = i_item_sk
  and ss_store_sk = s_store_sk
  and ss_cdemo_sk = cd_demo_sk
  and cd_gender = 'M' and cd_marital_status = 'S'
  and cd_education_status = 'College'
  and d_year = 2002
group by rollup(i_item_id, s_state)
order by i_item_id, s_state
limit 100
""",
    28: """
select b1_lp, b1_cnt, b1_cntd, b2_lp, b2_cnt, b2_cntd,
       b3_lp, b3_cnt, b3_cntd
from (select avg(ss_list_price) b1_lp, count(ss_list_price) b1_cnt,
             count(distinct ss_list_price) b1_cntd
      from store_sales
      where ss_quantity between 0 and 5
        and (ss_list_price between 8 and 8 + 10
             or ss_coupon_amt between 459 and 459 + 1000
             or ss_wholesale_cost between 57 and 57 + 20)) b1,
     (select avg(ss_list_price) b2_lp, count(ss_list_price) b2_cnt,
             count(distinct ss_list_price) b2_cntd
      from store_sales
      where ss_quantity between 6 and 10
        and (ss_list_price between 90 and 90 + 10
             or ss_coupon_amt between 2323 and 2323 + 1000
             or ss_wholesale_cost between 31 and 31 + 20)) b2,
     (select avg(ss_list_price) b3_lp, count(ss_list_price) b3_cnt,
             count(distinct ss_list_price) b3_cntd
      from store_sales
      where ss_quantity between 11 and 15
        and (ss_list_price between 142 and 142 + 10
             or ss_coupon_amt between 12214 and 12214 + 1000
             or ss_wholesale_cost between 79 and 79 + 20)) b3
limit 100
""",
    33: """
with ss as (
  select i_manufact_id, sum(ss_ext_sales_price) total_sales
  from store_sales, date_dim, customer_address, item
  where i_manufact_id in (select i_manufact_id from item
                          where i_category in ('Electronics'))
    and ss_item_sk = i_item_sk and ss_sold_date_sk = d_date_sk
    and d_year = 1998 and d_moy = 5
    and ss_addr_sk = ca_address_sk and ca_gmt_offset = -5
  group by i_manufact_id),
 cs as (
  select i_manufact_id, sum(cs_ext_sales_price) total_sales
  from catalog_sales, date_dim, customer_address, item
  where i_manufact_id in (select i_manufact_id from item
                          where i_category in ('Electronics'))
    and cs_item_sk = i_item_sk and cs_sold_date_sk = d_date_sk
    and d_year = 1998 and d_moy = 5
    and cs_bill_addr_sk = ca_address_sk and ca_gmt_offset = -5
  group by i_manufact_id),
 ws as (
  select i_manufact_id, sum(ws_ext_sales_price) total_sales
  from web_sales, date_dim, customer_address, item
  where i_manufact_id in (select i_manufact_id from item
                          where i_category in ('Electronics'))
    and ws_item_sk = i_item_sk and ws_sold_date_sk = d_date_sk
    and d_year = 1998 and d_moy = 5
    and ws_bill_addr_sk = ca_address_sk and ca_gmt_offset = -5
  group by i_manufact_id)
select i_manufact_id, sum(total_sales) total_sales
from (select i_manufact_id, total_sales from ss
      union all select i_manufact_id, total_sales from cs
      union all select i_manufact_id, total_sales from ws) tmp1
group by i_manufact_id
order by total_sales, i_manufact_id
limit 100
""",
    34: """
select c_last_name, c_first_name, c_salutation,
       c_preferred_cust_flag, ss_ticket_number, cnt
from (select ss_ticket_number, ss_customer_sk, count(*) cnt
      from store_sales, date_dim, store, household_demographics
      where ss_sold_date_sk = d_date_sk
        and ss_store_sk = s_store_sk
        and ss_hdemo_sk = hd_demo_sk
        and (d_dom between 1 and 3 or d_dom between 25 and 28)
        and (hd_buy_potential = '>10000'
             or hd_buy_potential = 'Unknown')
        and hd_vehicle_count > 0
        and d_year in (1999, 2000, 2001)
      group by ss_ticket_number, ss_customer_sk) dn, customer
where ss_customer_sk = c_customer_sk
  and cnt between 15 and 20
order by c_last_name, c_first_name, c_salutation,
         c_preferred_cust_flag desc, ss_ticket_number
limit 100
""",
    38: """
select count(*) c from (
  select distinct c_last_name, c_first_name, d_date
  from store_sales, date_dim, customer
  where store_sales.ss_sold_date_sk = date_dim.d_date_sk
    and store_sales.ss_customer_sk = customer.c_customer_sk
    and d_month_seq between 1200 and 1200 + 11
  intersect
  select distinct c_last_name, c_first_name, d_date
  from catalog_sales, date_dim, customer
  where catalog_sales.cs_sold_date_sk = date_dim.d_date_sk
    and catalog_sales.cs_bill_customer_sk = customer.c_customer_sk
    and d_month_seq between 1200 and 1200 + 11
  intersect
  select distinct c_last_name, c_first_name, d_date
  from web_sales, date_dim, customer
  where web_sales.ws_sold_date_sk = date_dim.d_date_sk
    and web_sales.ws_bill_customer_sk = customer.c_customer_sk
    and d_month_seq between 1200 and 1200 + 11
) hot_cust
limit 100
""",
    41: """
select distinct i_product_name
from item i1
where i_manufact_id between 738 and 738 + 40
  and (select count(*) from item
       where i_manufact = i1.i_manufact
         and ((i_category = 'Women' and i_color in ('powder', 'khaki'))
              or (i_category = 'Men' and i_color in ('brown', 'honeydew'))))
      > 0
order by i_product_name
limit 100
""",
    48: """
select sum(ss_quantity) q
from store_sales, store, customer_demographics,
     customer_address, date_dim
where s_store_sk = ss_store_sk
  and ss_sold_date_sk = d_date_sk and d_year = 2000
  and ss_cdemo_sk = cd_demo_sk
  and ((cd_marital_status = 'M'
        and cd_education_status = '4 yr Degree'
        and ss_sales_price between 100.00 and 150.00)
       or (cd_marital_status = 'D'
           and cd_education_status = '2 yr Degree'
           and ss_sales_price between 50.00 and 100.00)
       or (cd_marital_status = 'S'
           and cd_education_status = 'College'
           and ss_sales_price between 150.00 and 200.00))
  and ss_addr_sk = ca_address_sk and ca_country = 'United States'
  and ((ca_state in ('CO', 'OH', 'TX')
        and ss_net_profit between 0 and 2000)
       or (ca_state in ('OR', 'MN', 'KY')
           and ss_net_profit between 150 and 3000)
       or (ca_state in ('VA', 'CA', 'MS')
           and ss_net_profit between 50 and 25000))
""",
    98: """
select i_item_id, i_item_desc, i_category, i_class, i_current_price,
       sum(ss_ext_sales_price) itemrevenue,
       sum(ss_ext_sales_price) * 100 / sum(sum(ss_ext_sales_price))
           over (partition by i_class) revenueratio
from store_sales, item, date_dim
where ss_item_sk = i_item_sk
  and i_category in ('Sports', 'Books', 'Home')
  and ss_sold_date_sk = d_date_sk
  and d_date between date '1999-02-22' and date '1999-03-24'
group by i_item_id, i_item_desc, i_category, i_class, i_current_price
order by i_category, i_class, i_item_id, i_item_desc, revenueratio
limit 100
""",
    46: """
select c_last_name, c_first_name, ca_city, bought_city,
       ss_ticket_number, amt, profit
from (select ss_ticket_number, ss_customer_sk, ca_city bought_city,
             sum(ss_coupon_amt) amt, sum(ss_net_profit) profit
      from store_sales, date_dim, store, household_demographics,
           customer_address
      where ss_sold_date_sk = d_date_sk
        and ss_store_sk = s_store_sk
        and ss_hdemo_sk = hd_demo_sk
        and ss_addr_sk = ca_address_sk
        and (hd_dep_count = 4 or hd_vehicle_count = 3)
        and d_dow in (6, 0)
        and d_year in (1999, 2000, 2001)
      group by ss_ticket_number, ss_customer_sk, ss_addr_sk, ca_city) dn,
     customer, customer_address current_addr
where ss_customer_sk = c_customer_sk
  and customer.c_current_addr_sk = current_addr.ca_address_sk
  and current_addr.ca_city <> bought_city
order by c_last_name, c_first_name, ca_city, bought_city,
         ss_ticket_number
limit 100
""",
    47: """
with v1 as (
  select i_category, i_brand, s_store_name, s_company_name,
         d_year, d_moy, sum(ss_sales_price) sum_sales,
         avg(sum(ss_sales_price)) over (
           partition by i_category, i_brand, s_store_name,
                        s_company_name, d_year) avg_monthly_sales,
         rank() over (
           partition by i_category, i_brand, s_store_name,
                        s_company_name
           order by d_year, d_moy) rn
  from item, store_sales, date_dim, store
  where ss_item_sk = i_item_sk and ss_sold_date_sk = d_date_sk
    and ss_store_sk = s_store_sk
    and (d_year = 1999
         or (d_year = 1998 and d_moy = 12)
         or (d_year = 2000 and d_moy = 1))
  group by i_category, i_brand, s_store_name, s_company_name,
           d_year, d_moy),
 v2 as (
  select v1.i_category, v1.i_brand, v1.s_store_name,
         v1.s_company_name, v1.d_year, v1.d_moy, v1.avg_monthly_sales,
         v1.sum_sales, v1_lag.sum_sales psum, v1_lead.sum_sales nsum
  from v1, v1 v1_lag, v1 v1_lead
  where v1.i_category = v1_lag.i_category
    and v1.i_category = v1_lead.i_category
    and v1.i_brand = v1_lag.i_brand
    and v1.i_brand = v1_lead.i_brand
    and v1.s_store_name = v1_lag.s_store_name
    and v1.s_store_name = v1_lead.s_store_name
    and v1.s_company_name = v1_lag.s_company_name
    and v1.s_company_name = v1_lead.s_company_name
    and v1.rn = v1_lag.rn + 1
    and v1.rn = v1_lead.rn - 1)
select * from v2
where d_year = 1999
  and avg_monthly_sales > 0
  and abs(sum_sales - avg_monthly_sales) / avg_monthly_sales > 0.1
order by sum_sales - avg_monthly_sales, s_store_name
limit 100
""",
    51: """
with web_v1 as (
  select ws_item_sk item_sk, d_date,
         sum(sum(ws_sales_price)) over (
           partition by ws_item_sk order by d_date
           rows between unbounded preceding and current row) cume_sales
  from web_sales, date_dim
  where ws_sold_date_sk = d_date_sk
    and d_month_seq between 1200 and 1200 + 11
    and ws_item_sk is not null
  group by ws_item_sk, d_date),
 store_v1 as (
  select ss_item_sk item_sk, d_date,
         sum(sum(ss_sales_price)) over (
           partition by ss_item_sk order by d_date
           rows between unbounded preceding and current row) cume_sales
  from store_sales, date_dim
  where ss_sold_date_sk = d_date_sk
    and d_month_seq between 1200 and 1200 + 11
    and ss_item_sk is not null
  group by ss_item_sk, d_date)
select item_sk, d_date, web_sales, store_sales,
       max(web_sales) over (
         partition by item_sk order by d_date
         rows between unbounded preceding and current row) web_cumulative,
       max(store_sales) over (
         partition by item_sk order by d_date
         rows between unbounded preceding and current row) store_cumulative
from (select case when web.item_sk is not null then web.item_sk
                  else store.item_sk end item_sk,
             case when web.d_date is not null then web.d_date
                  else store.d_date end d_date,
             web.cume_sales web_sales, store.cume_sales store_sales
      from web_v1 web left join store_v1 store
        on web.item_sk = store.item_sk and web.d_date = store.d_date) x
order by item_sk, d_date
limit 100
""",
    53: """
select manufact_id, sum_sales, avg_quarterly_sales
from (select i_manufact_id manufact_id,
             sum(ss_sales_price) sum_sales,
             avg(sum(ss_sales_price)) over (
               partition by i_manufact_id) avg_quarterly_sales
      from item, store_sales, date_dim, store
      where ss_item_sk = i_item_sk and ss_sold_date_sk = d_date_sk
        and ss_store_sk = s_store_sk
        and d_month_seq in (1200, 1201, 1202, 1203, 1204, 1205,
                            1206, 1207, 1208, 1209, 1210, 1211)
        and i_category in ('Books', 'Children', 'Electronics')
        and i_class in ('personal', 'portable', 'reference',
                        'self-help')
      group by i_manufact_id, d_qoy) tmp1
where case when avg_quarterly_sales > 0
      then abs(sum_sales - avg_quarterly_sales) / avg_quarterly_sales
      else 0 end > 0.1
order by avg_quarterly_sales, sum_sales, manufact_id
limit 100
""",
    57: """
with v1 as (
  select i_category, i_brand, cc_name, d_year, d_moy,
         sum(cs_sales_price) sum_sales,
         avg(sum(cs_sales_price)) over (
           partition by i_category, i_brand, cc_name, d_year)
           avg_monthly_sales,
         rank() over (
           partition by i_category, i_brand, cc_name
           order by d_year, d_moy) rn
  from item, catalog_sales, date_dim, call_center
  where cs_item_sk = i_item_sk and cs_sold_date_sk = d_date_sk
    and cc_call_center_sk = cs_call_center_sk
    and (d_year = 1999
         or (d_year = 1998 and d_moy = 12)
         or (d_year = 2000 and d_moy = 1))
  group by i_category, i_brand, cc_name, d_year, d_moy),
 v2 as (
  select v1.i_category, v1.i_brand, v1.cc_name, v1.d_year, v1.d_moy,
         v1.avg_monthly_sales, v1.sum_sales,
         v1_lag.sum_sales psum, v1_lead.sum_sales nsum
  from v1, v1 v1_lag, v1 v1_lead
  where v1.i_category = v1_lag.i_category
    and v1.i_category = v1_lead.i_category
    and v1.i_brand = v1_lag.i_brand
    and v1.i_brand = v1_lead.i_brand
    and v1.cc_name = v1_lag.cc_name
    and v1.cc_name = v1_lead.cc_name
    and v1.rn = v1_lag.rn + 1
    and v1.rn = v1_lead.rn - 1)
select * from v2
where d_year = 1999
  and avg_monthly_sales > 0
  and abs(sum_sales - avg_monthly_sales) / avg_monthly_sales > 0.1
order by sum_sales - avg_monthly_sales, cc_name
limit 100
""",
    59: """
with wss as (
  select d_week_seq, ss_store_sk,
         sum(case when d_dow = 0 then ss_sales_price else 0 end)
             sun_sales,
         sum(case when d_dow = 1 then ss_sales_price else 0 end)
             mon_sales,
         sum(case when d_dow = 2 then ss_sales_price else 0 end)
             tue_sales,
         sum(case when d_dow = 3 then ss_sales_price else 0 end)
             wed_sales,
         sum(case when d_dow = 4 then ss_sales_price else 0 end)
             thu_sales,
         sum(case when d_dow = 5 then ss_sales_price else 0 end)
             fri_sales,
         sum(case when d_dow = 6 then ss_sales_price else 0 end)
             sat_sales
  from store_sales, date_dim
  where d_date_sk = ss_sold_date_sk
  group by d_week_seq, ss_store_sk)
select s_store_name s_store_name1, wss.d_week_seq d_week_seq1,
       s_store_id s_store_id1, sun_sales sun_sales1,
       mon_sales mon_sales1, tue_sales tue_sales1,
       wed_sales wed_sales1, thu_sales thu_sales1,
       fri_sales fri_sales1, sat_sales sat_sales1
from wss, store, date_dim d
where d.d_week_seq = wss.d_week_seq
  and ss_store_sk = s_store_sk
  and d_month_seq between 1185 and 1185 + 11
  and d_dom = 1
order by s_store_name1, s_store_id1, d_week_seq1, sun_sales1
limit 100
""",
    60: """
with ss as (
  select i_item_id, sum(ss_ext_sales_price) total_sales
  from store_sales, date_dim, customer_address, item
  where i_item_id in (select i_item_id from item
                      where i_category in ('Music'))
    and ss_item_sk = i_item_sk and ss_sold_date_sk = d_date_sk
    and d_year = 1998 and d_moy = 9
    and ss_addr_sk = ca_address_sk and ca_gmt_offset = -5
  group by i_item_id),
 cs as (
  select i_item_id, sum(cs_ext_sales_price) total_sales
  from catalog_sales, date_dim, customer_address, item
  where i_item_id in (select i_item_id from item
                      where i_category in ('Music'))
    and cs_item_sk = i_item_sk and cs_sold_date_sk = d_date_sk
    and d_year = 1998 and d_moy = 9
    and cs_bill_addr_sk = ca_address_sk and ca_gmt_offset = -5
  group by i_item_id),
 ws as (
  select i_item_id, sum(ws_ext_sales_price) total_sales
  from web_sales, date_dim, customer_address, item
  where i_item_id in (select i_item_id from item
                      where i_category in ('Music'))
    and ws_item_sk = i_item_sk and ws_sold_date_sk = d_date_sk
    and d_year = 1998 and d_moy = 9
    and ws_bill_addr_sk = ca_address_sk and ca_gmt_offset = -5
  group by i_item_id)
select i_item_id, sum(total_sales) total_sales
from (select i_item_id, total_sales from ss
      union all select i_item_id, total_sales from cs
      union all select i_item_id, total_sales from ws) tmp1
group by i_item_id
order by i_item_id, total_sales
limit 100
""",
    61: """
select promotions, total,
       cast(promotions as double) / cast(total as double) * 100 ratio
from (select sum(ss_ext_sales_price) promotions
      from store_sales, store, promotion, date_dim, customer,
           customer_address, item
      where ss_sold_date_sk = d_date_sk
        and ss_store_sk = s_store_sk
        and ss_promo_sk = p_promo_sk
        and ss_customer_sk = c_customer_sk
        and ca_address_sk = c_current_addr_sk
        and ss_item_sk = i_item_sk
        and ca_gmt_offset = -5 and i_category = 'Jewelry'
        and (p_channel_dmail = 'Y' or p_channel_email = 'Y'
             or p_channel_tv = 'Y')
        and s_gmt_offset = -5 and d_year = 1998 and d_moy = 11)
     promotional_sales,
     (select sum(ss_ext_sales_price) total
      from store_sales, store, date_dim, customer,
           customer_address, item
      where ss_sold_date_sk = d_date_sk
        and ss_store_sk = s_store_sk
        and ss_customer_sk = c_customer_sk
        and ca_address_sk = c_current_addr_sk
        and ss_item_sk = i_item_sk
        and ca_gmt_offset = -5 and i_category = 'Jewelry'
        and s_gmt_offset = -5 and d_year = 1998 and d_moy = 11)
     all_sales
order by promotions, total
limit 100
""",
    63: """
select manager_id, sum_sales, avg_monthly_sales
from (select i_manager_id manager_id,
             sum(ss_sales_price) sum_sales,
             avg(sum(ss_sales_price)) over (
               partition by i_manager_id) avg_monthly_sales
      from item, store_sales, date_dim, store
      where ss_item_sk = i_item_sk and ss_sold_date_sk = d_date_sk
        and ss_store_sk = s_store_sk
        and d_month_seq in (1200, 1201, 1202, 1203, 1204, 1205,
                            1206, 1207, 1208, 1209, 1210, 1211)
        and i_category in ('Books', 'Children', 'Electronics')
      group by i_manager_id, d_moy) tmp1
where case when avg_monthly_sales > 0
      then abs(sum_sales - avg_monthly_sales) / avg_monthly_sales
      else 0 end > 0.1
order by manager_id, avg_monthly_sales, sum_sales
limit 100
""",
    68: """
select c_last_name, c_first_name, ca_city, bought_city,
       ss_ticket_number, extended_price, extended_tax, list_price
from (select ss_ticket_number, ss_customer_sk, ca_city bought_city,
             sum(ss_ext_sales_price) extended_price,
             sum(ss_ext_list_price) list_price,
             sum(ss_ext_tax) extended_tax
      from store_sales, date_dim, store, household_demographics,
           customer_address
      where ss_sold_date_sk = d_date_sk
        and ss_store_sk = s_store_sk
        and ss_hdemo_sk = hd_demo_sk
        and ss_addr_sk = ca_address_sk
        and d_dom between 1 and 2
        and (hd_dep_count = 4 or hd_vehicle_count = 3)
        and d_year in (1999, 2000, 2001)
      group by ss_ticket_number, ss_customer_sk, ss_addr_sk,
               ca_city) dn,
     customer, customer_address current_addr
where ss_customer_sk = c_customer_sk
  and customer.c_current_addr_sk = current_addr.ca_address_sk
  and current_addr.ca_city <> bought_city
order by c_last_name, ss_ticket_number
limit 100
""",
    69: """
select cd_gender, cd_marital_status, cd_education_status,
       count(*) cnt1, cd_purchase_estimate, count(*) cnt2,
       cd_credit_rating, count(*) cnt3
from customer c, customer_address ca, customer_demographics
where c.c_current_addr_sk = ca.ca_address_sk
  and ca_state in ('KY', 'GA', 'NM')
  and cd_demo_sk = c.c_current_cdemo_sk
  and exists (select 1 from store_sales, date_dim
              where c.c_customer_sk = ss_customer_sk
                and ss_sold_date_sk = d_date_sk
                and d_year = 2001 and d_moy between 4 and 6)
  and not exists (select 1 from web_sales, date_dim
                  where c.c_customer_sk = ws_bill_customer_sk
                    and ws_sold_date_sk = d_date_sk
                    and d_year = 2001 and d_moy between 4 and 6)
  and not exists (select 1 from catalog_sales, date_dim
                  where c.c_customer_sk = cs_ship_customer_sk
                    and cs_sold_date_sk = d_date_sk
                    and d_year = 2001 and d_moy between 4 and 6)
group by cd_gender, cd_marital_status, cd_education_status,
         cd_purchase_estimate, cd_credit_rating
order by cd_gender, cd_marital_status, cd_education_status,
         cd_purchase_estimate, cd_credit_rating
limit 100
""",
    71: """
select i_brand_id brand_id, i_brand brand, t_hour, t_minute,
       sum(ext_price) ext_price
from item,
     (select ws_ext_sales_price ext_price, ws_sold_date_sk sold_date_sk,
             ws_item_sk sold_item_sk, ws_sold_time_sk time_sk
      from web_sales, date_dim
      where d_date_sk = ws_sold_date_sk
        and d_moy = 11 and d_year = 1999
      union all
      select cs_ext_sales_price ext_price, cs_sold_date_sk sold_date_sk,
             cs_item_sk sold_item_sk, cs_sold_time_sk time_sk
      from catalog_sales, date_dim
      where d_date_sk = cs_sold_date_sk
        and d_moy = 11 and d_year = 1999
      union all
      select ss_ext_sales_price ext_price, ss_sold_date_sk sold_date_sk,
             ss_item_sk sold_item_sk, ss_sold_time_sk time_sk
      from store_sales, date_dim
      where d_date_sk = ss_sold_date_sk
        and d_moy = 11 and d_year = 1999) tmp,
     time_dim
where sold_item_sk = i_item_sk and i_manager_id = 1
  and time_sk = t_time_sk
  and (t_meal_time = 'breakfast' or t_meal_time = 'dinner')
group by i_brand, i_brand_id, t_hour, t_minute
order by ext_price desc, i_brand_id
limit 100
""",
    73: """
select c_last_name, c_first_name, c_salutation,
       c_preferred_cust_flag, ss_ticket_number, cnt
from (select ss_ticket_number, ss_customer_sk, count(*) cnt
      from store_sales, date_dim, store, household_demographics
      where ss_sold_date_sk = d_date_sk
        and ss_store_sk = s_store_sk
        and ss_hdemo_sk = hd_demo_sk
        and d_dom between 1 and 2
        and (hd_buy_potential = '>10000'
             or hd_buy_potential = 'Unknown')
        and hd_vehicle_count > 0
        and d_year in (1999, 2000, 2001)
      group by ss_ticket_number, ss_customer_sk) dj, customer
where ss_customer_sk = c_customer_sk
  and cnt between 1 and 5
order by cnt desc, c_last_name
limit 100
""",
    87: """
select count(*) c
from ((select distinct c_last_name, c_first_name, d_date
       from store_sales, date_dim, customer
       where store_sales.ss_sold_date_sk = date_dim.d_date_sk
         and store_sales.ss_customer_sk = customer.c_customer_sk
         and d_month_seq between 1200 and 1200 + 11)
      except
      (select distinct c_last_name, c_first_name, d_date
       from catalog_sales, date_dim, customer
       where catalog_sales.cs_sold_date_sk = date_dim.d_date_sk
         and catalog_sales.cs_bill_customer_sk = customer.c_customer_sk
         and d_month_seq between 1200 and 1200 + 11)
      except
      (select distinct c_last_name, c_first_name, d_date
       from web_sales, date_dim, customer
       where web_sales.ws_sold_date_sk = date_dim.d_date_sk
         and web_sales.ws_bill_customer_sk = customer.c_customer_sk
         and d_month_seq between 1200 and 1200 + 11)) cool_cust
""",
    89: """
select i_category, i_class, i_brand, s_store_name, s_company_name,
       d_moy, sum_sales, avg_monthly_sales
from (select i_category, i_class, i_brand, s_store_name,
             s_company_name, d_moy, sum(ss_sales_price) sum_sales,
             avg(sum(ss_sales_price)) over (
               partition by i_category, i_brand, s_store_name,
                            s_company_name) avg_monthly_sales
      from item, store_sales, date_dim, store
      where ss_item_sk = i_item_sk and ss_sold_date_sk = d_date_sk
        and ss_store_sk = s_store_sk and d_year = 1999
        and ((i_category in ('Books', 'Electronics', 'Sports')
              and i_class in ('computers', 'stereo', 'football'))
             or (i_category in ('Men', 'Jewelry', 'Women')
                 and i_class in ('shirts', 'birdal', 'dresses')))
      group by i_category, i_class, i_brand, s_store_name,
               s_company_name, d_moy) tmp1
where case when avg_monthly_sales <> 0
      then abs(sum_sales - avg_monthly_sales) / avg_monthly_sales
      else 0 end > 0.1
order by sum_sales - avg_monthly_sales, s_store_name
limit 100
""",
    92: """
select sum(ws_ext_discount_amt) excess_discount_amount
from web_sales, item, date_dim
where i_manufact_id = 350
  and i_item_sk = ws_item_sk
  and d_date between date '2000-01-27' and date '2000-04-26'
  and d_date_sk = ws_sold_date_sk
  and ws_ext_discount_amt > (
    select 1.3 * avg(ws_ext_discount_amt)
    from web_sales, date_dim
    where ws_item_sk = i_item_sk
      and d_date between date '2000-01-27' and date '2000-04-26'
      and d_date_sk = ws_sold_date_sk)
order by excess_discount_amount
limit 100
""",
    94: """
select count(distinct ws_order_number) order_count,
       sum(ws_ext_ship_cost) total_shipping_cost,
       sum(ws_net_profit) total_net_profit
from web_sales ws1, date_dim, customer_address, web_site
where d_date between date '1999-02-01' and date '1999-04-02'
  and ws1.ws_ship_date_sk = d_date_sk
  and ws1.ws_ship_addr_sk = ca_address_sk
  and ca_state = 'IL'
  and ws1.ws_web_site_sk = web_site_sk
  and web_company_name = 'pri'
  and exists (select 1 from web_sales ws2
              where ws1.ws_order_number = ws2.ws_order_number
                and ws1.ws_warehouse_sk <> ws2.ws_warehouse_sk)
  and not exists (select 1 from web_returns wr1
                  where ws1.ws_order_number = wr1.wr_order_number)
""",
    9: """
select case when (select count(*) from store_sales
                  where ss_quantity between 1 and 20) > 409437
            then (select avg(ss_ext_discount_amt) from store_sales
                  where ss_quantity between 1 and 20)
            else (select avg(ss_net_paid) from store_sales
                  where ss_quantity between 1 and 20) end bucket1,
       case when (select count(*) from store_sales
                  where ss_quantity between 21 and 40) > 4595804
            then (select avg(ss_ext_discount_amt) from store_sales
                  where ss_quantity between 21 and 40)
            else (select avg(ss_net_paid) from store_sales
                  where ss_quantity between 21 and 40) end bucket2,
       case when (select count(*) from store_sales
                  where ss_quantity between 41 and 60) > 7887297
            then (select avg(ss_ext_discount_amt) from store_sales
                  where ss_quantity between 41 and 60)
            else (select avg(ss_net_paid) from store_sales
                  where ss_quantity between 41 and 60) end bucket3
from reason
where r_reason_sk = 1
""",
    32: """
select sum(cs_ext_discount_amt) excess_discount_amount
from catalog_sales, item, date_dim
where i_manufact_id = 977
  and i_item_sk = cs_item_sk
  and d_date between date '2000-01-27' and date '2000-04-26'
  and d_date_sk = cs_sold_date_sk
  and cs_ext_discount_amt > (
    select 1.3 * avg(cs_ext_discount_amt)
    from catalog_sales, date_dim
    where cs_item_sk = i_item_sk
      and d_date between date '2000-01-27' and date '2000-04-26'
      and d_date_sk = cs_sold_date_sk)
limit 100
""",
    36: """
select gross_margin, i_category, i_class, lochierarchy, rank_within_parent
from (select cast(sum(ss_net_profit) as double)
             / cast(sum(ss_ext_sales_price) as double) gross_margin,
             i_category, i_class,
             grouping(i_category) + grouping(i_class) lochierarchy,
             rank() over (
               partition by grouping(i_category) + grouping(i_class),
                            case when grouping(i_class) = 0
                                 then i_category end
               order by cast(sum(ss_net_profit) as double)
                        / cast(sum(ss_ext_sales_price) as double) asc)
               rank_within_parent
      from store_sales, date_dim, item, store
      where d_year = 2001
        and d_date_sk = ss_sold_date_sk
        and i_item_sk = ss_item_sk
        and s_store_sk = ss_store_sk
        and s_state in ('TN', 'KY')
      group by rollup(i_category, i_class)) t
order by lochierarchy desc, rank_within_parent
limit 100
""",
    44: """
select asceding.rnk, i1.i_product_name best_performing,
       i2.i_product_name worst_performing
from (select v1.item_sk, rank() over (order by v1.rank_col asc) rnk
      from (select ss_item_sk item_sk, avg(ss_net_profit) rank_col
            from store_sales
            where ss_store_sk = 4
            group by ss_item_sk
            having avg(ss_net_profit) > 0.9 * (
              select avg(ss_net_profit) rank_col from store_sales
              where ss_store_sk = 4 and ss_hdemo_sk is null)) v1) asceding,
     (select v2.item_sk, rank() over (order by v2.rank_col desc) rnk
      from (select ss_item_sk item_sk, avg(ss_net_profit) rank_col
            from store_sales
            where ss_store_sk = 4
            group by ss_item_sk
            having avg(ss_net_profit) > 0.9 * (
              select avg(ss_net_profit) rank_col from store_sales
              where ss_store_sk = 4 and ss_hdemo_sk is null)) v2) descending,
     item i1, item i2
where asceding.rnk = descending.rnk
  and i1.i_item_sk = asceding.item_sk
  and i2.i_item_sk = descending.item_sk
  and asceding.rnk < 11
order by asceding.rnk
limit 100
""",
    58: """
with ss_items as (
  select i_item_id item_id, sum(ss_ext_sales_price) ss_item_rev
  from store_sales, item, date_dim
  where ss_item_sk = i_item_sk
    and d_date in (select d_date from date_dim
                   where d_week_seq = (select d_week_seq from date_dim
                                       where d_date = date '2000-01-03'))
    and ss_sold_date_sk = d_date_sk
  group by i_item_id),
 cs_items as (
  select i_item_id item_id, sum(cs_ext_sales_price) cs_item_rev
  from catalog_sales, item, date_dim
  where cs_item_sk = i_item_sk
    and d_date in (select d_date from date_dim
                   where d_week_seq = (select d_week_seq from date_dim
                                       where d_date = date '2000-01-03'))
    and cs_sold_date_sk = d_date_sk
  group by i_item_id),
 ws_items as (
  select i_item_id item_id, sum(ws_ext_sales_price) ws_item_rev
  from web_sales, item, date_dim
  where ws_item_sk = i_item_sk
    and d_date in (select d_date from date_dim
                   where d_week_seq = (select d_week_seq from date_dim
                                       where d_date = date '2000-01-03'))
    and ws_sold_date_sk = d_date_sk
  group by i_item_id)
select ss_items.item_id, ss_item_rev,
       cs_item_rev, ws_item_rev
from ss_items, cs_items, ws_items
where ss_items.item_id = cs_items.item_id
  and ss_items.item_id = ws_items.item_id
  and ss_item_rev between 0.9 * cs_item_rev and 1.1 * cs_item_rev
  and ss_item_rev between 0.9 * ws_item_rev and 1.1 * ws_item_rev
order by ss_items.item_id, ss_item_rev
limit 100
""",
    84: """
select c_customer_id customer_id,
       c_last_name || ', ' || c_first_name customername
from customer, customer_address, customer_demographics,
     household_demographics, income_band, store_returns
where ca_city = 'Edgewood'
  and c_current_addr_sk = ca_address_sk
  and ib_lower_bound >= 38128
  and ib_upper_bound <= 38128 + 50000
  and ib_income_band_sk = hd_income_band_sk
  and cd_demo_sk = c_current_cdemo_sk
  and hd_demo_sk = c_current_hdemo_sk
  and sr_cdemo_sk = cd_demo_sk
order by c_customer_id
limit 100
""",
    90: """
select cast(amc as double) / cast(pmc as double) am_pm_ratio
from (select count(*) amc from web_sales, household_demographics,
             time_dim, web_page
      where ws_sold_time_sk = time_dim.t_time_sk
        and ws_ship_hdemo_sk = household_demographics.hd_demo_sk
        and ws_web_page_sk = web_page.wp_web_page_sk
        and t_hour between 8 and 9
        and household_demographics.hd_dep_count = 6
        and web_page.wp_char_count between 5000 and 5200) at1,
     (select count(*) pmc from web_sales, household_demographics,
             time_dim, web_page
      where ws_sold_time_sk = time_dim.t_time_sk
        and ws_ship_hdemo_sk = household_demographics.hd_demo_sk
        and ws_web_page_sk = web_page.wp_web_page_sk
        and t_hour between 19 and 20
        and household_demographics.hd_dep_count = 6
        and web_page.wp_char_count between 5000 and 5200) pt
order by am_pm_ratio
limit 100
""",
    91: """
select cc_call_center_id call_center, cc_name call_center_name,
       cc_manager manager, sum(cr_net_loss) returns_loss
from call_center, catalog_returns, date_dim, customer,
     customer_address, customer_demographics, household_demographics
where cr_call_center_sk = cc_call_center_sk
  and cr_returned_date_sk = d_date_sk
  and cr_returning_customer_sk = c_customer_sk
  and cd_demo_sk = c_current_cdemo_sk
  and hd_demo_sk = c_current_hdemo_sk
  and ca_address_sk = c_current_addr_sk
  and d_year = 1998 and d_moy = 11
  and ((cd_marital_status = 'M' and cd_education_status = 'Unknown')
       or (cd_marital_status = 'W'
           and cd_education_status = 'Advanced Degree'))
  and hd_buy_potential like 'Unknown%'
  and ca_gmt_offset = -7
group by cc_call_center_id, cc_name, cc_manager,
         cd_marital_status, cd_education_status
order by returns_loss desc
""",
    95: """
with ws_wh as (
  select ws1.ws_order_number
  from web_sales ws1, web_sales ws2
  where ws1.ws_order_number = ws2.ws_order_number
    and ws1.ws_warehouse_sk <> ws2.ws_warehouse_sk)
select count(distinct ws_order_number) order_count,
       sum(ws_ext_ship_cost) total_shipping_cost,
       sum(ws_net_profit) total_net_profit
from web_sales ws1, date_dim, customer_address, web_site
where d_date between date '1999-02-01' and date '1999-04-02'
  and ws1.ws_ship_date_sk = d_date_sk
  and ws1.ws_ship_addr_sk = ca_address_sk
  and ca_state = 'IL'
  and ws1.ws_web_site_sk = web_site_sk
  and web_company_name = 'pri'
  and ws1.ws_order_number in (select ws_order_number from ws_wh)
  and ws1.ws_order_number in (select wr_order_number
                              from web_returns, ws_wh
                              where wr_order_number = ws_wh.ws_order_number)
""",
}

# queries whose outputs include float-producing aggregates (avg, ratios):
# the differential test compares those columns with a tolerance instead
# of exactly (engine = exact decimal, SQLite = float)
FUZZY = {7, 13, 26, 65, 12, 20, 27, 28, 98, 47, 53, 57, 61, 63, 89, 92, 9, 32, 36, 44, 90}
