"""Deterministic dsdgen-lite: a seeded, FK-consistent miniature of the
TPC-DS retail schema (~sf0.01) so the reference's ACTUAL TPC-DS query
texts can run in-repo.

The reference's batch gate executes the real TPC-DS queries against
store_sales/catalog_sales/web_sales + dims
(flink-end-to-end-tests/flink-tpcds-test/src/main/java/.../
TpcdsTestProgram.java:76-85, queries under tpcds-tool/query/). This
generator produces the 14 tables those queries touch, with value
distributions tuned so every target query returns a non-empty result:

- item manufact/manager ids cycle through the ranges q3/q19/q42/q55
  filter on (128, 8, 1, 28);
- "hot" items x "hot" days give q23a its >4-sales-per-item-day
  frequent-item groups;
- ticket sizes include a forced 15..20-line stratum for q34's
  cnt BETWEEN 15 AND 20;
- catalog/web bill customers are biased into a 3 000-customer core so
  q4's three-channel year-over-year join has support;
- inventory is weekly through 1999 (q72's d_week_seq match) and
  4-weekly elsewhere.

Money columns are decimal(p,2) parquet — the real schema's type — via
integer cents, so Spark and DuckDB both compute exact sums.

Everything derives from one numpy PCG64 seed: re-running produces
byte-identical tables.
"""

from __future__ import annotations

import datetime as dt
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 20260814
BASE_DATE_SK = 2450815  # TPC-DS julian-style anchor for 1998-01-01
FIRST_DAY = dt.date(1998, 1, 1)
LAST_DAY = dt.date(2003, 12, 31)
N_ITEM = 2000
N_CUST = 10_000
N_ADDR = 5000
N_CDEMO = 1400
N_HDEMO = 720
N_STORE = 12
N_WAREHOUSE = 4
N_PROMO = 300
CORE_CUSTOMERS = 3000  # dense multi-channel segment (q4)
HOT_ITEMS = 50
SS_TICKETS = 45_000
CS_ORDERS = 26_000
WS_ORDERS = 20_000


def _dec(cents: np.ndarray, prec: int = 12, scale: int = 2) -> pa.Array:
    """int64 cents -> decimal128(prec,2) exactly."""
    return pa.array(
        [f"{c // 100}.{c % 100:02d}" for c in cents], type=pa.string()
    ).cast(pa.decimal128(prec, scale))


def _date_dim() -> pa.Table:
    n = (LAST_DAY - FIRST_DAY).days + 1
    days = [FIRST_DAY + dt.timedelta(days=int(i)) for i in range(n)]
    dow_names = [
        "Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
        "Saturday", "Sunday",
    ]
    w0 = FIRST_DAY.weekday()  # 3 (Thursday)
    return pa.table(
        {
            "d_date_sk": pa.array(
                [BASE_DATE_SK + i for i in range(n)], pa.int64()
            ),
            "d_date_id": pa.array([f"AAAAAAAA{BASE_DATE_SK + i:08d}" for i in range(n)]),
            "d_date": pa.array(days, pa.date32()),
            "d_year": pa.array([d.year for d in days], pa.int32()),
            "d_moy": pa.array([d.month for d in days], pa.int32()),
            "d_dom": pa.array([d.day for d in days], pa.int32()),
            "d_dow": pa.array([d.weekday() for d in days], pa.int32()),
            "d_qoy": pa.array([(d.month - 1) // 3 + 1 for d in days], pa.int32()),
            "d_week_seq": pa.array(
                [5270 + (i + w0) // 7 for i in range(n)], pa.int32()
            ),
            "d_month_seq": pa.array(
                [1176 + (d.year - 1998) * 12 + d.month - 1 for d in days],
                pa.int32(),
            ),
            "d_day_name": pa.array([dow_names[d.weekday()] for d in days]),
        }
    )


_CATEGORIES = [
    "Books", "Children", "Electronics", "Home", "Jewelry",
    "Men", "Music", "Shoes", "Sports", "Women",
]
_COLORS = ["red", "blue", "green", "ivory", "plum", "khaki", "salmon", "navy"]
_UNITS = ["Each", "Dozen", "Case", "Pound", "Ounce", "Pallet"]
_DESC_WORDS = (
    "quick brown premium classic deluxe rustic modern compact sturdy "
    "elegant woven brushed polished matte glossy heavy light portable "
    "durable handy ergonomic stylish vintage artisanal refined"
).split()


def _item(rng: np.random.Generator) -> pa.Table:
    sk = np.arange(1, N_ITEM + 1)
    brand_id = 1001001 + (sk * 31) % 1000
    manufact_id = 1 + (sk * 7) % 200
    manager_id = 1 + (sk * 11) % 40
    class_id = 1 + (sk * 7) % 50
    category_id = 1 + sk % 10
    desc = [
        " ".join(
            _DESC_WORDS[(s * 13 + j * 7) % len(_DESC_WORDS)] for j in range(8)
        )
        + f" item {s}"
        for s in sk
    ]
    return pa.table(
        {
            "i_item_sk": pa.array(sk, pa.int64()),
            "i_item_id": pa.array([f"AAAAAAAA{s:08d}" for s in sk]),
            "i_item_desc": pa.array(desc),
            "i_current_price": _dec(rng.integers(99, 29999, N_ITEM), 7),
            "i_brand_id": pa.array(brand_id, pa.int32()),
            "i_brand": pa.array([f"Brand#{b % 1000:03d}" for b in brand_id]),
            "i_class_id": pa.array(class_id, pa.int32()),
            "i_class": pa.array([f"class{c:02d}" for c in class_id]),
            "i_category_id": pa.array(category_id, pa.int32()),
            "i_category": pa.array([_CATEGORIES[c - 1] for c in category_id]),
            "i_manufact_id": pa.array(manufact_id, pa.int32()),
            "i_manufact": pa.array([f"Manufact#{m:03d}" for m in manufact_id]),
            "i_manager_id": pa.array(manager_id, pa.int32()),
            "i_color": pa.array([_COLORS[s % len(_COLORS)] for s in sk]),
            "i_size": pa.array(
                [["small", "medium", "large", "extra large"][s % 4] for s in sk]
            ),
            "i_units": pa.array([_UNITS[s % len(_UNITS)] for s in sk]),
        }
    )


_FIRST = [
    "James", "Mary", "Robert", "Patricia", "John", "Jennifer", "Michael",
    "Linda", "David", "Elizabeth", "William", "Barbara", "Richard", "Susan",
    "Joseph", "Jessica", "Thomas", "Sarah", "Charles", "Karen", "Noah",
    "Emma", "Liam", "Olivia", "Ava", "Lucas", "Mia", "Ethan", "Amelia",
]
_LAST = [
    "Smith", "Johnson", "Williams", "Brown", "Jones", "Garcia", "Miller",
    "Davis", "Rodriguez", "Martinez", "Hernandez", "Lopez", "Gonzalez",
    "Wilson", "Anderson", "Thomas", "Taylor", "Moore", "Jackson", "Martin",
    "Lee", "Perez", "Thompson", "White", "Harris", "Sanchez", "Clark",
]
_COUNTRIES = [
    "United States", "Canada", "Mexico", "Brazil", "Germany", "France",
    "Japan", "India", "Australia", "Kenya", "Spain", "Italy",
]
_SALUTATIONS = ["Mr.", "Mrs.", "Ms.", "Dr.", "Miss", "Sir"]


def _customer(rng: np.random.Generator) -> pa.Table:
    sk = np.arange(1, N_CUST + 1)
    addr = rng.integers(1, N_ADDR + 1, N_CUST)
    return pa.table(
        {
            "c_customer_sk": pa.array(sk, pa.int64()),
            "c_customer_id": pa.array([f"AAAAAAAA{s:08d}" for s in sk]),
            "c_current_addr_sk": pa.array(addr, pa.int64()),
            "c_current_cdemo_sk": pa.array(
                1 + (sk * 17) % N_CDEMO, pa.int64()
            ),
            "c_current_hdemo_sk": pa.array(
                1 + (sk * 13) % N_HDEMO, pa.int64()
            ),
            "c_salutation": pa.array(
                [_SALUTATIONS[s % len(_SALUTATIONS)] for s in sk]
            ),
            "c_first_name": pa.array([_FIRST[s % len(_FIRST)] for s in sk]),
            "c_last_name": pa.array(
                [_LAST[(s * 7) % len(_LAST)] for s in sk]
            ),
            "c_preferred_cust_flag": pa.array(
                ["Y" if s % 3 else "N" for s in sk]
            ),
            "c_birth_month": pa.array(1 + sk % 12, pa.int32()),
            "c_birth_year": pa.array(1930 + sk % 63, pa.int32()),
            "c_birth_country": pa.array(
                [_COUNTRIES[(s * 5) % len(_COUNTRIES)] for s in sk]
            ),
            "c_login": pa.array([f"user{s}" for s in sk]),
            "c_email_address": pa.array(
                [f"user{s}@example.org" for s in sk]
            ),
        }
    )


_CITIES = [
    "Fairview", "Midway", "Pleasant Hill", "Oak Grove", "Centerville",
    "Union", "Salem", "Liberty", "Greenville", "Franklin", "Springfield",
    "Clinton", "Marion", "Georgetown", "Ashland", "Riverside", "Oakland",
    "Bethel", "Glendale", "Lakeview", "Shiloh", "Antioch", "Concord",
    "Florence", "Kingston", "Milan", "Newport", "Oxford", "Dover", "Arlington",
]
_COUNTIES = [
    "Williamson County", "Franklin Parish", "Bronx County", "Orange County",
    "Walker County", "Daviess County", "Ziebach County", "Luce County",
]
_STATES = [
    "TN", "TX", "OH", "GA", "IN", "KY", "NC", "VA", "AL", "MO",
    "IL", "KS", "IA", "NE", "SD",
]


def _zips(rng: np.random.Generator, n: int) -> list[str]:
    pool = [f"{z:05d}" for z in rng.integers(10000, 99999, 80)]
    return [pool[int(i)] for i in rng.integers(0, len(pool), n)]


def _customer_address(rng: np.random.Generator) -> pa.Table:
    sk = np.arange(1, N_ADDR + 1)
    return pa.table(
        {
            "ca_address_sk": pa.array(sk, pa.int64()),
            "ca_address_id": pa.array([f"AAAAAAAA{s:08d}" for s in sk]),
            "ca_street_number": pa.array(
                [str(100 + s % 900) for s in sk]
            ),
            "ca_street_name": pa.array(
                [f"{_LAST[s % len(_LAST)]} Street" for s in sk]
            ),
            "ca_city": pa.array([_CITIES[(s * 3) % len(_CITIES)] for s in sk]),
            "ca_county": pa.array(
                [_COUNTIES[(s * 5) % len(_COUNTIES)] for s in sk]
            ),
            "ca_state": pa.array([_STATES[(s * 7) % len(_STATES)] for s in sk]),
            "ca_zip": pa.array(_zips(rng, N_ADDR)),
            "ca_country": pa.array(["United States"] * N_ADDR),
            "ca_gmt_offset": _dec(
                np.array([[-500, -600, -700, -800][s % 4] for s in sk]), 5
            ),
        }
    )


def _customer_demographics() -> pa.Table:
    k = np.arange(N_CDEMO)
    genders = ["M", "F"]
    maritals = ["M", "S", "D", "W", "U"]
    educations = [
        "Primary", "Secondary", "College", "2 yr Degree", "4 yr Degree",
        "Advanced Degree", "Unknown",
    ]
    ratings = ["Good", "Low Risk", "High Risk", "Unknown"]
    return pa.table(
        {
            "cd_demo_sk": pa.array(k + 1, pa.int64()),
            "cd_gender": pa.array([genders[i % 2] for i in k]),
            "cd_marital_status": pa.array([maritals[(i // 2) % 5] for i in k]),
            "cd_education_status": pa.array(
                [educations[(i // 10) % 7] for i in k]
            ),
            "cd_purchase_estimate": pa.array(
                500 * (1 + (k // 70) % 20), pa.int32()
            ),
            "cd_credit_rating": pa.array([ratings[(i // 70) % 4] for i in k]),
            "cd_dep_count": pa.array(k % 7, pa.int32()),
            "cd_dep_employed_count": pa.array((k // 7) % 7, pa.int32()),
            "cd_dep_college_count": pa.array((k // 49) % 7, pa.int32()),
        }
    )


def _household_demographics() -> pa.Table:
    k = np.arange(N_HDEMO)
    pots = ["0-500", "501-1000", "1001-5000", "5001-10000", ">10000", "Unknown"]
    return pa.table(
        {
            "hd_demo_sk": pa.array(k + 1, pa.int64()),
            "hd_income_band_sk": pa.array(1 + k % 20, pa.int64()),
            "hd_buy_potential": pa.array([pots[i % 6] for i in k]),
            "hd_dep_count": pa.array(k % 10, pa.int32()),
            "hd_vehicle_count": pa.array(k % 5, pa.int32()),
        }
    )


def _store(rng: np.random.Generator) -> pa.Table:
    sk = np.arange(1, N_STORE + 1)
    return pa.table(
        {
            "s_store_sk": pa.array(sk, pa.int64()),
            "s_store_id": pa.array([f"AAAAAAAA{s:08d}" for s in sk]),
            "s_store_name": pa.array(
                ["ought", "able", "pri", "ese", "anti", "cally", "ation",
                 "eing", "n st", "bar", "ought", "able"][: N_STORE]
            ),
            "s_number_employees": pa.array(200 + sk * 7 % 100, pa.int32()),
            "s_city": pa.array([_CITIES[s % 8] for s in sk]),
            "s_county": pa.array([_COUNTIES[s % 6] for s in sk]),
            "s_state": pa.array([_STATES[s % 6] for s in sk]),
            "s_zip": pa.array(_zips(rng, N_STORE)),
            "s_gmt_offset": _dec(np.full(N_STORE, -500), 5),
        }
    )


def _warehouse(rng: np.random.Generator) -> pa.Table:
    sk = np.arange(1, N_WAREHOUSE + 1)
    return pa.table(
        {
            "w_warehouse_sk": pa.array(sk, pa.int64()),
            "w_warehouse_id": pa.array([f"AAAAAAAA{s:08d}" for s in sk]),
            "w_warehouse_name": pa.array(
                ["Conventional childr", "Important issues liv",
                 "Doors canno", "Bad cards must make."][: N_WAREHOUSE]
            ),
            "w_warehouse_sq_ft": pa.array(
                rng.integers(50_000, 1_000_000, N_WAREHOUSE), pa.int32()
            ),
            "w_city": pa.array([_CITIES[s % len(_CITIES)] for s in sk]),
            "w_state": pa.array([_STATES[s % len(_STATES)] for s in sk]),
        }
    )


def _promotion(rng: np.random.Generator) -> pa.Table:
    sk = np.arange(1, N_PROMO + 1)
    yn = lambda arr: ["N" if v else "Y" for v in arr]  # noqa: E731
    return pa.table(
        {
            "p_promo_sk": pa.array(sk, pa.int64()),
            "p_promo_id": pa.array([f"AAAAAAAA{s:08d}" for s in sk]),
            "p_promo_name": pa.array(
                [["anti", "ought", "bar", "ese", "eing"][s % 5] for s in sk]
            ),
            "p_channel_dmail": pa.array(yn(rng.random(N_PROMO) < 0.7)),
            "p_channel_email": pa.array(yn(rng.random(N_PROMO) < 0.7)),
            "p_channel_event": pa.array(yn(rng.random(N_PROMO) < 0.7)),
            "p_channel_tv": pa.array(yn(rng.random(N_PROMO) < 0.7)),
            "p_discount_active": pa.array(
                [["Y", "N"][s % 2] for s in sk]
            ),
        }
    )


# --------------------------------------------------------------------------
# fact-table machinery
# --------------------------------------------------------------------------


def _day_weights(days: list[dt.date], rng: np.random.Generator) -> np.ndarray:
    """Sampling weight per day index: sales live in 1998-2002 (ship dates
    spill into 2003), 1999-2002 is denser, and a deterministic set of
    'hot days' (incl. Feb 2000 for q23a) is much denser."""
    w = np.array(
        [1.0 if d.year <= 2002 else 0.0 for d in days], dtype=np.float64
    )
    for i, d in enumerate(days):
        if 1999 <= d.year <= 2002:
            w[i] = 3.0
    hot = [
        i
        for i, d in enumerate(days)
        if (d.year == 2000 and d.month == 2 and d.day % 2 == 0)
        or (d.year in (2000, 2001) and d.day == 11)
        or (d.year in (1998, 1999, 2000, 2001) and d.month == 11 and d.day % 3 == 0)
    ]
    w[hot] *= 12.0
    return w / w.sum()


def _pick_items(rng: np.random.Generator, n: int, hot_frac: float) -> np.ndarray:
    hot = rng.random(n) < hot_frac
    out = rng.integers(1, N_ITEM + 1, n)
    out[hot] = rng.integers(1, HOT_ITEMS + 1, hot.sum())
    return out


def _money(rng: np.random.Generator, qty: np.ndarray):
    """Per-line money columns, all integer cents."""
    n = len(qty)
    wholesale = rng.integers(100, 10_000, n)  # 1.00 .. 100.00
    list_p = (wholesale * rng.integers(120, 250, n)) // 100
    sales_p = (list_p * rng.integers(30, 101, n)) // 100
    ext_list = list_p * qty
    ext_sales = sales_p * qty
    ext_wholesale = wholesale * qty
    ext_discount = ext_list - ext_sales
    ext_tax = (ext_sales * rng.integers(0, 10, n)) // 100
    coupon = np.where(rng.random(n) < 0.12, ext_sales // 10, 0)
    return wholesale, list_p, sales_p, ext_list, ext_sales, ext_wholesale, \
        ext_discount, ext_tax, coupon


def _store_sales(rng: np.random.Generator, days, dayw) -> pa.Table:
    sizes = np.minimum(rng.geometric(0.25, SS_TICKETS), 22)
    # forced stratum: q34 needs tickets with 15..20 matching lines
    sizes[::40] = 15 + (np.arange(SS_TICKETS)[::40] // 40) % 6
    n = int(sizes.sum())
    t_day = rng.choice(len(days), SS_TICKETS, p=dayw)
    t_store = rng.integers(1, N_STORE + 1, SS_TICKETS)
    t_cust = rng.integers(1, N_CUST + 1, SS_TICKETS)
    core = rng.random(SS_TICKETS) < 0.6
    t_cust[core] = rng.integers(1, CORE_CUSTOMERS + 1, core.sum())
    t_hdemo = rng.integers(1, N_HDEMO + 1, SS_TICKETS)
    t_cdemo = rng.integers(1, N_CDEMO + 1, SS_TICKETS)
    t_addr = rng.integers(1, N_ADDR + 1, SS_TICKETS)
    # "cluster" tickets buy mostly hot items (q23a frequent-item support)
    t_cluster = rng.random(SS_TICKETS) < 0.3

    rep = np.repeat(np.arange(SS_TICKETS), sizes)
    qty = rng.integers(1, 101, n)
    item = _pick_items(rng, n, 0.12)
    cl = t_cluster[rep]
    item[cl] = _pick_items(rng, int(cl.sum()), 0.8)
    wholesale, list_p, sales_p, ext_list, ext_sales, ext_wholesale, \
        ext_discount, ext_tax, coupon = _money(rng, qty)
    promo = rng.integers(1, N_PROMO + 1, n)
    promo_null = rng.random(n) < 0.5
    net_paid = ext_sales - coupon
    return pa.table(
        {
            "ss_sold_date_sk": pa.array(BASE_DATE_SK + t_day[rep], pa.int64()),
            "ss_item_sk": pa.array(item, pa.int64()),
            "ss_customer_sk": pa.array(t_cust[rep], pa.int64()),
            "ss_cdemo_sk": pa.array(t_cdemo[rep], pa.int64()),
            "ss_hdemo_sk": pa.array(t_hdemo[rep], pa.int64()),
            "ss_addr_sk": pa.array(t_addr[rep], pa.int64()),
            "ss_store_sk": pa.array(t_store[rep], pa.int64()),
            "ss_promo_sk": pa.array(
                np.where(promo_null, 0, promo), pa.int64(), mask=promo_null
            ),
            "ss_ticket_number": pa.array(rep + 1, pa.int64()),
            "ss_quantity": pa.array(qty, pa.int32()),
            "ss_wholesale_cost": _dec(wholesale, 7),
            "ss_list_price": _dec(list_p, 7),
            "ss_sales_price": _dec(sales_p, 7),
            "ss_ext_discount_amt": _dec(ext_discount, 9),
            "ss_ext_sales_price": _dec(ext_sales, 9),
            "ss_ext_wholesale_cost": _dec(ext_wholesale, 9),
            "ss_ext_list_price": _dec(ext_list, 9),
            "ss_ext_tax": _dec(ext_tax, 9),
            "ss_coupon_amt": _dec(coupon, 9),
            "ss_net_paid": _dec(net_paid, 9),
            "ss_net_profit": _dec(net_paid - ext_wholesale + 0, 9),
        }
    )


def _catalog_sales(rng: np.random.Generator, days, dayw) -> pa.Table:
    sizes = np.minimum(rng.geometric(0.28, CS_ORDERS), 14)
    n = int(sizes.sum())
    o_day = rng.choice(len(days), CS_ORDERS, p=dayw)
    o_cust = rng.integers(1, N_CUST + 1, CS_ORDERS)
    core = rng.random(CS_ORDERS) < 0.7
    o_cust[core] = rng.integers(1, CORE_CUSTOMERS + 1, core.sum())
    o_cdemo = rng.integers(1, N_CDEMO + 1, CS_ORDERS)
    o_hdemo = rng.integers(1, N_HDEMO + 1, CS_ORDERS)
    o_addr = rng.integers(1, N_ADDR + 1, CS_ORDERS)
    rep = np.repeat(np.arange(CS_ORDERS), sizes)
    ship_delta = rng.integers(2, 36, n)
    qty = rng.integers(1, 101, n)
    item = _pick_items(rng, n, 0.15)
    wholesale, list_p, sales_p, ext_list, ext_sales, ext_wholesale, \
        ext_discount, ext_tax, coupon = _money(rng, qty)
    promo = rng.integers(1, N_PROMO + 1, n)
    promo_null = rng.random(n) < 0.5
    ship_cost = (ext_sales * rng.integers(2, 9, n)) // 100
    return pa.table(
        {
            "cs_sold_date_sk": pa.array(BASE_DATE_SK + o_day[rep], pa.int64()),
            "cs_ship_date_sk": pa.array(
                BASE_DATE_SK + o_day[rep] + ship_delta, pa.int64()
            ),
            "cs_bill_customer_sk": pa.array(o_cust[rep], pa.int64()),
            "cs_bill_cdemo_sk": pa.array(o_cdemo[rep], pa.int64()),
            "cs_bill_hdemo_sk": pa.array(o_hdemo[rep], pa.int64()),
            "cs_bill_addr_sk": pa.array(o_addr[rep], pa.int64()),
            "cs_ship_customer_sk": pa.array(o_cust[rep], pa.int64()),
            "cs_ship_addr_sk": pa.array(o_addr[rep], pa.int64()),
            "cs_warehouse_sk": pa.array(
                rng.integers(1, N_WAREHOUSE + 1, n), pa.int64()
            ),
            "cs_item_sk": pa.array(item, pa.int64()),
            "cs_promo_sk": pa.array(
                np.where(promo_null, 0, promo), pa.int64(), mask=promo_null
            ),
            "cs_order_number": pa.array(rep + 1, pa.int64()),
            "cs_quantity": pa.array(qty, pa.int32()),
            "cs_wholesale_cost": _dec(wholesale, 7),
            "cs_list_price": _dec(list_p, 7),
            "cs_sales_price": _dec(sales_p, 7),
            "cs_ext_discount_amt": _dec(ext_discount, 9),
            "cs_ext_sales_price": _dec(ext_sales, 9),
            "cs_ext_wholesale_cost": _dec(ext_wholesale, 9),
            "cs_ext_list_price": _dec(ext_list, 9),
            "cs_ext_tax": _dec(ext_tax, 9),
            "cs_coupon_amt": _dec(coupon, 9),
            "cs_ext_ship_cost": _dec(ship_cost, 9),
            "cs_net_paid": _dec(ext_sales - coupon, 9),
            "cs_net_profit": _dec(ext_sales - coupon - ext_wholesale, 9),
        }
    )


def _web_sales(rng: np.random.Generator, days, dayw) -> pa.Table:
    sizes = np.minimum(rng.geometric(0.35, WS_ORDERS), 12)
    n = int(sizes.sum())
    o_day = rng.choice(len(days), WS_ORDERS, p=dayw)
    o_cust = rng.integers(1, N_CUST + 1, WS_ORDERS)
    core = rng.random(WS_ORDERS) < 0.7
    o_cust[core] = rng.integers(1, CORE_CUSTOMERS + 1, core.sum())
    o_addr = rng.integers(1, N_ADDR + 1, WS_ORDERS)
    rep = np.repeat(np.arange(WS_ORDERS), sizes)
    ship_delta = rng.integers(1, 30, n)
    qty = rng.integers(1, 101, n)
    item = _pick_items(rng, n, 0.15)
    wholesale, list_p, sales_p, ext_list, ext_sales, ext_wholesale, \
        ext_discount, ext_tax, coupon = _money(rng, qty)
    return pa.table(
        {
            "ws_sold_date_sk": pa.array(BASE_DATE_SK + o_day[rep], pa.int64()),
            "ws_ship_date_sk": pa.array(
                BASE_DATE_SK + o_day[rep] + ship_delta, pa.int64()
            ),
            "ws_item_sk": pa.array(item, pa.int64()),
            "ws_bill_customer_sk": pa.array(o_cust[rep], pa.int64()),
            "ws_bill_addr_sk": pa.array(o_addr[rep], pa.int64()),
            "ws_ship_customer_sk": pa.array(o_cust[rep], pa.int64()),
            "ws_ship_addr_sk": pa.array(o_addr[rep], pa.int64()),
            "ws_web_site_sk": pa.array(rng.integers(1, 4, n), pa.int64()),
            "ws_warehouse_sk": pa.array(
                rng.integers(1, N_WAREHOUSE + 1, n), pa.int64()
            ),
            "ws_order_number": pa.array(rep + 1, pa.int64()),
            "ws_quantity": pa.array(qty, pa.int32()),
            "ws_wholesale_cost": _dec(wholesale, 7),
            "ws_list_price": _dec(list_p, 7),
            "ws_sales_price": _dec(sales_p, 7),
            "ws_ext_discount_amt": _dec(ext_discount, 9),
            "ws_ext_sales_price": _dec(ext_sales, 9),
            "ws_ext_wholesale_cost": _dec(ext_wholesale, 9),
            "ws_ext_list_price": _dec(ext_list, 9),
            "ws_ext_tax": _dec(ext_tax, 9),
            "ws_coupon_amt": _dec(coupon, 9),
            "ws_net_paid": _dec(ext_sales - coupon, 9),
            "ws_net_profit": _dec(ext_sales - coupon - ext_wholesale, 9),
        }
    )


def _catalog_returns(rng: np.random.Generator, cs: pa.Table) -> pa.Table:
    n = cs.num_rows
    keep = rng.random(n) < 0.08
    item = cs["cs_item_sk"].to_numpy()[keep]
    order = cs["cs_order_number"].to_numpy()[keep]
    qty = cs["cs_quantity"].to_numpy()[keep]
    ship = cs["cs_ship_date_sk"].to_numpy()[keep]
    m = int(keep.sum())
    ret_qty = 1 + rng.integers(0, qty)
    amount = rng.integers(100, 20_000, m)
    return pa.table(
        {
            "cr_returned_date_sk": pa.array(
                ship + rng.integers(1, 30, m), pa.int64()
            ),
            "cr_item_sk": pa.array(item, pa.int64()),
            "cr_order_number": pa.array(order, pa.int64()),
            "cr_return_quantity": pa.array(ret_qty, pa.int32()),
            "cr_return_amount": _dec(amount, 9),
            "cr_returning_customer_sk": pa.array(
                rng.integers(1, N_CUST + 1, m), pa.int64()
            ),
        }
    )


def _inventory(rng: np.random.Generator, days) -> pa.Table:
    """Weekly snapshots through 1999 (q72 needs a same-week inventory row
    for every 1999 catalog sale), 4-weekly otherwise."""
    mondays = [
        i
        for i, d in enumerate(days)
        if d.weekday() == 0
        and (d.year == 1999 or (i // 7) % 4 == 0)
        and d.year <= 2002
    ]
    n = len(mondays) * N_ITEM * N_WAREHOUSE
    date_idx = np.repeat(np.array(mondays), N_ITEM * N_WAREHOUSE)
    item = np.tile(np.repeat(np.arange(1, N_ITEM + 1), N_WAREHOUSE), len(mondays))
    wh = np.tile(np.arange(1, N_WAREHOUSE + 1), len(mondays) * N_ITEM)
    return pa.table(
        {
            "inv_date_sk": pa.array(BASE_DATE_SK + date_idx, pa.int64()),
            "inv_item_sk": pa.array(item, pa.int64()),
            "inv_warehouse_sk": pa.array(wh, pa.int64()),
            "inv_quantity_on_hand": pa.array(
                rng.integers(0, 151, n), pa.int32()
            ),
        }
    )


def generate(outdir: str) -> None:
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(SEED)
    days = [
        FIRST_DAY + dt.timedelta(days=int(i))
        for i in range((LAST_DAY - FIRST_DAY).days + 1)
    ]
    dayw = _day_weights(days, rng)
    tables = {
        "date_dim": _date_dim(),
        "item": _item(rng),
        "customer": _customer(rng),
        "customer_address": _customer_address(rng),
        "customer_demographics": _customer_demographics(),
        "household_demographics": _household_demographics(),
        "store": _store(rng),
        "warehouse": _warehouse(rng),
        "promotion": _promotion(rng),
        "store_sales": _store_sales(rng, days, dayw),
        "catalog_sales": _catalog_sales(rng, days, dayw),
        "web_sales": _web_sales(rng, days, dayw),
        "inventory": _inventory(rng, days),
    }
    tables["catalog_returns"] = _catalog_returns(rng, tables["catalog_sales"])
    for name, t in tables.items():
        pq.write_table(t, os.path.join(outdir, f"{name}.parquet"))
        print(f"  {name}: {t.num_rows} rows")


def ensure(outdir: str) -> str:
    """Generate iff missing (cheap presence check: last table written)."""
    if not os.path.exists(os.path.join(outdir, "catalog_returns.parquet")):
        generate(outdir)
    return outdir


if __name__ == "__main__":
    import sys

    generate(sys.argv[1] if len(sys.argv) > 1 else "/root/repo/benchdata/tpcds")
