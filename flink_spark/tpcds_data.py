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

# fact_scale multiplies the FACT table volumes only (dims fixed, same
# formulas and support blocks): generate(dir, fact_scale=15) yields
# ~2.9M store_sales rows — real TPC-DS sf1's fact volume — for perf
# runs, while the default corpus stays the correctness-sized ~sf0.07.
_FACT_SCALE = 1.0


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
    n_tickets = int(SS_TICKETS * _FACT_SCALE)
    sizes = np.minimum(rng.geometric(0.25, n_tickets), 22)
    # forced stratum: q34 needs tickets with 15..20 matching lines
    sizes[::40] = 15 + (np.arange(n_tickets)[::40] // 40) % 6
    n = int(sizes.sum())
    t_day = rng.choice(len(days), n_tickets, p=dayw)
    t_store = rng.integers(1, N_STORE + 1, n_tickets)
    t_cust = rng.integers(1, N_CUST + 1, n_tickets)
    core = rng.random(n_tickets) < 0.6
    t_cust[core] = rng.integers(1, CORE_CUSTOMERS + 1, core.sum())
    t_hdemo = rng.integers(1, N_HDEMO + 1, n_tickets)
    t_cdemo = rng.integers(1, N_CDEMO + 1, n_tickets)
    t_addr = rng.integers(1, N_ADDR + 1, n_tickets)
    # "cluster" tickets buy mostly hot items (q23a frequent-item support)
    t_cluster = rng.random(n_tickets) < 0.3

    rep = np.repeat(np.arange(n_tickets), sizes)
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
    n_orders = int(CS_ORDERS * _FACT_SCALE)
    sizes = np.minimum(rng.geometric(0.28, n_orders), 14)
    n = int(sizes.sum())
    o_day = rng.choice(len(days), n_orders, p=dayw)
    o_cust = rng.integers(1, N_CUST + 1, n_orders)
    core = rng.random(n_orders) < 0.7
    o_cust[core] = rng.integers(1, CORE_CUSTOMERS + 1, core.sum())
    o_cdemo = rng.integers(1, N_CDEMO + 1, n_orders)
    o_hdemo = rng.integers(1, N_HDEMO + 1, n_orders)
    o_addr = rng.integers(1, N_ADDR + 1, n_orders)
    rep = np.repeat(np.arange(n_orders), sizes)
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
    n_orders = int(WS_ORDERS * _FACT_SCALE)
    sizes = np.minimum(rng.geometric(0.35, n_orders), 12)
    n = int(sizes.sum())
    o_day = rng.choice(len(days), n_orders, p=dayw)
    o_cust = rng.integers(1, N_CUST + 1, n_orders)
    core = rng.random(n_orders) < 0.7
    o_cust[core] = rng.integers(1, CORE_CUSTOMERS + 1, core.sum())
    o_addr = rng.integers(1, N_ADDR + 1, n_orders)
    rep = np.repeat(np.arange(n_orders), sizes)
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


# --------------------------------------------------------------------------
# r5 extension: the columns and tables the FULL 103-query set touches.
#
# Existing tables keep their original columns byte-identical (the r4
# queries' data must not move): every new column/table draws from its own
# child rng (default_rng([SEED, tag])), never from the main stream, or is
# derived formulaically from already-materialized arrays.
# --------------------------------------------------------------------------

GENVER = 3  # bump to force corpus regeneration


def _crng(tag: int) -> np.random.Generator:
    return np.random.default_rng([SEED, tag])


_STREET_TYPES = ["Street", "Ave", "Blvd", "Way", "Court", "Lane"]


def _app(t: pa.Table, name: str, arr) -> pa.Table:
    return t.append_column(name, arr)


def _time_sks(tag: int, n: int) -> np.ndarray:
    """Second-of-day keys biased into shopping hours (8h-21h) so the
    t_hour/t_time range predicates (q66 q71 q88 q90 q96) have support."""
    r = _crng(tag)
    return r.integers(8 * 3600, 21 * 3600, n)


def _extend_existing(tables: dict[str, pa.Table]) -> None:
    # -- item: q22/q41/q44/q64/q67 (i_product_name), q65 (i_wholesale_cost)
    it = tables["item"]
    sk = it["i_item_sk"].to_numpy()
    prod = [
        "".join(
            ["ought", "able", "pri", "ese", "anti"][(int(s) // d) % 5]
            for d in (1, 5, 25, 125)
        )
        for s in sk
    ]
    it = _app(it, "i_product_name", pa.array(prod))
    it = _app(it, "i_wholesale_cost", _dec((sk * 37) % 9000 + 100, 7))
    tables["item"] = it

    # -- store: q47/q89 (company name), q50 (street), q24 (market id)
    st = tables["store"]
    ssk = st["s_store_sk"].to_numpy()
    st = _app(st, "s_company_id", pa.array(np.where(ssk % 2 == 1, 1, 2), pa.int32()))
    st = _app(st, "s_company_name", pa.array(["Unknown"] * len(ssk)))
    st = _app(st, "s_market_id", pa.array(1 + (ssk * 3) % 10, pa.int32()))
    st = _app(st, "s_street_number", pa.array([str(100 + int(s) * 13 % 900) for s in ssk]))
    st = _app(st, "s_street_name", pa.array([f"{_LAST[int(s) % len(_LAST)]}" for s in ssk]))
    st = _app(st, "s_street_type", pa.array([_STREET_TYPES[int(s) % len(_STREET_TYPES)] for s in ssk]))
    st = _app(st, "s_suite_number", pa.array([f"Suite {int(s) * 10 % 990}" for s in ssk]))
    tables["store"] = st

    # -- customer: q30/q84 (birth day), q64 (first sales/shipto dates)
    cu = tables["customer"]
    csk = cu["c_customer_sk"].to_numpy()
    n_days = (LAST_DAY - FIRST_DAY).days + 1
    first_sales = BASE_DATE_SK + (csk * 97) % (n_days - 400)
    cu = _app(cu, "c_birth_day", pa.array(1 + csk % 28, pa.int32()))
    cu = _app(cu, "c_first_sales_date_sk", pa.array(first_sales, pa.int64()))
    cu = _app(cu, "c_first_shipto_date_sk", pa.array(first_sales + 30, pa.int64()))
    cu = _app(cu, "c_last_review_date_sk", pa.array(first_sales + 200, pa.int64()))
    tables["customer"] = cu

    # -- customer_address: q81/q85 (street type / suite / location type)
    ca = tables["customer_address"]
    ask = ca["ca_address_sk"].to_numpy()
    ca = _app(ca, "ca_street_type", pa.array([_STREET_TYPES[int(s) * 3 % len(_STREET_TYPES)] for s in ask]))
    ca = _app(ca, "ca_suite_number", pa.array([f"Suite {int(s) * 7 % 990}" for s in ask]))
    ca = _app(ca, "ca_location_type", pa.array([["apartment", "condo", "single family"][int(s) % 3] for s in ask]))
    tables["customer_address"] = ca

    # -- date_dim: q17 (d_quarter_name)
    dd = tables["date_dim"]
    yy = dd["d_year"].to_numpy()
    qq = dd["d_qoy"].to_numpy()
    dd = _app(dd, "d_quarter_name", pa.array([f"{y}Q{q}" for y, q in zip(yy, qq)]))
    tables["date_dim"] = dd

    # -- warehouse: q66 (country/county)
    wh = tables["warehouse"]
    wsk = wh["w_warehouse_sk"].to_numpy()
    wh = _app(wh, "w_county", pa.array([_COUNTIES[int(s) % len(_COUNTIES)] for s in wsk]))
    wh = _app(wh, "w_country", pa.array(["United States"] * len(wsk)))
    tables["warehouse"] = wh

    # -- store_sales: q88/q96 (sold time)
    ss = tables["store_sales"]
    ss = _app(ss, "ss_sold_time_sk", pa.array(_time_sks(11, ss.num_rows), pa.int64()))
    tables["store_sales"] = ss

    # -- catalog_sales: call center / catalog page / ship mode / time /
    #    net_paid_inc_tax (derived exactly: net_paid + ext_tax)
    cs = tables["catalog_sales"]
    r = _crng(12)
    ncs = cs.num_rows
    cs = _app(cs, "cs_call_center_sk", pa.array(r.integers(1, N_CC + 1, ncs), pa.int64()))
    cs = _app(cs, "cs_catalog_page_sk", pa.array(r.integers(1, N_CATPAGE + 1, ncs), pa.int64()))
    cs = _app(cs, "cs_ship_mode_sk", pa.array(r.integers(1, N_SHIPMODE + 1, ncs), pa.int64()))
    cs = _app(cs, "cs_sold_time_sk", pa.array(_time_sks(13, ncs), pa.int64()))
    npaid = cs["cs_net_paid"].to_numpy()
    ntax = cs["cs_ext_tax"].to_numpy()
    cs = _app(cs, "cs_net_paid_inc_tax", pa.array(npaid + ntax).cast(pa.decimal128(12, 2)))
    tables["catalog_sales"] = cs

    # -- web_sales: ship cost / promo / page / ship mode / times / hdemo
    ws = tables["web_sales"]
    r = _crng(14)
    nws = ws.num_rows
    ext_sales = (ws["ws_ext_sales_price"].to_numpy() * 100).astype(np.int64)
    ship_cost = (ext_sales * r.integers(2, 9, nws)) // 100
    promo = r.integers(1, N_PROMO + 1, nws)
    promo_null = r.random(nws) < 0.5
    ws = _app(ws, "ws_ext_ship_cost", _dec(ship_cost, 9))
    ws = _app(ws, "ws_promo_sk", pa.array(np.where(promo_null, 0, promo), pa.int64(), mask=promo_null))
    ws = _app(ws, "ws_web_page_sk", pa.array(r.integers(1, N_WEBPAGE + 1, nws), pa.int64()))
    ws = _app(ws, "ws_ship_mode_sk", pa.array(r.integers(1, N_SHIPMODE + 1, nws), pa.int64()))
    ws = _app(ws, "ws_sold_time_sk", pa.array(_time_sks(15, nws), pa.int64()))
    ws = _app(ws, "ws_ship_hdemo_sk", pa.array(r.integers(1, N_HDEMO + 1, nws), pa.int64()))
    tables["web_sales"] = ws

    # -- catalog_returns: q5/q77/q80/q81/q91 money split + page/cc/addr
    cr = tables["catalog_returns"]
    r = _crng(16)
    ncr = cr.num_rows
    amt = (cr["cr_return_amount"].to_numpy() * 100).astype(np.int64)
    cash = (amt * r.integers(30, 81, ncr)) // 100
    charge = ((amt - cash) * r.integers(0, 101, ncr)) // 100
    credit = amt - cash - charge
    tax = (amt * r.integers(0, 10, ncr)) // 100
    cr = _app(cr, "cr_refunded_cash", _dec(cash, 9))
    cr = _app(cr, "cr_reversed_charge", _dec(charge, 9))
    cr = _app(cr, "cr_store_credit", _dec(credit, 9))
    cr = _app(cr, "cr_return_amt_inc_tax", _dec(amt + tax, 9))
    cr = _app(cr, "cr_net_loss", _dec((amt * r.integers(5, 60, ncr)) // 100 + 50, 9))
    cr = _app(cr, "cr_call_center_sk", pa.array(r.integers(1, N_CC + 1, ncr), pa.int64()))
    cr = _app(cr, "cr_catalog_page_sk", pa.array(r.integers(1, N_CATPAGE + 1, ncr), pa.int64()))
    cr = _app(cr, "cr_returning_addr_sk", pa.array(r.integers(1, N_ADDR + 1, ncr), pa.int64()))
    tables["catalog_returns"] = cr


N_CC = 3
N_CATPAGE = 200
N_WEBPAGE = 60
N_SHIPMODE = 20
N_REASON = 72
N_WEBSITE = 3

# --------------------------------------------------------------------------
# predicate support: deterministic overwrites + appended story blocks so
# every query's literal filters (real TPC-DS names/ids the base formulas
# don't produce) select a non-empty slice. Overwrites touch disjoint
# sk-residue subsets; appends extend tables with new surrogate keys.
# Both engines read the same parquet, so correctness is unaffected —
# this is purely about making the 103-query suite exercise real rows.
# --------------------------------------------------------------------------

# real dsdgen (category, class, brand) triples the q53/q63/q89/q54
# families filter on
_REAL_TRIPLES = [
    ("Books", "personal", "scholaramalgamalg #14"),
    ("Books", "portable", "scholaramalgamalg #7"),
    ("Books", "reference", "exportiunivamalg #9"),
    ("Books", "self-help", "scholaramalgamalg #9"),
    ("Women", "accessories", "amalgimporto #1"),
    ("Music", "classical", "edu packscholar #1"),
    ("Women", "fragrances", "exportiimporto #1"),
    ("Men", "pants", "importoamalg #1"),
    ("Electronics", "stereo", "importounivamalg #6"),
    ("Electronics", "computers", "amalgnameless #3"),
    ("Sports", "football", "exportischolar #2"),
    ("Men", "shirts", "amalgamalg #4"),
    ("Jewelry", "birdal", "univbrand #8"),
    ("Women", "dresses", "exportiexporti #1"),
    ("Women", "maternity", "exportiexporti #2"),
    ("Children", "toddlers", "scholarnameless #5"),
]

# colors the q24/q41/q56/q64 families filter on (plus the base palette)
_REAL_COLORS = [
    "pale", "chiffon", "slate", "blanched", "burnished", "powder",
    "brown", "honeydew", "floral", "deep", "light", "cornflower",
    "chocolate", "purple", "burlywood", "indian", "spice", "maroon",
    "cream", "peach", "saddle", "spring", "medium", "midnight", "snow",
    "cyan", "papaya", "orange", "frosted", "forest", "ghost",
]

# out-of-formula manufact ids (q37 q41 q82)
_REAL_MANUFACTS = [677, 940, 694, 808, 129, 270, 821, 423] + list(
    range(738, 779)
)

_Q10_COUNTIES = [
    "Rush County", "Toole County", "Jefferson County", "Dona Ana County",
    "La Porte County",
]


def _dsk(d: dt.date) -> int:
    return BASE_DATE_SK + (d - FIRST_DAY).days


def _set(t: pa.Table, name: str, arr) -> pa.Table:
    return t.set_column(t.schema.get_field_index(name), name, arr)


def _null_subset(t: pa.Table, col: str, frac: float, tag: int) -> pa.Table:
    """Null out a deterministic fraction of an int64 FK column (q44 q76:
    the real data has NULL FKs; the base generator never emits them)."""
    r = _crng(tag)
    vals = t[col].to_numpy(zero_copy_only=False)
    mask = r.random(len(vals)) < frac
    return _set(t, col, pa.array(np.where(mask, 0, vals), pa.int64(), mask=mask))


def _rows_like(t: pa.Table, n: int, **overrides) -> pa.Table:
    """n copies of row 0 with the given columns overridden — appended
    story rows keep every unspecified FK/money column valid."""
    cols = {}
    for field in t.schema:
        name = field.name
        if name in overrides:
            v = overrides[name]
            if isinstance(v, pa.Array):
                cols[name] = v
            elif isinstance(v, np.ndarray):
                cols[name] = pa.array(v).cast(field.type)
            elif isinstance(v, (list, tuple)):
                cols[name] = pa.array(list(v)).cast(field.type)
            else:
                cols[name] = pa.array([v] * n).cast(field.type)
        else:
            v0 = t[name][0]
            cols[name] = pa.array([v0.as_py()] * n, type=field.type)
    return pa.table(cols)


def _overwrite_dims(tables: dict[str, pa.Table]) -> None:
    # -- item: real triples (sk%7==3), colors (sk%11==5), manufacts
    #    (sk%13==2), calibrated prices on the color subset
    it = tables["item"]
    sk = it["i_item_sk"].to_numpy()
    cat = it["i_category"].to_numpy(zero_copy_only=False).astype(object)
    cls = it["i_class"].to_numpy(zero_copy_only=False).astype(object)
    brand = it["i_brand"].to_numpy(zero_copy_only=False).astype(object)
    color = it["i_color"].to_numpy(zero_copy_only=False).astype(object)
    manu = it["i_manufact_id"].to_numpy().copy()
    price = np.array([d.as_py() for d in it["i_current_price"]], dtype=object)
    tri_idx = 0
    col_idx = 0
    man_idx = 0
    for i, s in enumerate(sk):
        if s % 7 == 3:
            c, k, b = _REAL_TRIPLES[tri_idx % len(_REAL_TRIPLES)]
            cat[i], cls[i], brand[i] = c, k, b
            tri_idx += 1
        if s % 11 == 5:
            c64 = _REAL_COLORS[col_idx % len(_REAL_COLORS)]
            color[i] = c64
            # q64's windows intersect at [65,74]: its colors get 70.00;
            # the rest cycle 63.00..95.00 (q37/q82 ranges)
            if c64 in ("purple", "burlywood", "indian", "spring", "floral", "medium"):
                price[i] = "70.00"
            else:
                price[i] = f"{63 + (col_idx * 7) % 33}.00"
            col_idx += 1
        if s % 13 == 2:
            manu[i] = _REAL_MANUFACTS[man_idx % len(_REAL_MANUFACTS)]
            man_idx += 1
    # guaranteed q37/q82 support: the sk ≡ 93 (mod 143) slice gets the
    # literal manufact ids with a price inside both 62..92 and 68..98
    q3782 = [677, 940, 694, 808, 129, 270, 821, 423]
    j = 0
    for i, s in enumerate(sk):
        if s % 143 == 93:
            manu[i] = q3782[j % len(q3782)]
            price[i] = "70.00"
            j += 1
    it = _set(it, "i_category", pa.array(list(cat), pa.string()))
    it = _set(it, "i_class", pa.array(list(cls), pa.string()))
    it = _set(it, "i_brand", pa.array(list(brand), pa.string()))
    it = _set(it, "i_color", pa.array(list(color), pa.string()))
    it = _set(it, "i_manufact_id", pa.array(manu, pa.int32()))
    it = _set(
        it, "i_current_price",
        pa.array([str(p) for p in price]).cast(pa.decimal128(7, 2)),
    )
    tables["item"] = it

    # -- store: market 8 for stores 1..4 (q24), store 1 zip from q8's
    #    literal list
    st = tables["store"]
    ssk = st["s_store_sk"].to_numpy()
    mk = st["s_market_id"].to_numpy().copy()
    mk[ssk <= 4] = 8
    st = _set(st, "s_market_id", pa.array(mk, pa.int32()))
    zips = st["s_zip"].to_numpy(zero_copy_only=False).astype(object)
    zips[0] = "24128"
    st = _set(st, "s_zip", pa.array(list(zips), pa.string()))
    tables["store"] = st

    # -- customer_address: q10 counties (sk%19==7), Edgewood (sk%17==5),
    #    store-matching zips (sk%23==1, q24's s_zip = ca_zip join)
    ca = tables["customer_address"]
    ask = ca["ca_address_sk"].to_numpy()
    county = ca["ca_county"].to_numpy(zero_copy_only=False).astype(object)
    city = ca["ca_city"].to_numpy(zero_copy_only=False).astype(object)
    azip = ca["ca_zip"].to_numpy(zero_copy_only=False).astype(object)
    store_zips = list(zips)
    for i, s in enumerate(ask):
        if s % 19 == 7:
            county[i] = _Q10_COUNTIES[(int(s) // 19) % len(_Q10_COUNTIES)]
        if s % 17 == 5:
            city[i] = "Edgewood"
        if s % 23 == 1:
            azip[i] = store_zips[(int(s) // 23) % len(store_zips)]
    ca = _set(ca, "ca_county", pa.array(list(county), pa.string()))
    ca = _set(ca, "ca_city", pa.array(list(city), pa.string()))
    ca = _set(ca, "ca_zip", pa.array(list(azip), pa.string()))
    tables["customer_address"] = ca

def _null_fact_fks(tables: dict[str, pa.Table]) -> None:
    """NULL FK subsets (q44: ss_addr, q76: ss_store/cs_ship_addr/
    ws_ship_customer). Runs AFTER the returns tables derive from sales
    (they copy these columns as non-null int arrays)."""
    tables["store_sales"] = _null_subset(tables["store_sales"], "ss_addr_sk", 0.02, 31)
    tables["store_sales"] = _null_subset(tables["store_sales"], "ss_store_sk", 0.02, 32)
    tables["catalog_sales"] = _null_subset(tables["catalog_sales"], "cs_ship_addr_sk", 0.02, 33)
    tables["web_sales"] = _null_subset(tables["web_sales"], "ws_ship_customer_sk", 0.02, 34)


def _inventory_v3(days) -> pa.Table:
    """Weekly snapshots across all sales years with a skewed quantity
    mix (35% zero / 35% small / 30% 100-500): q39's cov = stddev/mean > 1
    needs heavy-tailed per-(item,wh,month) samples, q37/q82 filter
    100..500, q72 needs inv < cs_quantity. Replaces the uniform
    4-weekly table (child rng; the main stream is untouched)."""
    r = _crng(41)
    mondays = [
        i for i, d in enumerate(days) if d.weekday() == 0 and d.year <= 2002
    ]
    n = len(mondays) * N_ITEM * N_WAREHOUSE
    date_idx = np.repeat(np.array(mondays), N_ITEM * N_WAREHOUSE)
    item = np.tile(np.repeat(np.arange(1, N_ITEM + 1), N_WAREHOUSE), len(mondays))
    wh = np.tile(np.arange(1, N_WAREHOUSE + 1), len(mondays) * N_ITEM)
    kind = r.random(n)
    qty = np.where(
        kind < 0.35, 0,
        np.where(kind < 0.70, r.integers(1, 61, n), r.integers(100, 501, n)),
    )
    return pa.table(
        {
            "inv_date_sk": pa.array(BASE_DATE_SK + date_idx, pa.int64()),
            "inv_item_sk": pa.array(item, pa.int64()),
            "inv_warehouse_sk": pa.array(wh, pa.int64()),
            "inv_quantity_on_hand": pa.array(qty, pa.int32()),
        }
    )


def _append_support(tables: dict[str, pa.Table]) -> None:
    """Append coherent story blocks for the multi-join queries whose
    predicate intersections the base distributions can't hit."""
    r = _crng(51)
    ss, cs, ws = tables["store_sales"], tables["catalog_sales"], tables["web_sales"]
    sr, cr, wr = tables["store_returns"], tables["catalog_returns"], tables["web_returns"]
    cu, ca = tables["customer"], tables["customer_address"]
    max_ticket = int(pa.compute.max(ss["ss_ticket_number"]).as_py())
    max_order_cs = int(pa.compute.max(cs["cs_order_number"]).as_py())
    max_order_ws = int(pa.compute.max(ws["ws_order_number"]).as_py())
    item_sk = tables["item"]["i_item_sk"].to_numpy()
    color = tables["item"]["i_color"].to_numpy(zero_copy_only=False)
    cat = tables["item"]["i_category"].to_numpy(zero_copy_only=False)
    cls = tables["item"]["i_class"].to_numpy(zero_copy_only=False)
    pale_items = item_sk[(color == "peach") | (color == "saddle")][:20]
    purple_items = item_sk[np.isin(color, ["purple", "burlywood", "indian", "spring", "floral", "medium"])][:20]
    maternity_items = item_sk[(cat == "Women") & (cls == "maternity")][:20]

    # q8: >10 preferred customers in literal zip 24128 (store 1's zip)
    n8 = 15
    new_ca = _rows_like(
        ca, n8,
        ca_address_sk=np.arange(N_ADDR + 1, N_ADDR + 1 + n8),
        ca_address_id=[f"AAAAAAAB{s:08d}" for s in range(n8)],
        ca_zip="24128",
    )
    new_cu = _rows_like(
        cu, n8,
        c_customer_sk=np.arange(N_CUST + 1, N_CUST + 1 + n8),
        c_customer_id=[f"AAAAAAAB{s:08d}" for s in range(n8)],
        c_current_addr_sk=np.arange(N_ADDR + 1, N_ADDR + 1 + n8),
        c_preferred_cust_flag="Y",
    )

    # q91: customers wired to ('M','Unknown') cdemo, 'Unknown' hd,
    # gmt -7 addr, with Nov-1998 catalog returns through each call center
    n91 = 40
    cd_mu = 61     # (60//2)%5=0 -> 'M', (60//10)%7=6 -> 'Unknown'
    hd_unknown = 6  # pots[5] == 'Unknown'
    addr_gmt7 = 2   # [-500,-600,-700,-800][2%4] == -700
    sk91 = np.arange(N_CUST + n8 + 1, N_CUST + n8 + 1 + n91)
    new_cu91 = _rows_like(
        cu, n91,
        c_customer_sk=sk91,
        c_customer_id=[f"AAAAAAAC{s:08d}" for s in range(n91)],
        c_current_cdemo_sk=cd_mu,
        c_current_hdemo_sk=hd_unknown,
        c_current_addr_sk=addr_gmt7,
    )
    cr91 = _rows_like(
        cr, n91,
        cr_returned_date_sk=_dsk(dt.date(1998, 11, 10)) + (np.arange(n91) % 19),
        cr_returning_customer_sk=sk91,
        cr_call_center_sk=1 + np.arange(n91) % N_CC,
        cr_order_number=max_order_cs + 200_000 + np.arange(n91),
    )

    # q25/q29-style story: ss(Apr 2001) -> sr(May/Jun) -> cs(Jun-Aug),
    # same customer+item
    n25 = 60
    story_cust = 1 + np.arange(n25) % 200
    story_item = 1 + np.arange(n25) % 40
    t25 = max_ticket + 100_000 + np.arange(n25)
    ss25 = _rows_like(
        ss, n25,
        ss_sold_date_sk=_dsk(dt.date(2001, 4, 5)) + (np.arange(n25) % 20),
        ss_customer_sk=story_cust, ss_item_sk=story_item,
        ss_ticket_number=t25, ss_store_sk=1 + np.arange(n25) % N_STORE,
    )
    sr25 = _rows_like(
        sr, n25,
        sr_returned_date_sk=_dsk(dt.date(2001, 6, 5)) + (np.arange(n25) % 30),
        sr_customer_sk=story_cust, sr_item_sk=story_item,
        sr_ticket_number=t25,
        sr_store_sk=ss25["ss_store_sk"].to_numpy(zero_copy_only=False),
        sr_cdemo_sk=ss25["ss_cdemo_sk"].to_numpy(zero_copy_only=False),
    )
    cs25 = _rows_like(
        cs, n25,
        cs_sold_date_sk=_dsk(dt.date(2001, 7, 10)) + (np.arange(n25) % 40),
        cs_bill_customer_sk=story_cust, cs_item_sk=story_item,
        cs_order_number=max_order_cs + 100_000 + np.arange(n25),
    )

    # q24: returned peach/saddle store-1 purchases by customers whose
    # address zip equals store 1's zip ('24128' — the q8 block)
    n24 = 40
    cust24 = np.arange(N_CUST + 1, N_CUST + 1 + n8)[np.arange(n24) % n8]
    item24 = pale_items[np.arange(n24) % max(len(pale_items), 1)]
    t24 = max_ticket + 200_000 + np.arange(n24)
    ss24 = _rows_like(
        ss, n24,
        ss_sold_date_sk=_dsk(dt.date(2001, 5, 3)) + (np.arange(n24) % 25),
        ss_customer_sk=cust24, ss_item_sk=item24,
        ss_ticket_number=t24, ss_store_sk=1,
        ss_net_paid="5000.00",
    )
    sr24 = _rows_like(
        sr, n24,
        sr_returned_date_sk=_dsk(dt.date(2001, 6, 3)) + (np.arange(n24) % 25),
        sr_customer_sk=cust24, sr_item_sk=item24,
        sr_ticket_number=t24, sr_store_sk=1,
    )

    # q58: one calibration week (2000-01-03) where items 1..30 take the
    # SAME extended price in all three channels (cross-channel revenue
    # ratio exactly 1.0)
    n58 = 24
    d58 = _dsk(dt.date(2000, 1, 4)) + (np.arange(n58) % 5)
    # boutique items (appended below) have NO base-data sales, so the
    # three channels' week revenue is exactly the calibration rows'
    i58 = N_ITEM + 1 + np.arange(n58) % 8
    price58 = "500.00"
    ss58 = _rows_like(
        ss, n58, ss_sold_date_sk=d58, ss_item_sk=i58,
        ss_ticket_number=max_ticket + 300_000 + np.arange(n58),
        ss_ext_sales_price=price58,
    )
    cs58 = _rows_like(
        cs, n58, cs_sold_date_sk=d58, cs_item_sk=i58,
        cs_order_number=max_order_cs + 300_000 + np.arange(n58),
        cs_ext_sales_price=price58,
    )
    ws58 = _rows_like(
        ws, n58, ws_sold_date_sk=d58, ws_item_sk=i58,
        ws_order_number=max_order_ws + 300_000 + np.arange(n58),
        ws_ext_sales_price=price58,
    )

    # q56/q60-style: color-subset items selling in Feb 2001 in all three
    # channels; addr sks ≡ 0 (mod 4) carry the gmt_offset = -5 the query
    # filters on
    slate_items = item_sk[np.isin(color, ["slate", "blanched", "burnished"])][:15]
    n56 = 45
    i56 = slate_items[np.arange(n56) % max(len(slate_items), 1)]
    d56 = _dsk(dt.date(2001, 2, 3)) + (np.arange(n56) % 24)
    addr56 = 4 + (np.arange(n56) * 4) % (N_ADDR - 4)
    ss56 = _rows_like(
        ss, n56, ss_sold_date_sk=d56, ss_item_sk=i56,
        ss_addr_sk=addr56,
        ss_ticket_number=max_ticket + 400_000 + np.arange(n56),
    )
    cs56 = _rows_like(
        cs, n56, cs_sold_date_sk=d56, cs_item_sk=i56,
        cs_bill_addr_sk=addr56,
        cs_order_number=max_order_cs + 400_000 + np.arange(n56),
    )
    ws56 = _rows_like(
        ws, n56, ws_sold_date_sk=d56, ws_item_sk=i56,
        ws_bill_addr_sk=addr56,
        ws_order_number=max_order_ws + 400_000 + np.arange(n56),
    )

    # q83: items 1..20 returned in all three channels in the three
    # literal weeks
    weeks83 = [dt.date(2000, 6, 28), dt.date(2000, 9, 25), dt.date(2000, 11, 15)]
    n83 = 60
    i83 = 1 + np.arange(n83) % 20
    d83 = np.array([_dsk(weeks83[k % 3]) + k % 3 for k in range(n83)])
    sr83 = _rows_like(
        sr, n83, sr_returned_date_sk=d83, sr_item_sk=i83,
        sr_ticket_number=max_ticket + 500_000 + np.arange(n83),
    )
    cr83 = _rows_like(
        cr, n83, cr_returned_date_sk=d83, cr_item_sk=i83,
        cr_order_number=max_order_cs + 500_000 + np.arange(n83),
    )
    wr83 = _rows_like(
        wr, n83, wr_returned_date_sk=d83, wr_item_sk=i83,
        wr_order_number=max_order_ws + 500_000 + np.arange(n83),
    )

    # q54: maternity cs/ws sales in Dec 1998 by addressed core customers
    n54 = 120
    cust54 = 1 + (np.arange(n54) * 7) % 3000
    i54 = maternity_items[np.arange(n54) % max(len(maternity_items), 1)]
    d54 = _dsk(dt.date(1998, 12, 2)) + (np.arange(n54) % 26)
    cs54 = _rows_like(
        cs, n54, cs_sold_date_sk=d54, cs_item_sk=i54,
        cs_bill_customer_sk=cust54,
        cs_order_number=max_order_cs + 600_000 + np.arange(n54),
    )
    ws54 = _rows_like(
        ws, n54, ws_sold_date_sk=d54, ws_item_sk=i54,
        ws_bill_customer_sk=cust54,
        ws_order_number=max_order_ws + 600_000 + np.arange(n54),
    )

    # q85: year-2000 web sales at price 120 / profit 150 returned by
    # ('M','Advanced Degree') demographics (cd sk 51) to an Indiana
    # address (ca sk 7: state IN, country United States)
    n85 = 50
    i85 = 1 + np.arange(n85) % 30
    o85 = max_order_ws + 800_000 + np.arange(n85)
    ws85 = _rows_like(
        ws, n85,
        ws_sold_date_sk=_dsk(dt.date(2000, 3, 6)) + (np.arange(n85) % 200),
        ws_item_sk=i85, ws_order_number=o85,
        ws_sales_price="120.00", ws_net_profit="150.00",
    )
    wr85 = _rows_like(
        wr, n85,
        wr_returned_date_sk=_dsk(dt.date(2000, 5, 6)) + (np.arange(n85) % 100),
        wr_item_sk=i85, wr_order_number=o85,
        wr_refunded_cdemo_sk=51, wr_returning_cdemo_sk=51,
        wr_refunded_addr_sk=7,
        wr_reason_sk=1 + np.arange(n85) % N_REASON,
    )

    # q64: two-year (1999/2000) ss+sr stories on the purple-family
    # calibrated-price items, with catalog refund support (cs+cr pairs
    # whose refunds stay under half the list price)
    n64 = 40
    cust64 = 1 + (np.arange(n64) * 11) % 3000
    i64 = purple_items[np.arange(n64) % max(len(purple_items), 1)]
    rows64 = []
    for yr, base_t in ((1999, 600_000), (2000, 700_000)):
        t64 = max_ticket + base_t + np.arange(n64)
        d64 = _dsk(dt.date(yr, 5, 5)) + (np.arange(n64) % 20)
        rows64.append((
            _rows_like(
                ss, n64, ss_sold_date_sk=d64, ss_item_sk=i64,
                ss_customer_sk=cust64, ss_ticket_number=t64, ss_store_sk=2,
                ss_promo_sk=1, ss_addr_sk=5, ss_cdemo_sk=7,
            ),
            _rows_like(
                sr, n64, sr_returned_date_sk=d64 + 12, sr_item_sk=i64,
                sr_customer_sk=cust64, sr_ticket_number=t64, sr_store_sk=2,
            ),
        ))
    cs64 = _rows_like(
        cs, n64,
        cs_sold_date_sk=_dsk(dt.date(1999, 5, 5)) + (np.arange(n64) % 20),
        cs_item_sk=i64,
        cs_order_number=max_order_cs + 700_000 + np.arange(n64),
        cs_ext_list_price="900.00",
    )
    cr64 = _rows_like(
        cr, n64,
        cr_returned_date_sk=_dsk(dt.date(1999, 6, 5)) + (np.arange(n64) % 20),
        cr_item_sk=i64,
        cr_order_number=max_order_cs + 700_000 + np.arange(n64),
        cr_refunded_cash="10.00", cr_reversed_charge="5.00",
        cr_store_credit="5.00",
    )

    # q41 boutique items: one item per predicate branch, manufact ids in
    # 738..778 — each satisfies its own correlated-subquery branch
    it = tables["item"]
    branches41 = [
        ("Women", "powder", "Ounce", "medium"),
        ("Women", "brown", "Bunch", "N/A"),
        ("Men", "floral", "N/A", "petite"),
        ("Men", "light", "Box", "medium"),
        ("Women", "midnight", "Pallet", "medium"),
        ("Women", "cyan", "Cup", "N/A"),
        ("Men", "orange", "Each", "petite"),
        ("Men", "forest", "Lb", "medium"),
    ]
    nb = len(branches41)
    boutique = _rows_like(
        it, nb,
        i_item_sk=np.arange(N_ITEM + 1, N_ITEM + 1 + nb),
        i_item_id=[f"AAAAAAAB{k:08d}" for k in range(nb)],
        i_manufact_id=[738 + 5 * k for k in range(nb)],
        i_manufact=[f"boutique#{k}" for k in range(nb)],
        i_product_name=[f"boutique{k}" for k in range(nb)],
        i_category=[b[0] for b in branches41],
        i_color=[b[1] for b in branches41],
        i_units=[b[2] for b in branches41],
        i_size=[b[3] for b in branches41],
    )
    tables["item"] = pa.concat_tables([it, boutique])

    tables["customer_address"] = pa.concat_tables([ca, new_ca])
    tables["customer"] = pa.concat_tables([cu, new_cu, new_cu91])
    tables["store_sales"] = pa.concat_tables(
        [ss, ss25, ss24, ss58, ss56, rows64[0][0], rows64[1][0]]
    )
    tables["catalog_sales"] = pa.concat_tables(
        [cs, cs25, cs58, cs56, cs54, cs64]
    )
    tables["web_sales"] = pa.concat_tables([ws, ws58, ws56, ws54, ws85])
    tables["store_returns"] = pa.concat_tables(
        [sr, sr25, sr24, sr83, rows64[0][1], rows64[1][1]]
    )
    tables["catalog_returns"] = pa.concat_tables([cr, cr91, cr83, cr64])
    tables["web_returns"] = pa.concat_tables([wr, wr83, wr85])


def _store_returns(ss: pa.Table) -> pa.Table:
    """~8% of store-sales lines return; keys copied from the sale row so
    every FK join (q1 q17 q24 q25 q29 q50 q64 q93) lands."""
    r = _crng(21)
    n = ss.num_rows
    keep = r.random(n) < 0.08
    m = int(keep.sum())
    qty = ss["ss_quantity"].to_numpy()[keep]
    price = (ss["ss_sales_price"].to_numpy()[keep] * 100).astype(np.int64)
    ret_qty = 1 + r.integers(0, qty)
    amt = ret_qty * price
    return pa.table(
        {
            "sr_returned_date_sk": pa.array(
                ss["ss_sold_date_sk"].to_numpy()[keep] + r.integers(1, 60, m),
                pa.int64(),
            ),
            "sr_item_sk": pa.array(ss["ss_item_sk"].to_numpy()[keep], pa.int64()),
            "sr_customer_sk": pa.array(ss["ss_customer_sk"].to_numpy()[keep], pa.int64()),
            "sr_cdemo_sk": pa.array(ss["ss_cdemo_sk"].to_numpy()[keep], pa.int64()),
            "sr_store_sk": pa.array(ss["ss_store_sk"].to_numpy()[keep], pa.int64()),
            "sr_reason_sk": pa.array(r.integers(1, N_REASON + 1, m), pa.int64()),
            "sr_ticket_number": pa.array(ss["ss_ticket_number"].to_numpy()[keep], pa.int64()),
            "sr_return_quantity": pa.array(ret_qty, pa.int32()),
            "sr_return_amt": _dec(amt, 9),
            "sr_net_loss": _dec((amt * r.integers(5, 60, m)) // 100 + 50, 9),
        }
    )


def _web_returns(ws: pa.Table) -> pa.Table:
    r = _crng(22)
    n = ws.num_rows
    keep = r.random(n) < 0.06
    m = int(keep.sum())
    qty = ws["ws_quantity"].to_numpy()[keep]
    price = (ws["ws_sales_price"].to_numpy()[keep] * 100).astype(np.int64)
    ret_qty = 1 + r.integers(0, qty)
    amt = ret_qty * price
    cash = (amt * r.integers(30, 81, m)) // 100
    return pa.table(
        {
            "wr_returned_date_sk": pa.array(
                ws["ws_ship_date_sk"].to_numpy()[keep] + r.integers(1, 60, m),
                pa.int64(),
            ),
            "wr_item_sk": pa.array(ws["ws_item_sk"].to_numpy()[keep], pa.int64()),
            "wr_order_number": pa.array(ws["ws_order_number"].to_numpy()[keep], pa.int64()),
            "wr_returning_customer_sk": pa.array(
                ws["ws_bill_customer_sk"].to_numpy()[keep], pa.int64()
            ),
            "wr_returning_addr_sk": pa.array(
                ws["ws_bill_addr_sk"].to_numpy()[keep], pa.int64()
            ),
            "wr_returning_cdemo_sk": pa.array(r.integers(1, N_CDEMO + 1, m), pa.int64()),
            "wr_refunded_addr_sk": pa.array(
                ws["ws_bill_addr_sk"].to_numpy()[keep], pa.int64()
            ),
            "wr_refunded_cdemo_sk": pa.array(r.integers(1, N_CDEMO + 1, m), pa.int64()),
            "wr_web_page_sk": pa.array(ws["ws_web_page_sk"].to_numpy()[keep], pa.int64()),
            "wr_reason_sk": pa.array(r.integers(1, N_REASON + 1, m), pa.int64()),
            "wr_return_quantity": pa.array(ret_qty, pa.int32()),
            "wr_return_amt": _dec(amt, 9),
            "wr_fee": _dec(r.integers(50, 10_000, m), 9),
            "wr_refunded_cash": _dec(cash, 9),
            "wr_net_loss": _dec((amt * r.integers(5, 60, m)) // 100 + 50, 9),
        }
    )


def _time_dim() -> pa.Table:
    sk = np.arange(86_400)
    hour = sk // 3600
    meal = np.where(
        (hour >= 6) & (hour < 9), "breakfast",
        np.where((hour >= 17) & (hour < 20), "dinner", ""),
    )
    return pa.table(
        {
            "t_time_sk": pa.array(sk, pa.int64()),
            "t_time": pa.array(sk, pa.int32()),
            "t_hour": pa.array(hour, pa.int32()),
            "t_minute": pa.array((sk // 60) % 60, pa.int32()),
            "t_meal_time": pa.array(
                [m if m else None for m in meal], pa.string()
            ),
        }
    )


def _reason() -> pa.Table:
    sk = np.arange(1, N_REASON + 1)
    return pa.table(
        {
            "r_reason_sk": pa.array(sk, pa.int64()),
            "r_reason_desc": pa.array([f"reason {int(s)}" for s in sk]),
        }
    )


def _ship_mode() -> pa.Table:
    sk = np.arange(1, N_SHIPMODE + 1)
    types = ["EXPRESS", "OVERNIGHT", "REGULAR", "NEXT DAY", "TWO DAY"]
    carriers = [
        "UPS", "FEDEX", "AIRBORNE", "USPS", "DHL", "BARIAN", "LATVIAN",
        "ZOUROS", "TBS", "MSC",
    ]
    return pa.table(
        {
            "sm_ship_mode_sk": pa.array(sk, pa.int64()),
            "sm_type": pa.array([types[int(s) % len(types)] for s in sk]),
            "sm_carrier": pa.array([carriers[int(s) % len(carriers)] for s in sk]),
        }
    )


def _call_center() -> pa.Table:
    sk = np.arange(1, N_CC + 1)
    return pa.table(
        {
            "cc_call_center_sk": pa.array(sk, pa.int64()),
            "cc_call_center_id": pa.array([f"AAAAAAAA{int(s):08d}" for s in sk]),
            "cc_name": pa.array([f"NY Metro #{int(s)}" for s in sk]),
            "cc_county": pa.array(["Williamson County"] * N_CC),
            "cc_manager": pa.array([_FIRST[int(s) % len(_FIRST)] + " " + _LAST[int(s) % len(_LAST)] for s in sk]),
        }
    )


def _web_site() -> pa.Table:
    sk = np.arange(1, N_WEBSITE + 1)
    return pa.table(
        {
            "web_site_sk": pa.array(sk, pa.int64()),
            "web_site_id": pa.array([f"AAAAAAAA{int(s):08d}" for s in sk]),
            "web_name": pa.array([f"site_{int(s)}" for s in sk]),
            "web_company_name": pa.array(
                [["pri", "able", "ought"][int(s) % 3] for s in sk]
            ),
        }
    )


def _web_page() -> pa.Table:
    sk = np.arange(1, N_WEBPAGE + 1)
    # a third of pages inside q90's 5000..5200 char-count window
    cc = np.where(sk % 3 == 0, 5000 + sk * 3 % 200, 2500 + sk * 41 % 2400)
    return pa.table(
        {
            "wp_web_page_sk": pa.array(sk, pa.int64()),
            "wp_char_count": pa.array(cc, pa.int32()),
        }
    )


def _catalog_page() -> pa.Table:
    sk = np.arange(1, N_CATPAGE + 1)
    return pa.table(
        {
            "cp_catalog_page_sk": pa.array(sk, pa.int64()),
            "cp_catalog_page_id": pa.array([f"AAAAAAAA{int(s):08d}" for s in sk]),
        }
    )


def _income_band() -> pa.Table:
    sk = np.arange(1, 21)
    return pa.table(
        {
            "ib_income_band_sk": pa.array(sk, pa.int64()),
            "ib_lower_bound": pa.array((sk - 1) * 10_000, pa.int32()),
            "ib_upper_bound": pa.array(sk * 10_000 - 1, pa.int32()),
        }
    )


def generate(outdir: str, fact_scale: float = 1.0) -> None:
    global _FACT_SCALE
    _FACT_SCALE = fact_scale
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
    _extend_existing(tables)
    _overwrite_dims(tables)
    tables["inventory"] = _inventory_v3(days)
    tables["store_returns"] = _store_returns(tables["store_sales"])
    tables["web_returns"] = _web_returns(tables["web_sales"])
    _null_fact_fks(tables)
    _append_support(tables)
    tables["time_dim"] = _time_dim()
    tables["reason"] = _reason()
    tables["ship_mode"] = _ship_mode()
    tables["call_center"] = _call_center()
    tables["web_site"] = _web_site()
    tables["web_page"] = _web_page()
    tables["catalog_page"] = _catalog_page()
    tables["income_band"] = _income_band()
    for name, t in tables.items():
        pq.write_table(t, os.path.join(outdir, f"{name}.parquet"))
        print(f"  {name}: {t.num_rows} rows")
    with open(os.path.join(outdir, "_MANIFEST"), "w") as f:
        f.write(f"{GENVER}@{fact_scale}")
    _FACT_SCALE = 1.0


def ensure(outdir: str) -> str:
    """Generate iff missing or from an older generator version."""
    mf = os.path.join(outdir, "_MANIFEST")
    try:
        # any fact_scale of the current generator version is valid — a
        # session pointed (via SPARK_GRAFT_TPCDS_DIR) at a scaled perf
        # corpus must NOT clobber it back to the default size
        ok = open(mf).read().strip().startswith(f"{GENVER}@")
    except OSError:
        ok = False
    if not ok:
        generate(outdir)
    return outdir


if __name__ == "__main__":
    import sys

    generate(sys.argv[1] if len(sys.argv) > 1 else "/root/repo/benchdata/tpcds")
