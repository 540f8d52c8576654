"""Scale the driver's sf0.1 fixtures to sf>=1 for compute-dominated
benchmarking (VERDICT r3 next-round item 2: at sf0.1 the per-job
scheduling floor is 30-90% of most Spark timings, so the 2x gate was
being argued from decomposition instead of measured).

Scaling model — the TPC-H dbgen convention (uniform replication with
disjoint key ranges), applied to the existing fixtures so both engines
read identical bytes:

- region/nation: fixed-size dimensions (as in TPC-H at every SF).
- customer/supplier/part/orders/lineitem/events: replicated R times
  with every key column offset by i*(max_key+1), FK-consistently —
  replica i's lineitem rows reference replica i's orders/part/supplier
  keys, so join cardinalities scale linearly, selectivities and skew
  shape are preserved, and per-key group sizes stay constant.
- documents: replica text passes through a per-replica vowel
  substitution so replicas are genuinely distinct documents (otherwise
  near-dup pair output grows ~R^2 and the dedup tiers benchmark a
  different workload than the corpus shape they were built for).
- embeddings: replica vectors get a small deterministic per-replica
  offset (+i*1e-4 per dimension) for the same reason — no exact-dup
  distance ties, cosine structure preserved.

Usage: python tools/gen_scale.py <factor> [<dst_dir>]
Default dst: /root/repo/benchdata/sf<factor * 0.1>.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

# per-replica vowel permutations (i=0 is identity → replica 0 equals
# the original corpus byte-for-byte)
_VOWELS = [
    "aeiou", "eioua", "iouae", "ouaei", "uaeio",
    "aeiuo", "eioau", "iouea", "ouaie", "uaeoi",
    "aieou", "eoiua", "iuoae", "oauei", "ueaio",
    "aeoiu", "eiaou", "ioeua", "ouiae", "uoaei",
]


def generate(factor: int, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads = {os.cpu_count() or 8}")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SRC}/{t}.parquet'"
        )

    def off(table: str, col: str) -> int:
        return con.execute(f"SELECT max({col}) + 1 FROM {table}").fetchone()[0]

    C = off("customer", "c_custkey")
    S = off("supplier", "s_suppkey")
    P = off("part", "p_partkey")
    O = off("orders", "o_orderkey")
    E = off("events", "event_id")
    D = off("documents", "doc_id")
    V = off("embeddings", "vec_id")
    rep = f"(SELECT unnest(range({factor})) AS i) r"

    jobs = {
        "region": "SELECT * FROM region",
        "nation": "SELECT * FROM nation",
        "customer": f"""
            SELECT c_custkey + i*{C} AS c_custkey, c_name, c_nationkey,
                   c_acctbal, c_mktsegment
            FROM customer, {rep}""",
        "supplier": f"""
            SELECT s_suppkey + i*{S} AS s_suppkey, s_name, s_nationkey,
                   s_acctbal
            FROM supplier, {rep}""",
        "part": f"""
            SELECT p_partkey + i*{P} AS p_partkey, p_name, p_brand, p_type,
                   p_size, p_retailprice
            FROM part, {rep}""",
        "orders": f"""
            SELECT o_orderkey + i*{O} AS o_orderkey,
                   o_custkey + i*{C} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM orders, {rep}""",
        "lineitem": f"""
            SELECT l_orderkey + i*{O} AS l_orderkey,
                   l_partkey + i*{P} AS l_partkey,
                   l_suppkey + i*{S} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM lineitem, {rep}""",
        "events": f"""
            SELECT event_id + i*{E} AS event_id, ts,
                   user_id + i*{C} AS user_id,
                   event_type, value, props
            FROM events, {rep}""",
        "documents": f"""
            SELECT doc_id + i*{D} AS doc_id,
                   translate(text, 'aeiou', perm) AS text,
                   lang, source, length(translate(text, 'aeiou', perm))
                       AS n_chars
            FROM documents,
                 (SELECT i, ['{"','".join(_VOWELS)}'][ (i % 20) + 1 ] AS perm
                  FROM range({factor}) t(i)) r""",
        "embeddings": f"""
            SELECT vec_id + i*{V} AS vec_id,
                   list_transform(embedding,
                       x -> CAST(x + i * 0.0001 AS FLOAT)) AS embedding,
                   label
            FROM embeddings, {rep}""",
    }
    for t, sql in jobs.items():
        out = os.path.join(dst, f"{t}.parquet")
        con.execute(
            f"COPY ({sql}) TO '{out}' (FORMAT PARQUET, COMPRESSION ZSTD)"
        )
        n = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"{t}: {n} rows -> {out}")


if __name__ == "__main__":
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf = factor * 0.1
    sf_name = f"sf{int(sf)}" if sf == int(sf) else f"sf{sf}"
    dst = sys.argv[2] if len(sys.argv) > 2 else f"/root/repo/benchdata/{sf_name}"
    generate(factor, dst)
