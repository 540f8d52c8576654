"""Extended operator coverage: windowed joins/rank/dedup, lookup join,
remaining set ops, VALUES, first/last-value aggregates, and the scalar
function batteries (regexp, bitwise, encode/URL/map, JSON aggregates)
from SURVEY.md §2.3, §2.5, §2.7, §2.8.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_spark.catalog import Catalog
from flink_spark.functions import scalar as FS
from flink_spark.llm import similarity as sim
from flink_spark.operators import joins as J
from flink_spark.operators import windows as W
from flink_spark.queries import query


# ---------------------------------------------------------------------------
# §2.3 Window join / lookup join
# ---------------------------------------------------------------------------


@query(
    "join_window_same_hour",
    """
    WITH c AS (SELECT user_id, date_trunc('hour', ts) AS w FROM events
               WHERE event_type = 'click'),
    p AS (SELECT user_id, date_trunc('hour', ts) AS w FROM events
          WHERE event_type = 'purchase')
    SELECT c.user_id AS user_id, CAST(c.w AS TIMESTAMP) AS window_start,
           count(*) AS n_pairs
    FROM c JOIN p ON c.user_id = p.user_id AND c.w = p.w
    GROUP BY 1, 2
    """,
)
def join_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window join (StreamExecWindowJoin.java:69): clicks x purchases in
    the same 1h tumbling window per user — equi-join on (window, key),
    stays a hash join (no range condition at all)."""
    ev = Catalog(spark, sf_dir).events
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts")
    purch = ev.where(F.col("event_type") == "purchase").select("user_id", "ts")
    joined = J.window_join(clicks, purch, "user_id", "user_id", "ts", "ts", "1 hour")
    return joined.groupBy(
        F.col("l.user_id").alias("user_id"), F.col("window_start")
    ).agg(F.count("*").alias("n_pairs"))


@query(
    "join_lookup_enrich",
    """
    SELECT event_id, user_id, c_mktsegment AS segment
    FROM events LEFT JOIN customer ON user_id = c_custkey
    """,
)
def join_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lookup join (StreamExecLookupJoin.java:56): enrich the event stream
    from the customer dimension. Broadcast hash join — the probe side is
    never shuffled, the dim ships once per executor."""
    c = Catalog(spark, sf_dir)
    out = J.lookup_join(
        c.events.select("event_id", "user_id"),
        c.customer.select("c_custkey", "c_mktsegment"),
        "user_id",
        "c_custkey",
    )
    return out.select("event_id", "user_id", F.col("c_mktsegment").alias("segment"))


# ---------------------------------------------------------------------------
# §2.5 Window Top-N / window deduplication
# ---------------------------------------------------------------------------


@query(
    "window_topn_daily",
    """
    SELECT window_start, event_id, value, rn FROM (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
             event_id, value,
             row_number() OVER (PARTITION BY date_trunc('day', ts)
                                ORDER BY value DESC, event_id) AS rn
      FROM events) WHERE rn <= 3
    """,
)
def window_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window Top-N (StreamExecWindowRank.java:77): top-3 events by value
    per tumbling day. Partitioning by the window bound keeps state per
    window, the batch shape of the reference's per-window rank state."""
    ev = Catalog(spark, sf_dir).events
    windowed = ev.select(
        F.window("ts", "1 day").start.alias("window_start"), "event_id", "value"
    )
    return W.top_n(
        windowed, ["window_start"], [F.col("value").desc(), F.col("event_id")], 3
    ).withColumn("rn", F.col("rn").cast("long"))


@query(
    "window_dedup_first_daily",
    """
    SELECT user_id, window_start, event_id FROM (
      SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
             event_id,
             row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                                ORDER BY ts, event_id) AS rn
      FROM events) WHERE rn = 1
    """,
)
def window_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window deduplication (StreamExecWindowDeduplicate.java:69): first
    event per (user, day window)."""
    ev = Catalog(spark, sf_dir).events
    windowed = ev.select(
        "user_id", F.window("ts", "1 day").start.alias("window_start"),
        "event_id", "ts",
    )
    return W.dedup_keep_first(
        windowed, ["user_id", "window_start"], [F.col("ts"), F.col("event_id")]
    ).select("user_id", "window_start", "event_id")


# ---------------------------------------------------------------------------
# §2.7 Remaining set operations / Values
# ---------------------------------------------------------------------------


@query(
    "set_union_distinct",
    """
    SELECT c_nationkey AS k FROM customer
    UNION SELECT s_nationkey AS k FROM supplier
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    return (
        c.customer.select(F.col("c_nationkey").alias("k"))
        .union(c.supplier.select(F.col("s_nationkey").alias("k")))
        .distinct()
    )


@query(
    "set_except_all",
    """
    SELECT o_orderstatus AS s FROM orders WHERE o_totalprice > 50000
    EXCEPT ALL
    SELECT o_orderstatus AS s FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL / minusAll (Table.java:540)."""
    o = Catalog(spark, sf_dir).orders
    return (
        o.where(F.col("o_totalprice") > 50000)
        .select(F.col("o_orderstatus").alias("s"))
        .exceptAll(
            o.where(F.col("o_orderpriority") == "1-URGENT").select(
                F.col("o_orderstatus").alias("s")
            )
        )
    )


@query(
    "values_inline_table",
    """
    SELECT * FROM (VALUES (1, 'alpha', 1.5), (2, 'beta', 2.5), (3, 'gamma', NULL))
      AS t(id, tag, score)
    """,
)
def values_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline literal table (StreamExecValues.java:44 / BatchExecValues)."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("tag", T.StringType(), False),
            T.StructField("score", T.DoubleType(), True),
        ]
    )
    return spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "beta", 2.5), (3, "gamma", None)], schema
    )


# ---------------------------------------------------------------------------
# §2.5 / §2.4 FIRST_VALUE / LAST_VALUE / NTH_VALUE and MIN_BY / MAX_BY
# ---------------------------------------------------------------------------


@query(
    "over_first_last_nth",
    """
    SELECT o_orderkey, o_custkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice)
             OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_price,
           nth_value(o_totalprice, 2)
             OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def over_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE/LAST_VALUE/NTH_VALUE (FlinkSqlOperatorTable.java:925-933)."""
    o = Catalog(spark, sf_dir).orders
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(wfull).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(wfull).alias("second_price"),
    )


@query(
    "agg_min_by_max_by",
    """
    SELECT o_custkey,
           max_by(o_orderkey, o_totalprice) AS biggest_order,
           min_by(o_orderkey, o_totalprice) AS smallest_order,
           max(o_totalprice) AS max_price
    FROM orders GROUP BY o_custkey
    """,
)
def agg_min_by_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN_BY/MAX_BY — the aggregate form of Flink's minBy/maxBy rolling
    aggregates (KeyedStream.java:771-1038)."""
    o = Catalog(spark, sf_dir).orders
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("biggest_order"),
        F.min_by("o_orderkey", "o_totalprice").alias("smallest_order"),
        F.max("o_totalprice").alias("max_price"),
    )


# ---------------------------------------------------------------------------
# §2.8 Scalar batteries: regexp, bitwise, encode/URL/map, JSON aggs
# ---------------------------------------------------------------------------


@query(
    "scalar_regexp_battery",
    """
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+)', 1) AS r_first_word,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS r_replace,
           regexp_matches(p_name, '^[bh]') AS r_like,
           translate(p_brand, 'Bad#', 'bAD_') AS r_translate,
           CAST(ascii(p_name) AS BIGINT) AS r_ascii,
           chr(65 + CAST(p_partkey % 26 AS INTEGER)) AS r_chr,
           starts_with(p_type, 'S') AS r_starts,
           contains(p_name, 'dg') AS r_contains,
           CAST(position('e' IN p_name) AS BIGINT) AS r_pos
    FROM part
    """,
)
def scalar_regexp_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REGEXP/REGEXP_EXTRACT/REGEXP_REPLACE (FlinkSqlOperatorTable.java:403-415)
    plus TRANSLATE/ASCII/CHR/POSITION."""
    p = Catalog(spark, sf_dir).part
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("r_first_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("r_replace"),
        F.col("p_name").rlike("^[bh]").alias("r_like"),
        F.translate("p_brand", "Bad#", "bAD_").alias("r_translate"),
        F.ascii("p_name").cast("long").alias("r_ascii"),
        F.chr(F.lit(65) + (F.col("p_partkey") % 26).cast("int")).alias("r_chr"),
        F.startswith(F.col("p_type"), F.lit("S")).alias("r_starts"),
        F.contains(F.col("p_name"), F.lit("dg")).alias("r_contains"),
        F.instr("p_name", "e").cast("long").alias("r_pos"),
    )


@query(
    "scalar_bitwise_battery",
    """
    SELECT l_orderkey, l_linenumber,
           l_partkey & 255 AS b_and,
           l_partkey | 15 AS b_or,
           xor(l_partkey, l_suppkey) AS b_xor,
           ~l_partkey AS b_not,
           l_partkey << 2 AS b_shl,
           l_partkey >> 1 AS b_shr,
           bin(l_partkey) AS b_bin,
           hex(l_partkey) AS b_hex
    FROM lineitem WHERE l_orderkey < 500
    """,
)
def scalar_bitwise_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise ops + BIN/HEX (BuiltInFunctionDefinitions.java math rows)."""
    li = Catalog(spark, sf_dir).lineitem
    pk = F.col("l_partkey")
    return li.where(F.col("l_orderkey") < 500).select(
        "l_orderkey",
        "l_linenumber",
        pk.bitwiseAND(F.lit(255)).alias("b_and"),
        pk.bitwiseOR(F.lit(15)).alias("b_or"),
        pk.bitwiseXOR(F.col("l_suppkey")).alias("b_xor"),
        F.bitwise_not(pk).alias("b_not"),
        F.shiftleft(pk, 2).alias("b_shl"),
        F.shiftright(pk, 1).alias("b_shr"),
        F.bin(pk).alias("b_bin"),
        F.hex(pk).alias("b_hex"),
    )


@query(
    "scalar_encode_url_map",
    """
    WITH u AS (
      SELECT doc_id, lang, source, substr(text, 1, 24) AS head,
             'https://ex' || CAST(doc_id % 5 AS VARCHAR) || '.com/docs/' || lang
               || '?q=' || source AS url
      FROM documents)
    SELECT doc_id,
           base64(encode(head)) AS e_b64,
           CAST(from_base64(base64(encode(head))) AS VARCHAR) AS e_roundtrip,
           regexp_extract(url, 'https?://([^/]+)', 1) AS e_host,
           regexp_extract(url, 'https?://[^/]+(/[^?]*)', 1) AS e_path,
           regexp_extract(url, '[?&]q=([^&]*)', 1) AS e_q,
           u.lang AS m_lang,
           u.source AS m_src,
           regexp_full_match(CAST(doc_id AS VARCHAR), '[0-9]+') AS e_is_digit,
           regexp_full_match(u.lang, '[A-Za-z]+') AS e_is_alpha,
           regexp_full_match(CAST(n_chars AS VARCHAR),
                             '\\s*[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)([eE][+-]?[0-9]+)?\\s*')
             AS e_is_decimal
    FROM u JOIN documents USING (doc_id)
    """,
)
def scalar_encode_url_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TO_BASE64/FROM_BASE64 (F:667,678), PARSE_URL (F:539), STR_TO_MAP
    (F:262), IS_DIGIT/IS_ALPHA/IS_DECIMAL (F:276-294). STR_TO_MAP is
    verified by reconstructing a kv-string and extracting both keys."""
    d = Catalog(spark, sf_dir).documents
    head = F.substring("text", 1, 24)
    url = F.concat(
        F.lit("https://ex"),
        (F.col("doc_id") % 5).cast("string"),
        F.lit(".com/docs/"),
        F.col("lang"),
        F.lit("?q="),
        F.col("source"),
    )
    kv = F.concat(F.lit("lang="), F.col("lang"), F.lit(",src="), F.col("source"))
    m = FS.str_to_map(kv, ",", "=")
    b64 = FS.to_base64(F.encode(head, "UTF-8"))
    return d.select(
        "doc_id",
        b64.alias("e_b64"),
        FS.from_base64(b64).cast("string").alias("e_roundtrip"),
        FS.parse_url(url, "HOST").alias("e_host"),
        FS.parse_url(url, "PATH").alias("e_path"),
        FS.parse_url(url, "QUERY", "q").alias("e_q"),
        m.getItem("lang").alias("m_lang"),
        m.getItem("src").alias("m_src"),
        FS.is_digit(F.col("doc_id")).alias("e_is_digit"),
        FS.is_alpha(F.col("lang")).alias("e_is_alpha"),
        FS.is_decimal(F.col("n_chars")).alias("e_is_decimal"),
    )


@query(
    "agg_json_objectagg",
    """
    WITH c AS (SELECT user_id % 10 AS user_bucket, event_type,
                      CAST(count(*) AS BIGINT) AS n
               FROM events GROUP BY 1, 2)
    SELECT user_bucket,
           '{' || string_agg('"' || event_type || '":' || n, ',' ORDER BY event_type)
               || '}' AS type_counts
    FROM c GROUP BY user_bucket
    """,
)
def agg_json_objectagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON_OBJECTAGG (BuiltInFunctionDefinitions.java:1968-2009) →
    to_json(map_from_entries(sorted collect_list)) — deterministic key
    order so the serialized form is engine-comparable."""
    ev = Catalog(spark, sf_dir).events
    counts = (
        ev.withColumn("user_bucket", F.col("user_id") % 10)
        .groupBy("user_bucket", "event_type")
        .agg(F.count("*").alias("n"))
    )
    return counts.groupBy("user_bucket").agg(
        F.to_json(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("event_type", "n")))
            )
        ).alias("type_counts")
    )


@query(
    "agg_json_arrayagg",
    """
    WITH d AS (SELECT DISTINCT user_id % 10 AS user_bucket, event_type FROM events)
    SELECT user_bucket,
           '[' || string_agg('"' || event_type || '"', ',' ORDER BY event_type)
               || ']' AS types
    FROM d GROUP BY user_bucket
    """,
)
def agg_json_arrayagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON_ARRAYAGG → to_json(sorted collect_set)."""
    ev = Catalog(spark, sf_dir).events
    return (
        ev.withColumn("user_bucket", F.col("user_id") % 10)
        .groupBy("user_bucket")
        .agg(F.to_json(F.sort_array(F.collect_set("event_type"))).alias("types"))
    )


# ---------------------------------------------------------------------------
# M6: embedding-cosine near-duplicate pairs
# ---------------------------------------------------------------------------


_EMB_DIM = 64  # driver testdata embeddings dimension (TESTDATA.md)


@query(
    "emb_cosine_neardup_pairs",
    f"""
    WITH b AS (
      SELECT vec_id, embedding,
             {sim.bucket_sql('embedding', _EMB_DIM)} AS bucket
      FROM embeddings)
    SELECT a.vec_id AS d1, c.vec_id AS d2,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(c.embedding AS DOUBLE[])), 6)
             AS cos_sim
    FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
    WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                       CAST(c.embedding AS DOUBLE[])), 6)
          >= 0.35
    """,
)
def emb_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs ≥ 0.35, LSH-bucketed (the 100 TB shape):
    candidate pairs come from an equi-join on the hyperplane bucket —
    never an all-pairs nested loop. Scoring runs on the numpy GEMM tier
    (one BLAS call per bucket; ~6× over the interpreted zip_with fold);
    the oracle replicates the identical md5-derived hyperplanes in SQL,
    so the candidate sets match exactly."""
    e = Catalog(spark, sf_dir).embeddings
    return sim.cosine_pairs_bucketed_np(e, dim=_EMB_DIM, threshold=0.35)


@query(
    "emb_cosine_allpairs_exact",
    """
    SELECT a.vec_id AS d1, b.vec_id AS d2,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6)
             AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                       CAST(b.embedding AS DOUBLE[])), 6)
          >= 0.35
    """,
)
def emb_cosine_allpairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs tier — the verification oracle for the bucketed
    scale tier above; quadratic by design, run only at small SF."""
    e = Catalog(spark, sf_dir).embeddings
    a = sim.cosine_pairs(e, threshold=0.35)
    return a.withColumn("cos_sim", F.round(F.col("cos_sim"), 6)).where(
        F.col("cos_sim") >= 0.35
    )
