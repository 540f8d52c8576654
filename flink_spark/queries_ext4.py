"""Round-4 operator coverage: the remaining SQL-standard JSON forms
(JSON_QUERY / JSON_EXISTS / IS JSON / JSON_VALUE ON EMPTY|ERROR
defaults — BuiltInFunctionDefinitions.java:1883-1967), OVERLAY and
ENCODE/DECODE from the §2.8 string list, and dynamic-gap session
windows (DynamicEventTimeSessionWindows.java).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_spark.catalog import Catalog
from flink_spark.functions import scalar as FS
from flink_spark.operators import tvf_windows as TVF
from flink_spark.queries import query
from flink_spark.llm import similarity as sim


# ---------------------------------------------------------------------------
# §2.8 JSON forms beyond JSON_VALUE
# ---------------------------------------------------------------------------

# Both engines build the identical JSON document from order columns, so
# the extraction functions (which re-serialize minified on both sides)
# are value-hash comparable. The "c" object is present only for 'F'
# orders, giving JSON_EXISTS / ON EMPTY genuinely varying outputs.
_J_SPARK = None  # built inline below
_J_SQL = (
    "'{\"k\":' || o_orderkey || ',\"tags\":[\"' || o_orderpriority || "
    "'\",\"' || o_orderstatus || '\"]' || "
    "CASE WHEN o_orderstatus = 'F' "
    "THEN ',\"c\":{\"p\":' || o_custkey || '}}' ELSE '}' END"
)


@query(
    "scalar_json_query_exists",
    f"""
    WITH j AS (SELECT o_orderkey, {_J_SQL} AS doc FROM orders)
    SELECT o_orderkey,
           json_extract(doc, '$.tags')::VARCHAR AS jq_tags,
           json_extract(doc, '$.c')::VARCHAR AS jq_obj,
           (json_extract(doc, '$.c.p') IS NOT NULL) AS je_hit,
           (json_extract(doc, '$.zz') IS NOT NULL) AS je_miss,
           json_valid(doc) AS isj_good,
           json_valid(translate(doc, '{{', '(')) AS isj_bad,
           coalesce(json_extract_string(doc, '$.c.p'), '-1') AS jv_default,
           coalesce(CASE WHEN json_valid(translate(doc, '{{', '('))
                         THEN json_extract_string(
                             translate(doc, '{{', '('), '$.k')
                    END, 'ERR') AS jv_on_error
    FROM j
    """,
)
def scalar_json_query_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON_QUERY / JSON_EXISTS / IS JSON / JSON_VALUE DEFAULT ON
    EMPTY|ERROR (BuiltInFunctionDefinitions.java:1883-1967). All forms
    stay JVM-side: get_json_object + try_parse_json, no Python UDF."""
    o = Catalog(spark, sf_dir).orders
    doc = F.concat(
        F.lit('{"k":'),
        F.col("o_orderkey").cast("string"),
        F.lit(',"tags":["'),
        F.col("o_orderpriority"),
        F.lit('","'),
        F.col("o_orderstatus"),
        F.lit('"]'),
        F.when(
            F.col("o_orderstatus") == "F",
            F.concat(
                F.lit(',"c":{"p":'), F.col("o_custkey").cast("string"), F.lit("}}")
            ),
        ).otherwise(F.lit("}")),
    )
    bad = F.translate(doc, "{", "(")  # every '{' → '(' → malformed
    return o.select(
        "o_orderkey",
        FS.json_query(doc, "$.tags").alias("jq_tags"),
        FS.json_query(doc, "$.c").alias("jq_obj"),
        FS.json_exists(doc, "$.c.p").alias("je_hit"),
        FS.json_exists(doc, "$.zz").alias("je_miss"),
        FS.is_json(doc).alias("isj_good"),
        FS.is_json(bad).alias("isj_bad"),
        FS.json_value_default(doc, "$.c.p", "-1").alias("jv_default"),
        FS.json_value_default(bad, "$.k", "ERR").alias("jv_on_error"),
    )


@query(
    "scalar_overlay_encode",
    """
    SELECT o_orderkey,
           substr(o_orderpriority, 1, 1) || 'XX' || substr(o_orderpriority, 5)
               AS ov_for,
           substr(o_orderpriority, 1, 1) || '+' || substr(o_orderpriority, 2)
               AS ov_insert,
           o_orderpriority AS enc_roundtrip,
           upper(to_hex(encode(o_orderstatus))) AS enc_hex
    FROM orders
    """,
)
def scalar_overlay_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OVERLAY(PLACING FROM FOR) + ENCODE/DECODE charset round trip
    (BuiltInFunctionDefinitions §2.8 string battery remainder). The
    oracle spells OVERLAY as the substr composition both engines define
    it by; ENCODE output is compared via hex so the binary column
    hash-compares as text."""
    o = Catalog(spark, sf_dir).orders
    return o.select(
        "o_orderkey",
        FS.overlay(F.col("o_orderpriority"), "XX", 2, 3).alias("ov_for"),
        FS.overlay(F.col("o_orderpriority"), "+", 2, 0).alias("ov_insert"),
        FS.decode_utf8(FS.encode_utf8(F.col("o_orderpriority"))).alias(
            "enc_roundtrip"
        ),
        F.hex(FS.encode_utf8(F.col("o_orderstatus"))).alias("enc_hex"),
    )


# ---------------------------------------------------------------------------
# Dynamic-gap session windows (DynamicEventTimeSessionWindows.java:44)
# ---------------------------------------------------------------------------

_GAP_SQL = (
    "CASE WHEN event_type IN ('view', 'click') THEN 1800000 "
    "ELSE 7200000 END"
)


@query(
    "tvf_session_dynamic",
    f"""
    WITH g AS (
      SELECT user_id, ts, event_id, {_GAP_SQL} AS gap_ms FROM events),
    s AS (
      SELECT user_id, ts, event_id,
             CASE WHEN max(epoch_ms(ts) + gap_ms) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  IS NULL THEN 1
                  WHEN epoch_ms(ts) > max(epoch_ms(ts) + gap_ms) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS new_s
      FROM g),
    sid AS (
      SELECT user_id, ts, event_id,
             CAST(sum(new_s) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
                 AS BIGINT) AS session_id
      FROM s)
    SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events,
           min(epoch_ms(ts)) AS start_ms, max(epoch_ms(ts)) AS end_ms
    FROM sid GROUP BY user_id, session_id
    """,
)
def tvf_session_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-gap sessionization: view/click events extend a session by
    30 min, other events by 2 h (per-element gap extractor —
    DynamicEventTimeSessionWindows.java:44). One shuffle on user_id, one
    per-partition sort, then the per-session aggregate reuses the same
    partitioning (no second exchange)."""
    ev = Catalog(spark, sf_dir).events
    gapped = ev.withColumn(
        "gap_ms",
        F.when(F.col("event_type").isin("view", "click"), F.lit(1_800_000))
        .otherwise(F.lit(7_200_000)),
    )
    sess = TVF.session_dynamic(
        gapped, "ts", "gap_ms", "user_id", order_cols=["event_id"]
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min(F.unix_millis("ts")).alias("start_ms"),
        F.max(F.unix_millis("ts")).alias("end_ms"),
    )


def _semantic_dedup_oracle(nlist: int = 4, threshold: float = 0.4) -> str:
    a = "ascii(substr(md5(CAST(vec_id AS VARCHAR)), 1, 1))"
    nib = f"(CASE WHEN {a} <= 57 THEN {a} - 48 ELSE {a} - 87 END)"
    return f"""
    WITH a0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
                       CAST({nib} % {nlist} AS BIGINT) AS cell
                FROM embeddings),
    c1 AS (SELECT cell, list(cv ORDER BY pos) AS centroid FROM (
        SELECT cell, pos, round(avg(v), 6) AS cv FROM (
          SELECT cell, unnest(range(0, len(emb))) AS pos,
                 unnest(emb) AS v FROM a0)
        GROUP BY 1, 2) GROUP BY cell),
    a1 AS (SELECT vec_id, emb, cell FROM (
        SELECT s.vec_id, s.emb, c.cell,
               row_number() OVER (PARTITION BY s.vec_id
                 ORDER BY list_cosine_similarity(s.emb, c.centroid) DESC,
                          c.cell) AS rn
        FROM a0 s CROSS JOIN c1 c) WHERE rn = 1),
    pruned AS (
        SELECT a.cell, count(DISTINCT b.vec_id) AS n_pruned
        FROM a1 a JOIN a1 b ON a.cell = b.cell AND a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(a.emb, b.emb), 6) >= {threshold}
        GROUP BY a.cell),
    members AS (SELECT cell, count(*) AS n_members FROM a1 GROUP BY cell)
    SELECT m.cell,
           CAST(m.n_members AS BIGINT) AS n_members,
           CAST(coalesce(p.n_pruned, 0) AS BIGINT) AS n_pruned,
           CAST(m.n_members - coalesce(p.n_pruned, 0) AS BIGINT) AS n_kept
    FROM members m LEFT JOIN pruned p ON m.cell = p.cell
    """


@query("emb_semantic_dedup", _semantic_dedup_oracle())
def emb_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (llm/similarity.py semantic_dedup):
    one deterministic Lloyd round clusters the embeddings, then each
    cluster prunes the higher-id member of every cosine>=0.4 pair —
    cluster-then-prune keeps the pairwise stage per-cluster instead of
    corpus-wide, the property that makes embedding dedup tractable at
    100 TB. Verified against a fully unrolled DuckDB oracle (same
    md5-seeded round as emb_kmeans_lloyd)."""
    e = Catalog(spark, sf_dir).embeddings
    return sim.semantic_dedup(e, "vec_id", "embedding", nlist=4, threshold=0.4)


def _decontaminate_oracle(n: int = 8, nbuckets: int = 8) -> str:
    a = "ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1))"
    nib = f"(CASE WHEN {a} <= 57 THEN {a} - 48 ELSE {a} - 87 END)"
    gram = " || ' ' || ".join(
        "ws[i]" if j == 0 else f"ws[i+{j}]" for j in range(n)
    )
    return f"""
    WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS ws,
                      {nib} % {nbuckets} AS bkt
               FROM documents),
    sh AS (SELECT doc_id, source, bkt,
                  unnest([{gram} for i in range(1, len(ws) - {n - 2})]) AS s
           FROM d WHERE len(ws) >= {n}),
    ev AS (SELECT DISTINCT md5(s) AS dig FROM sh WHERE bkt = 0),
    hits AS (SELECT DISTINCT doc_id FROM sh
             WHERE bkt <> 0 AND md5(s) IN (SELECT dig FROM ev))
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_train,
           CAST(sum(CASE WHEN doc_id IN (SELECT doc_id FROM hits)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
    FROM d WHERE bkt <> 0
    GROUP BY source
    """


@query("doc_decontaminate", _decontaminate_oracle())
def doc_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (llm/dedup.py decontaminate): the
    held-out set is the docs in md5-bucket 0 (a deterministic stand-in
    for a benchmark corpus); every training doc sharing an 8-gram with
    it is flagged, reported as per-source contamination counts. The
    eval shingle digests broadcast into one equi-join — the corpus is
    never self-joined."""
    from flink_spark.llm import dedup as lsh

    d = Catalog(spark, sf_dir).documents.withColumn(
        "bkt", sim._seed_cell(F.col("doc_id"), 8)
    )
    train = d.where(F.col("bkt") != 0)
    ev = d.where(F.col("bkt") == 0)
    flagged = lsh.decontaminate(train, ev, "doc_id", "text", n=8)
    return flagged.groupBy("source").agg(
        F.count("*").alias("n_train"),
        F.sum(F.col("contaminated").cast("long")).alias("n_contaminated"),
    )


_PII_DECORATED = (
    "text || ' contact user' || CAST(doc_id AS {str}) || '@example.com"
    " or call ' || CAST(doc_id * 7919 + 10007 AS {str})"
    " || ' via http://site-' || CAST(doc_id AS {str}) || '.example/page'"
)


@query(
    "doc_pii_redact",
    f"""
    WITH decorated AS (
      SELECT doc_id, source,
             {_PII_DECORATED.format(str='VARCHAR')} AS t
      FROM documents),
    red AS (
      SELECT doc_id, source, t,
             regexp_replace(regexp_replace(regexp_replace(t,
                 'https?://[^ ]+', '[URL]', 'g'),
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}',
                 '[EMAIL]', 'g'),
                 '[0-9]{{5,}}', '[NUM]', 'g') AS rt
      FROM decorated)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(t) - length(rt)) AS BIGINT) AS chars_redacted,
           CAST(sum(CASE WHEN rt LIKE '%[EMAIL]%' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_email,
           CAST(sum(CASE WHEN rt LIKE '%[URL]%' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_url,
           CAST(sum(CASE WHEN rt LIKE '%[NUM]%' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_num,
           CAST(sum(CASE WHEN rt LIKE '%@%' OR rt LIKE '%http%' THEN 1
                         ELSE 0 END) AS BIGINT) AS n_leaked
    FROM red
    GROUP BY source
    """,
)
def doc_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass (llm/text.py redact_pii): the fixture corpus
    carries no PII, so each doc is first decorated with deterministic
    synthetic PII derived from its id (an email, a long phone-like
    number, a URL), then scrubbed — per-source report of redacted chars
    and per-type hit counts, with an `n_leaked` column that must be 0
    (the redaction-completeness assertion, hash-checked against the
    oracle running the identical RE2/Java-compatible patterns)."""
    from flink_spark.llm import text as T

    d = Catalog(spark, sf_dir).documents
    sid = F.col("doc_id").cast("string")
    decorated = d.withColumn(
        "t",
        F.concat(
            F.col("text"), F.lit(" contact user"), sid,
            F.lit("@example.com or call "),
            (F.col("doc_id") * 7919 + 10007).cast("string"),
            F.lit(" via http://site-"), sid, F.lit(".example/page"),
        ),
    )
    red = decorated.withColumn("rt", T.redact_pii(F.col("t")))
    return red.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("t") - F.length("rt")).alias("chars_redacted"),
        F.sum(F.col("rt").contains("[EMAIL]").cast("long")).alias("n_email"),
        F.sum(F.col("rt").contains("[URL]").cast("long")).alias("n_url"),
        F.sum(F.col("rt").contains("[NUM]").cast("long")).alias("n_num"),
        F.sum(
            (F.col("rt").contains("@") | F.col("rt").contains("http"))
            .cast("long")
        ).alias("n_leaked"),
    )
