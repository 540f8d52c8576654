"""Flink-DDL front-end (Parser.tdd:53-57): CREATE TABLE with computed
columns + WATERMARK routed into the Spark catalog, batch and streaming."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_spark.ddl import execute_ddl, parse_create_table
from flink_spark.table_api import TableEnvironment
from tests.conftest import SF_DIR


def test_parse_full_create_table():
    spec = parse_create_table("""
        CREATE TABLE ev (
            event_id BIGINT NOT NULL,
            ts TIMESTAMP(3),
            user_id BIGINT,
            event_type STRING,
            value DOUBLE,
            props STRING,
            day_str AS date_format(ts, 'yyyy-MM-dd'),
            PRIMARY KEY (event_id) NOT ENFORCED,
            WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
        ) WITH ('connector' = 'filesystem', 'path' = '/x', 'format' = 'parquet')
    """)
    assert spec.name == "ev"
    assert ("event_id", "bigint") in spec.physical
    assert ("ts", "timestamp") in spec.physical
    assert spec.computed == [("day_str", "date_format(ts, 'yyyy-MM-dd')")]
    assert spec.watermark == ("ts", "5 seconds")
    assert spec.primary_key == ["event_id"]
    assert spec.options["format"] == "parquet"


def test_type_lowering_nested():
    spec = parse_create_table("""
        CREATE TABLE t (
            a DECIMAL(18, 4), b ARRAY<INT>, c MAP<STRING, DOUBLE>,
            d ROW<x INT, y STRING>, e VARCHAR(10)
        ) WITH ('connector' = 'filesystem', 'path' = '/x')
    """)
    types = dict(spec.physical)
    assert types["a"] == "decimal(18,4)"
    assert types["b"] == "array<int>"
    assert types["c"] == "map<string,double>"
    assert types["d"] == "struct<x: int, y: string>"
    assert types["e"] == "string"


def test_ddl_batch_round_trip(spark):
    env = TableEnvironment(spark)
    res = env.execute_sql(f"""
        CREATE TABLE ddl_orders (
            o_orderkey BIGINT,
            o_custkey BIGINT,
            o_orderstatus STRING,
            o_totalprice DOUBLE,
            o_orderdate DATE,
            o_orderpriority STRING,
            price_band AS CASE WHEN o_totalprice > 100000 THEN 'hi' ELSE 'lo' END
        ) WITH ('connector' = 'filesystem',
                'path' = '{SF_DIR}/orders.parquet',
                'format' = 'parquet')
    """)
    assert res.collect()[0].result == "OK"
    got = env.sql_query(
        "SELECT price_band, count(*) AS n FROM ddl_orders GROUP BY price_band"
    )._df
    want = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .withColumn(
            "price_band",
            F.when(F.col("o_totalprice") > 100000, "hi").otherwise("lo"),
        )
        .groupBy("price_band")
        .count()
    )
    assert sorted(tuple(r) for r in got.collect()) == sorted(
        tuple(r) for r in want.collect()
    )
    env.execute_sql("DROP TABLE ddl_orders")


def test_ddl_streaming_watermark_agg(spark, tmp_path):
    """Streaming DDL table: watermark from the DDL drives an append-mode
    windowed aggregate (the CREATE TABLE ... WATERMARK → withWatermark
    → window path end-to-end)."""
    import datetime as dt
    import os

    from flink_spark.streaming import core as SC

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0 + dt.timedelta(minutes=10 * i), float(i)) for i in range(12)]
    src = os.path.join(str(tmp_path), "src")
    spark.createDataFrame(rows, "id long, ts timestamp, v double").write.parquet(src)

    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE ddl_stream (
            id BIGINT, ts TIMESTAMP(3), v DOUBLE,
            WATERMARK FOR ts AS ts - INTERVAL '1' MINUTE
        ) WITH ('connector' = 'filesystem', 'path' = '{src}',
                'format' = 'parquet', 'scan.streaming' = 'true')
    """)
    stream = spark.table("ddl_stream")
    assert stream.isStreaming
    agg = stream.groupBy(F.window("ts", "1 hour")).agg(
        F.sum("v").alias("total")
    )
    SC.run_to_memory(agg, "t_ddl_stream", "append")
    got = {
        r["window"].start.minute + r["window"].start.hour * 60: r.total
        for r in spark.sql("SELECT * FROM t_ddl_stream").collect()
    }
    # hour 0 closed by the final watermark: ids 0..5 → 15.0
    assert got.get(0) == 15.0


def test_ddl_datagen_and_view(spark):
    env = TableEnvironment(spark)
    env.execute_sql("""
        CREATE TABLE gen (ts TIMESTAMP(3), n BIGINT)
        WITH ('connector' = 'datagen', 'number-of-rows' = '5')
    """)
    assert spark.table("gen").count() == 5
    env.execute_sql("CREATE VIEW gen_v AS SELECT n * 2 AS n2 FROM gen")
    assert spark.table("gen_v").agg(F.max("n2")).collect()[0][0] == 8
    env.execute_sql("DROP VIEW gen_v")
    env.execute_sql("DROP TABLE gen")


def test_ddl_unknown_clauses_error(spark):
    env = TableEnvironment(spark)
    # a Kafka-only metadata key on a filesystem table is rejected with
    # the supported key list (metadata columns themselves are supported
    # since r6)
    with pytest.raises(ValueError, match="metadata key"):
        env.execute_sql("""
            CREATE TABLE t (ts TIMESTAMP(3) METADATA FROM 'timestamp')
            WITH ('connector' = 'filesystem', 'path' = '/x')
        """)
    with pytest.raises(ValueError, match="connector"):
        env.execute_sql("""
            CREATE TABLE t (a INT) WITH ('connector' = 'hbase')
        """)
    # CREATE CATALOG is implemented since r9 (was the unrecognized
    # example here) — a genuinely unsupported CREATE still errors
    with pytest.raises(ValueError, match="unrecognized CREATE"):
        env.execute_sql("CREATE MODEL m WITH ('type' = 'x')")
    with pytest.raises(ValueError, match="unsupported Flink type"):
        parse_create_table(
            "CREATE TABLE t (a GEOMETRY) WITH ('connector' = 'filesystem', 'path' = '/x')"
        )


def test_ddl_insert_into_filesystem_round_trip(spark, tmp_path):
    """INSERT INTO / INSERT OVERWRITE on a DDL-registered filesystem
    table — the TableSink path: executeSql submits the write, files land
    via the declared format, and the re-registered view reads them."""
    env = TableEnvironment(spark)
    path = str(tmp_path / "sink_t")
    env.execute_sql(f"""
        CREATE TABLE sink_t (k INT, name STRING, amount BIGINT)
        WITH ('connector' = 'filesystem', 'path' = '{path}',
              'format' = 'parquet')
    """)
    r = env.execute_sql(
        "INSERT INTO sink_t VALUES (1, 'a', 10), (2, 'b', 20)"
    )
    assert r.collect()[0].rows_inserted == 2
    assert spark.sql("SELECT count(*) c FROM sink_t").collect()[0].c == 2

    # append semantics: a second INSERT INTO adds rows
    env.execute_sql(
        "INSERT INTO sink_t SELECT k + 10, name, amount * 2 FROM sink_t"
    )
    assert spark.sql("SELECT count(*) c FROM sink_t").collect()[0].c == 4

    # INSERT OVERWRITE replaces the table contents
    env.execute_sql("INSERT OVERWRITE sink_t VALUES (9, 'z', 99)")
    rows = spark.sql("SELECT k, name, amount FROM sink_t").collect()
    assert [(r.k, r.name, r.amount) for r in rows] == [(9, "z", 99)]

    # writes to non-filesystem tables are a clear error
    env.execute_sql("""
        CREATE TABLE gen_t (a BIGINT, b BIGINT)
        WITH ('connector' = 'datagen', 'number-of-rows' = '5')
    """)
    with pytest.raises(ValueError, match="filesystem"):
        env.execute_sql("INSERT INTO gen_t VALUES (1, 2)")
    env.execute_sql("DROP TABLE sink_t")
    env.execute_sql("DROP TABLE gen_t")


def test_ddl_csv_pipe_tpch_harness_parity(spark, tmp_path):
    """The reference's TPC-H e2e harness reads |-delimited CSV filesystem
    tables (test_tpch.sh:22,34 + source.sql). Mirror it: export lineitem
    to pipe-CSV, register it through Flink DDL with the csv connector
    options, and the q1-style aggregate over the CSV table must equal
    the same aggregate over the parquet fixture."""
    import pyspark.sql.functions as F

    src = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    path = str(tmp_path / "lineitem_csv")
    src.select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag",
        "l_linestatus",
    ).write.option("sep", "|").csv(path)

    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE lineitem_csv (
            l_orderkey BIGINT,
            l_quantity DOUBLE,
            l_extendedprice DOUBLE,
            l_returnflag STRING,
            l_linestatus STRING
        ) WITH ('connector' = 'filesystem', 'path' = '{path}',
                'format' = 'csv', 'csv.sep' = '|')
    """)

    agg = """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n, round(sum(l_quantity), 2) AS qty,
               round(sum(l_extendedprice), 2) AS price
        FROM {t} GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """
    src.createOrReplaceTempView("lineitem_pq")
    got = spark.sql(agg.format(t="lineitem_csv")).collect()
    want = spark.sql(agg.format(t="lineitem_pq")).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    env.execute_sql("DROP TABLE lineitem_csv")


def test_ddl_insert_csv_applies_format_options(spark, tmp_path):
    """INSERT INTO a 'csv.sep'='|' table must WRITE pipe-delimited files
    — register_table reads with sep='|', so a comma-delimited write
    would silently collapse every row into one misparsed column."""
    env = TableEnvironment(spark)
    path = str(tmp_path / "pipe_t")
    env.execute_sql(f"""
        CREATE TABLE pipe_t (k INT, name STRING, amount BIGINT)
        WITH ('connector' = 'filesystem', 'path' = '{path}',
              'format' = 'csv', 'csv.sep' = '|')
    """)
    env.execute_sql("INSERT INTO pipe_t VALUES (1, 'a', 10), (2, 'b', 20)")
    rows = sorted(
        (r.k, r.name, r.amount)
        for r in spark.sql("SELECT * FROM pipe_t").collect()
    )
    assert rows == [(1, "a", 10), (2, "b", 20)]
    # the files on disk really are pipe-delimited
    import glob

    raw = []
    for f in glob.glob(f"{path}/part-*"):
        with open(f) as fh:
            raw += [ln.strip() for ln in fh if ln.strip()]
    assert sorted(raw) == ["1|a|10", "2|b|20"]
    env.execute_sql("DROP TABLE pipe_t")


def test_ddl_insert_explicit_column_list(spark, tmp_path):
    """Flink supports INSERT INTO t (c1, c2) SELECT ... — unmentioned
    columns are padded with NULLs (SqlValidatorImpl target-column
    expansion)."""
    env = TableEnvironment(spark)
    path = str(tmp_path / "partial_t")
    env.execute_sql(f"""
        CREATE TABLE partial_t (k INT, name STRING, amount BIGINT)
        WITH ('connector' = 'filesystem', 'path' = '{path}',
              'format' = 'parquet')
    """)
    env.execute_sql("INSERT INTO partial_t (amount, k) VALUES (10, 1)")
    r = spark.sql("SELECT k, name, amount FROM partial_t").collect()[0]
    assert (r.k, r.name, r.amount) == (1, None, 10)
    with pytest.raises(ValueError, match="not in table schema"):
        env.execute_sql("INSERT INTO partial_t (nope) VALUES (1)")
    env.execute_sql("DROP TABLE partial_t")


def test_ddl_insert_nondeterministic_count_consistent(spark, tmp_path):
    """rows_inserted must describe the rows actually written — the
    materialization is cached and counted once, not re-executed after
    the write (a rand() SELECT would otherwise disagree)."""
    env = TableEnvironment(spark)
    path = str(tmp_path / "rand_t")
    env.execute_sql(f"""
        CREATE TABLE rand_t (v DOUBLE)
        WITH ('connector' = 'filesystem', 'path' = '{path}',
              'format' = 'parquet')
    """)
    r = env.execute_sql(
        "INSERT INTO rand_t SELECT rand() AS v FROM range(1000) WHERE rand() < 0.5"
    )
    n_reported = r.collect()[0].rows_inserted
    n_on_disk = spark.sql("SELECT count(*) c FROM rand_t").collect()[0].c
    assert n_reported == n_on_disk
    env.execute_sql("DROP TABLE rand_t")


# ---- CREATE TABLE ... LIKE + metadata columns (r6, SqlCreateTableLike /
# MergeTableLikeUtil; Parser.tdd:53-57) --------------------------------

def test_parse_like_merges_and_overrides(spark):
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE like_base (
            n_nationkey INT,
            n_name STRING,
            n_regionkey INT,
            upper_name AS upper(n_name)
        ) WITH ('connector' = 'filesystem',
                'path' = '{SF_DIR}/nation.parquet',
                'format' = 'parquet')
    """)
    # default like options = INCLUDING ALL OVERWRITING OPTIONS: the new
    # WITH option wins on conflict, base columns + computed col carry over
    spec = parse_create_table(f"""
        CREATE TABLE like_child (
            name_len AS length(n_name)
        ) WITH ('path' = '{SF_DIR}/nation.parquet')
        LIKE like_base
    """)
    assert spec.name == "like_child"
    assert [c for c, _ in spec.physical] == ["n_nationkey", "n_name", "n_regionkey"]
    assert dict(spec.computed) == {
        "upper_name": "upper(n_name)", "name_len": "length(n_name)"}
    assert spec.options["path"] == f"{SF_DIR}/nation.parquet"
    assert spec.options["connector"] == "filesystem"
    # EXCLUDING GENERATED drops the base computed column (explicit
    # OVERWRITING OPTIONS too — explicit like options reset the default
    # to INCLUDING, under which the conflicting path would error, the
    # same contract Flink's MergeTableLikeUtil enforces)
    spec2 = parse_create_table(
        "CREATE TABLE c2 WITH ('path' = '/y') LIKE like_base "
        "(EXCLUDING GENERATED OVERWRITING OPTIONS)")
    assert spec2.computed == []
    assert spec2.options["path"] == "/y"
    # INCLUDING OPTIONS + conflicting option errors without OVERWRITING
    with pytest.raises(ValueError, match="OVERWRITING OPTIONS"):
        parse_create_table(
            "CREATE TABLE c3 WITH ('path' = '/z') LIKE like_base "
            "(INCLUDING ALL)")
    # duplicating a base physical column errors
    with pytest.raises(ValueError, match="already defined"):
        parse_create_table(
            "CREATE TABLE c4 (n_name STRING) WITH ('path'='/z') LIKE like_base")


def test_like_round_trip_with_option_override_and_watermark(spark, tmp_path):
    env = TableEnvironment(spark)
    src = str(tmp_path / "wm_src")
    spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (2, "2024-01-01 00:00:07")],
        "id bigint, ts_str string",
    ).select("id", F.col("ts_str").cast("timestamp").alias("ts")).write.parquet(src)
    env.execute_sql(f"""
        CREATE TABLE wm_base (
            id BIGINT,
            ts TIMESTAMP(3),
            WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
        ) WITH ('connector' = 'filesystem', 'path' = '{src}',
                'format' = 'parquet')
    """)
    # override the base watermark; keep everything else
    env.execute_sql(f"""
        CREATE TABLE wm_child (
            WATERMARK FOR ts AS ts - INTERVAL '1' SECOND
        ) WITH ('path' = '{src}')
        LIKE wm_base (INCLUDING ALL OVERWRITING WATERMARKS OVERWRITING OPTIONS)
    """)
    from flink_spark.ddl import _REGISTERED
    assert _REGISTERED["wm_child"].watermark == ("ts", "1 seconds")
    got = {r.id for r in spark.sql("SELECT id FROM wm_child").collect()}
    assert got == {1, 2}


def test_metadata_columns_filesystem(spark):
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE meta_nation (
            n_nationkey INT,
            n_name STRING,
            n_regionkey INT,
            fname STRING METADATA FROM 'file.name' VIRTUAL,
            fpath STRING METADATA FROM 'file.path',
            fsize BIGINT METADATA FROM 'file.size',
            mtime TIMESTAMP(3) METADATA FROM 'file.modification-time'
        ) WITH ('connector' = 'filesystem',
                'path' = '{SF_DIR}/nation.parquet',
                'format' = 'parquet')
    """)
    row = spark.sql(
        "SELECT n_nationkey, fname, fpath, fsize, mtime FROM meta_nation "
        "ORDER BY n_nationkey LIMIT 1"
    ).collect()[0]
    assert row.fname.endswith(".parquet")
    assert row.fpath.endswith(row.fname)
    assert row.fsize > 0
    assert row.mtime is not None
    # metadata column with the key defaulting to the column name
    spec2 = parse_create_table(
        "CREATE TABLE t (x INT, file_size BIGINT METADATA) "
        "WITH ('connector' = 'filesystem', 'path' = '/x')"
    )
    assert spec2.metadata == [("file_size", "bigint", "file_size")]


# ---------------------------------------------------------------- r7: CTAS


def test_create_table_as_roundtrip(spark, tmp_path):
    """SqlCreateTableAs (Parser.tdd:53-57): one statement derives the
    schema from the query, writes the rows, and registers the table."""
    from flink_spark.ddl import _REGISTERED, execute_ddl

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)],
        "id int, k string, v double",
    ).write.parquet(src)
    execute_ddl(spark, f"""
        CREATE TABLE ctas_src (id INT, k STRING, v DOUBLE)
        WITH ('connector' = 'filesystem', 'path' = '{src}',
              'format' = 'parquet')
    """)
    execute_ddl(spark, f"""
        CREATE TABLE ctas_agg
        WITH ('connector' = 'filesystem',
              'path' = '{tmp_path}/agg', 'format' = 'parquet')
        AS SELECT k, sum(v) AS total FROM ctas_src GROUP BY k
    """)
    got = {(r.k, r.total) for r in spark.sql("SELECT * FROM ctas_agg").collect()}
    assert got == {("a", 40.0), ("b", 20.0)}
    # registered like any other DDL table: INSERT works against it
    spec = _REGISTERED["ctas_agg"]
    assert [c for c, _ in spec.physical] == ["k", "total"]
    execute_ddl(spark, "INSERT INTO ctas_agg VALUES ('c', 5.0)")
    assert spark.sql("SELECT count(*) AS n FROM ctas_agg").collect()[0].n == 3
    # re-running CTAS on an existing table is an error (Flink createTable
    # semantics — r8, closes the silent-overwrite ADVICE item) ...
    with pytest.raises(ValueError, match="already exists"):
        execute_ddl(spark, f"""
            CREATE TABLE ctas_agg
            WITH ('connector' = 'filesystem',
                  'path' = '{tmp_path}/agg', 'format' = 'parquet')
            AS SELECT k, sum(v) AS total FROM ctas_src GROUP BY k
        """)
    # ... IF NOT EXISTS skips without touching the files ...
    execute_ddl(spark, f"""
        CREATE TABLE IF NOT EXISTS ctas_agg
        WITH ('connector' = 'filesystem',
              'path' = '{tmp_path}/agg', 'format' = 'parquet')
        AS SELECT k, sum(v) AS total FROM ctas_src GROUP BY k
    """)
    assert spark.sql("SELECT count(*) AS n FROM ctas_agg").collect()[0].n == 3
    # ... and DROP + re-create overwrites (CREATE semantics, not append)
    execute_ddl(spark, "DROP TABLE ctas_agg")
    execute_ddl(spark, f"""
        CREATE TABLE ctas_agg
        WITH ('connector' = 'filesystem',
              'path' = '{tmp_path}/agg', 'format' = 'parquet')
        AS SELECT k, sum(v) AS total FROM ctas_src GROUP BY k
    """)
    assert spark.sql("SELECT count(*) AS n FROM ctas_agg").collect()[0].n == 2


def test_create_table_as_requires_connector(spark):
    from flink_spark.ddl import execute_ddl

    with pytest.raises(ValueError, match="filesystem connector"):
        execute_ddl(
            spark,
            "CREATE TABLE nope WITH ('connector' = 'datagen') AS SELECT 1",
        )


# --------------------------------------------------------- r7: ALTER TABLE


def test_alter_table_set_and_reset_options(spark, tmp_path):
    """SqlAlterTable SET/RESET (Parser.tdd:58-96): option changes take
    effect on the next read — witnessed via a csv separator swap."""
    from flink_spark.ddl import _REGISTERED, execute_ddl

    d = tmp_path / "csv"
    d.mkdir()
    (d / "part.csv").write_text("1|x\n2|y\n")
    execute_ddl(spark, f"""
        CREATE TABLE alt_csv (id INT, s STRING)
        WITH ('connector' = 'filesystem', 'path' = '{d}',
              'format' = 'csv', 'csv.sep' = ',')
    """)
    # comma sep: each line parses as one field + null
    assert spark.sql(
        "SELECT count(*) AS n FROM alt_csv WHERE s IS NULL"
    ).collect()[0].n == 2
    execute_ddl(spark, "ALTER TABLE alt_csv SET ('csv.sep' = '|')")
    got = {(r.id, r.s) for r in spark.sql("SELECT * FROM alt_csv").collect()}
    assert got == {(1, "x"), (2, "y")}
    assert _REGISTERED["alt_csv"].options["csv.sep"] == "|"
    execute_ddl(spark, "ALTER TABLE alt_csv RESET ('csv.sep')")
    assert "csv.sep" not in _REGISTERED["alt_csv"].options
    with pytest.raises(ValueError, match="connector"):
        execute_ddl(spark, "ALTER TABLE alt_csv RESET ('connector')")


def test_alter_table_add_column_and_rename(spark, tmp_path):
    """ADD extends the read schema (old files surface NULL for the new
    physical column; computed columns evaluate); RENAME re-points the
    registration."""
    from flink_spark.ddl import _REGISTERED, execute_ddl

    p = str(tmp_path / "t")
    spark.createDataFrame([(1, 2.0)], "a int, b double").write.parquet(p)
    execute_ddl(spark, f"""
        CREATE TABLE alt_t (a INT, b DOUBLE)
        WITH ('connector' = 'filesystem', 'path' = '{p}',
              'format' = 'parquet')
    """)
    execute_ddl(spark, "ALTER TABLE alt_t ADD (c STRING, twice AS b * 2)")
    row = spark.sql("SELECT a, b, c, twice FROM alt_t").collect()[0]
    assert (row.a, row.b, row.c, row.twice) == (1, 2.0, None, 4.0)
    with pytest.raises(ValueError, match="exist"):
        execute_ddl(spark, "ALTER TABLE alt_t ADD (a INT)")
    execute_ddl(spark, "ALTER TABLE alt_t RENAME TO alt_t2")
    assert "alt_t" not in _REGISTERED and "alt_t2" in _REGISTERED
    assert spark.sql("SELECT count(*) AS n FROM alt_t2").collect()[0].n == 1
    with pytest.raises(Exception):
        spark.sql("SELECT * FROM alt_t").collect()  # old view dropped


def test_alter_table_unknown_action_and_table(spark):
    from flink_spark.ddl import execute_ddl

    with pytest.raises(ValueError, match="not registered"):
        execute_ddl(spark, "ALTER TABLE never_made SET ('x' = 'y')")
    # unsupported action on a registered table surfaces legibly
    with pytest.raises(ValueError, match="unsupported ALTER"):
        execute_ddl(spark, "ALTER TABLE alt_t2 PARTITION BY (a)")


def test_alter_table_modify_and_drop(spark, tmp_path):
    """MODIFY re-types a physical column / re-defines a computed one;
    DROP removes columns, refusing when a surviving computed column
    still references a dropped one (reference SqlAlterTable
    ADD/MODIFY/DROP, Parser.tdd:58-96)."""
    from flink_spark.ddl import _REGISTERED, execute_ddl

    p = str(tmp_path / "t")
    spark.createDataFrame([(1, 2.0)], "a int, b double").write.parquet(p)
    execute_ddl(spark, f"""
        CREATE TABLE mod_t (a INT, b DOUBLE, twice AS b * 2)
        WITH ('connector' = 'filesystem', 'path' = '{p}',
              'format' = 'parquet')
    """)
    execute_ddl(spark, "ALTER TABLE mod_t MODIFY (a BIGINT, twice AS b * 4)")
    row = spark.sql("SELECT a, twice FROM mod_t").collect()[0]
    assert (row.a, row.twice) == (1, 8.0)
    assert dict(_REGISTERED["mod_t"].physical)["a"] == "bigint"
    with pytest.raises(ValueError, match="not a physical column"):
        execute_ddl(spark, "ALTER TABLE mod_t MODIFY (nope INT)")
    # DROP refuses while `twice` still references b
    with pytest.raises(ValueError, match="references"):
        execute_ddl(spark, "ALTER TABLE mod_t DROP b")
    execute_ddl(spark, "ALTER TABLE mod_t DROP (twice, b)")
    assert [c for c, _ in _REGISTERED["mod_t"].physical] == ["a"]
    assert spark.sql("SELECT * FROM mod_t").columns == ["a"]
    with pytest.raises(ValueError, match="every physical"):
        execute_ddl(spark, "ALTER TABLE mod_t DROP a")


# ----------------------------------------------------- r8: STATEMENT SET


def test_statement_set_multi_sink_shares_scan(spark, tmp_path):
    """BEGIN STATEMENT SET (Parser.tdd:79 SqlBeginStatementSet): two
    INSERTs from one source run as one logical job, and the shared
    source scan executes ONCE — the Spark mapping of the reference's
    common-subgraph optimizer (StreamCommonSubGraphBasedOptimizer
    .scala:107) is an analyzed-plan cache substituted into both sink
    plans (InMemoryRelation), released when the set completes."""
    import flink_spark.ddl as ddl_mod
    from flink_spark.ddl import execute_ddl

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, "k%d" % (i % 3), float(i)) for i in range(100)],
        "id int, k string, v double",
    ).write.parquet(src)
    for ddl in (
        f"""CREATE TABLE ss_src (id INT, k STRING, v DOUBLE)
            WITH ('connector' = 'filesystem', 'path' = '{src}',
                  'format' = 'parquet')""",
        f"""CREATE TABLE ss_agg (k STRING, total DOUBLE)
            WITH ('connector' = 'filesystem', 'path' = '{tmp_path}/agg',
                  'format' = 'parquet')""",
        f"""CREATE TABLE ss_big (id INT, v DOUBLE)
            WITH ('connector' = 'filesystem', 'path' = '{tmp_path}/big',
                  'format' = 'parquet')""",
    ):
        execute_ddl(spark, ddl)
    out = execute_ddl(spark, """
        EXECUTE STATEMENT SET
        BEGIN
          INSERT INTO ss_agg SELECT k, sum(v) AS total FROM ss_src GROUP BY k;
          INSERT INTO ss_big SELECT id, v FROM ss_src WHERE v >= 50;
        END
    """)
    got = {(r.sink, r.rows_inserted) for r in out.collect()}
    assert got == {("ss_agg", 3), ("ss_big", 50)}
    # both sinks readable with the right contents
    tot = {
        (r.k, r.total)
        for r in spark.sql("SELECT * FROM ss_agg").collect()
    }
    assert tot == {
        ("k0", float(sum(i for i in range(100) if i % 3 == 0))),
        ("k1", float(sum(i for i in range(100) if i % 3 == 1))),
        ("k2", float(sum(i for i in range(100) if i % 3 == 2))),
    }
    assert spark.sql("SELECT count(*) AS n FROM ss_big").collect()[0].n == 50
    # the shared-scan pin: every captured sink plan reads the cached
    # relation, so the parquet scan of ss_src executed once
    plans = ddl_mod._LAST_STATEMENT_SET_PLANS
    assert len(plans) == 2
    for p in plans:
        assert "InMemoryRelation" in p, p
    # and the cache is released after the set completes
    assert not spark.catalog.isCached("ss_src")


def test_statement_set_validation(spark, tmp_path):
    from flink_spark.ddl import execute_ddl

    with pytest.raises(ValueError, match="INSERT statements only"):
        execute_ddl(
            spark, "BEGIN STATEMENT SET; SELECT 1; END"
        )
    with pytest.raises(ValueError, match="not registered"):
        execute_ddl(
            spark,
            "EXECUTE STATEMENT SET BEGIN INSERT INTO nope SELECT 1; END",
        )
    with pytest.raises(ValueError, match="no statements"):
        execute_ddl(spark, "BEGIN STATEMENT SET; END")


def test_statement_set_single_source_not_cached(spark, tmp_path):
    """A source referenced by only ONE sink is not cached — nothing to
    share, and materializing it would be pure overhead at scale."""
    from flink_spark.ddl import execute_ddl

    src = str(tmp_path / "one")
    spark.createDataFrame([(1,)], "a int").write.parquet(src)
    execute_ddl(spark, f"""
        CREATE TABLE ss_one (a INT)
        WITH ('connector' = 'filesystem', 'path' = '{src}',
              'format' = 'parquet')
    """)
    execute_ddl(spark, f"""
        CREATE TABLE ss_one_out (a INT)
        WITH ('connector' = 'filesystem', 'path' = '{tmp_path}/oneout',
              'format' = 'parquet')
    """)
    import flink_spark.ddl as ddl_mod

    execute_ddl(spark, """
        BEGIN STATEMENT SET;
        INSERT INTO ss_one_out SELECT a FROM ss_one;
        END
    """)
    assert "InMemoryRelation" not in ddl_mod._LAST_STATEMENT_SET_PLANS[0]
    assert spark.sql("SELECT * FROM ss_one_out").collect()[0].a == 1


def test_alter_table_drop_watermark_column_refused(spark, tmp_path):
    """Dropping the watermark's rowtime column is rejected (Flink does
    the same) — otherwise the spec keeps a dangling watermark and SHOW
    CREATE TABLE emits non-roundtrippable DDL (r8 ADVICE fix)."""
    from flink_spark.ddl import execute_ddl

    p = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "2024-01-01 00:00:00")], "a int, ts string"
    ).write.parquet(p)
    execute_ddl(spark, f"""
        CREATE TABLE wm_t (
            a INT, ts TIMESTAMP(3),
            WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
        ) WITH ('connector' = 'filesystem', 'path' = '{p}',
                'format' = 'parquet')
    """)
    with pytest.raises(ValueError, match="watermark rowtime"):
        execute_ddl(spark, "ALTER TABLE wm_t DROP ts")
    # dropping a non-watermark column still works
    execute_ddl(spark, "ALTER TABLE wm_t DROP a")


def test_alter_table_rename_is_atomic(spark, tmp_path, monkeypatch):
    """RENAME registers the new name before dropping the old one: a
    failed re-registration leaves the original table intact instead of
    losing it (r8 ADVICE fix)."""
    import flink_spark.ddl as ddl_mod
    from flink_spark.ddl import _REGISTERED, execute_ddl

    p = str(tmp_path / "t")
    spark.createDataFrame([(1,)], "a int").write.parquet(p)
    execute_ddl(spark, f"""
        CREATE TABLE ren_t (a INT)
        WITH ('connector' = 'filesystem', 'path' = '{p}',
              'format' = 'parquet')
    """)

    def boom(*a, **k):
        raise RuntimeError("simulated registration failure")

    monkeypatch.setattr(ddl_mod, "register_table", boom)
    with pytest.raises(RuntimeError, match="simulated"):
        execute_ddl(spark, "ALTER TABLE ren_t RENAME TO ren_t2")
    monkeypatch.undo()
    # old table survives, both in the registry and as a readable view
    assert "ren_t" in _REGISTERED and "ren_t2" not in _REGISTERED
    assert spark.sql("SELECT count(*) AS n FROM ren_t").collect()[0].n == 1


# -------------------------------------------------- r7: PARTITIONED BY


def test_partitioned_table_write_read_and_prune(spark, tmp_path):
    """PARTITIONED BY (reference SqlCreateTable partition list +
    FileSystemTableFactory): writes land as hive-style partition dirs,
    reads see the partition column, and a filter on it PRUNES the scan
    (PartitionFilters — the mechanism that makes a 100 TB date-
    partitioned table readable)."""
    from flink_spark.ddl import _REGISTERED, execute_ddl

    path = str(tmp_path / "pt")
    execute_ddl(spark, f"""
        CREATE TABLE part_t (id INT, v DOUBLE, dt STRING)
        PARTITIONED BY (dt)
        WITH ('connector' = 'filesystem', 'path' = '{path}',
              'format' = 'parquet')
    """)
    assert _REGISTERED["part_t"].partitioned == ["dt"]
    execute_ddl(spark, """
        INSERT INTO part_t VALUES
        (1, 1.0, '2024-01-01'), (2, 2.0, '2024-01-01'), (3, 3.0, '2024-01-02')
    """)
    import os

    assert sorted(
        d for d in os.listdir(path) if d.startswith("dt=")
    ) == ["dt=2024-01-01", "dt=2024-01-02"]
    got = {(r.id, r.dt) for r in spark.sql("SELECT id, dt FROM part_t").collect()}
    assert got == {(1, "2024-01-01"), (2, "2024-01-01"), (3, "2024-01-02")}
    # partition pruning reaches the scan
    df = spark.sql("SELECT id FROM part_t WHERE dt = '2024-01-02'")
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "2024-01-02" in plan, plan
    assert [r.id for r in df.collect()] == [3]


def test_partitioned_static_insert_and_dynamic_overwrite(spark, tmp_path):
    """INSERT INTO t PARTITION (p='v') fills the partition column from
    the spec; INSERT OVERWRITE on a partitioned table replaces only the
    partitions the query writes (dynamic overwrite), never the whole
    table — Flink's filesystem-sink overwrite semantics."""
    from flink_spark.ddl import execute_ddl

    path = str(tmp_path / "pt2")
    execute_ddl(spark, f"""
        CREATE TABLE part_u (k STRING, amt BIGINT, region STRING)
        PARTITIONED BY (region)
        WITH ('connector' = 'filesystem', 'path' = '{path}',
              'format' = 'parquet')
    """)
    r = execute_ddl(
        spark,
        "INSERT INTO part_u PARTITION (region='eu') VALUES ('a', 1), ('b', 2)",
    )
    assert r.collect()[0].rows_inserted == 2
    execute_ddl(
        spark,
        "INSERT INTO part_u PARTITION (region='us') VALUES ('c', 3)",
    )
    got = {(r.k, r.region) for r in spark.sql("SELECT k, region FROM part_u").collect()}
    assert got == {("a", "eu"), ("b", "eu"), ("c", "us")}
    # dynamic overwrite: rewriting eu must keep us intact
    execute_ddl(
        spark,
        "INSERT OVERWRITE part_u PARTITION (region='eu') VALUES ('z', 9)",
    )
    got = {(r.k, r.region) for r in spark.sql("SELECT k, region FROM part_u").collect()}
    assert got == {("z", "eu"), ("c", "us")}
    # spec'ing a non-partition column is an error
    with pytest.raises(ValueError, match="not partition keys"):
        execute_ddl(
            spark, "INSERT INTO part_u PARTITION (k='x') VALUES (1)"
        )


def test_partitioned_by_validation_and_like_merge(spark, tmp_path):
    """Partition keys must be physical columns; LIKE copies them by
    default (INCLUDING ALL) and EXCLUDING PARTITIONS drops them;
    ALTER DROP refuses a partition key."""
    from flink_spark.ddl import _REGISTERED, execute_ddl, parse_create_table

    with pytest.raises(ValueError, match="not physical"):
        parse_create_table("""
            CREATE TABLE t (a INT) PARTITIONED BY (nope)
            WITH ('connector' = 'filesystem', 'path' = '/x')
        """)
    path = str(tmp_path / "pl")
    execute_ddl(spark, f"""
        CREATE TABLE part_base (a INT, p STRING) PARTITIONED BY (p)
        WITH ('connector' = 'filesystem', 'path' = '{path}/b',
              'format' = 'parquet')
    """)
    execute_ddl(spark, f"""
        CREATE TABLE part_like (extra AS a * 2)
        WITH ('path' = '{path}/l') LIKE part_base
    """)
    assert _REGISTERED["part_like"].partitioned == ["p"]
    execute_ddl(spark, f"""
        CREATE TABLE part_nolike (extra AS a * 2)
        WITH ('path' = '{path}/n')
        LIKE part_base (EXCLUDING PARTITIONS, OVERWRITING OPTIONS)
    """)
    assert _REGISTERED["part_nolike"].partitioned == []
    with pytest.raises(ValueError, match="partition keys"):
        execute_ddl(spark, "ALTER TABLE part_base DROP p")


# ------------------------------------------ r7: SHOW CREATE TABLE / DESCRIBE


def test_show_create_table_round_trips(spark, tmp_path):
    """SqlShowCreateTable / ShowCreateUtil parity: the reconstructed DDL
    must re-register an EQUIVALENT table when fed back through
    execute_ddl (canonical-text round trip)."""
    from flink_spark.ddl import _REGISTERED, execute_ddl, show_create_table

    path = str(tmp_path / "sct")
    execute_ddl(spark, f"""
        CREATE TABLE sct_t (
            id BIGINT,
            ts TIMESTAMP(3),
            v DECIMAL(10, 2),
            tags ARRAY<STRING>,
            nested ROW<x INT, y STRING>,
            dt STRING,
            day_str AS date_format(ts, 'yyyy-MM-dd'),
            PRIMARY KEY (id) NOT ENFORCED,
            WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
        ) PARTITIONED BY (dt)
        WITH ('connector' = 'filesystem', 'path' = '{path}',
              'format' = 'parquet')
    """)
    ddl = show_create_table(spark, "sct_t")
    assert "PARTITIONED BY (dt)" in ddl and "WATERMARK FOR ts" in ddl
    orig = _REGISTERED["sct_t"]
    execute_ddl(spark, ddl.replace("TABLE sct_t", "TABLE sct_t2"))
    clone = _REGISTERED["sct_t2"]
    assert clone.physical == orig.physical
    assert clone.computed == orig.computed
    assert clone.watermark == orig.watermark
    assert clone.primary_key == orig.primary_key
    assert clone.partitioned == orig.partitioned
    assert clone.options == orig.options
    # SHOW CREATE TABLE routes through execute_ddl too
    out = execute_ddl(spark, "SHOW CREATE TABLE sct_t")
    assert "CREATE TABLE sct_t" in out.collect()[0].result


def test_describe_registered_table(spark, tmp_path):
    """DESCRIBE on a DDL-registered table: Flink-style column report
    (SqlRichDescribeTable output shape)."""
    from flink_spark.ddl import execute_ddl

    path = str(tmp_path / "dsc")
    execute_ddl(spark, f"""
        CREATE TABLE dsc_t (
            id BIGINT, dt STRING, double_id AS id * 2,
            PRIMARY KEY (id) NOT ENFORCED
        ) PARTITIONED BY (dt)
        WITH ('connector' = 'filesystem', 'path' = '{path}',
              'format' = 'parquet')
    """)
    rows = {r.name: r for r in execute_ddl(spark, "DESCRIBE dsc_t").collect()}
    assert rows["id"].key == "PRI(NOT ENFORCED)"
    assert rows["dt"].extras == "PARTITIONED"
    assert rows["double_id"].extras == "AS id * 2"


def test_alter_table_add_and_modify_watermark(spark, tmp_path):
    """SqlAlterTable ADD/MODIFY WATERMARK: ADD attaches a watermark to a
    table without one (error if one exists); MODIFY replaces an existing
    one (error if none). The streaming read picks up the new delay."""
    from flink_spark.ddl import _REGISTERED, execute_ddl

    p = str(tmp_path / "wm")
    spark.createDataFrame(
        [], "id long, ts timestamp"
    ).write.parquet(p)
    execute_ddl(spark, f"""
        CREATE TABLE wm_t (id BIGINT, ts TIMESTAMP(3))
        WITH ('connector' = 'filesystem', 'path' = '{p}',
              'format' = 'parquet')
    """)
    with pytest.raises(ValueError, match="no watermark"):
        execute_ddl(
            spark,
            "ALTER TABLE wm_t MODIFY (WATERMARK FOR ts AS ts - INTERVAL '1' MINUTE)",
        )
    execute_ddl(
        spark,
        "ALTER TABLE wm_t ADD (WATERMARK FOR ts AS ts - INTERVAL '5' SECOND)",
    )
    assert _REGISTERED["wm_t"].watermark == ("ts", "5 seconds")
    with pytest.raises(ValueError, match="already has a watermark"):
        execute_ddl(
            spark,
            "ALTER TABLE wm_t ADD (WATERMARK FOR ts AS ts - INTERVAL '1' MINUTE)",
        )
    execute_ddl(
        spark,
        "ALTER TABLE wm_t MODIFY (WATERMARK FOR ts AS ts - INTERVAL '2' MINUTE)",
    )
    assert _REGISTERED["wm_t"].watermark == ("ts", "2 minutes")


# ------------------------------------ r8: statement inventory (Parser.tdd)


def test_show_statements(spark, tmp_path):
    """SHOW TABLES/VIEWS/DATABASES/FUNCTIONS/CURRENT DATABASE/COLUMNS —
    the reference's ShowOperation family, with Flink's result column
    names ("table name", "database name", ...)."""
    from flink_spark.ddl import execute_ddl

    p = str(tmp_path / "t")
    spark.createDataFrame([(1, "x")], "a int, s string").write.parquet(p)
    execute_ddl(spark, f"""
        CREATE TABLE show_t (a INT, s STRING, PRIMARY KEY (a) NOT ENFORCED)
        WITH ('connector' = 'filesystem', 'path' = '{p}',
              'format' = 'parquet')
    """)
    execute_ddl(spark, "CREATE VIEW show_v AS SELECT a FROM show_t")
    tables = {r[0] for r in execute_ddl(spark, "SHOW TABLES").collect()}
    assert {"show_t", "show_v"} <= tables
    views = {r[0] for r in execute_ddl(spark, "SHOW VIEWS").collect()}
    assert "show_v" in views and "show_t" not in views
    out = execute_ddl(spark, "SHOW TABLES")
    assert out.columns == ["table name"]
    dbs = {r[0] for r in execute_ddl(spark, "SHOW DATABASES").collect()}
    assert "default" in dbs
    fns = {r[0] for r in execute_ddl(spark, "SHOW FUNCTIONS").collect()}
    assert "xxhash64" in fns or "abs" in fns
    cur = execute_ddl(spark, "SHOW CURRENT DATABASE").collect()[0][0]
    assert cur  # some database is always current
    cols = execute_ddl(spark, "SHOW COLUMNS FROM show_t").collect()
    byname = {r.name: r for r in cols}
    assert byname["a"].key == "PRI(NOT ENFORCED)"
    assert byname["s"].type == "STRING"
    # DROP VIEW clears the SHOW VIEWS entry
    execute_ddl(spark, "DROP VIEW show_v")
    assert "show_v" not in {
        r[0] for r in execute_ddl(spark, "SHOW VIEWS").collect()
    }


def test_use_and_create_database(spark):
    from flink_spark.ddl import execute_ddl

    execute_ddl(spark, "CREATE DATABASE IF NOT EXISTS ddl_inv_db")
    execute_ddl(spark, "USE ddl_inv_db")
    try:
        assert spark.catalog.currentDatabase() == "ddl_inv_db"
    finally:
        execute_ddl(spark, "USE default")
    assert spark.catalog.currentDatabase() == "default"


def test_explain_statement(spark, tmp_path):
    """SqlRichExplain (Parser.tdd:87): EXPLAIN [PLAN FOR] query returns
    the plan as one `result` string; EXPLAIN over INSERT shows the
    sink-aligned plan."""
    from flink_spark.ddl import execute_ddl

    p = str(tmp_path / "t")
    spark.createDataFrame([(1, 2.0)], "a int, v double").write.parquet(p)
    execute_ddl(spark, f"""
        CREATE TABLE exp_t (a INT, v DOUBLE)
        WITH ('connector' = 'filesystem', 'path' = '{p}',
              'format' = 'parquet')
    """)
    out = execute_ddl(spark, "EXPLAIN PLAN FOR SELECT a, sum(v) FROM exp_t GROUP BY a")
    assert out.columns == ["result"]
    txt = out.collect()[0].result
    assert "Physical Plan" in txt and "exp_t" in txt.lower() or "Aggregate" in txt
    # EXPLAIN over INSERT explains the schema-aligned sink plan
    out2 = execute_ddl(spark, "EXPLAIN INSERT INTO exp_t SELECT a, v * 2 FROM exp_t")
    txt2 = out2.collect()[0].result
    assert txt2.startswith("== Sink ==")
    # Spark-native mode passthrough
    out3 = execute_ddl(spark, "EXPLAIN FORMATTED SELECT 1 AS one")
    assert "Project" in out3.collect()[0].result


def test_analyze_table_feeds_cbo_stats(spark, tmp_path):
    """SqlAnalyzeTable (Parser.tdd:76) → Spark ANALYZE TABLE COMPUTE
    STATISTICS on a catalog mirror; the registered view then reads
    through the stats-backed catalog table so the CBO sees rowCount."""
    from flink_spark.ddl import _REGISTERED, _STATS_DB, execute_ddl

    p = str(tmp_path / "t")
    spark.createDataFrame(
        [(i, float(i)) for i in range(1000)], "a int, v double"
    ).write.parquet(p)
    execute_ddl(spark, f"""
        CREATE TABLE an_t (a INT, v DOUBLE)
        WITH ('connector' = 'filesystem', 'path' = '{p}',
              'format' = 'parquet')
    """)
    execute_ddl(spark, "ANALYZE TABLE an_t COMPUTE STATISTICS FOR ALL COLUMNS")
    # catalog mirror carries the stats
    rows = spark.sql(f"DESCRIBE FORMATTED {_STATS_DB}.an_t").collect()
    stats = next((r.data_type for r in rows if r.col_name == "Statistics"), "")
    assert "1000 rows" in stats, stats
    # the registered view reads through it (stats reach the planner)
    assert "__stats_table__" in _REGISTERED["an_t"].options
    assert spark.sql("SELECT count(*) AS n FROM an_t").collect()[0].n == 1000
    got = spark.table("an_t")._jdf.queryExecution().optimizedPlan().stats()
    assert got.rowCount().isDefined() and got.rowCount().get() == 1000
    # stats stay sticky across a re-register (ALTER TABLE SET)
    execute_ddl(spark, "ALTER TABLE an_t SET ('x' = 'y')")
    got2 = spark.table("an_t")._jdf.queryExecution().optimizedPlan().stats()
    assert got2.rowCount().isDefined()


def test_alter_view(spark, tmp_path):
    from flink_spark.ddl import execute_ddl

    execute_ddl(spark, "CREATE VIEW av_v AS SELECT 1 AS a")
    execute_ddl(spark, "ALTER VIEW av_v AS SELECT 2 AS a")
    assert spark.sql("SELECT a FROM av_v").collect()[0].a == 2
    execute_ddl(spark, "ALTER VIEW av_v RENAME TO av_v2")
    assert spark.sql("SELECT a FROM av_v2").collect()[0].a == 2
    views = {r[0] for r in execute_ddl(spark, "SHOW VIEWS").collect()}
    assert "av_v2" in views and "av_v" not in views
    with pytest.raises(ValueError, match="not found"):
        execute_ddl(spark, "ALTER VIEW never_was RENAME TO x")


def test_alter_table_primary_key_constraint(spark, tmp_path):
    """ALTER TABLE ADD/DROP PRIMARY KEY (SqlAlterTable constraint
    variants, Parser.tdd:39-41) — NOT ENFORCED required, round-trips
    through SHOW CREATE TABLE."""
    from flink_spark.ddl import _REGISTERED, execute_ddl

    p = str(tmp_path / "t")
    spark.createDataFrame([(1, "x")], "id int, s string").write.parquet(p)
    execute_ddl(spark, f"""
        CREATE TABLE pk_t (id INT, s STRING)
        WITH ('connector' = 'filesystem', 'path' = '{p}',
              'format' = 'parquet')
    """)
    with pytest.raises(ValueError, match="NOT ENFORCED"):
        execute_ddl(spark, "ALTER TABLE pk_t ADD PRIMARY KEY (id)")
    execute_ddl(spark, "ALTER TABLE pk_t ADD PRIMARY KEY (id) NOT ENFORCED")
    assert _REGISTERED["pk_t"].primary_key == ["id"]
    ddl_text = execute_ddl(spark, "SHOW CREATE TABLE pk_t").collect()[0][0]
    assert "PRIMARY KEY (id) NOT ENFORCED" in ddl_text
    with pytest.raises(ValueError, match="already exists"):
        execute_ddl(spark, "ALTER TABLE pk_t ADD PRIMARY KEY (s) NOT ENFORCED")
    execute_ddl(spark, "ALTER TABLE pk_t DROP PRIMARY KEY")
    assert _REGISTERED["pk_t"].primary_key == []
    with pytest.raises(ValueError, match="no primary key"):
        execute_ddl(spark, "ALTER TABLE pk_t DROP PRIMARY KEY")
    with pytest.raises(ValueError, match="unknown column"):
        execute_ddl(spark, "ALTER TABLE pk_t ADD PRIMARY KEY (zz) NOT ENFORCED")


def test_alter_table_compact(spark, tmp_path):
    """ALTER TABLE COMPACT (SqlAlterTableCompact): many small files →
    one per partition, same rows; partition-scoped compact touches only
    that partition's directory."""
    import os

    from flink_spark.ddl import execute_ddl

    path = str(tmp_path / "ct")
    execute_ddl(spark, f"""
        CREATE TABLE cmp_t (id INT, v DOUBLE, dt STRING)
        PARTITIONED BY (dt)
        WITH ('connector' = 'filesystem', 'path' = '{path}',
              'format' = 'parquet')
    """)
    # 4 INSERTs -> many small files across 2 partitions
    for i in range(4):
        execute_ddl(spark, f"""
            INSERT INTO cmp_t VALUES
            ({i}, {i}.0, '2024-01-01'), ({i + 10}, {i}.5, '2024-01-02')
        """)

    def files_in(part):
        d = os.path.join(path, f"dt={part}")
        return [f for f in os.listdir(d) if f.endswith(".parquet")]

    assert len(files_in("2024-01-01")) >= 4
    before = {
        (r.id, r.v, r.dt) for r in spark.sql("SELECT * FROM cmp_t").collect()
    }
    # partition-scoped compact
    execute_ddl(spark, "ALTER TABLE cmp_t PARTITION (dt='2024-01-01') COMPACT")
    assert len(files_in("2024-01-01")) == 1
    assert len(files_in("2024-01-02")) >= 4  # untouched
    after = {
        (r.id, r.v, r.dt) for r in spark.sql("SELECT * FROM cmp_t").collect()
    }
    assert after == before
    # full-table compact
    execute_ddl(spark, "ALTER TABLE cmp_t COMPACT")
    assert len(files_in("2024-01-02")) == 1
    final = {
        (r.id, r.v, r.dt) for r in spark.sql("SELECT * FROM cmp_t").collect()
    }
    assert final == before


def test_create_function_roundtrip(spark):
    """CREATE FUNCTION (SqlCreateFunction.java, Parser.tdd:52):
    registers a named Python callable under a SQL name; the UDF body
    actually evaluates; SHOW FUNCTIONS lists it; DROP removes it."""
    import pytest

    from flink_spark.ddl import _FUNCTIONS, execute_ddl

    _FUNCTIONS.pop("fn_digest", None)
    execute_ddl(spark, """
        CREATE FUNCTION fn_digest
        AS 'flink_spark.functions.udfs.str_digest' LANGUAGE PYTHON
    """)
    got = spark.sql("SELECT fn_digest('Germany') AS d").collect()[0].d
    assert got == "GER_7"
    fns = {r[0] for r in execute_ddl(spark, "SHOW FUNCTIONS").collect()}
    assert "fn_digest" in fns
    # duplicate without IF NOT EXISTS → error; with it → no-op
    with pytest.raises(ValueError, match="already exists"):
        execute_ddl(spark, """
            CREATE FUNCTION fn_digest
            AS 'flink_spark.functions.udfs.str_digest'
        """)
    execute_ddl(spark, """
        CREATE FUNCTION IF NOT EXISTS fn_digest
        AS 'flink_spark.functions.udfs.str_digest'
    """)
    execute_ddl(spark, "DROP FUNCTION fn_digest")
    assert "fn_digest" not in _FUNCTIONS
    with pytest.raises(ValueError, match="not found"):
        execute_ddl(spark, "DROP FUNCTION fn_digest")
    execute_ddl(spark, "DROP FUNCTION IF EXISTS fn_digest")  # no-op


def test_alter_function_swaps_body(spark):
    """ALTER FUNCTION (SqlAlterFunction.java): re-points an existing
    name at a new implementation; subsequent SQL calls run the new
    body."""
    import pytest

    from flink_spark.ddl import _FUNCTIONS, execute_ddl

    _FUNCTIONS.pop("fn_tax", None)
    execute_ddl(spark, """
        CREATE TEMPORARY FUNCTION fn_tax
        AS 'flink_spark.functions.udfs.add_tax' LANGUAGE PYTHON
    """)
    assert spark.sql("SELECT fn_tax(CAST(100.0 AS DOUBLE)) AS t").collect()[0].t == 108.0
    execute_ddl(spark, """
        ALTER FUNCTION fn_tax AS 'flink_spark.functions.udfs.add_tax_v2'
    """)
    assert abs(spark.sql("SELECT fn_tax(CAST(100.0 AS DOUBLE)) AS t").collect()[0].t
               - 110.0) < 1e-9
    with pytest.raises(ValueError, match="not found"):
        execute_ddl(spark, "ALTER FUNCTION no_such_fn AS 'm.a'")
    execute_ddl(spark, "DROP FUNCTION fn_tax")


def test_function_ddl_errors_and_persistence(spark):
    """Resolution errors carry actionable messages; JAVA bodies are a
    documented narrowing; TEMPORARY functions are NOT restored by
    restore_functions while persistent ones are (the metastore-attach
    analog for Python UDFs)."""
    import pytest

    from flink_spark.ddl import _FUNCTIONS, execute_ddl, restore_functions

    with pytest.raises(ValueError, match="cannot import"):
        execute_ddl(spark, "CREATE FUNCTION f_x AS 'no_such_mod.f'")
    with pytest.raises(ValueError, match="no attribute"):
        execute_ddl(
            spark, "CREATE FUNCTION f_x AS 'flink_spark.functions.udfs.nope'"
        )
    with pytest.raises(ValueError, match="only PYTHON"):
        execute_ddl(
            spark,
            "CREATE FUNCTION f_x AS 'com.example.Fn' LANGUAGE JAVA",
        )
    with pytest.raises(ValueError, match="TEMPORARY"):
        execute_ddl(
            spark,
            "CREATE SYSTEM FUNCTION f_x "
            "AS 'flink_spark.functions.udfs.add_tax'",
        )
    _FUNCTIONS.pop("fn_persist", None)
    _FUNCTIONS.pop("fn_session", None)
    execute_ddl(spark, """
        CREATE FUNCTION fn_persist
        AS 'flink_spark.functions.udfs.add_tax'
    """)
    execute_ddl(spark, """
        CREATE TEMPORARY FUNCTION fn_session
        AS 'flink_spark.functions.udfs.add_tax'
    """)
    # simulate a fresh session attach: restore re-registers ONLY the
    # persistent one (count includes any persistent functions other
    # tests left behind — assert via the record flags instead)
    restore_functions(spark)
    assert not _FUNCTIONS["fn_persist"]["temporary"]
    assert _FUNCTIONS["fn_session"]["temporary"]
    execute_ddl(spark, "DROP FUNCTION fn_persist")
    execute_ddl(spark, "DROP FUNCTION fn_session")


def test_streaming_statement_set_fan_out(spark, tmp_path):
    """Streaming STATEMENT SET (r9; the reference's primary statement-
    set use case — streaming multi-sink through one shared source
    scan): a scan.streaming source drives a foreachBatch fan-out with
    trigger(availableNow). Pins: (1) BOTH sinks receive every
    micro-batch's rows, (2) the shared scan executes once per
    micro-batch — every per-sink write plan reads the persisted batch
    (InMemoryRelation), (3) maxFilesPerTrigger=1 over 3 files yields 3
    micro-batches (3 batches x 2 sinks = 6 captured plans)."""
    import flink_spark.ddl as ddl_mod
    import pytest
    from flink_spark.ddl import execute_ddl

    src = str(tmp_path / "stream_src")
    # 3 separate files -> 3 micro-batches at maxFilesPerTrigger=1
    for part in range(3):
        spark.createDataFrame(
            [(part * 10 + i, float(part * 10 + i)) for i in range(10)],
            "id int, v double",
        ).coalesce(1).write.mode("append").parquet(src)
    for ddl in (
        f"""CREATE TABLE sss_src (id INT, v DOUBLE)
            WITH ('connector' = 'filesystem', 'path' = '{src}',
                  'format' = 'parquet', 'scan.streaming' = 'true',
                  'parquet.maxFilesPerTrigger' = '1')""",
        f"""CREATE TABLE sss_even (id INT, v DOUBLE)
            WITH ('connector' = 'filesystem', 'path' = '{tmp_path}/even',
                  'format' = 'parquet')""",
        f"""CREATE TABLE sss_all (id INT, doubled DOUBLE)
            WITH ('connector' = 'filesystem', 'path' = '{tmp_path}/all',
                  'format' = 'parquet')""",
    ):
        execute_ddl(spark, ddl)
    out = execute_ddl(spark, """
        EXECUTE STATEMENT SET
        BEGIN
          INSERT INTO sss_even SELECT id, v FROM sss_src WHERE id % 2 = 0;
          INSERT INTO sss_all SELECT id, v * 2 AS doubled FROM sss_src;
        END
    """, capture_plans=True)
    got = {(r.sink, r.rows_inserted) for r in out.collect()}
    assert got == {("sss_even", 15), ("sss_all", 30)}
    # both sinks hold every micro-batch's rows
    even = {r.id for r in spark.sql("SELECT id FROM sss_even").collect()}
    assert even == {i for i in range(30) if i % 2 == 0}
    alln = {
        (r.id, r.doubled)
        for r in spark.sql("SELECT id, doubled FROM sss_all").collect()
    }
    assert alln == {(i, float(i) * 2) for i in range(30)}
    # 3 micro-batches x 2 sinks, every write reading the persisted batch
    plans = ddl_mod._LAST_STATEMENT_SET_PLANS
    assert len(plans) == 6, len(plans)
    for p in plans:
        assert "InMemoryRelation" in p, p
    # production mode (default, r10): write-only — counts still exact
    # (Observation rides the write action), NO plan strings accumulate;
    # the fresh ephemeral checkpoint re-ingests the whole source, so the
    # sinks now hold exactly two copies (the documented duplicate-append
    # behavior of the default checkpoint)
    out2 = execute_ddl(spark, """
        EXECUTE STATEMENT SET
        BEGIN
          INSERT INTO sss_even SELECT id, v FROM sss_src WHERE id % 2 = 0;
          INSERT INTO sss_all SELECT id, v * 2 AS doubled FROM sss_src;
        END
    """)
    got2 = {(r.sink, r.rows_inserted) for r in out2.collect()}
    assert got2 == {("sss_even", 15), ("sss_all", 30)}
    assert ddl_mod._LAST_STATEMENT_SET_PLANS == []
    dup = spark.sql(
        "SELECT id, count(*) AS c FROM sss_all GROUP BY id"
    ).collect()
    assert len(dup) == 30 and all(r.c == 2 for r in dup)
    # INSERT OVERWRITE rejected in streaming sets
    with pytest.raises(ValueError, match="OVERWRITE"):
        execute_ddl(spark, """
            EXECUTE STATEMENT SET
            BEGIN
              INSERT OVERWRITE sss_even SELECT id, v FROM sss_src;
            END
        """)


def test_compile_execute_plan_roundtrip(spark, tmp_path):
    """COMPILE PLAN / EXECUTE PLAN (SqlCompilePlan/SqlExecutePlan,
    Parser.tdd:49,84-85; CompiledPlan.java): persist a statement's plan
    recipe (statement + canonical DDL of every referenced table), then
    EXECUTE PLAN re-validates the catalog and resubmits. Refuses on
    (a) existing plan file without IF NOT EXISTS, (b) format-version
    mismatch, (c) schema drift — the CompiledPlan.restore contract."""
    import json

    import pytest

    from flink_spark.ddl import _REGISTERED, execute_ddl

    src = str(tmp_path / "cp_src")
    spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "id int, v double"
    ).write.parquet(src)
    execute_ddl(spark, f"""
        CREATE TABLE cp_src (id INT, v DOUBLE)
        WITH ('connector' = 'filesystem', 'path' = '{src}',
              'format' = 'parquet')""")
    execute_ddl(spark, f"""
        CREATE TABLE cp_snk (id INT, v DOUBLE)
        WITH ('connector' = 'filesystem', 'path' = '{tmp_path}/cp_snk',
              'format' = 'parquet')""")
    plan = str(tmp_path / "plan.json")
    execute_ddl(spark, f"""
        COMPILE PLAN '{plan}' FOR
        INSERT INTO cp_snk SELECT id, v FROM cp_src WHERE id < 10
    """)
    rec = json.load(open(plan))
    assert rec["format_version"] == 1
    assert set(rec["tables"]) == {"cp_src", "cp_snk"}
    # plan file collision without IF NOT EXISTS
    with pytest.raises(ValueError, match="already exists"):
        execute_ddl(spark, f"""
            COMPILE PLAN '{plan}' FOR
            INSERT INTO cp_snk SELECT id, v FROM cp_src
        """)
    # EXECUTE PLAN runs the persisted statement
    out = execute_ddl(spark, f"EXECUTE PLAN '{plan}'")
    assert out.collect()[0][0] == 10
    assert spark.sql("SELECT count(*) n FROM cp_snk").collect()[0].n == 10
    # COMPILE AND EXECUTE PLAN, one statement (new file)
    plan2 = str(tmp_path / "plan2.json")
    out2 = execute_ddl(spark, f"""
        COMPILE AND EXECUTE PLAN '{plan2}' FOR
        INSERT INTO cp_snk SELECT id, v FROM cp_src WHERE id >= 15
    """)
    assert out2.collect()[0][0] == 5
    # schema drift: re-register cp_src with a changed column type
    execute_ddl(spark, "ALTER TABLE cp_src MODIFY (v STRING)")
    with pytest.raises(ValueError, match="schema drift"):
        execute_ddl(spark, f"EXECUTE PLAN '{plan}'")
    execute_ddl(spark, "ALTER TABLE cp_src MODIFY (v DOUBLE)")  # restore
    # dropped table refusal
    _REGISTERED.pop("cp_src")
    with pytest.raises(ValueError, match="no longer registered"):
        execute_ddl(spark, f"EXECUTE PLAN '{plan}'")
    # format-version refusal
    rec["format_version"] = 99
    json.dump(rec, open(plan, "w"))
    with pytest.raises(ValueError, match="format version"):
        execute_ddl(spark, f"EXECUTE PLAN '{plan}'")


def test_set_reset_session_config(spark):
    """SET / RESET (SqlSet/SqlReset, Parser.tdd:66-67): Flink's quoted
    form maps onto spark.conf; bare RESET restores every key the
    session set; bare SET lists config."""
    from flink_spark.ddl import execute_ddl

    execute_ddl(spark, "SET 'spark.sql.session.timeZone' = 'UTC+02:00'")
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC+02:00"
    # unquoted form too
    execute_ddl(spark, "SET spark.sql.session.timeZone = UTC")
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    rows = execute_ddl(spark, "SET").collect()
    assert ("spark.sql.session.timeZone", "UTC") in {
        (r.key, r.value) for r in rows
    }
    execute_ddl(spark, "RESET 'spark.sql.session.timeZone'")
    default_tz = spark.conf.get("spark.sql.session.timeZone")
    assert default_tz != "UTC+02:00"
    execute_ddl(spark, "SET 'spark.sql.shuffle.partitions' = '7'")
    execute_ddl(spark, "RESET")  # bare: restore everything the session set
    assert spark.conf.get("spark.sql.shuffle.partitions") != "7"


def test_catalog_statements(spark):
    """CREATE/DROP/USE CATALOG, SHOW CATALOGS / CURRENT CATALOG,
    DESCRIBE CATALOG (Parser.tdd:50,59,73-77): Flink catalogs map to
    named namespaces over the one Spark session catalog (documented
    narrowing)."""
    import pytest

    from flink_spark.ddl import execute_ddl

    execute_ddl(
        spark,
        "CREATE CATALOG cat_a WITH ('type' = 'generic_in_memory', "
        "'default-database' = 'db_a')",
    )
    cats = {r[0] for r in execute_ddl(spark, "SHOW CATALOGS").collect()}
    assert {"default_catalog", "cat_a"} <= cats
    cur = execute_ddl(spark, "SHOW CURRENT CATALOG").collect()[0][0]
    assert cur == "default_catalog"
    execute_ddl(spark, "USE CATALOG cat_a")
    assert execute_ddl(
        spark, "SHOW CURRENT CATALOG"
    ).collect()[0][0] == "cat_a"
    info = {
        (r.info_name, r.info_value)
        for r in execute_ddl(spark, "DESCRIBE CATALOG cat_a").collect()
    }
    assert ("name", "cat_a") in info
    assert ("default-database", "db_a") in info
    with pytest.raises(ValueError, match="current catalog"):
        execute_ddl(spark, "DROP CATALOG cat_a")
    execute_ddl(spark, "USE CATALOG default_catalog")
    execute_ddl(spark, "DROP CATALOG cat_a")
    with pytest.raises(ValueError, match="not found"):
        execute_ddl(spark, "DROP CATALOG cat_a")
    execute_ddl(spark, "DROP CATALOG IF EXISTS cat_a")  # no-op
    with pytest.raises(ValueError, match="not found"):
        execute_ddl(spark, "USE CATALOG cat_a")


def test_set_unquoted_trailing_semicolon(spark):
    """ADVICE r9: `SET k = v;` (unquoted, semicolon-terminated script
    form) must not capture the semicolon into the stored value."""
    from flink_spark.ddl import execute_ddl

    execute_ddl(spark, "SET spark.sql.shuffle.partitions = 7;")
    assert spark.conf.get("spark.sql.shuffle.partitions") == "7"
    execute_ddl(spark, "RESET spark.sql.shuffle.partitions")


def test_create_catalog_duplicate_raises(spark):
    """ADVICE r9: CREATE CATALOG on an existing name must raise (Flink
    CatalogManager rejects duplicate registration) — and must NOT
    silently discard the new WITH properties; IF NOT EXISTS no-ops."""
    import pytest

    from flink_spark.ddl import execute_ddl

    execute_ddl(spark, "CREATE CATALOG cat_dup WITH ('k' = 'v1')")
    with pytest.raises(ValueError, match="already exists"):
        execute_ddl(spark, "CREATE CATALOG cat_dup WITH ('k' = 'v2')")
    execute_ddl(spark, "CREATE CATALOG IF NOT EXISTS cat_dup WITH ('k' = 'v2')")
    info = {
        (r.info_name, r.info_value)
        for r in execute_ddl(spark, "DESCRIBE CATALOG cat_dup").collect()
    }
    assert ("k", "v1") in info  # original registration untouched
    execute_ddl(spark, "DROP CATALOG cat_dup")


def test_module_statements(spark):
    """LOAD/UNLOAD MODULE, USE MODULES, SHOW [FULL] MODULES
    (SqlLoadModule/SqlUnloadModule/SqlUseModules/SqlShowModules,
    Parser.tdd:64-65,96-97): ordered module registry with a used
    subset, matching ModuleManager semantics. Only 'core' is
    discoverable — a Python-first engine has no JVM ModuleFactory
    classpath discovery (documented narrowing, SURVEY deviation
    register); any other identifier gets the reference-shaped
    factory-not-found error."""
    import pytest

    from flink_spark.ddl import execute_ddl

    rows = execute_ddl(spark, "SHOW MODULES").collect()
    assert [r[0] for r in rows] == ["core"]
    full = execute_ddl(spark, "SHOW FULL MODULES").collect()
    assert [(r[0], r[1]) for r in full] == [("core", True)]
    # duplicate load rejected, like ModuleManager.loadModule
    with pytest.raises(ValueError, match="already exists"):
        execute_ddl(spark, "LOAD MODULE core")
    # non-discoverable identifier: reference-shaped factory refusal
    with pytest.raises(ValueError, match="Could not find any factory"):
        execute_ddl(spark, "LOAD MODULE hive WITH ('hive-version' = '2.3.9')")
    # USE MODULES with an empty used set is expressible via unload/load
    execute_ddl(spark, "UNLOAD MODULE core")
    assert execute_ddl(spark, "SHOW MODULES").collect() == []
    with pytest.raises(ValueError, match="No module with name 'core'"):
        execute_ddl(spark, "UNLOAD MODULE core")
    with pytest.raises(ValueError, match="No module with name 'core'"):
        execute_ddl(spark, "USE MODULES core")
    execute_ddl(spark, "LOAD MODULE core")
    with pytest.raises(ValueError, match="unique"):
        execute_ddl(spark, "USE MODULES core, core")
    execute_ddl(spark, "USE MODULES core")
    assert [r[0] for r in execute_ddl(spark, "SHOW MODULES").collect()] == [
        "core"
    ]


def test_jar_statements(spark, tmp_path):
    """ADD/REMOVE JAR + SHOW JARS (SqlAddJar/SqlRemoveJar/SqlShowJars,
    Parser.tdd:33,88-89): ADD JAR delegates to Spark's real resource
    machinery and is tracked client-side; REMOVE JAR drops the registry
    entry (the live JVM classpath retains the jar — documented
    narrowing, Spark has no REMOVE JAR)."""
    import pytest

    from flink_spark.ddl import execute_ddl

    jar = tmp_path / "fake_udf.jar"
    jar.write_bytes(b"PK\x05\x06" + b"\x00" * 18)  # minimal empty zip
    execute_ddl(spark, f"ADD JAR '{jar}'")
    jars = [r.jars for r in execute_ddl(spark, "SHOW JARS").collect()]
    assert str(jar) in jars
    # Spark's own resource list saw it too (real JVM-side effect)
    native = [r[0] for r in spark.sql("LIST JARS").collect()]
    assert any("fake_udf.jar" in p for p in native)
    with pytest.raises(ValueError, match="only accepts .jar"):
        execute_ddl(spark, "ADD JAR '/tmp/not_a_jar.txt'")
    execute_ddl(spark, f"REMOVE JAR '{jar}'")
    assert [
        r.jars for r in execute_ddl(spark, "SHOW JARS").collect()
    ] == []
    with pytest.raises(ValueError, match="hasn't been registered"):
        execute_ddl(spark, f"REMOVE JAR '{jar}'")


def test_show_create_view_and_describe_database(spark):
    """SHOW CREATE VIEW (Parser.tdd:90-101) round-trips the view's
    definition; ALTER VIEW AS updates it; DESCRIBE DATABASE delegates
    to the Spark catalog."""
    from flink_spark.ddl import execute_ddl

    execute_ddl(
        spark, "CREATE VIEW scv_v AS SELECT 1 AS a, 'x' AS b"
    )
    txt = execute_ddl(spark, "SHOW CREATE VIEW scv_v").collect()[0][0]
    assert txt == "CREATE VIEW scv_v AS SELECT 1 AS a, 'x' AS b"
    execute_ddl(spark, "ALTER VIEW scv_v AS SELECT 2 AS a")
    txt2 = execute_ddl(spark, "SHOW CREATE VIEW scv_v").collect()[0][0]
    assert txt2 == "CREATE VIEW scv_v AS SELECT 2 AS a"
    assert spark.sql("SELECT a FROM scv_v").collect()[0].a == 2
    rows = execute_ddl(spark, "DESCRIBE DATABASE default").collect()
    assert rows  # catalog metadata comes back
    execute_ddl(spark, "DROP VIEW scv_v")
