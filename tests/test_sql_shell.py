"""Scripted e2e for tools/sql_shell.py — the flink-sql-client analog
(reference: flink-table/flink-sql-client CliClient.java; its own e2e
under flink-end-to-end-tests/test-scripts/test_sql_client.sh drives
exactly this flow: CREATE TABLE -> INSERT -> SELECT -> SHOW). The shell
is driven over injected stdin/stdout like the reference's scripted
mode, so the test exercises statement accumulation across lines,
routing (front-end DDL vs Spark SQL fallthrough), the BEGIN STATEMENT
SET block form, tableau rendering, error recovery, and QUIT."""

import io


def _drive(spark, script: str, max_rows: int = 1000):
    from tools.sql_shell import run_shell

    out = io.StringIO()
    n = run_shell(spark, stdin=io.StringIO(script), stdout=out,
                  max_rows=max_rows, prompt=False)
    return n, out.getvalue()


def test_shell_ddl_insert_select_show(spark, tmp_path):
    script = f"""
CREATE TABLE shell_t (id INT, name STRING)
WITH ('connector' = 'filesystem', 'path' = '{tmp_path}/shell_t',
      'format' = 'parquet');
INSERT INTO shell_t VALUES (1, 'a'), (2, 'b');
SELECT id, name FROM shell_t ORDER BY id;
SHOW TABLES;
QUIT;
SELECT 1;
"""
    n, out = _drive(spark, script)
    # QUIT stops the loop — the trailing SELECT never runs
    assert n == 4, out
    assert "| id | name |" in out, out
    assert "| 1  | a    |" in out and "| 2  | b    |" in out
    assert "2 rows in set" in out
    assert "shell_t" in out  # SHOW TABLES listed it
    assert "[INFO] Exiting the shell." in out


def test_shell_multiline_statement_set_and_errors(spark, tmp_path):
    # statements split across lines; a statement-set block; an error
    # statement must not kill the shell (CliClient keeps the session)
    script = f"""
CREATE TABLE ss_src (id INT)
WITH ('connector' = 'filesystem',
      'path' = '{tmp_path}/src', 'format' = 'parquet');
CREATE TABLE ss_a (id INT)
WITH ('connector' = 'filesystem', 'path' = '{tmp_path}/a',
      'format' = 'parquet');
CREATE TABLE ss_b (id INT)
WITH ('connector' = 'filesystem', 'path' = '{tmp_path}/b',
      'format' = 'parquet');
INSERT INTO ss_src VALUES (1), (2), (3);
BEGIN STATEMENT SET;
INSERT INTO ss_a SELECT id FROM ss_src WHERE id > 1;
INSERT INTO ss_b SELECT id FROM ss_src;
END;
SELECT count(*) AS c FROM ss_a;
SELECT * FROM table_that_does_not_exist;
SELECT count(*) AS c FROM ss_b;
HELP;
EXIT;
"""
    n, out = _drive(spark, script)
    assert "[INFO] Statement set opened" in out
    # the set returned one row per sink
    assert "ss_a" in out and "ss_b" in out
    assert "| 2 |" in out  # count from ss_a
    assert "| 3 |" in out  # count from ss_b
    assert "[ERROR]" in out  # bad table reported, shell survived
    assert "Available commands" in out  # HELP
    assert "[INFO] Exiting the shell." in out
    # semicolon inside a string literal must NOT split the statement
    n2, out2 = _drive(spark, "SELECT 'a;b' AS s;\nQUIT;\n")
    assert "a;b" in out2


def test_shell_comment_handling(spark):
    """ADVICE r10: a ';' inside a /* */ block comment (or a -- line
    comment) must not terminate the statement — the two halves would
    otherwise execute separately and fail. Also covers
    ddl._split_statements via a STATEMENT SET whose body carries a
    block comment with an embedded ';'."""
    n, out = _drive(
        spark,
        "SELECT /* not a terminator: ; */ 1 AS one;\n"
        "SELECT 2 -- trailing; comment\n AS two;\n"
        "QUIT;\n",
    )
    assert n == 2, out
    assert "| one |" in out and "| two |" in out
    assert "[ERROR]" not in out, out

    from flink_spark.ddl import _split_statements

    parts = _split_statements(
        "INSERT INTO a /* x; y */ SELECT 1; INSERT INTO b SELECT 2 -- z;"
        "\n; INSERT INTO c VALUES (';')"
    )
    assert parts == [
        "INSERT INTO a /* x; y */ SELECT 1",
        "INSERT INTO b SELECT 2 -- z;",
        "INSERT INTO c VALUES (';')",
    ], parts


def test_shell_truncation_and_null_rendering(spark):
    n, out = _drive(
        spark,
        "SELECT id FROM range(10) ORDER BY id;\n"
        "SELECT CAST(NULL AS INT) AS x;\nQUIT;\n",
        max_rows=4,
    )
    assert "4 rows in set (showing first 4; result truncated)" in out
    assert "| NULL |" in out or "| NULL " in out
