"""Interactive SQL shell over the engine's statement front-end — the
flink-sql-client analog (reference: flink-table/flink-sql-client
cli/CliClient.java + cli/parser/ClientParser.java: input accumulates
until a top-level ';', QUIT/EXIT/CLEAR/HELP are client-side commands
(ClientParser.java:174-180), BEGIN STATEMENT SET; ... END; brackets a
multi-insert block, and results render as tableau tables like
CliTableauResultView).

Routing: every completed statement goes through
``flink_spark.ddl.execute_ddl`` first (the full Flink statement
surface: DDL, catalogs, modules, SET/RESET, statement sets, COMPILE/
EXECUTE PLAN, INSERT); anything the front-end does not claim falls
through to ``spark.sql`` — exactly the dispatch the engine's tests use.

Scale note: result rendering collects at most ``max_rows + 1`` rows
(take(), not collect()) — the shell never pulls an unbounded result to
the driver; `N rows in set` reports what was PRINTED, with a truncation
marker when the result kept going.

Usage:
    python tools/sql_shell.py [--sf-dir DIR] [-f script.sql] [--max-rows N]

--sf-dir registers the testdata parquet tables (region, nation, ...)
as temp views so ad-hoc queries work immediately.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROMPT = "flink-spark-sql> "
SET_PROMPT = "statement-set> "

_HELP = """\
Available commands:
  HELP;                       print this help
  QUIT; / EXIT;               leave the shell
  CLEAR;                      clear the screen
  BEGIN STATEMENT SET; ... END;   bracket a multi-insert job
  <any SQL statement>;        DDL routes through the Flink-dialect
                              front-end, queries through Spark SQL
"""


def split_complete(buf: str) -> tuple[list[str], str]:
    """Split ``buf`` into completed statements (terminated by a ';'
    outside single-quoted literals, -- comments, and /* */ block
    comments) plus the unfinished remainder. An unterminated block
    comment keeps the statement in the remainder — the REPL waits for
    more input, like an unterminated literal."""
    stmts: list[str] = []
    cur: list[str] = []
    i, n = 0, len(buf)
    in_str = in_comment = in_block = False
    while i < n:
        c = buf[i]
        if in_block:
            cur.append(c)
            if c == "*" and i + 1 < n and buf[i + 1] == "/":
                cur.append("/")
                i += 1
                in_block = False
        elif in_comment:
            cur.append(c)
            if c == "\n":
                in_comment = False
        elif in_str:
            cur.append(c)
            if c == "'":
                in_str = False
        elif c == "'":
            in_str = True
            cur.append(c)
        elif c == "-" and i + 1 < n and buf[i + 1] == "-":
            in_comment = True
            cur.append(c)
        elif c == "/" and i + 1 < n and buf[i + 1] == "*":
            in_block = True
            cur.append(c)
        elif c == ";":
            s = "".join(cur).strip()
            if s:
                stmts.append(s)
            cur = []
        else:
            cur.append(c)
        i += 1
    return stmts, "".join(cur)


def format_table(df, max_rows: int = 1000) -> str:
    """Tableau-style rendering (CliTableauResultView's batch shape):
    header box + rows + 'N rows in set'. Collects max_rows+1 only."""
    names = df.columns
    taken = df.take(max_rows + 1)
    truncated = len(taken) > max_rows
    rows = taken[:max_rows]
    cells = [
        ["NULL" if v is None else str(v) for v in r] for r in rows
    ]
    widths = [
        max(len(names[j]), *(len(c[j]) for c in cells)) if cells
        else len(names[j])
        for j in range(len(names))
    ]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    out = [sep,
           "|" + "|".join(f" {names[j]:<{widths[j]}} "
                          for j in range(len(names))) + "|",
           sep]
    for c in cells:
        out.append("|" + "|".join(f" {c[j]:<{widths[j]}} "
                                  for j in range(len(names))) + "|")
    if cells:
        out.append(sep)
    tail = f"{len(rows)} row{'s' if len(rows) != 1 else ''} in set"
    if truncated:
        tail += f" (showing first {max_rows}; result truncated)"
    out.append(tail)
    return "\n".join(out)


def execute_statement(spark, stmt: str):
    """Route one statement: Flink-dialect front-end first, then Spark
    SQL. Returns the result DataFrame or None (pure side-effect)."""
    from flink_spark.ddl import execute_ddl

    res = execute_ddl(spark, stmt)
    if res is not None:
        return res
    return spark.sql(stmt)


def run_shell(spark, stdin=None, stdout=None, max_rows: int = 1000,
              prompt: bool | None = None) -> int:
    """The REPL loop; returns the number of statements executed.
    ``stdin``/``stdout`` injectable so tests can drive it scripted."""
    stdin = stdin or sys.stdin
    stdout = stdout or sys.stdout
    if prompt is None:
        prompt = hasattr(stdin, "isatty") and stdin.isatty()

    def say(text: str) -> None:
        stdout.write(text + "\n")

    buf = ""
    set_body: list[str] | None = None  # inside BEGIN STATEMENT SET
    executed = 0
    say("Welcome to the flink-spark SQL shell. Type HELP; for help, "
        "QUIT; to leave.")
    while True:
        if prompt:
            stdout.write(SET_PROMPT if set_body is not None else PROMPT)
            stdout.flush()
        line = stdin.readline()
        if not line:
            break  # EOF
        buf += line
        stmts, buf = split_complete(buf)
        for stmt in stmts:
            head = stmt.strip().rstrip(";").strip().upper()
            if set_body is not None:
                if head == "END":
                    body = ";\n".join(set_body)
                    set_body = None
                    stmt = f"EXECUTE STATEMENT SET BEGIN {body}; END"
                else:
                    set_body.append(stmt)
                    continue
            elif head in ("QUIT", "EXIT"):
                say("[INFO] Exiting the shell.")
                return executed
            elif head == "HELP":
                say(_HELP)
                continue
            elif head == "CLEAR":
                stdout.write("\033[2J\033[H" if prompt else "")
                continue
            elif re.match(r"^BEGIN\s+STATEMENT\s+SET$", head):
                set_body = []
                say("[INFO] Statement set opened; finish with END;")
                continue
            try:
                res = execute_statement(spark, stmt)
                executed += 1
                if res is not None:
                    say(format_table(res, max_rows))
                else:
                    say("[INFO] Execute statement succeeded.")
            except Exception as e:  # keep the shell alive, like CliClient
                first = str(e).strip().splitlines()
                say(f"[ERROR] {first[0] if first else type(e).__name__}")
    return executed


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("-f", "--file", help="run a SQL script then exit")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR"),
                    help="register the testdata parquet tables as views")
    ap.add_argument("--max-rows", type=int, default=1000)
    args = ap.parse_args(argv)

    from flink_spark.session import get_spark

    spark = get_spark(app_name="sql_shell")
    if args.sf_dir:
        from flink_spark.catalog import Catalog

        Catalog(spark, args.sf_dir).register_all()
        print(f"[INFO] Registered testdata tables from {args.sf_dir}")
    if args.file:
        with open(args.file) as fh:
            run_shell(spark, stdin=fh, prompt=False,
                      max_rows=args.max_rows)
        return 0
    run_shell(spark, max_rows=args.max_rows)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
