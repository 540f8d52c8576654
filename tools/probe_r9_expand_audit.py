"""Round-9 audit (VERDICT r8 task #9): does any other ROLLUP text run
its Expand over raw joined fact rows (the q67 pre-fix pathology) —
q5 / q18 / q22 / q36 / q70 / q77 / q80 / q86?

For each, walk the formatted plan: find each Expand node id N and
check whether operator N-1 (its direct child in formatted explain) is
a HashAggregate (Expand over a pre-aggregate — fine) or something else
(Expand over raw rows — each rollup duplicate-row multiplies the raw
input). Reports rows/groups context so a "raw" verdict can be judged:
Expand over an ALREADY-GROUPED-upstream shape (e.g. a union of
aggregates) is also fine.

Usage: TPCDS_BENCH_SCALE=10 python tools/probe_r9_expand_audit.py
"""

from __future__ import annotations

import io
import contextlib
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_SCALE = os.environ.get("TPCDS_BENCH_SCALE", "10")
SF_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchdata", f"tpcds_sf{_SCALE}",
)
os.environ["SPARK_GRAFT_TPCDS_DIR"] = SF_DIR
os.environ.setdefault("SPARK_GRAFT_TPCDS_STATS", "1")

from flink_spark.session import get_spark  # noqa: E402
from flink_spark import queries as Q  # noqa: E402

ROLLUPS = ["5", "18", "22", "36", "67", "70", "77", "80", "86"]


def main() -> None:
    spark = get_spark(app_name="probe_r9_expand_audit")
    out = {}
    for qid in ROLLUPS:
        df = Q.QUERIES[f"tpcds_real_q{qid}"](spark, "x")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        expands = [int(x) for x in re.findall(r"Expand \((\d+)\)", plan)]
        aggs = {int(x) for x in re.findall(r"HashAggregate \((\d+)\)", plan)}
        unions = {int(x) for x in re.findall(r"Union \((\d+)\)", plan)}
        verdicts = []
        for e in set(expands):
            if e - 1 in aggs:
                verdicts.append("pre-aggregate")
            elif e - 1 in unions:
                verdicts.append("union-of-aggregates")
            else:
                # show what sits directly below
                m = re.search(rf"\n\(({e - 1})\) (\w+)", plan)
                verdicts.append(f"raw:{m.group(2) if m else '?'}")
        out[f"q{qid}"] = verdicts
        print(f"# q{qid}: {verdicts}", file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
