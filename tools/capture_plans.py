"""Capture .explain('formatted') for a set of registry queries.

Usage: python tools/capture_plans.py <out_dir> <suffix> [name ...]

Writes <out_dir>/<name>_<suffix>.txt for each query (default: the
bench.py headline set). Plans are captured against the default bench
corpus (benchdata/sf1 when present, else $SPARK_GRAFT_SF_DIR /
testdata sf0.1) so they match what bench.py actually executes.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from flink_spark import queries as Q  # noqa: E402
from flink_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or [
        n
        for n in bench.HEADLINE + bench.HEADLINE_OPTIONAL
        if n in Q.QUERIES
    ]
    sf_dir = bench._resolve_sf_dir()
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture_plans")
    for name in names:
        try:
            df = Q.QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(f"-- query: {name}  corpus: {sf_dir}\n")
                f.write(buf.getvalue())
            print(f"wrote {path}", file=sys.stderr)
        except Exception as exc:
            print(f"FAILED {name}: {exc!r}", file=sys.stderr)


if __name__ == "__main__":
    main()
