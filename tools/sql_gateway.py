"""Launch the SQL gateway (flink-sql-gateway analog) on localhost.

Usage: python tools/sql_gateway.py [--port N] [--sf-dir DIR]

--sf-dir registers the testdata parquet tables as temp views in the
ROOT session; gateway sessions fork from it (newSession()) and see the
same catalog tables but keep their own temp views/conf.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--port", type=int, default=8083)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR"))
    args = ap.parse_args(argv)

    from flink_spark.gateway import SqlGateway
    from flink_spark.session import get_spark

    spark = get_spark(app_name="sql_gateway")
    if args.sf_dir:
        from flink_spark.catalog import Catalog

        Catalog(spark, args.sf_dir).register_all()
        print(f"[INFO] Registered testdata tables from {args.sf_dir}")
    gw = SqlGateway(spark, port=args.port).start()
    print(f"[INFO] SQL gateway listening on {gw.url}")
    try:
        gw._thread.join()
    except KeyboardInterrupt:
        gw.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
