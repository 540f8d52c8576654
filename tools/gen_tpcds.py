"""CLI wrapper: generate the dsdgen-lite TPC-DS corpus.

Usage: python tools/gen_tpcds.py [outdir]   (default benchdata/tpcds)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_spark.tpcds_data import generate  # noqa: E402

if __name__ == "__main__":
    generate(sys.argv[1] if len(sys.argv) > 1 else "/root/repo/benchdata/tpcds")
