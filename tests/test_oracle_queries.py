"""Every registered query with an oracle must hash-match DuckDB at the
test scale factor — the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from flink_spark import queries as Q
from tests.conftest import SF_DIR, assert_matches_oracle

WITH_ORACLE = sorted(Q.ORACLE)
NO_ORACLE = sorted(set(Q.QUERIES) - set(Q.ORACLE))


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, ddb, name):
    df = Q.QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, ddb, Q.ORACLE[name], name)


@pytest.mark.parametrize("name", NO_ORACLE)
def test_query_runs(spark, name):
    """Weaker check for non-SQL-expressible queries: runs, stable schema."""
    df = Q.QUERIES[name](spark, SF_DIR)
    assert df.columns
    assert df.count() >= 0


def test_hash_sample_is_nested_and_deterministic(spark):
    """Smaller-rate samples are subsets of larger-rate ones, and re-runs
    select identical rows (the reproducible-data-mix contract)."""
    from flink_spark.catalog import Catalog
    from flink_spark.llm import sampling as smp

    d = Catalog(spark, "/root/testdata/sf0.01").documents
    small = {r.doc_id for r in smp.hash_sample(d, "doc_id", 0.1).select("doc_id").collect()}
    big = {r.doc_id for r in smp.hash_sample(d, "doc_id", 0.5).select("doc_id").collect()}
    again = {r.doc_id for r in smp.hash_sample(d, "doc_id", 0.1).select("doc_id").collect()}
    assert small <= big
    assert small == again
    assert 0 < len(small) < len(big) < 500
