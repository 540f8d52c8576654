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
