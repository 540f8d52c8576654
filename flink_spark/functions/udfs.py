"""Named Python callables for CREATE FUNCTION DDL resolution.

The reference's ``CREATE FUNCTION name AS 'identifier' LANGUAGE
PYTHON`` (SqlCreateFunction.java, Parser.tdd:52) stores the identifier
string in the catalog and resolves it to a callable at use time; this
module is the engine's resolution target namespace for its own demo /
test functions. Any importable ``module.attr`` works — users point the
DDL at their own modules the same way.

Functions here are Arrow-vectorized pandas UDFs (the repo's UDF
discipline: never row-at-a-time Python in a hot path) — at 100 TB a
registered Python function runs once per Arrow batch, not per row.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("string")
def str_digest(s: pd.Series) -> pd.Series:
    """UPPER(first 3 chars) || '_' || LENGTH — a deterministic string
    digest that DuckDB can mirror exactly (upper/substr/length), so a
    DDL-registered UDF can sit behind a value-hash oracle."""
    return s.str.upper().str.slice(0, 3) + "_" + s.str.len().astype("string")


@pandas_udf("double")
def add_tax(amount: pd.Series) -> pd.Series:
    """amount * 1.08 — numeric demo target for ALTER FUNCTION swaps."""
    return amount * 1.08


@pandas_udf("double")
def add_tax_v2(amount: pd.Series) -> pd.Series:
    """amount * 1.10 — the 'new implementation' an ALTER FUNCTION
    points an existing name at (reference SqlAlterFunction.java)."""
    return amount * 1.10
