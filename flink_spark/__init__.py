"""flink_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Apache Flink (reference:
ep-infosec/33_apache_flink @ 1.17-SNAPSHOT).

Architecture: DataFrame/SQL-first. Batch-relational operators map onto
Catalyst built-ins (SURVEY.md §2.2-2.8); streaming semantics map onto
Structured Streaming (§2.9); operators Spark lacks (temporal join,
streaming Top-N, CEP, CUMULATE windows) are built as compositions of
DataFrame ops or Pandas-UDF stateful operators — never as ports of the
reference's Java runtime.
"""

from flink_spark.session import get_spark
from flink_spark.catalog import Catalog

__all__ = ["get_spark", "Catalog"]
__version__ = "0.1.0"
