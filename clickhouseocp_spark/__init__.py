"""clickhouseocp_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the system packaged by DanielCasali/clickhouseocp
(ClickHouse v25.7.4.11 in an OpenShift image; see /root/reference Dockerfile:102-104).

This is NOT a port of ClickHouse's C++ internals.  Storage is columnar Parquet,
planning/execution are Spark SQL + Catalyst + Tungsten, streaming is Structured
Streaming.  ClickHouse-distinctive operations (ASOF JOIN, LIMIT BY, WITH FILL,
aggregate combinators, dictionary lookups, MergeTree-variant fold semantics) are
expressed as idiomatic DataFrame compositions in :mod:`clickhouseocp_spark.operators`
and :mod:`clickhouseocp_spark.functions`.  LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing) live alongside them and are
designed for 100 TB scale: no collect() in operators, no row-at-a-time Python UDFs
on hot paths, broadcast only bounded dimensions.
"""

from clickhouseocp_spark.session import get_spark
from clickhouseocp_spark.catalog import register_tables, load_table, TABLES

__all__ = ["get_spark", "register_tables", "load_table", "TABLES"]
__version__ = "0.1.0"
