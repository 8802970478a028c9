"""Driver contract for the spark-graft builder (PySpark target).

Thin projection of :mod:`clickhouseocp_spark.queries` — the operator registry
keeps each PySpark implementation and its DuckDB oracle SQL side by side (one
entry per implemented row of SURVEY.md §2).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    from clickhouseocp_spark.queries import all_queries

    return all_queries()["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from clickhouseocp_spark.queries import all_queries

    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted → rows-only check)."""
    from clickhouseocp_spark.queries import all_queries

    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle is not None
    }
