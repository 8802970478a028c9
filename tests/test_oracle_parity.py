"""Every registry query must hash-match its DuckDB oracle (SURVEY.md §5 —
the stateless-SQL/golden-reference analog, and exactly what the driver's
CORRECTNESS gate runs at sf0.01)."""

import pytest

from clickhouseocp_spark.queries import all_queries
from clickhouseocp_spark.testing import compare_query

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    q = QUERIES[name]
    res = compare_query(spark, name, q.fn, q.oracle, sf_dir)
    assert res.ok, str(res)
    if q.oracle is not None:
        assert res.spark_rows == res.oracle_rows


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_registry_contract():
    """queries() and oracle_sql() stay in sync; names are stable slugs."""
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert all(isinstance(v, str) and v.strip() for v in oracles.values())
