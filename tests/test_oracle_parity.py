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


def test_no_driver_unsafe_output_schemas(spark, sf_dir):
    """Driver-output-shape hygiene gate (round-8 verdict #3): the driver
    canonicalizes collected frames via pandas.sort_values over all columns,
    which crashes on unhashable cells — so no registry query may emit a
    top-level Array/Map/Struct column.  Arrays must render comma-joined
    (array_join(transform(cast))); maps as parallel key/value strings.
    compare_query enforces the same gate per-query; this test gives one
    whole-registry failure message."""
    from clickhouseocp_spark.testing import driver_unsafe_columns

    bad = {}
    for name, q in QUERIES.items():
        cols = driver_unsafe_columns(q.fn(spark, sf_dir))
        if cols:
            bad[name] = cols
    assert not bad, f"driver-unsafe output schemas: {bad}"


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


def test_every_query_is_staged_in_a_driver_window():
    """Registry-growth discipline (round-6 verdict: the never-recorded
    backlog must strictly decrease): every registry query must either be in
    a committed _DRIVER_WINDOW_* list or already carry a driver record in a
    committed CORRECTNESS_r*.json — a new query that is staged nowhere
    fails here at birth."""
    import glob
    import json
    import os

    from clickhouseocp_spark import queries as q

    recorded = set()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for f in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        recorded |= set(json.load(open(f)).keys())
    staged = set()
    for name in dir(q):
        if name.startswith("_DRIVER_WINDOW_"):
            staged |= set(getattr(q, name))
    missing = sorted(set(q.all_queries()) - staged - recorded)
    assert not missing, f"queries staged in no driver window: {missing}"


def test_comparator_rejects_tz_aware_vs_naive(spark, sf_dir):
    """Pinned regression for the round-10 driver RED `chsql_vocab_r18`: the
    oracle's bare timezone('America/New_York', ts) returns a tz-AWARE
    datetime64[us, Etc/UTC] through DuckDB's pandas path while Spark
    timestamps arrive naive; the driver's dtype-sensitive schema/value hash
    fails that pairing even with identical wall clocks.  The old comparator
    stripped tzinfo (`v.replace(tzinfo=None)`) and passed it — CHECKALL
    green was not driver-green.  This test fails on that old code."""

    def naive_fn(sp, _sf):
        return sp.sql("SELECT TIMESTAMP '2024-01-01 12:00:00' AS ts, 1 AS k")

    # Identical wall clock, but DuckDB timezone() yields TIMESTAMPTZ.
    aware_oracle = (
        "SELECT timezone('UTC', TIMESTAMP '2024-01-01 12:00:00') AS ts, 1 AS k"
    )
    res = compare_query(spark, "tz_regression", naive_fn, aware_oracle, sf_dir)
    assert not res.ok, "tz-aware oracle vs naive Spark must FAIL locally"
    assert any("tz" in e for e in res.errors), res.errors

    # The repo convention — CAST(timezone(...) AS TIMESTAMP) — passes.
    naive_oracle = (
        "SELECT CAST(timezone('UTC', TIMESTAMP '2024-01-01 12:00:00') "
        "AS TIMESTAMP) AS ts, 1 AS k"
    )
    res2 = compare_query(spark, "tz_regression_ok", naive_fn, naive_oracle, sf_dir)
    assert res2.ok, str(res2)
