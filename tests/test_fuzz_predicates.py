"""Randomized predicate fuzzing (SURVEY.md §5.2 stretch goal — the AST-fuzzer
analog of ClickHouse upstream): hypothesis generates filter predicates from a
small grammar, rendered BOTH as a Spark Column tree and as SQL for DuckDB;
row counts and exact decimal sums must agree on the shared lineitem fixture.
"""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from clickhouseocp_spark.catalog import load_table

NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
STR_COLS = ["l_returnflag", "l_linestatus"]
STR_VALS = ["A", "N", "R", "O", "F"]


@st.composite
def leaf(draw):
    kind = draw(st.sampled_from(["num_cmp", "str_eq", "str_in", "between", "mod"]))
    if kind == "num_cmp":
        col = draw(st.sampled_from(NUM_COLS))
        op = draw(st.sampled_from(["<", "<=", ">", ">=", "=", "<>"]))
        # fixture values are 2-decimal; .x75 thresholds avoid representability ties
        val = round(draw(st.floats(0, 100, allow_nan=False)) * 4) / 4 + 0.125
        return (f"{col} {op} {val}", lambda d, c=col, o=op, v=val: _cmp(d[c], o, v))
    if kind == "str_eq":
        col = draw(st.sampled_from(STR_COLS))
        val = draw(st.sampled_from(STR_VALS))
        return (f"{col} = '{val}'", lambda d, c=col, v=val: d[c] == v)
    if kind == "str_in":
        col = draw(st.sampled_from(STR_COLS))
        vals = draw(st.lists(st.sampled_from(STR_VALS), min_size=1, max_size=3))
        sql_vals = ", ".join(f"'{v}'" for v in vals)
        return (f"{col} IN ({sql_vals})", lambda d, c=col, v=tuple(vals): d[c].isin(*v))
    if kind == "between":
        col = draw(st.sampled_from(NUM_COLS))
        lo = round(draw(st.floats(0, 50, allow_nan=False)), 1) + 0.05
        hi = lo + round(draw(st.floats(0, 50, allow_nan=False)), 1)
        return (
            f"{col} BETWEEN {lo} AND {hi}",
            lambda d, c=col, a=lo, b=hi: d[c].between(a, b),
        )
    col = "l_orderkey"
    m = draw(st.integers(2, 13))
    r = draw(st.integers(0, 1))
    return (f"{col} % {m} = {r}", lambda d, mm=m, rr=r: d[col] % mm == rr)


def _cmp(c, op, v):
    return {
        "<": c < v,
        "<=": c <= v,
        ">": c > v,
        ">=": c >= v,
        "=": c == v,
        "<>": c != v,
    }[op]


@st.composite
def predicate(draw, depth=0):
    if depth >= 2 or draw(st.booleans()):
        return draw(leaf())
    op = draw(st.sampled_from(["AND", "OR"]))
    lsql, lcol = draw(predicate(depth + 1))
    rsql, rcol = draw(predicate(depth + 1))
    if draw(st.booleans()):
        return (f"NOT (({lsql}) {op} ({rsql}))",
                lambda d, a=lcol, b=rcol, o=op: ~_combine(a(d), b(d), o))
    return (f"(({lsql}) {op} ({rsql}))",
            lambda d, a=lcol, b=rcol, o=op: _combine(a(d), b(d), o))


def _combine(a, b, op):
    return (a & b) if op == "AND" else (a | b)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{sf_dir}/lineitem.parquet')"
    )
    return con


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=predicate())
def test_random_predicate_agrees_with_oracle(spark, sf_dir, duck, pred):
    sql_pred, col_fn = pred
    li = load_table(spark, sf_dir, "lineitem")
    sres = (
        li.filter(col_fn(li))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).cast("double"),
                F.lit(0.0),
            ).alias("s"),
        )
        .collect()[0]
    )
    on, os_ = duck.execute(
        "SELECT COUNT(*), COALESCE(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE), 0.0) "
        f"FROM lineitem WHERE {sql_pred}"
    ).fetchone()
    assert sres.n == on, sql_pred
    assert sres.s == os_, sql_pred
