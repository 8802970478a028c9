"""Self-check harness mirroring the driver's DuckDB-oracle comparison.

ClickHouse upstream validates with stateless SQL + golden `.reference` pairs
(SURVEY.md §5); our analog runs each registry query on Spark AND its oracle SQL
on DuckDB over the same parquet fixtures, then compares row count, column names
and exact cell values (order-insensitive).  The driver does the same at sf0.01;
running this locally first means no surprises in CORRECTNESS_r{N}.json.

Exactness policy: floats must match BITWISE.  Queries achieve this by routing
double reductions through DECIMAL sums and rounding libm-backed outputs on both
engines (see queries/__init__ docstring).  The comparator reports max float
deltas on mismatch so offending queries can be tightened.
"""

from __future__ import annotations

import datetime as _dt
import math
import os
from dataclasses import dataclass, field
from decimal import Decimal

import duckdb

from pyspark.sql import SparkSession


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Fresh DuckDB connection with the ten fixture views registered, matching
    the driver's pre-registered-view environment."""
    from clickhouseocp_spark.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _canon_cell(v):
    """Normalize one cell to a comparable tagged tuple (engine-agnostic)."""
    if v is None:
        return ("z",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("z",)  # NULL double round-trips as NaN through some paths
        return ("f", v)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        # ints up to 2^53 compare exactly as floats; keeps int64/float64
        # dtype drift between engines from producing spurious diffs
        return ("f", float(v)) if abs(v) < 2**53 else ("i", v)
    if isinstance(v, Decimal):
        return ("f", float(v))
    if isinstance(v, _dt.datetime):
        return ("t", v.replace(tzinfo=None).isoformat())
    if isinstance(v, _dt.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("l", tuple(_canon_cell(x) for x in v))
    return ("s", str(v))


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int = 0
    oracle_rows: int = 0
    errors: list[str] = field(default_factory=list)
    max_float_delta: float = 0.0

    def __str__(self) -> str:
        status = "PASS" if self.ok else "FAIL"
        msg = f"{status} {self.name} rows={self.spark_rows}"
        if not self.ok:
            msg += f" oracle_rows={self.oracle_rows} maxΔ={self.max_float_delta:.3e}\n  " + "\n  ".join(
                self.errors[:6]
            )
        return msg


def compare_query(
    spark: SparkSession, name: str, fn, oracle: str | None, sf_dir: str
) -> CompareResult:
    res = CompareResult(name=name, ok=True)
    sdf = fn(spark, sf_dir)
    srows = sdf.collect()
    scols = list(sdf.columns)
    res.spark_rows = len(srows)

    if oracle is None:  # driver does a rows-only check for these
        res.ok = len(srows) >= 0
        return res

    con = duck_connection(sf_dir)
    cur = con.execute(oracle)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    res.oracle_rows = len(orows)

    if sorted(scols) != sorted(ocols):
        res.ok = False
        res.errors.append(f"columns differ: spark={sorted(scols)} oracle={sorted(ocols)}")
        return res
    if len(srows) != len(orows):
        res.ok = False
        res.errors.append(f"row count differs: {len(srows)} vs {len(orows)}")

    order = sorted(range(len(scols)), key=lambda i: scols[i])
    sidx = [scols.index(c) for c in sorted(scols)]
    oidx = [ocols.index(c) for c in sorted(ocols)]

    def canon(rows, idx):
        return sorted(
            (tuple(_canon_cell(r[i]) for i in idx) for r in rows), key=repr
        )

    cs, co = canon(srows, sidx), canon(orows, oidx)
    mismatches = 0
    for rs, ro in zip(cs, co):
        if rs == ro:
            continue
        for cell_s, cell_o, colname in zip(rs, ro, sorted(scols)):
            if cell_s == cell_o:
                continue
            if cell_s[0] == "f" and cell_o[0] == "f":
                delta = abs(cell_s[1] - cell_o[1])
                rel = delta / max(1e-300, abs(cell_s[1]), abs(cell_o[1]))
                res.max_float_delta = max(res.max_float_delta, rel)
            mismatches += 1
            if len(res.errors) < 8:
                res.errors.append(f"col {colname}: spark={cell_s} oracle={cell_o}")
    if mismatches:
        res.ok = False
        res.errors.append(f"{mismatches} mismatched cells")
    _ = order
    con.close()
    return res


def check_all(
    spark: SparkSession, sf_dir: str, only: list[str] | None = None, verbose: bool = True
) -> list[CompareResult]:
    from clickhouseocp_spark.queries import all_queries

    results = []
    for name, q in all_queries().items():
        if only and name not in only:
            continue
        try:
            r = compare_query(spark, name, q.fn, q.oracle, sf_dir)
        except Exception as e:  # noqa: BLE001 — report, keep checking the rest
            r = CompareResult(name=name, ok=False, errors=["EXCEPTION: " + str(e)[:600]])
        results.append(r)
        if verbose:
            print(r, flush=True)
    return results
