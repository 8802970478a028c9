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

TYPE-exactness policy (round 5, from the round-4 verdict): the driver hashes
collected values type-sensitively — int ≠ float ≠ Decimal — and reads the
oracle through DuckDB's *pandas* path, which widens HUGEINT (SUM of integers),
DECIMAL, and nullable-int columns to float64.  The round-4 local harness
unified all numerics to float and therefore reported 271/271 while the driver
failed 3 — exactly this class.  This comparator now mirrors the driver:
oracle rows come from ``cur.df()`` and Spark rows from ``toPandas()`` (so the
widenings — and the cases where BOTH sides widen identically, e.g. nullable
ints — are visible locally exactly as the driver sees them) and
``_canon_cell`` keeps int / float / Decimal distinct.  A query whose Spark
output is BIGINT while its oracle SUM widens to HUGEINT now fails *here*
first.  Remedies, in order: CAST the oracle aggregate back (``CAST(SUM(x) AS
BIGINT)``), avoid DECIMAL in final output columns, and COALESCE nullable int
outputs on both sides.
"""

from __future__ import annotations

import datetime as _dt
import math
import os
from dataclasses import dataclass, field
from decimal import Decimal

import duckdb
import numpy as np

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
    """Normalize one cell to a comparable tagged tuple.

    TYPE-SENSITIVE on numerics (int / float / Decimal stay distinct) so local
    results predict the driver's value hash; lenient only where the driver
    demonstrably is: NULL==NaN==NaT, and DATE == midnight-TIMESTAMP (DuckDB's
    pandas path renders DATE as a midnight Timestamp, yet date-emitting
    queries are driver-green — so both canon to the date form).
    """
    if v is None:
        return ("z",)
    try:
        if v != v:  # NaN / NaT — NULL through a float-widened or time path
            return ("z",)
    except (TypeError, ValueError):
        pass
    if isinstance(v, (bool, np.bool_)):  # before int: bool subclasses int
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return ("z",) if math.isnan(f) else ("f", f)
    if isinstance(v, Decimal):
        return ("dec", str(v))
    if isinstance(v, _dt.datetime):
        # tz-AWARE stays a DISTINCT tag (round 11, from the round-10 driver
        # RED chsql_vocab_r18): DuckDB's pandas path returns TIMESTAMPTZ as
        # datetime64[us, Etc/UTC] while Spark timestamps arrive naive — the
        # driver's dtype-sensitive hash fails that pairing even when wall
        # clocks match.  The old `v.replace(tzinfo=None)` silently passed it
        # locally; now a tz-aware vs naive pairing fails HERE first.
        tz_aware = v.tzinfo is not None
        if hasattr(v, "to_pydatetime"):
            v = v.to_pydatetime()
        if tz_aware:
            return ("tzt", v.isoformat())
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return ("d", v.date().isoformat())
        return ("t", v.isoformat())
    if isinstance(v, _dt.date):
        return ("d", v.isoformat())
    if isinstance(v, (bytes, bytearray)):
        return ("y", bytes(v).hex())
    if isinstance(v, np.ndarray) and v.ndim == 0:
        # DuckDB's pandas path renders a NULL-bearing list as a numpy MASKED
        # array (observed: list(round(x,6)) with interior NULLs): masked
        # elements iterate as 0-d masked scalars whose raw data is the fill
        # value (0.0) — NULL, not zero.  Unmasked 0-d cells unwrap normally.
        if np.ma.is_masked(v):
            return ("z",)
        return _canon_cell(v.item())
    if isinstance(v, (list, tuple, np.ndarray)):
        return ("l", tuple(_canon_cell(x) for x in v))
    if isinstance(v, dict):
        return ("m", tuple(sorted((str(k), _canon_cell(x)) for k, x in v.items())))
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


#: Driver-output-shape gate (round 9, from the round-8 verdict): the driver
#: canonicalizes collected frames via ``pandas.sort_values`` over ALL columns,
#: which hard-crashes on unhashable cells (``TypeError: unhashable type:
#: 'list'``) — exactly what turned 4 round-8 queries red despite correct
#: values.  This comparator was MORE lenient (``_canon_cell`` tuples lists),
#: so CHECKALL could not catch the class.  Any registry query whose TOP-LEVEL
#: output schema contains Array/Map/Struct must stringify it (the
#: ``array_join(transform(cast))`` convention) before returning.
_DRIVER_UNSAFE_TYPES = ("ArrayType", "MapType", "StructType")


def driver_unsafe_columns(sdf) -> list[str]:
    """Top-level columns whose Spark type would crash the driver's
    pandas-sort canonicalizer (list/dict cells are unhashable)."""
    return [
        f.name
        for f in sdf.schema.fields
        if type(f.dataType).__name__ in _DRIVER_UNSAFE_TYPES
    ]


def compare_query(
    spark: SparkSession, name: str, fn, oracle: str | None, sf_dir: str
) -> CompareResult:
    res = CompareResult(name=name, ok=True)
    sdf = fn(spark, sf_dir)
    bad = driver_unsafe_columns(sdf)
    if bad:
        res.ok = False
        res.errors.append(
            "driver-unsafe output schema (pandas.sort_values crashes on "
            f"unhashable cells): columns {bad} are Array/Map/Struct — "
            "stringify via array_join(transform(cast)) on BOTH sides"
        )
        return res
    # Pandas on the SPARK side too: the driver collects both engines through
    # pandas, so a nullable BIGINT column widens to float64 on BOTH sides and
    # hashes equal (observed: join_full_outer/any_left_join driver-green in
    # r1) — while a non-null BIGINT vs an oracle HUGEINT/DOUBLE still
    # mismatches (observed: the 3 r4 reds).  collect() on the Spark side
    # would spuriously flag every nullable-int output.
    spdf = sdf.toPandas()
    srows = list(spdf.itertuples(index=False, name=None))
    scols = list(spdf.columns)
    res.spark_rows = len(srows)

    if oracle is None:  # driver does a rows-only check for these
        res.ok = len(srows) >= 0
        return res

    con = duck_connection(sf_dir)
    try:
        return _compare_against_oracle(res, con, oracle, srows, scols, spdf)
    finally:
        con.close()


def _tz_aware_cols(df) -> set[str]:
    """Column names whose pandas dtype is timezone-AWARE (DatetimeTZDtype)."""
    return {c for c in df.columns if getattr(df.dtypes[c], "tz", None) is not None}


def _compare_against_oracle(res, con, oracle, srows, scols, spdf=None) -> CompareResult:
    cur = con.execute(oracle)
    # Pandas path, NOT fetchall(): the driver reads the oracle through
    # pandas, which widens HUGEINT / DECIMAL / nullable-int to float64.
    # fetchall() hides exactly that drift (round-4 verdict, What's wrong #2).
    odf = cur.df()
    ocols = list(odf.columns)
    orows = list(odf.itertuples(index=False, name=None))
    res.oracle_rows = len(orows)

    if sorted(scols) != sorted(ocols):
        res.ok = False
        res.errors.append(f"columns differ: spark={sorted(scols)} oracle={sorted(ocols)}")
        return res
    # Frame-level tz-awareness gate (round 11, from the round-10 driver RED
    # chsql_vocab_r18): the driver's schema hash is dtype-sensitive, so a
    # datetime64[us, Etc/UTC] oracle column vs a naive Spark column is RED
    # even with identical wall clocks (and even all-NULL, which the value
    # check below cannot see).  Oracles must CAST(timezone(...) AS TIMESTAMP).
    if spdf is not None:
        stz, otz = _tz_aware_cols(spdf), _tz_aware_cols(odf)
        if stz != otz:
            res.ok = False
            res.errors.append(
                "tz-awareness differs (driver schema hash is dtype-strict): "
                f"spark tz-aware={sorted(stz)} oracle tz-aware={sorted(otz)} "
                "— CAST(timezone(...) AS TIMESTAMP) on the oracle side"
            )
            return res
    if len(srows) != len(orows):
        res.ok = False
        res.errors.append(f"row count differs: {len(srows)} vs {len(orows)}")

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
