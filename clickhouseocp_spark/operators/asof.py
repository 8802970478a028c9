"""ASOF JOIN — nearest-match time-series join (SURVEY.md §2.3, the signature
ClickHouse capability; upstream `src/Interpreters/` ASOF hash join, shipped via
the reference engine pin Dockerfile:102-104).

Spark has no native ASOF join.  Two implementations:

- :func:`asof_join` — union-tag-window technique: tag right rows, union both
  sides, sort within key partitions by (ts, side), carry the last-seen right
  payload forward with ``last(ignorenulls)``.  Exact, fully JVM-side, and
  100 TB-safe: ONE shuffle on the join keys, no row explosion, no Python.
  This is the default.

- :func:`asof_join_pandas` — ``pd.merge_asof`` per key group via cogrouped
  ``applyInPandas``.  Same semantics, supports `tolerance`; crosses the Arrow
  boundary so it's the fallback for semantics the window trick can't express.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str | None = None,
    direction: str = "backward",
    strict: bool = False,
    right_cols: Sequence[str] | None = None,
    suffix: str = "_r",
    how: str = "left",
) -> DataFrame:
    """ClickHouse ``ASOF JOIN``: for each left row, the single right row with
    the greatest ``right_ts <= left_ts`` (backward; ``<`` if strict) or the
    smallest ``right_ts >= left_ts`` (forward), per key.

    Ties between right rows at the same timestamp resolve to the last under
    an ascending sort of the right payload struct — deterministic.
    """
    right_ts = right_ts or left_ts
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys]
    payload = F.struct(*[F.col(c) for c in right_cols])

    l2 = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    r2 = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        payload.alias("__p"),
        F.lit(0).alias("__side"),
    )
    u = l2.unionByName(r2, allowMissingColumns=True)

    if direction == "backward":
        ts_order: Column = F.col("__ts").asc()
        # non-strict: right row at equal ts is visible to the left row → sort
        # right (side 0) first; strict: left first so equal ts is excluded
        side_order = F.col("__side").desc() if strict else F.col("__side").asc()
    elif direction == "forward":
        ts_order = F.col("__ts").desc()
        side_order = F.col("__side").desc() if strict else F.col("__side").asc()
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, side_order, F.col("__p").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = F.last("__p", ignorenulls=True).over(w)

    out_left = [c for c in left.columns]
    taken = set(out_left)
    out = (
        u.withColumn("__m", matched)
        .filter(F.col("__side") == 1)
        .select(
            *out_left,
            *[
                F.col("__m").getField(c).alias(c + suffix if c in taken else c)
                for c in right_cols
            ],
        )
    )
    if how == "inner":
        first_rc = right_cols[0] + suffix if right_cols[0] in taken else right_cols[0]
        out = out.where(F.col(first_rc).isNotNull())
    elif how != "left":
        raise ValueError(f"how must be left|inner, got {how!r}")
    return out


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str | None = None,
    direction: str = "backward",
    strict: bool = False,
    tolerance=None,
    suffix: str = "_r",
) -> DataFrame:
    """``pd.merge_asof`` per key via cogrouped applyInPandas (Arrow-batched).

    Shuffles both sides once on the keys; each group is merged in pandas.
    Supports ``tolerance`` (pandas Timedelta / numeric) which the window
    variant does not.
    """
    import pandas as pd

    right_ts = right_ts or left_ts
    keys = [on] if isinstance(on, str) else list(on)
    rcols = [c for c in right.columns if c not in keys]

    taken = set(left.columns)
    out_fields = [left.schema[c] for c in left.columns]
    renamed = {c: (c + suffix if c in taken else c) for c in rcols}
    from pyspark.sql.types import StructField, StructType

    rschema = {f.name: f for f in right.schema.fields}
    out_schema = StructType(
        out_fields
        + [StructField(renamed[c], rschema[c].dataType, True) for c in rcols]
    )

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf.sort_values(left_ts, kind="mergesort")
        if rpdf.empty:
            for c in rcols:
                lpdf[renamed[c]] = None
            return lpdf
        rp = rpdf.sort_values(right_ts, kind="mergesort")[[right_ts] + [c for c in rcols if c != right_ts]]
        merged = pd.merge_asof(
            lpdf,
            rp.rename(columns={c: renamed[c] for c in rp.columns if c in renamed}),
            left_on=left_ts,
            right_on=renamed.get(right_ts, right_ts),
            direction=direction,
            allow_exact_matches=not strict,
            tolerance=tolerance,
        )
        return merged[[f.name for f in out_schema.fields]]

    return (
        left.groupBy(*keys)
        .cogroup(right.groupBy(*keys))
        .applyInPandas(merge, schema=out_schema)
    )
