"""ORDER BY ... WITH FILL [FROM|TO|STEP|STALENESS] [INTERPOLATE] —
gap-filling an ordered axis (SURVEY.md §2.6, a ClickHouse signature op;
ships via the reference engine pin Dockerfile:102-104.  STALENESS is the
CH 25.1 addition: fills extend at most ``staleness`` past the previous
observed row instead of all the way to the next one).

Composite strategy: derive (or accept) axis bounds per partition, generate the
dense axis with ``sequence()`` + ``explode``, left-join the data back, then
optionally carry values forward (INTERPOLATE analog) with
``last(ignorenulls)``.

Scale: the axis cardinality is (range/step) per partition — independent of the
fact-table row count, so the generated side stays tiny at 100 TB; the join is
a shuffle on (partition keys, axis) or a broadcast of the axis when global.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def with_fill(
    df: DataFrame,
    order_col: str,
    step: Column | str,
    partition_by: Sequence[str] = (),
    fill_from: Column | None = None,
    fill_to: Column | None = None,
    zero_fill: dict[str, object] | None = None,
    interpolate: Sequence[str] = (),
    interpolate_linear: Sequence[str] = (),
    staleness: Column | str | None = None,
) -> DataFrame:
    """Gap-fill ``df`` so ``order_col`` becomes dense from min (or
    ``fill_from``) to max (or ``fill_to``) in increments of ``step``.

    ``zero_fill`` maps column → literal used for generated rows (ClickHouse
    fills with type defaults); ``interpolate`` columns carry the last seen
    value forward instead (INTERPOLATE clause analog);
    ``interpolate_linear`` columns are linearly interpolated between the
    surrounding observed points (the ``INTERPOLATE (c AS <expr of prev/next>)``
    family), falling back to carry-forward/backward at the boundaries.

    ``staleness`` (CH 25.1): a generated row survives only while
    ``order_col - previous_observed < staleness`` — large gaps stay gaps.
    Works for numeric axes (numeric staleness) and date/timestamp axes
    (INTERVAL staleness); generated rows before the first observation are
    dropped, matching the "measured from the previous row" definition.

    Scale note: the global-fill shape evaluates ``df`` in several branches
    (bounds, clamp, present-keys) and the DataFrame API has no CTE reuse —
    pass a persisted ``df`` when the input is itself an expensive aggregate
    so the branches share one materialization.
    """
    step_col = F.expr(step) if isinstance(step, str) else step
    stale_col = F.expr(staleness) if isinstance(staleness, str) else staleness
    if stale_col is not None and fill_to is not None:
        # ClickHouse rejects WITH FILL TO ... STALENESS (INVALID_WITH_FILL
        #_EXPRESSION): staleness bounds fills relative to observed rows, TO
        # bounds the axis absolutely — the combination is contradictory.
        raise ValueError("WITH FILL cannot combine TO and STALENESS")
    pk = list(partition_by)
    df = df.withColumn("__orig", F.lit(True))

    # STALENESS extends fills up to staleness-1 steps past EVERY observed row
    # including the last one (CH docs: keys 0,5,10,15 STALENESS 3 emit
    # 15,16,17), so the axis upper bound is max + staleness - step; the
    # gap < staleness filter below trims interior overshoot correctly.
    mx_expr = F.max(order_col)
    if stale_col is not None:
        mx_expr = mx_expr + stale_col - step_col
    bounds = df.groupBy(*pk).agg(
        (fill_from if fill_from is not None else F.min(order_col)).alias("__mn"),
        (fill_to if fill_to is not None else mx_expr).alias("__mx"),
    )
    axis = bounds.select(
        *pk, F.explode(F.sequence(F.col("__mn"), F.col("__mx"), step_col)).alias(order_col)
    )
    if not pk:
        # Global fill, deterministic shuffle-free shape: no supported
        # BroadcastHashJoin form can broadcast the PRESERVED side of an outer
        # join, so instead of `axis LEFT JOIN data` we keep the data stream in
        # place — clamp it to the axis range via a 1-row broadcast of the
        # bounds, broadcast-anti the distinct present keys (≤ range/step rows
        # after map-side combine) against the axis, and union the missing rows
        # back with nulls.  The fact side never shuffles.
        bounded = (
            df.join(F.broadcast(bounds))
            .filter(F.col(order_col).between(F.col("__mn"), F.col("__mx")))
            .drop("__mn", "__mx")
        )
        present = bounded.select(order_col).distinct()
        missing = axis.join(F.broadcast(present), [order_col], "left_anti")
        out = bounded.unionByName(missing, allowMissingColumns=True)
    else:
        out = axis.join(df, pk + [order_col], "left")
    if stale_col is not None:
        w_prev = (
            Window.partitionBy(*pk)
            .orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        prev_obs = F.last(
            F.when(F.col("__orig"), F.col(order_col)), ignorenulls=True
        ).over(w_prev)
        out = (
            out.withColumn("__prev_obs", prev_obs)
            .filter(
                F.coalesce(F.col("__orig"), F.lit(False))
                | (
                    F.col("__prev_obs").isNotNull()
                    & ((F.col(order_col) - F.col("__prev_obs")) < stale_col)
                )
            )
            .drop("__prev_obs")
        )
    out = out.drop("__orig")
    if zero_fill:
        for c, default in zero_fill.items():
            out = out.withColumn(c, F.coalesce(F.col(c), F.lit(default)))
    if interpolate:
        w = (
            Window.partitionBy(*pk)
            .orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        for c in interpolate:
            out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    if interpolate_linear:
        # numeric position of the axis (timestamps → epoch seconds) so the
        # interpolation ratio is well-defined for any step
        dtype = dict(out.dtypes)[order_col]
        pos = (
            F.unix_timestamp(F.col(order_col).cast("timestamp"))
            if dtype.startswith(("timestamp", "date"))
            else F.col(order_col).cast("double")
        )
        back = (
            Window.partitionBy(*pk)
            .orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        fwd = (
            Window.partitionBy(*pk)
            .orderBy(order_col)
            .rowsBetween(0, Window.unboundedFollowing)
        )
        out = out.withColumn("__pos", pos)
        for c in interpolate_linear:
            known_pos = F.when(F.col(c).isNotNull(), F.col("__pos"))
            pv = F.last(c, ignorenulls=True).over(back)
            pp = F.last(known_pos, ignorenulls=True).over(back)
            nv = F.first(c, ignorenulls=True).over(fwd)
            np_ = F.first(known_pos, ignorenulls=True).over(fwd)
            ratio = (F.col("__pos") - pp) / (np_ - pp)
            lerp = pv + (nv - pv) * ratio
            out = out.withColumn(
                c,
                F.when(F.col(c).isNotNull(), F.col(c))
                .when(pp.isNull(), nv)  # before the first observation
                .when(np_.isNull(), pv)  # after the last observation
                .otherwise(lerp),
            )
        out = out.drop("__pos")
    return out
