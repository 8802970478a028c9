"""Mutation semantics (SURVEY.md §2.1 mutability model): ClickHouse INSERTs
create immutable parts; UPDATE/DELETE are asynchronous mutations that rewrite
parts; TTL expiry ages rows out.

On write-once Parquet the equivalent is recompute-and-overwrite: these
operators produce the post-mutation DataFrame; callers persist it with the
layout conventions in sources/writers.py.  At 100 TB the key practice is
partition-scoped rewrites — mutate only the partitions the predicate touches
(partition pruning makes reading them cheap; rewriting less than everything
is the point).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, functions as F


def update_where(df: DataFrame, condition: Column, assignments: Mapping[str, Column]) -> DataFrame:
    """ALTER TABLE ... UPDATE col = expr WHERE cond (mutation rewrite)."""
    out = df
    for col, expr in assignments.items():
        out = out.withColumn(col, F.when(condition, expr).otherwise(F.col(col)))
    return out


def delete_where(df: DataFrame, condition: Column) -> DataFrame:
    """ALTER TABLE ... DELETE WHERE cond / lightweight DELETE."""
    return df.filter(~condition)


def ttl_expire(df: DataFrame, ts_col: str, cutoff: Column) -> DataFrame:
    """TTL age-out: drop rows older than the cutoff (CH TTL DELETE)."""
    return df.filter(F.col(ts_col) >= cutoff)


def collapsing_merge(
    df: DataFrame,
    keys: list[str],
    sign_col: str,
    value_cols: list[str],
) -> DataFrame:
    """CollapsingMergeTree read-time fold (SURVEY §2.1): +1/-1 sign rows
    cancel pairwise; the collapsed view keeps keys with positive net sign and
    sign-weighted value sums (the standard `sum(col * sign)` read pattern)."""
    aggs = [F.sum(F.col(sign_col)).alias("net_sign")] + [
        F.sum(F.col(c).cast("decimal(38,6)") * F.col(sign_col))
        .cast("double")
        .alias(c)
        for c in value_cols
    ]
    return df.groupBy(*keys).agg(*aggs).filter(F.col("net_sign") > 0)


def obfuscate(
    df: DataFrame,
    string_cols: list[str] = (),
    numeric_jitter: Mapping[str, float] | None = None,
    keep: list[str] = (),
) -> DataFrame:
    """clickhouse-obfuscator analog (reference Dockerfile:171): deterministic
    anonymization that preserves analytic shape — strings become stable
    digests (joins still work), numerics get deterministic multiplicative
    jitter derived from the row's own hash (distributions roughly keep their
    shape, exact values are gone)."""
    out = df
    for c in string_cols:
        out = out.withColumn(c, F.concat(F.lit("anon_"), F.substring(F.md5(F.col(c)), 1, 12)))
    for c, amplitude in (numeric_jitter or {}).items():
        factor = 1.0 + (F.pmod(F.xxhash64(F.col(c)), F.lit(1000)) / 1000.0 - 0.5) * (
            2 * amplitude
        )
        out = out.withColumn(c, (F.col(c) * factor))
    _ = keep
    return out
