"""Skew mitigation (SURVEY.md 'Optimize for scale': skewed keys → salting or
AQE skew-join).

AQE's skew-join splitting (on by default, session.py) handles most cases at
runtime by splitting oversized partitions.  :func:`salted_join` is the
explicit fallback for the pathologies AQE can't fix — e.g. one hot key in a
shuffle-hash join against a side too large to broadcast: the hot side gets a
random-but-deterministic salt (hash of a unique column), the other side is
exploded across all salt values, and the join key becomes (key, salt), fanning
one reducer's load across ``salt_factor`` reducers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    salt_factor: int = 8,
    salt_source: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed side salted ``salt_factor`` ways.

    ``salt_source``: a column of the skewed side used to derive the salt
    deterministically (default: all join keys + monotonically varying input —
    here we hash the full row via all columns).  The other side is replicated
    ``salt_factor`` times (explode of a literal range) — its shuffle volume
    multiplies, so keep salt_factor minimal and apply only to genuinely hot
    keys at 100 TB (pre-filter with a heavy-hitter count when needed).
    """
    keys = list(on)
    salt_cols = [salt_source] if salt_source else [c for c in skewed.columns]
    salted = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(*salt_cols), F.lit(salt_factor)).cast("int")
    )
    replicated = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_factor)]))
    )
    return salted.join(replicated, keys + ["__salt"], how).drop("__salt")
