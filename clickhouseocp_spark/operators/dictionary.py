"""Dictionary engine analog (SURVEY.md §2.1): ClickHouse external dictionaries
(`dictGet*`, flat/hashed/cache/range_hashed layouts — reference
Dockerfile:222,231 configures builtin + external dictionaries with hourly
reload).

Spark-native equivalent: the dictionary source is a DataFrame; lookups are
broadcast hash joins (the `direct`/`hashed` layout analog) and range
dictionaries are broadcast range joins.  Broadcasting is correct here by
construction: a dictionary is a bounded key→value table, the one thing that is
always small relative to the fact side at 100 TB.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, functions as F


def dict_get(
    df: DataFrame,
    dictionary: DataFrame,
    key: str | Sequence[str],
    values: Mapping[str, object],
    dict_key: str | Sequence[str] | None = None,
) -> DataFrame:
    """``dictGetOrDefault``: enrich ``df`` with dictionary attributes.

    ``values`` maps attribute column → default (the `OrDefault` value used
    when the key is missing; pass None for `dictGetOrNull` semantics).
    """
    keys = [key] if isinstance(key, str) else list(key)
    dkeys = keys if dict_key is None else ([dict_key] if isinstance(dict_key, str) else list(dict_key))
    attrs = list(values)
    dim = dictionary.select(
        *[F.col(dk).alias(k) for dk, k in zip(dkeys, keys)], *attrs
    )
    out = df.join(F.broadcast(dim), keys, "left")
    for attr, default in values.items():
        if default is not None:
            out = out.withColumn(attr, F.coalesce(F.col(attr), F.lit(default)))
    return out


def range_dict_get(
    df: DataFrame,
    dictionary: DataFrame,
    key: str,
    point: str,
    range_start: str,
    range_end: str,
    values: Mapping[str, object],
) -> DataFrame:
    """``range_hashed`` layout: value valid while ``range_start <= point <
    range_end`` for the key.  Broadcast range join."""
    attrs = list(values)
    dim = dictionary.select(key, range_start, range_end, *attrs)
    cond = (
        (df[key] == dim[key])
        & (df[point] >= dim[range_start])
        & (df[point] < dim[range_end])
    )
    out = df.join(F.broadcast(dim), cond, "left").drop(dim[key]).drop(
        dim[range_start]
    ).drop(dim[range_end])
    for attr, default in values.items():
        if default is not None:
            out = out.withColumn(attr, F.coalesce(F.col(attr), F.lit(default)))
    return out
