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


def dict_hierarchy(
    dictionary: DataFrame,
    key: str,
    parent: str,
    max_depth: int = 16,
) -> DataFrame:
    """Hierarchical-dictionary closure: ``(key, ancestors)`` where
    ``ancestors`` is CH's ``dictGetHierarchy`` chain — the key itself
    first, then each parent, stopping at parent 0/NULL (ClickHouse's
    hierarchical convention) or at ``max_depth`` (cycle guard).

    Built with ``max_depth`` broadcast self-joins on the DICTIONARY side
    only — a dictionary is bounded by contract (CH materializes it in
    RAM on every server), so the closure table stays dimension-sized and
    the fact side joins it ONCE, broadcast.  No driver collect.
    """
    d = dictionary.select(F.col(key).alias("__k"), F.col(parent).alias("__p"))
    h = d.select(
        "__k",
        F.array(F.col("__k")).alias("__chain"),
        F.col("__p").alias("__cur"),
    )
    for i in range(max_depth):
        lk = d.select(
            F.col("__k").alias(f"__lk{i}"), F.col("__p").alias(f"__lp{i}")
        )
        stop = F.col("__cur").isNull() | (F.col("__cur") == 0)
        h = (
            h.join(
                F.broadcast(lk), h["__cur"] == lk[f"__lk{i}"], "left"
            )
            .select(
                "__k",
                F.when(stop, F.col("__chain"))
                .otherwise(F.concat(F.col("__chain"), F.array(F.col("__cur"))))
                .alias("__chain"),
                F.when(stop, F.lit(None).cast(d.schema["__p"].dataType))
                .otherwise(F.col(f"__lp{i}"))
                .alias("__cur"),
            )
        )
    return h.select(F.col("__k").alias(key), F.col("__chain").alias("ancestors"))


def dict_get_hierarchy(
    df: DataFrame,
    dictionary: DataFrame,
    key: str,
    dict_key: str,
    parent: str,
    out: str = "hierarchy",
    max_depth: int = 16,
) -> DataFrame:
    """``dictGetHierarchy(dict, key)``: enrich ``df`` with the ancestor
    chain of ``df[key]`` (missing keys yield an empty array, CH's
    behavior for unknown keys)."""
    h = dict_hierarchy(dictionary, dict_key, parent, max_depth)
    h = h.select(F.col(dict_key).alias(key), F.col("ancestors").alias(out))
    empty = F.array().cast(h.schema[out].dataType)
    return df.join(F.broadcast(h), key, "left").withColumn(
        out, F.coalesce(F.col(out), empty)
    )


def dict_is_in(
    df: DataFrame,
    dictionary: DataFrame,
    child: str,
    ancestor,
    dict_key: str,
    parent: str,
    out: str = "is_in",
    max_depth: int = 16,
) -> DataFrame:
    """``dictIsIn(dict, child, ancestor)``: 1 when ``ancestor`` (a column
    name or literal Column) appears in the child's ancestor chain
    (the child itself included, CH semantics)."""
    anc = F.col(ancestor) if isinstance(ancestor, str) else F.lit(ancestor)
    tmp = "__hier_isin"
    enriched = dict_get_hierarchy(
        df, dictionary, child, dict_key, parent, out=tmp, max_depth=max_depth
    )
    return enriched.withColumn(
        out, F.array_contains(F.col(tmp), anc).cast("int")
    ).drop(tmp)


def dict_descendants(
    dictionary: DataFrame,
    key: str,
    parent: str,
    level: int = 0,
    max_depth: int = 16,
) -> DataFrame:
    """``dictGetDescendants(dict, key, level)`` closure table:
    ``(key, descendants)`` sorted ascending.  ``level=1`` is
    ``dictGetChildren``; ``level=0`` means all levels (CH's default).
    Derived by inverting the ancestor chains — one extra shuffle on the
    dimension side only."""
    h = dict_hierarchy(dictionary, key, parent, max_depth)
    pairs = h.select(
        F.col(key).alias("__desc"),
        F.posexplode(F.slice(F.col("ancestors"), 2, max_depth)),
    ).select(
        F.col("col").alias(key),
        F.col("__desc"),
        (F.col("pos") + 1).alias("__dist"),
    )
    if level > 0:
        pairs = pairs.filter(F.col("__dist") == level)
    return pairs.groupBy(key).agg(
        F.sort_array(F.collect_list("__desc")).alias("descendants")
    )


def dict_get_children(
    dictionary: DataFrame, key: str, parent: str
) -> DataFrame:
    """``dictGetChildren(dict, key)``: direct children only — the
    ``level=1`` descendants closure."""
    return dict_descendants(dictionary, key, parent, level=1, max_depth=2)
