"""PRQL pipeline dialect → Spark SQL (subset).

The reference image compiles ClickHouse's Rust components in — including the
PRQL parser (`/root/reference` Dockerfile:90-94 installs the nightly Rust
toolchain the build requires; upstream exposes it as ``SET dialect = 'prql'``).
This module provides the same entry surface for the PySpark engine:
``ChSparkEngine.sql(text, dialect="prql")``.

Design: each PRQL transform wraps the previous relation in one subquery —
``from t | filter c | derive x | group ks (aggregate as) | sort | take`` becomes
nested SELECTs that Catalyst collapses back into a single logical plan, so the
nesting is free at execution time while keeping PRQL's strict left-to-right
transform semantics (a ``filter`` after ``aggregate`` filters aggregated rows,
``derive`` columns are visible to every later transform) without any scope
analysis here.

Supported transforms (the stable core of the public PRQL spec, prql-lang.org):
``from``, ``filter``, ``derive``, ``select``, ``join [side:left|right|full]``,
``group {keys} (aggregate {...})``, ``aggregate {...}``, ``sort``, ``take``
(incl. ``take a..b`` ranges), and the relational set ops ``append`` /
``remove`` / ``intersect`` (bag semantics — UNION/EXCEPT/INTERSECT ALL,
prqlc's all-columns join lowering expressed as set ops).
Expression sugar handled: ``==`` → ``=``, ``@2024-01-01`` date literals,
aggregation by juxtaposition (``sum x`` → ``sum(x)``), ``count this`` →
``count(*)``, ``average`` → ``avg``.  Everything else passes through to Spark
SQL verbatim, which is what PRQL's own compiler does for unknown functions.
"""

from __future__ import annotations

import re

__all__ = ["transpile_prql", "PrqlError"]


class PrqlError(ValueError):
    """A PRQL pipeline the subset transpiler cannot handle (named so callers
    can distinguish dialect diagnostics from Spark analysis errors)."""


_AGG_FUNCS = {
    "sum": "sum",
    "min": "min",
    "max": "max",
    "count": "count",
    "average": "avg",
    "avg": "avg",
    "stddev": "stddev",
    "any": "any_value",
}

_DATE_LIT = re.compile(r"@(\d{4}-\d{2}-\d{2})(?:T(\d{2}:\d{2}:\d{2}))?")


def _expr(e: str) -> str:
    """PRQL expression → Spark SQL expression (textual sugar only)."""
    e = e.strip()
    e = _DATE_LIT.sub(
        lambda m: (
            f"TIMESTAMP '{m.group(1)} {m.group(2)}'"
            if m.group(2)
            else f"DATE '{m.group(1)}'"
        ),
        e,
    )
    e = re.sub(r"(?<![=!<>])==(?!=)", "=", e)
    return e


def _agg_expr(e: str) -> str:
    """Aggregate shorthand: ``sum x`` → ``sum(x)``, ``count this`` → count(*)."""
    e = e.strip()
    m = re.match(r"^(\w+)\s+(.+)$", e)
    if m and m.group(1) in _AGG_FUNCS:
        fn, arg = _AGG_FUNCS[m.group(1)], m.group(2).strip()
        if arg == "this":
            arg = "*"
        return f"{fn}({_expr(arg)})"
    return _expr(e)


def _split_items(body: str) -> list[str]:
    """Split ``{a = x, b = y}`` items on top-level commas."""
    items, depth, cur = [], 0, []
    for ch in body:
        if ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        if ch == "," and depth == 0:
            items.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        items.append(tail)
    return items


def _tuple_body(rest: str, what: str) -> list[str]:
    rest = rest.strip()
    if rest.startswith("{"):
        if not rest.endswith("}"):
            raise PrqlError(f"{what}: unterminated tuple {rest!r}")
        return _split_items(rest[1:-1])
    return [rest]


def _assignments(items: list[str], agg: bool) -> list[str]:
    out = []
    conv = _agg_expr if agg else _expr
    for it in items:
        m = re.match(r"^([A-Za-z_]\w*)\s*=(?!=)\s*(.+)$", it, re.S)
        if m:
            out.append(f"{conv(m.group(2))} AS {m.group(1)}")
        else:
            out.append(conv(it))
    return out


def _steps(text: str) -> list[str]:
    """Split the pipeline on newlines / ``|``, honoring (...) groups spanning
    lines (``group {...} (\n aggregate ... \n)``)."""
    steps, depth, cur = [], 0, []
    for ch in text:
        if ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        if (ch == "\n" or ch == "|") and depth == 0:
            s = "".join(cur).strip()
            if s and not s.startswith("#"):
                steps.append(s)
            cur = []
        else:
            cur.append(ch)
    s = "".join(cur).strip()
    if s and not s.startswith("#"):
        steps.append(s)
    return steps


def transpile_prql(text: str) -> str:
    """Compile a PRQL pipeline (subset, see module doc) to one Spark SQL
    statement of nested subqueries."""
    steps = _steps(text)
    if not steps or not steps[0].split(None, 1)[0] == "from":
        raise PrqlError("PRQL pipeline must start with `from <table>`")
    rel = None
    alias_n = 0

    def wrap(select: str, suffix: str = "") -> str:
        nonlocal alias_n, rel
        alias_n += 1
        rel = f"SELECT {select} FROM ({rel}) AS _p{alias_n}{suffix}"

    for step in steps:
        head, _, rest = step.partition(" ")
        rest = rest.strip()
        if head == "from":
            if rel is not None:
                raise PrqlError("`from` must be the first transform")
            if not re.match(r"^[A-Za-z_]\w*$", rest):
                raise PrqlError(f"from: expected a table name, got {rest!r}")
            rel = f"SELECT * FROM {rest}"
        elif head == "filter":
            wrap("*", f" WHERE {_expr(rest)}")
        elif head == "derive":
            items = _assignments(_tuple_body(rest, "derive"), agg=False)
            wrap("*, " + ", ".join(items))
        elif head == "select":
            items = _assignments(_tuple_body(rest, "select"), agg=False)
            wrap(", ".join(items))
        elif head == "join":
            m = re.match(r"^(?:side:(\w+)\s+)?([A-Za-z_]\w*)\s*\((.+)\)$", rest, re.S)
            if not m:
                raise PrqlError(f"join: expected `join [side:s] table (cond)`, got {rest!r}")
            side = {None: "JOIN", "inner": "JOIN", "left": "LEFT JOIN",
                    "right": "RIGHT JOIN", "full": "FULL JOIN"}.get(m.group(1))
            if side is None:
                raise PrqlError(f"join: unknown side {m.group(1)!r}")
            alias_n += 1
            rel = (
                f"SELECT * FROM ({rel}) AS _p{alias_n} {side} {m.group(2)}"
                f" ON {_expr(m.group(3))}"
            )
        elif head == "group":
            m = re.match(r"^(\{[^}]*\}|[A-Za-z_]\w*)\s*\(\s*aggregate\s+(.+?)\s*\)$", rest, re.S)
            if not m:
                raise PrqlError(
                    f"group: expected `group {{keys}} (aggregate {{...}})`, got {rest!r}"
                )
            keys = [_expr(k) for k in _tuple_body(m.group(1), "group keys")]
            aggs = _assignments(_tuple_body(m.group(2), "aggregate"), agg=True)
            wrap(
                ", ".join(keys + aggs),
                f" GROUP BY {', '.join(keys)}",
            )
        elif head == "aggregate":
            aggs = _assignments(_tuple_body(rest, "aggregate"), agg=True)
            wrap(", ".join(aggs))
        elif head == "sort":
            keys = []
            for k in _tuple_body(rest, "sort"):
                k = k.strip()
                keys.append(f"{_expr(k[1:])} DESC" if k.startswith("-") else _expr(k))
            wrap("*", f" ORDER BY {', '.join(keys)}")
        elif head == "take":
            mr = re.match(r"^(\d+)\.\.(\d+)$", rest)
            if mr:  # take a..b — PRQL's 1-based inclusive row range
                a, b = int(mr.group(1)), int(mr.group(2))
                if b < a:
                    raise PrqlError(f"take: empty range {rest!r}")
                suffix = f" LIMIT {b - a + 1} OFFSET {a - 1}"
            elif re.match(r"^\d+$", rest):
                suffix = f" LIMIT {rest}"
            else:
                raise PrqlError(
                    f"take: only `take n` / `take a..b` are supported, got {rest!r}"
                )
            if re.search(r" ORDER BY [^)]*$", rel):
                # keep sort+take in ONE query level: ORDER BY inside a
                # subquery does not survive the outer SELECT
                rel = f"{rel}{suffix}"
            else:
                wrap("*", suffix)
        elif head in ("append", "remove", "intersect"):
            # PRQL relational set ops (stable spec): append = bag union;
            # remove/intersect = bag difference/intersection (prqlc's
            # anti/semi-join-on-all-columns semantics expressed as the
            # equivalent EXCEPT ALL / INTERSECT ALL)
            if not re.match(r"^[A-Za-z_]\w*$", rest):
                raise PrqlError(f"{head}: expected a table name, got {rest!r}")
            op = {"append": "UNION ALL", "remove": "EXCEPT ALL",
                  "intersect": "INTERSECT ALL"}[head]
            alias_n += 1
            rel = (
                f"SELECT * FROM (({rel}) {op} "
                f"(SELECT * FROM {rest})) AS _p{alias_n}"
            )
        else:
            raise PrqlError(f"unsupported PRQL transform {head!r}")
    return rel
