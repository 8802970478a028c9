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
``from``, ``filter``, ``derive``, ``select`` (incl. ``select !{...}``
exclusion → ``* EXCEPT``), ``join [side:left|right|full]``,
``group {keys} (aggregate {...})``, ``aggregate {...}``, ``sort``, ``take``
(incl. ``take a..b`` ranges), ``window rows:a..b (derive {...})`` (frame
aggregations OVER the most recent ``sort`` order — ``rolling:n`` /
``expanding:true`` shorthands included), and the relational set ops
``append`` / ``remove`` / ``intersect`` (bag semantics —
UNION/EXCEPT/INTERSECT ALL, prqlc's all-columns join lowering expressed as
set ops).
Expression sugar handled: ``==`` → ``=``, ``@2024-01-01`` date literals,
aggregation by juxtaposition (``sum x`` → ``sum(x)``), ``count this`` →
``count(*)``, ``average`` → ``avg``, ``a ?? b`` → coalesce,
``case [c => v, ..., true => d]`` → CASE WHEN, and f-strings
(``f"{a}-{b}"`` → concat).  Everything else passes through to Spark
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


def _split_on(s: str, sep: str) -> list[str]:
    """Split on a top-level multi-char separator (paren/quote aware)."""
    parts, depth, q, i, start = [], 0, None, 0, 0
    while i < len(s):
        ch = s[i]
        if q:
            if ch == q:
                q = None
        elif ch in "'\"":
            q = ch
        elif ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        elif depth == 0 and s.startswith(sep, i):
            parts.append(s[start:i])
            i += len(sep)
            start = i
            continue
        i += 1
    parts.append(s[start:])
    return parts


def _case_sugar(e: str) -> str:
    """``case [c1 => v1, c2 => v2, true => d]`` → CASE WHEN (PRQL's case
    expression; a ``true`` guard becomes the ELSE)."""
    while True:
        m = re.search(r"\bcase\s*\[", e)
        if not m:
            return e
        depth, j = 1, m.end()
        while j < len(e) and depth:
            if e[j] == "[":
                depth += 1
            elif e[j] == "]":
                depth -= 1
            j += 1
        if depth:
            raise PrqlError(f"case: unterminated bracket in {e!r}")
        arms = _split_items(e[m.end() : j - 1])
        whens, default = [], "NULL"
        for arm in arms:
            parts = _split_on(arm, "=>")
            if len(parts) != 2:
                raise PrqlError(f"case arm needs `cond => value`, got {arm!r}")
            cond, val = parts[0].strip(), parts[1].strip()
            if cond == "true":
                default = val
            else:
                whens.append(f"WHEN {cond} THEN {val}")
        if not whens:
            raise PrqlError("case needs at least one non-default arm")
        e = e[: m.start()] + f"CASE {' '.join(whens)} ELSE {default} END" + e[j:]


def _fstring_sugar(e: str) -> str:
    """``f"a{x}b{y}"`` → concat('a', x, 'b', y)."""

    def conv(m: re.Match) -> str:
        body = m.group(1)
        parts, buf, i = [], [], 0
        while i < len(body):
            ch = body[i]
            if ch == "{":
                j = body.index("}", i)
                if buf:
                    parts.append("'" + "".join(buf).replace("'", "''") + "'")
                    buf = []
                parts.append(body[i + 1 : j].strip())
                i = j + 1
            else:
                buf.append(ch)
                i += 1
        if buf:
            parts.append("'" + "".join(buf).replace("'", "''") + "'")
        return f"concat({', '.join(parts)})" if parts else "''"

    return re.sub(r'f"([^"]*)"', conv, e)


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
    e = _fstring_sugar(e)
    e = _case_sugar(e)
    # null-coalescing: a ?? b ?? c → coalesce(a, b, c)
    if "??" in e:
        parts = [p.strip() for p in _split_on(e, "??")]
        if len(parts) > 1:
            e = f"coalesce({', '.join(parts)})"
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


def _window_items(
    rest: str, last_sort: str | None, partition: list[str] | None
) -> list[str]:
    """Lower a ``window rows:a..b|rolling:n|expanding:true (derive {...})``
    body to SELECT items with explicit OVER clauses; ``partition`` (group
    keys) makes the window partition-parallel — the form to use at scale."""
    m = re.match(
        r"^(?:rows:(-?\d*)\.\.(-?\d*)|rolling:(\d+)|expanding:true)\s*"
        r"\(\s*derive\s+(.+?)\s*\)$",
        rest,
        re.S,
    )
    if not m:
        raise PrqlError(
            "window: expected `window rows:a..b|rolling:n|"
            f"expanding:true (derive {{...}})`, got {rest!r}"
        )
    if last_sort is None:
        raise PrqlError("window requires a preceding `sort`")
    if m.group(3):  # rolling:n = the n rows ending at the current one
        lo, hi = str(1 - int(m.group(3))), "0"
    elif m.group(1) is None and m.group(2) is None:
        lo, hi = "", "0"  # expanding:true
    else:
        lo, hi = m.group(1), m.group(2)

    def bound(v: str, default: str) -> str:
        if v == "":
            return default
        n = int(v)
        if n < 0:
            return f"{-n} PRECEDING"
        if n == 0:
            return "CURRENT ROW"
        return f"{n} FOLLOWING"

    frame = (
        f"ROWS BETWEEN {bound(lo, 'UNBOUNDED PRECEDING')} "
        f"AND {bound(hi, 'UNBOUNDED FOLLOWING')}"
    )
    part = f"PARTITION BY {', '.join(partition)} " if partition else ""
    over = f" OVER ({part}ORDER BY {last_sort} {frame})"
    items = []
    for it in _tuple_body(m.group(4), "window derive"):
        ma = re.match(r"^([A-Za-z_]\w*)\s*=(?!=)\s*(.+)$", it, re.S)
        if not ma:
            raise PrqlError(f"window derive needs name = agg, got {it!r}")
        items.append(f"{_agg_expr(ma.group(2))}{over} AS {ma.group(1)}")
    return items


def transpile_prql(text: str) -> str:
    """Compile a PRQL query (subset, see module doc) to one Spark SQL
    statement of nested subqueries.  Leading ``let`` statements bind
    either a tabular sub-pipeline (``let x = (from t | ...)`` — resolved
    where ``from``/``append``/``remove``/``intersect`` name it) or a
    scalar constant (textual macro substitution, PRQL's own semantics for
    simple let bindings)."""
    lets: dict[str, str] = {}
    lines = text.strip()
    while True:
        m = re.match(r"^\s*let\s+([A-Za-z_]\w*)\s*=\s*", lines)
        if not m:
            break
        rest = lines[m.end():]
        if rest.startswith("("):
            depth, j = 1, 1
            while j < len(rest) and depth:
                if rest[j] == "(":
                    depth += 1
                elif rest[j] == ")":
                    depth -= 1
                j += 1
            if depth:
                raise PrqlError(f"let {m.group(1)}: unterminated (...)")
            lets[m.group(1)] = _transpile_steps(
                _steps(rest[1 : j - 1]), lets
            )
            lines = rest[j:]
        else:
            nl = rest.find("\n")
            val = rest if nl < 0 else rest[:nl]
            repl = f"({_expr(val.strip())})"
            pat = re.compile(
                rf"(?<![\w.\x00]){re.escape(m.group(1))}(?![\w(])"
            )
            # mask PLAIN string literals so a binding name inside one never
            # substitutes (same hardening class as the KQL lets); f-strings
            # stay unmasked — their {interpolations} legitimately reference
            # let bindings
            body = rest[nl:] if nl >= 0 else ""
            lits: list[str] = []

            def _mask(mm: "re.Match[str]") -> str:
                lits.append(mm.group(0))
                return f"\x00{len(lits) - 1}\x00"

            masked = re.sub(
                r"(?<!f)'(?:[^'\\]|\\.)*'|(?<!f)\"(?:[^\"\\]|\\.)*\"",
                _mask,
                body,
            )
            masked = pat.sub(repl, masked)
            lines = re.sub(
                r"\x00(\d+)\x00", lambda mm: lits[int(mm.group(1))], masked
            )
    return _transpile_steps(_steps(lines), lets)


def _transpile_steps(steps: list[str], lets: dict[str, str] | None = None) -> str:
    lets = lets or {}
    if not steps or not steps[0].split(None, 1)[0] == "from":
        raise PrqlError("PRQL pipeline must start with `from <table>`")
    rel = None
    alias_n = 0
    last_sort: str | None = None

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
            rel = lets[rest] if rest in lets else f"SELECT * FROM {rest}"
        elif head == "filter":
            wrap("*", f" WHERE {_expr(rest)}")
        elif head == "derive":
            items = _assignments(_tuple_body(rest, "derive"), agg=False)
            wrap("*, " + ", ".join(items))
        elif head == "select":
            if rest.startswith("!{") and rest.endswith("}"):
                # select !{a, b} — exclusion form → SELECT * EXCEPT
                cols = [c.strip() for c in _split_items(rest[2:-1])]
                if not all(re.match(r"^[A-Za-z_]\w*$", c) for c in cols):
                    raise PrqlError(
                        f"select !{{...}} needs bare column names, got {rest!r}"
                    )
                wrap(f"* EXCEPT ({', '.join(cols)})")
            else:
                items = _assignments(_tuple_body(rest, "select"), agg=False)
                wrap(", ".join(items))
        elif head == "loop":
            # PRQL `loop (pipeline)`: apply the pipeline to the previous
            # iteration until it yields no rows; the output is the union of
            # every iteration including the seed — exactly SQL's recursive
            # CTE, so it lowers to WITH RECURSIVE on Spark 4's UnionLoop
            # (iteration depth governed by spark.sql.cteRecursionLevelLimit,
            # default 100 — same guard class as Kusto's scan row limits).
            if not (rest.startswith("(") and rest.endswith(")")):
                raise PrqlError(f"loop: expected `loop (pipeline)`, got {rest!r}")
            body = _steps(rest[1:-1])
            if not body:
                raise PrqlError("loop: empty pipeline")
            step_rel = _transpile_steps(["from __prql_loop"] + body, lets)
            alias_n += 1
            rel = (
                f"WITH RECURSIVE __prql_loop AS (({rel}) UNION ALL "
                f"({step_rel})) SELECT * FROM __prql_loop"
            )
        elif head == "join":
            m = re.match(r"^(?:side:(\w+)\s+)?([A-Za-z_]\w*)\s*\((.+)\)$", rest, re.S)
            if not m:
                raise PrqlError(f"join: expected `join [side:s] table (cond)`, got {rest!r}")
            side = {None: "JOIN", "inner": "JOIN", "left": "LEFT JOIN",
                    "right": "RIGHT JOIN", "full": "FULL JOIN"}.get(m.group(1))
            if side is None:
                raise PrqlError(f"join: unknown side {m.group(1)!r}")
            alias_n += 1
            cond = m.group(3).strip()
            ms = re.match(r"^==\s*([A-Za-z_]\w*)$", cond)
            if ms:
                # PRQL's `(==col)` self-equality shorthand: equi-join on the
                # same-named column of both sides
                on = f"_p{alias_n}.{ms.group(1)} = {m.group(2)}.{ms.group(1)}"
            else:
                on = _expr(cond)
            rel = (
                f"SELECT * FROM ({rel}) AS _p{alias_n} {side} {m.group(2)}"
                f" ON {on}"
            )
        elif head == "group":
            mw = re.match(
                r"^(\{[^}]*\}|[A-Za-z_]\w*)\s*\(\s*(window\s+.+)\s*\)$", rest, re.S
            )
            if mw:
                # group {keys} (window ... (derive {...})) — the PARTITIONED
                # window form: per-key frames, partition-parallel at scale
                keys = [_expr(k) for k in _tuple_body(mw.group(1), "group keys")]
                body = mw.group(2).split(None, 1)[1]
                wrap("*, " + ", ".join(_window_items(body, last_sort, keys)))
                continue
            mt = re.match(
                r"^(\{[^}]*\}|[A-Za-z_]\w*)\s*\(\s*sort\s+(\{[^}]*\}|\S+)"
                r"\s*\|\s*take\s+(\d+)\s*\)$",
                rest,
                re.S,
            )
            if mt:
                # group {keys} (sort {...} | take n) — top-n per group,
                # lowered to a per-key row_number window (per-partition
                # heaps at scale, never a global sort)
                keys = [_expr(k) for k in _tuple_body(mt.group(1), "group keys")]
                order = []
                for k in _tuple_body(mt.group(2), "group sort"):
                    k = k.strip()
                    order.append(
                        f"{_expr(k[1:])} DESC" if k.startswith("-") else _expr(k)
                    )
                alias_n += 1
                rel = (
                    f"SELECT * EXCEPT (__gr) FROM (SELECT *, row_number() "
                    f"OVER (PARTITION BY {', '.join(keys)} ORDER BY "
                    f"{', '.join(order)}) AS __gr FROM ({rel}) AS _p{alias_n}) "
                    f"AS _pt{alias_n} WHERE __gr <= {int(mt.group(3))}"
                )
                continue
            m = re.match(r"^(\{[^}]*\}|[A-Za-z_]\w*)\s*\(\s*aggregate\s+(.+?)\s*\)$", rest, re.S)
            if not m:
                raise PrqlError(
                    f"group: expected `group {{keys}} (aggregate {{...}})`, "
                    f"`group {{keys}} (window ...)`, or `group {{keys}} "
                    f"(sort {{...}} | take n)`, got {rest!r}"
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
            last_sort = ", ".join(keys)
            wrap("*", f" ORDER BY {last_sort}")
        elif head == "window":
            # window rows:a..b | rolling:n | expanding:true (derive {...})
            # — frame aggregations OVER the most recent `sort` order.  The
            # OVER clause re-states the sort keys explicitly, so the window
            # is well-defined regardless of subquery order preservation.
            # Unpartitioned (global) — prefer the `group {k} (window ...)`
            # form at scale, which partitions by the group keys.
            wrap("*, " + ", ".join(_window_items(rest, last_sort, None)))
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
            other = lets.get(rest) or f"SELECT * FROM {rest}"
            alias_n += 1
            rel = (
                f"SELECT * FROM (({rel}) {op} "
                f"({other})) AS _p{alias_n}"
            )
        else:
            raise PrqlError(f"unsupported PRQL transform {head!r}")
    return rel
