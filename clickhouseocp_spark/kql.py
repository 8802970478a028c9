"""Kusto Query Language (KQL) pipeline dialect → Spark SQL (subset).

ClickHouse ships an experimental Kusto dialect (``SET dialect = 'kusto'``,
23.3+ — the same setting switch the reference image exposes for PRQL); this
module provides that entry surface for the PySpark engine:
``ChSparkEngine.sql(text, dialect="kusto")`` and ``SET dialect = 'kusto'``.

Design mirrors prql.py: each tabular operator wraps the previous relation in
one subquery — Catalyst collapses the nesting back into a single logical
plan, so KQL's strict left-to-right pipe semantics come for free without any
scope analysis here.

Supported tabular operators (the core of the public KQL spec,
learn.microsoft.com/kusto):

- ``T``                      — bare source table starts the pipeline
- ``| where <pred>``         — predicate sugar: ``==`` → ``=``, ``!=`` → ``<>``,
  ``and/or/not`` pass through, ``contains``/``startswith``/``endswith`` →
  LIKE forms, ``in (...)`` passes through
- ``| project c1, c2=expr``  — select list (KQL alias ``name=expr`` →
  ``expr AS name``)
- ``| extend name=expr``     — SELECT *, expr AS name
- ``| summarize [a1=agg(), ...] [by k1, ...]`` — GROUP BY (``count()`` →
  ``count(*)``, ``dcount(x)`` → ``count(DISTINCT x)``, ``avg/sum/min/max``
  pass through, ``make_list`` → collect_list)
- ``| sort by c [asc|desc], ...`` / ``| order by`` — ORDER BY (KQL default
  direction is DESC, applied when none given)
- ``| top n by c [asc|desc]`` — ORDER BY + LIMIT (default DESC)
- ``| take n`` / ``| limit n`` — LIMIT
- ``| count``                — SELECT count(*) AS Count
- ``| distinct c1, ...``     — SELECT DISTINCT
- ``| mv-expand col``        — explode an array column (LATERAL VIEW
  EXPLODE; the expanded column keeps its name)
- ``| project-away c1, ...`` — drop columns (``SELECT * EXCEPT``)
- ``| project-rename new=old, ...`` — rename columns

Documented deviation from Kusto: ``mv-expand`` and ``project-rename`` emit
the affected column at the END of the schema (the ``SELECT * EXCEPT (...),
col`` rewrite — a text-level transpiler has no schema to reproject the
original position).  Name-addressed consumers are unaffected; positional
consumers of FORMAT output see the moved column.
- ``| join kind=inner|leftouter|rightouter|fullouter (T2) on key`` —
  equi-join (single key or ``$left.a == $right.b`` form)
- ``| parse col with [*] 'lit' Name[:type] ...`` — log extraction (simple
  mode) compiled to one anchored regex; extracted columns append at the END
  of the schema (same positional deviation as mv-expand, documented above)
- ``| render <chart> [with (...)]`` — no-op passthrough (charting is
  client-side in Kusto)
- ``| top-nested N1 of K1 by agg1, top-nested N2 of K2 by agg2, ...`` —
  hierarchical top-k, arbitrary depth (per-level join-back + partitioned
  row_number); ``with others`` not in the subset
- ``| mv-apply [v =] arr on (summarize n = agg(expr), ...)`` — the
  single-summarize subset of the subquery-per-record operator, collapsed
  to per-row array folds (sum/avg/max/min/count/make_list) — no explode,
  no re-join; other subpipelines raise
- ``| make-series v=agg(x) [default=d] on ts from a to b step Nu [by k]`` —
  the Kusto time-series operator: binned aggregation over a dense
  default-filled axis (end-exclusive, start-aligned), one array row per
  group.  Series values are DOUBLE (Kusto dynamic arrays are real-typed);
  lowered to two map-side-combinable grouped aggregations + a
  constant-folded axis transform, zero joins (see ``_make_series``)

Scalar sugar: ``==``/``!=``, ``contains``/``startswith``/``endswith``,
``datetime(...)`` literals, and ``bin(x, size)`` (numeric or
30s/5m/1h/1d timespan — Kusto's bucketing scalar, lowered to floor
arithmetic / epoch-floor).

Everything else inside scalar expressions passes through to Spark SQL
verbatim (same policy as prql.py — KQL's scalar layer is close enough to SQL for the
shared core: arithmetic, comparisons, function calls).
"""

from __future__ import annotations

import re

__all__ = ["transpile_kql", "KqlError"]


class KqlError(ValueError):
    """Raised when KQL text falls outside the supported subset."""


def _expr(e: str) -> str:
    """KQL scalar-expression sugar → Spark SQL."""
    e = e.strip()
    # string predicates first (word-boundary, case-insensitive keywords)
    e = re.sub(
        r"(\S+)\s+contains\s+'([^']*)'",
        lambda m: f"{m.group(1)} ILIKE '%{m.group(2)}%'",
        e,
        flags=re.IGNORECASE,
    )
    e = re.sub(
        r"(\S+)\s+startswith\s+'([^']*)'",
        lambda m: f"{m.group(1)} ILIKE '{m.group(2)}%'",
        e,
        flags=re.IGNORECASE,
    )
    e = re.sub(
        r"(\S+)\s+endswith\s+'([^']*)'",
        lambda m: f"{m.group(1)} ILIKE '%{m.group(2)}'",
        e,
        flags=re.IGNORECASE,
    )
    e = re.sub(r"!=", "<>", e)
    e = re.sub(r"==", "=", e)
    # KQL datetime(...) literal → timestamp literal
    e = re.sub(
        r"\bdatetime\(([^)]+)\)",
        lambda m: f"TIMESTAMP '{m.group(1).strip()}'",
        e,
        flags=re.IGNORECASE,
    )
    # bin(x, size): Kusto's bucketing scalar.  Numeric size → floor
    # arithmetic; timespan literal (30s/5m/1h/1d) → epoch-floor back to
    # timestamp — both stay whole-stage-codegen expressions.
    e = re.sub(
        r"\bbin\(([^,]+),\s*([0-9.]+)(s|m|h|d)\s*\)",
        lambda m: (
            lambda secs: (
                f"to_timestamp(floor(unix_timestamp({m.group(1).strip()}) "
                f"/ {secs}) * {secs})"
            )
        )({"s": 1, "m": 60, "h": 3600, "d": 86400}[m.group(3)] * float(m.group(2))),
        e,
        flags=re.IGNORECASE,
    )
    e = re.sub(
        r"\bbin\(([^,]+),\s*([0-9.]+)\s*\)",
        lambda m: (
            f"(floor({m.group(1).strip()} / {m.group(2)}) * {m.group(2)})"
        ),
        e,
        flags=re.IGNORECASE,
    )
    return e


def _agg_expr(e: str) -> str:
    e = _expr(e)
    e = re.sub(r"\bcount\(\s*\)", "count(*)", e, flags=re.IGNORECASE)
    e = re.sub(
        r"\bdcount\(([^)]+)\)",
        lambda m: f"count(DISTINCT {m.group(1)})",
        e,
        flags=re.IGNORECASE,
    )
    e = re.sub(r"\bmake_list\(", "collect_list(", e, flags=re.IGNORECASE)
    e = re.sub(r"\bmake_set\(", "collect_set(", e, flags=re.IGNORECASE)
    return e


def _split_top(s: str, sep: str = ",") -> list[str]:
    """Split on top-level separators (paren/quote aware)."""
    out, depth, cur, q = [], 0, [], None
    for ch in s:
        if q:
            cur.append(ch)
            if ch == q:
                q = None
            continue
        if ch in "'\"":
            q = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == sep and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return [p for p in out if p]


def _alias_item(item: str, agg: bool = False) -> str:
    """KQL ``name = expr`` → ``expr AS name``; bare exprs pass through."""
    m = re.match(r"^([A-Za-z_]\w*)\s*=\s*(?![=])(.+)$", item.strip())
    conv = _agg_expr if agg else _expr
    if m:
        return f"{conv(m.group(2))} AS {m.group(1)}"
    return conv(item)


def _order_list(s: str, default_desc: bool = True) -> str:
    parts = []
    for item in _split_top(s):
        if re.search(r"\b(asc|desc)\s*$", item, re.IGNORECASE):
            parts.append(_expr(item))
        else:
            parts.append(_expr(item) + (" DESC" if default_desc else ""))
    return ", ".join(parts)


def _make_series(sub: str, rest: str) -> str:
    """Lower ``make-series`` (Kusto's signature time-series operator) to one
    Spark SQL statement built entirely from JVM expressions.

    Grammar subset::

        make-series s1=agg(expr) [default = lit][, s2=...]
                    on TsCol from <start> to <end> step <Ns|m|h|d>
                    [by k1, k2]

    Lowering: (1) bin rows to ``start``-aligned buckets and aggregate per
    (keys, bin); (2) fold each group's bins into one ``map<bin, struct>``;
    (3) project a constant-foldable axis ``sequence(0, n-1)`` →
    ``to_timestamp`` and ``transform`` it, filling gaps with each series'
    default via ``try_element_at`` (ANSI-safe missing-key lookup).  The gap
    fill is a map lookup, not a join — the whole operator is two map-side-
    combinable grouped aggregations ((keys, bin), then keys) and zero
    joins; the axis is folded by Catalyst when start/end/step are literals
    (the only supported Kusto forms are literal anyway).
    """
    m = re.match(
        r"^(.*?)\s+on\s+([A-Za-z_]\w*)\s+from\s+(.+?)\s+to\s+(.+?)"
        r"\s+step\s+([0-9.]+)(s|m|h|d)\s*(?:\bby\b\s+(.+))?$",
        rest,
        re.IGNORECASE | re.DOTALL,
    )
    if not m:
        raise KqlError(
            "make-series needs 'aggs on col from a to b step Nu [by keys]', "
            f"got {rest!r}"
        )
    aggs_txt, ts_col, frm, to, step_n, step_u, by = m.groups()
    secs = {"s": 1, "m": 60, "h": 3600, "d": 86400}[step_u.lower()] * float(step_n)
    secs = int(secs) if float(secs).is_integer() else secs
    frm_sql, to_sql = _expr(frm), _expr(to)
    series = []  # (name, agg_sql, default_sql)
    for item in _split_top(aggs_txt):
        ma = re.match(r"^([A-Za-z_]\w*)\s*=\s*(.+?)(?:\s+default\s*=\s*(\S+))?$",
                      item.strip(), re.IGNORECASE)
        if not ma:
            raise KqlError(f"make-series series needs name=agg(expr), got {item!r}")
        series.append((ma.group(1), _agg_expr(ma.group(2)),
                       _expr(ma.group(3)) if ma.group(3) else "0"))
    keys = [k.strip() for k in _split_top(by)] if by else []
    f_ep = f"unix_timestamp({frm_sql})"
    bin_expr = (
        f"to_timestamp({f_ep} + CAST(floor((unix_timestamp({ts_col}) - {f_ep})"
        f" / {secs}) AS BIGINT) * {secs})"
    )
    key_sel = "".join(f"{k}, " for k in keys)
    v_sel = ", ".join(
        f"CAST({agg} AS DOUBLE) AS __v{i}" for i, (_n, agg, _d) in enumerate(series)
    )
    inner = (
        f"SELECT {key_sel}{bin_expr} AS __bin, {v_sel} FROM {sub} "
        f"WHERE {ts_col} >= {frm_sql} AND {ts_col} < {to_sql} "
        f"GROUP BY {key_sel}{bin_expr}"
    )
    v_struct = ", ".join(f"__v{i}" for i in range(len(series)))
    mapped = (
        f"SELECT {key_sel}map_from_entries(collect_list(struct(__bin, "
        f"struct({v_struct})))) AS __m FROM ({inner}) __msi"
    )
    if keys:
        mapped += f" GROUP BY {', '.join(keys)}"
    n_bins = (
        f"CAST(ceil((unix_timestamp({to_sql}) - {f_ep}) / {secs}) AS INT)"
    )
    axis = (
        f"CASE WHEN {n_bins} > 0 THEN transform(sequence(0, {n_bins} - 1), "
        f"__i -> to_timestamp({f_ep} + CAST(__i AS BIGINT) * {secs})) "
        f"ELSE array() END"
    )
    fills = ", ".join(
        f"transform({axis}, __t -> coalesce(try_element_at(__m, __t).__v{i}, "
        f"CAST({d} AS DOUBLE))) AS {name}"
        for i, (name, _a, d) in enumerate(series)
    )
    return (
        f"SELECT {key_sel}{fills}, {axis} AS {ts_col} FROM ({mapped}) __mso"
    )


#: parse column capture types → Spark cast targets
_PARSE_TYPES = {"string": None, "long": "bigint", "int": "int",
                "real": "double", "double": "double", "datetime": "timestamp",
                "bool": "boolean"}


def _parse_op(sub: str, rest: str) -> str:
    """Lower ``parse <col> with [*] 'lit' Name[:type] 'lit' ...`` — Kusto's
    log-extraction operator (simple mode).

    Lowering: the literal/capture sequence compiles to ONE anchored regex
    (literals escaped, captures non-greedy ``(.*?)``, a trailing capture
    takes the rest of the string), evaluated once per extracted column via
    ``regexp_extract`` — whole-stage-codegen expressions, no UDF.  A leading
    ``*`` unanchors the start, matching Kusto.  Rows that don't match yield
    empty strings / NULL casts (Kusto's simple-mode behavior for non-matching
    rows is empty values too)."""
    m = re.match(r"^(\S+)\s+with\s+(.*)$", rest.strip(), re.IGNORECASE | re.DOTALL)
    if not m:
        raise KqlError(f"parse needs '<col> with <pattern>', got {rest!r}")
    col, pat = m.group(1), m.group(2).strip()
    toks = re.findall(
        r"'(?:[^']*)'|\*|[A-Za-z_]\w*(?:\s*:\s*\w+)?", pat
    )
    if not toks or "".join(toks).strip() == "":
        raise KqlError(f"parse pattern is empty: {pat!r}")
    rx_parts, caps = ["^"], []  # caps: (name, cast_type)
    if toks and toks[0] == "*":
        rx_parts = ["^.*?"]
        toks = toks[1:]
    for i, t in enumerate(toks):
        if t.startswith("'"):
            rx_parts.append(re.escape(t[1:-1]))
        elif t == "*":
            rx_parts.append(".*?")
        else:
            mm = re.match(r"^([A-Za-z_]\w*)(?:\s*:\s*(\w+))?$", t)
            name, typ = mm.group(1), (mm.group(2) or "string").lower()
            if typ not in _PARSE_TYPES:
                raise KqlError(f"parse: unsupported type {typ!r}")
            last = i == len(toks) - 1
            rx_parts.append("(.*)$" if last else "(.*?)")
            caps.append((name, _PARSE_TYPES[typ]))
    if not caps:
        raise KqlError(f"parse pattern captures no columns: {pat!r}")
    rx = "".join(rx_parts)
    if not rx.endswith("$"):
        rx += ".*$"
    rx_sql = rx.replace("\\", "\\\\").replace("'", "''")
    sels = []
    for gi, (name, cast) in enumerate(caps, start=1):
        e = f"regexp_extract({col}, '{rx_sql}', {gi})"
        if cast == "timestamp":
            e = f"try_to_timestamp({e})"
        elif cast:
            e = f"try_cast({e} AS {cast})"
        sels.append(f"{e} AS {name}")
    return f"SELECT *, {', '.join(sels)} FROM {sub}"


#: mv-apply summarize aggregates → array-expression builders.  Each takes
#: (col_sql, var, expr_sql) where expr is in terms of the element variable.
_MV_APPLY_AGGS = {
    "sum": lambda c, v, e: (
        f"aggregate({c}, CAST(0 AS DOUBLE), (__acc, {v}) -> "
        f"__acc + CAST({e} AS DOUBLE))"
    ),
    "avg": lambda c, v, e: (
        f"(aggregate({c}, CAST(0 AS DOUBLE), (__acc, {v}) -> "
        f"__acc + CAST({e} AS DOUBLE)) / nullif(size({c}), 0))"
    ),
    "max": lambda c, v, e: f"array_max(transform({c}, {v} -> {e}))",
    "min": lambda c, v, e: f"array_min(transform({c}, {v} -> {e}))",
    "count": lambda c, v, e: f"size({c})",
    "make_list": lambda c, v, e: f"transform({c}, {v} -> {e})",
}


def _mv_apply(sub: str, rest: str) -> str:
    """Lower ``mv-apply [v =] arr on ( summarize n = agg(expr), ... )`` —
    the single-summarize subset of Kusto's subquery-per-record operator.

    Because the subpipeline is one aggregation over the expanded elements,
    the whole operator collapses to per-row ARRAY folds (aggregate /
    transform / size) — no explode, no re-join, no shuffle; the general
    arbitrary-subpipeline form stays outside the subset and raises."""
    m = re.match(
        r"^(?:([A-Za-z_]\w*)\s*=\s*)?([A-Za-z_]\w*)\s+on\s+"
        r"\(\s*summarize\s+(.+?)\s*\)$",
        rest.strip(),
        re.IGNORECASE | re.DOTALL,
    )
    if not m:
        raise KqlError(
            "mv-apply subset is '[v =] arr on (summarize n = agg(expr), ...)'"
            f", got {rest!r}"
        )
    var = m.group(1) or m.group(2)
    col = m.group(2)
    sels = []
    for item in _split_top(m.group(3)):
        ma = re.match(
            r"^([A-Za-z_]\w*)\s*=\s*([A-Za-z_]\w*)\s*\((.*)\)$", item.strip(),
            re.DOTALL,
        )
        if not ma:
            raise KqlError(f"mv-apply summarize needs name = agg(expr), got {item!r}")
        name, fn, arg = ma.group(1), ma.group(2).lower(), _expr(ma.group(3))
        builder = _MV_APPLY_AGGS.get(fn)
        if builder is None:
            raise KqlError(
                f"mv-apply: unsupported aggregate {fn!r} "
                f"(subset: {', '.join(sorted(_MV_APPLY_AGGS))})"
            )
        if fn == "count" and arg.strip():
            raise KqlError("mv-apply: count() takes no argument in the subset")
        sels.append(f"{builder(col, var, arg or var)} AS {name}")
    return f"SELECT *, {', '.join(sels)} FROM {sub}"


def _top_nested(sub: str, rest: str) -> str:
    """Lower ``top-nested N1 of K1 by [n1 =] agg1, top-nested N2 of K2 by
    ... `` — Kusto's hierarchical top-k.  Arbitrary depth: level k joins the
    source to the level-(k-1) winners on all prior keys, aggregates, and
    keeps the per-partition top N via row_number (Spark lowers that to
    per-partition heaps, no global sort).  ``with others`` is not in the
    subset."""
    specs = []
    for item in _split_top(rest):
        item = re.sub(r"^top-nested\s+", "", item.strip(), flags=re.IGNORECASE)
        m = re.match(
            r"^(\d+)\s+of\s+([A-Za-z_]\w*)\s+by\s+"
            r"(?:([A-Za-z_]\w*)\s*=\s*)?(.+)$",
            item,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise KqlError(
                f"top-nested needs 'N of col by [name=]agg', got {item!r}"
            )
        n, key, name, agg = m.groups()
        specs.append((int(n), key, name or f"aggregated_{key}", _agg_expr(agg)))
    if not specs:
        raise KqlError("top-nested needs at least one spec")
    rel = None
    prior: list[tuple[str, str]] = []  # (key, value_alias) selected so far
    for n, key, name, agg in specs:
        if rel is None:
            grouped = (
                f"SELECT {key}, {agg} AS {name} FROM {sub} GROUP BY {key}"
            )
            ranked = (
                f"SELECT *, row_number() OVER (ORDER BY {name} DESC, {key}) "
                f"AS __rnk FROM ({grouped}) __g"
            )
        else:
            join_on = " AND ".join(f"__t.{k} = __p.{k}" for k, _v in prior)
            keep = ", ".join(
                [f"__t.{k}" for k, _v in prior]
                + [f"__p.{v}" for _k, v in prior]
            )
            grouped = (
                f"SELECT {keep}, __t.{key} AS {key}, {agg} AS {name} "
                f"FROM (SELECT * FROM {sub}) __t "
                f"JOIN ({rel}) __p ON {join_on} "
                f"GROUP BY {keep}, __t.{key}"
            )
            ranked = (
                f"SELECT *, row_number() OVER (PARTITION BY "
                f"{', '.join(k for k, _v in prior)} "
                f"ORDER BY {name} DESC, {key}) AS __rnk FROM ({grouped}) __g"
            )
        sel = ", ".join(
            [k for k, _v in prior] + [v for _k, v in prior] + [key, name]
        )
        rel = f"SELECT {sel} FROM ({ranked}) __r WHERE __rnk <= {n}"
        prior.append((key, name))
    return rel


def transpile_kql(query: str) -> str:
    """KQL pipeline text → one nested Spark SQL statement."""
    stages = [s.strip() for s in _split_top(query.strip(), "|")]
    if not stages or not stages[0]:
        raise KqlError("empty KQL pipeline")
    src = stages[0]
    if not re.match(r"^[A-Za-z_]\w*$", src):
        raise KqlError(
            f"KQL pipeline must start with a bare table name, got {src!r}"
        )
    rel = src
    for i, st in enumerate(stages[1:]):
        sub = f"({rel}) __k{i}" if " " in rel or rel.startswith("(") else rel
        kw = st.split(None, 1)
        op = kw[0].lower()
        rest = kw[1] if len(kw) > 1 else ""
        if op == "where":
            rel = f"SELECT * FROM {sub} WHERE {_expr(rest)}"
        elif op == "project":
            items = ", ".join(_alias_item(x) for x in _split_top(rest))
            rel = f"SELECT {items} FROM {sub}"
        elif op == "extend":
            items = ", ".join(_alias_item(x) for x in _split_top(rest))
            rel = f"SELECT *, {items} FROM {sub}"
        elif op == "summarize":
            m = re.search(r"\bby\b", rest, re.IGNORECASE)
            if m:
                aggs, keys = rest[: m.start()].strip(), rest[m.end():].strip()
            else:
                aggs, keys = rest.strip(), ""
            agg_items = [_alias_item(x, agg=True) for x in _split_top(aggs)]
            key_sel, key_grp = [], []
            for x in _split_top(keys) if keys else []:
                # Kusto allows aliased by-keys: `by day = bin(ts, 1d)` —
                # SELECT the aliased expr, GROUP BY the bare expr
                m2 = re.match(r"^\s*([A-Za-z_]\w*)\s*=\s*(.+)$", x)
                if m2 and not re.match(r"^\s*=", m2.group(2)):
                    expr = _expr(m2.group(2))
                    key_sel.append(f"{expr} AS {m2.group(1)}")
                    key_grp.append(expr)
                else:
                    expr = _expr(x)
                    key_sel.append(expr)
                    key_grp.append(expr)
            if not agg_items and not key_sel:
                raise KqlError("summarize needs aggregates or by-keys")
            sel = ", ".join(key_sel + agg_items) or "*"
            rel = f"SELECT {sel} FROM {sub}"
            if key_grp:
                rel += f" GROUP BY {', '.join(key_grp)}"
        elif op in ("sort", "order"):
            rest = re.sub(r"^by\s+", "", rest, flags=re.IGNORECASE)
            rel = f"SELECT * FROM {sub} ORDER BY {_order_list(rest)}"
        elif op == "top":
            m = re.match(r"^(\d+)\s+by\s+(.+)$", rest, re.IGNORECASE)
            if not m:
                raise KqlError(f"top needs 'top N by expr', got {rest!r}")
            rel = (
                f"SELECT * FROM {sub} ORDER BY "
                f"{_order_list(m.group(2))} LIMIT {m.group(1)}"
            )
        elif op in ("take", "limit"):
            rel = f"SELECT * FROM {sub} LIMIT {int(rest)}"
        elif op == "mv-expand":
            col = rest.strip()
            if not re.match(r"^[A-Za-z_]\w*$", col):
                raise KqlError(f"mv-expand needs a bare column name, got {rest!r}")
            rel = (
                f"SELECT * EXCEPT ({col}, __mv), __mv AS {col} FROM {sub} "
                f"LATERAL VIEW EXPLODE({col}) __mvt AS __mv"
            )
        elif op == "project-away":
            cols = [c.strip() for c in _split_top(rest)]
            if not cols or not all(re.match(r"^[A-Za-z_]\w*$", c) for c in cols):
                raise KqlError(f"project-away needs bare column names, got {rest!r}")
            rel = f"SELECT * EXCEPT ({', '.join(cols)}) FROM {sub}"
        elif op == "project-rename":
            pairs = []
            for item in _split_top(rest):
                m = re.match(r"^\s*([A-Za-z_]\w*)\s*=\s*([A-Za-z_]\w*)\s*$", item)
                if not m:
                    raise KqlError(
                        f"project-rename needs new=old pairs, got {item!r}"
                    )
                pairs.append((m.group(1), m.group(2)))
            olds = ", ".join(old for _n, old in pairs)
            renames = ", ".join(f"{old} AS {new}" for new, old in pairs)
            rel = f"SELECT * EXCEPT ({olds}), {renames} FROM {sub}"
        elif op == "make-series":
            rel = _make_series(sub, rest)
        elif op == "parse":
            rel = _parse_op(sub, rest)
        elif op == "top-nested":
            rel = _top_nested(sub, rest)
        elif op == "mv-apply":
            rel = _mv_apply(sub, rest)
        elif op == "render":
            # charting is a client-side concern in Kusto — pass the relation
            # through unchanged (same no-op contract as ADX's tabular engine)
            rel = f"SELECT * FROM {sub}"
        elif op == "count":
            rel = f"SELECT count(*) AS Count FROM {sub}"
        elif op == "distinct":
            items = ", ".join(_expr(x) for x in _split_top(rest))
            rel = f"SELECT DISTINCT {items} FROM {sub}"
        elif op == "join":
            m = re.match(
                r"^(?:kind\s*=\s*(\w+)\s+)?\(\s*([^)]+?)\s*\)\s+on\s+(.+)$",
                rest,
                re.IGNORECASE,
            )
            if not m:
                raise KqlError(f"unsupported join form: {rest!r}")
            kind = (m.group(1) or "inner").lower()
            jmap = {
                "inner": "JOIN",
                "leftouter": "LEFT JOIN",
                "rightouter": "RIGHT JOIN",
                "fullouter": "FULL JOIN",
            }
            if kind not in jmap:
                raise KqlError(f"unsupported join kind: {kind!r}")
            right = m.group(2).strip()
            cond = m.group(3).strip()
            mc = re.match(
                r"^\$left\.(\w+)\s*==\s*\$right\.(\w+)$", cond
            )
            if mc:
                on = f"__l.{mc.group(1)} = __r.{mc.group(2)}"
            elif re.match(r"^\w+$", cond):
                on = f"__l.{cond} = __r.{cond}"
            else:
                raise KqlError(f"unsupported join condition: {cond!r}")
            rel = (
                f"SELECT * FROM ({rel if ' ' in rel else f'SELECT * FROM {rel}'}) __l "
                f"{jmap[kind]} (SELECT * FROM {right}) __r ON {on}"
            )
            continue
        else:
            raise KqlError(f"unsupported KQL operator: {op!r}")
    if " " not in rel:
        rel = f"SELECT * FROM {rel}"
    return rel
