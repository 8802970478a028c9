"""DuckDB-SQL replays of the pure-SQL special functions in
``functions/sqlstats.py`` and ``chsql._phi_tail_sql``, for ORACLE strings.

The registry's determinism contract (queries/__init__.py docstring) rests
on per-row IEEE double arithmetic being bitwise-identical across engines;
these builders emit the SAME closed forms / fold recurrences as the Spark
side — Lanczos g=7 lgamma, the NR ``betacf`` modified-Lentz continued
fraction with the identical adaptive iteration envelope
(clamp(3·sqrt(max(a,b)) + 50, [100, 10000])), the symmetric ``betai``
pick, and the Abramowitz-Stegun 26.2.17 normal tail — so a ``round(x, 6)``
on both sides compares exactly.

DuckDB 1.0 has no seeded ``list_reduce`` and no lambda structs, so the
Lentz state (c, d, h) rides a LIST(DOUBLE): the seed state is prepended as
the first element and each subsequent element carries its iteration index
m in slot 1 (DuckDB lists are 1-based).
"""

from __future__ import annotations

from clickhouseocp_spark.functions.sqlstats import _LANCZOS


def duck_lgamma(z: str) -> str:
    """ln Γ(z) for z > 0 — the identical Lanczos g=7 closed form."""
    ag = f"CAST({_LANCZOS[0]!r} AS DOUBLE)"
    for k in range(1, 9):
        ag += f" + CAST({_LANCZOS[k]!r} AS DOUBLE) / (({z}) - 1 + {k})"
    return (
        f"(0.5 * ln(2 * pi()) + (({z}) - 0.5) * ln(({z}) + 6.5) "
        f"- (({z}) + 6.5) + ln({ag}))"
    )


def duck_phi_tail(z: str) -> str:
    """1 − Φ(z) for z ≥ 0 — the identical A&S 26.2.17 rational form
    replayed from ``chsql._phi_tail_sql``."""
    t = f"(1.0 / (1.0 + 0.2316419 * ({z})))"
    poly = (
        f"({t} * (0.319381530 + {t} * (-0.356563782 + {t} * (1.781477937 "
        f"+ {t} * (-1.821255978 + {t} * 1.330274429)))))"
    )
    return f"(exp(-(({z}) * ({z})) / 2) / sqrt(2 * pi()) * {poly})"


def _clamp(v: str) -> str:
    return f"CASE WHEN abs({v}) < 1e-300 THEN 1e-300 ELSE {v} END"


def duck_betacf(a: str, b: str, x: str) -> str:
    """NR ``betacf`` Lentz fold — state [c, d, h] in a LIST(DOUBLE),
    iteration index m in element slot 1 of each non-seed element."""
    # __m below is el[1]; accumulator acc = [c, d, h]
    aa1 = (
        f"(__el[1] * (({b}) - __el[1]) * ({x}) "
        f"/ ((({a}) - 1 + 2 * __el[1]) * (({a}) + 2 * __el[1])))"
    )
    aa2 = (
        f"(-(({a}) + __el[1]) * (({a}) + ({b}) + __el[1]) * ({x}) "
        f"/ ((({a}) + 2 * __el[1]) * (({a}) + 1 + 2 * __el[1])))"
    )
    d0 = _clamp(f"1 - (({a}) + ({b})) * ({x}) / (({a}) + 1)")
    n_iter = (
        f"CAST(least(CAST(10000 AS DOUBLE), greatest(CAST(100 AS DOUBLE), "
        f"ceil(3 * sqrt(greatest({a}, {b}))) + 50)) AS BIGINT)"
    )
    step = (
        f"list_transform([[1 / ({_clamp(f'1 + {aa1} * __acc[2]')}), "
        f"{_clamp(f'1 + {aa1} / __acc[1]')}]], __e1 -> "
        f"list_transform([[1 / ({_clamp(f'1 + {aa2} * __e1[1]')}), "
        f"{_clamp(f'1 + {aa2} / __e1[2]')}]], __e2 -> "
        f"[__e2[2], __e2[1], "
        f"__acc[3] * __e1[1] * __e1[2] * __e2[1] * __e2[2]])[1])[1]"
    )
    return (
        f"list_reduce(list_concat("
        f"[[CAST(1 AS DOUBLE), 1 / ({d0}), 1 / ({d0})]], "
        f"list_transform(range(1, {n_iter} + 1), __m -> "
        f"[CAST(__m AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)])), "
        f"(__acc, __el) -> {step})[3]"
    )


def duck_betai(a: str, b: str, x: str) -> str:
    """Regularized incomplete beta I_x(a, b) — the identical symmetric
    continued-fraction pick replayed from ``sqlstats.betai_sql``."""
    bt = (
        f"exp({duck_lgamma(f'({a}) + ({b})')} - {duck_lgamma(a)} "
        f"- {duck_lgamma(b)} + ({a}) * ln({x}) + ({b}) * ln(1 - ({x})))"
    )
    return (
        f"(CASE WHEN ({x}) <= 0 THEN CAST(0 AS DOUBLE) "
        f"WHEN ({x}) >= 1 THEN CAST(1 AS DOUBLE) "
        f"WHEN ({x}) < (({a}) + 1) / (({a}) + ({b}) + 2) "
        f"THEN {bt} * {duck_betacf(a, b, x)} / ({a}) "
        f"ELSE 1 - {bt} * {duck_betacf(b, a, f'1 - ({x})')} / ({b}) END)"
    )
