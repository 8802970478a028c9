"""Pure-SQL special-function builders shared by the CH and KQL dialects.

The statistical p-value tier (anova, welch_test, beta_cdf, the t/KS/MW
normal and F tails) needs lgamma and the regularized incomplete beta;
neither engine ships them as SQL builtins, so these helpers emit
CLOSED-FORM / fixed-fold Spark SQL: Lanczos g=7 lgamma (public
coefficients — Numerical Recipes / Boost; ~15 significant digits for
z > 0) and the NR ``betacf`` continued fraction as a deterministic
100-step Lentz fold over ``sequence(1, 100)``.  Everything is plain JVM
codegen — mixable with any aggregate, no Python worker, replayable
verbatim in an oracle or pinned against a math.lgamma Python replay.
"""

from __future__ import annotations


#: Lanczos g=7 n=9 coefficients (public — Numerical Recipes / Boost /
#: Wikipedia "Lanczos approximation"): ~15 significant digits for z > 0.
_LANCZOS = (
    0.99999999999980993,
    676.5203681218851,
    -1259.1392167224028,
    771.32342877765313,
    -176.61502916214059,
    12.507343278686905,
    -0.13857109526572012,
    9.9843695780195716e-6,
    1.5056327351493116e-7,
)


def lgamma_sql(z: str) -> str:
    """ln Γ(z) for z > 0 as CLOSED-FORM SQL via the Lanczos approximation
    — no fold, mixable anywhere."""
    ag = f"CAST({_LANCZOS[0]!r} AS DOUBLE)"
    for k in range(1, 9):
        ag += f" + CAST({_LANCZOS[k]!r} AS DOUBLE) / (({z}) - 1 + {k})"
    return (
        f"(0.5 * ln(2 * pi()) + (({z}) - 0.5) * ln(({z}) + 6.5) "
        f"- (({z}) + 6.5) + ln({ag}))"
    )


def betacf_sql(a: str, b: str, x: str) -> str:
    """NR ``betacf`` continued fraction (modified Lentz) as ONE SQL fold
    over ``sequence(1, n)``; (a, b, x) are scalar sub-expressions, wrapped
    in a struct so each is evaluated once.

    Iteration count is ADAPTIVE: the CF needs roughly sqrt(max(a, b))
    iterations near the x ≈ a/(a+b) branch cut (NR §6.4), so a fixed
    small n silently loses digits once df/2 ≈ group row count grows
    (sf1-scale groups).  n = clamp(3·sqrt(max(a,b)) + 50, [100, 10000]) —
    exact through max(a,b) ≈ 1.1e7; past the 10000 cap (df ≈ 2e7) the
    tail is still accurate to ~1e-12 because ``betai_sql``'s symmetric
    pick keeps x on the fast-converging side of the cut, and iterations
    past convergence multiply h by exactly 1 within double rounding (no
    early break needed for determinism).  The Python replica
    (``stats_dist._betacf``) mirrors the same envelope."""

    def clamp(v: str) -> str:
        return f"IF(abs({v}) < 1e-300, 1e-300, {v})"

    d0 = clamp("1 - __w.a1 * __w.x / (__w.a + 1)")
    # per iteration: the even step (aa1) then the odd step (aa2); state
    # carries Lentz's (c, d, h) with d already reciprocal-folded
    aa1 = (
        "(CAST(__m AS DOUBLE) * (__w.b - __m) * __w.x "
        "/ ((__w.a - 1 + 2 * __m) * (__w.a + 2 * __m)))"
    )
    aa2 = (
        "(-(__w.a + __m) * (__w.a1 + __m) * __w.x "
        "/ ((__w.a + 2 * __m) * (__w.a + 1 + 2 * __m)))"
    )
    step = (
        f"transform(array(named_struct("
        f"'d1', 1 / {clamp(f'1 + {aa1} * __s.d')}, "
        f"'c1', {clamp(f'1 + {aa1} / __s.c')})), __e1 -> "
        f"transform(array(named_struct("
        f"'d2', 1 / {clamp(f'1 + {aa2} * __e1.d1')}, "
        f"'c2', {clamp(f'1 + {aa2} / __e1.c1')})), __e2 -> "
        f"named_struct('c', __e2.c2, 'd', __e2.d2, "
        f"'h', __s.h * __e1.d1 * __e1.c1 * __e2.d2 * __e2.c2))[0])[0]"
    )
    return (
        f"transform(array(named_struct('a', CAST({a} AS DOUBLE), "
        f"'b', CAST({b} AS DOUBLE), 'x', CAST({x} AS DOUBLE), "
        f"'a1', CAST({a} AS DOUBLE) + CAST({b} AS DOUBLE))), __w -> "
        f"aggregate(sequence(1, CAST(least(CAST(10000 AS DOUBLE), "
        f"greatest(CAST(100 AS DOUBLE), "
        f"ceil(3 * sqrt(greatest(__w.a, __w.b))) + 50)) AS INT)), "
        f"named_struct('c', CAST(1 AS DOUBLE), 'd', 1 / {d0}, "
        f"'h', 1 / {d0}), "
        f"(__s, __m) -> {step}, __s -> __s.h))[0]"
    )


def betai_sql(a: str, b: str, x: str) -> str:
    """Regularized incomplete beta I_x(a, b) (NR ``betai``) in pure SQL:
    Lanczos lgamma prefactor + the symmetric continued-fraction pick."""
    bt = (
        f"exp({lgamma_sql(f'({a}) + ({b})')} - {lgamma_sql(a)} "
        f"- {lgamma_sql(b)} + ({a}) * ln({x}) + ({b}) * ln(1 - ({x})))"
    )
    return (
        f"(CASE WHEN ({x}) <= 0 THEN CAST(0 AS DOUBLE) "
        f"WHEN ({x}) >= 1 THEN CAST(1 AS DOUBLE) "
        f"WHEN ({x}) < (({a}) + 1) / (({a}) + ({b}) + 2) "
        f"THEN {bt} * {betacf_sql(a, b, x)} / ({a}) "
        f"ELSE 1 - {bt} * {betacf_sql(b, a, f'1 - ({x})')} / ({b}) END)"
    )


