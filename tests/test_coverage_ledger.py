"""COVERAGE.md anti-drift gate (VERDICT r11 "what's wrong" #1).

The r10 and r11 verdicts both caught COVERAGE.md's registry count and
driver ledger going stale after manual edits.  This test REGENERATES both
from the ground truth — ``all_queries()`` for the count,
``CORRECTNESS_r*.json`` artifacts for the ledger table — and fails when
the committed doc disagrees, so the staleness class dies instead of
recurring one round at a time.
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _ledger_rows() -> list[str]:
    rows, cum = [], set()
    files = sorted(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )
    assert files, "no CORRECTNESS_r*.json artifacts found"
    for f in files:
        r = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        d = json.load(open(f))
        green = sum(
            1
            for v in d.values()
            if v.get("rows_match") and v.get("schema_match")
            and v.get("hash_match")
        )
        new = len(set(d) - cum)
        cum |= set(d)
        rows.append(
            f"| r{r:02d} | {len(d)} | {green} | {len(d) - green} "
            f"| {new} | {len(cum)} |"
        )
    return rows


def test_registry_count_in_coverage_md():
    from clickhouseocp_spark.queries import all_queries

    n = len(all_queries())
    text = open(os.path.join(REPO, "COVERAGE.md")).read()
    assert f"{n} registry queries total" in text, (
        f"COVERAGE.md registry count is stale: the registry has {n} "
        f"queries — update the '... registry queries total' line"
    )


def _git_commit_epoch(path: str) -> int:
    """Last-commit unix time for *path*, or 0 if untracked/not a repo."""
    import subprocess

    try:
        out = subprocess.run(
            ["git", "log", "-1", "--format=%ct", "--", path],
            cwd=REPO, capture_output=True, text=True, timeout=30,
        ).stdout.strip()
        return int(out) if out else 0
    except Exception:
        return 0


def test_driver_ledger_in_coverage_md():
    """Every CORRECTNESS_r*.json round must have its regenerated ledger
    row in COVERAGE.md — EXCEPT the newest artifact when the driver
    committed it after COVERAGE.md's last commit (the driver writes
    CORRECTNESS_r{N} post-close, so demanding its row at judgment time
    made pytest red every round through no code defect — VERDICT r12
    wrong #1).  The tolerated row becomes mandatory the moment
    COVERAGE.md is next touched, so round N+1 still cannot skip it.
    """
    text = open(os.path.join(REPO, "COVERAGE.md")).read()
    rows = _ledger_rows()
    missing = [row for row in rows if row not in text]
    if missing == [rows[-1]]:
        newest = max(
            glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")),
            key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
        )
        cov_t = _git_commit_epoch(os.path.join(REPO, "COVERAGE.md"))
        art_t = _git_commit_epoch(newest)
        if not art_t:
            # The driver sometimes leaves the post-close artifact
            # UNTRACKED (r13 did); fall back to file mtime so the
            # tolerance still fires (VERDICT r13 wrong #1).
            art_t = int(os.path.getmtime(newest))
        if art_t and cov_t and art_t > cov_t:
            return  # post-close driver artifact; row due next round
    assert not missing, (
        "COVERAGE.md driver ledger is stale — regenerate these rows "
        f"(recorded/green/red/newly/cumulative from CORRECTNESS_r*.json): "
        f"{missing}"
    )


def test_rotation_tail_is_derived():
    """The recording window past the births must be the staleness order
    computed from the committed CORRECTNESS_r*.json artifacts: names
    red at their latest record first, then greens by record round
    ascending (stalest first), names alphabetical within a round.

    Rounds 12 and 13 both tripped on hand-written rotation lists (the
    r12 note undercounted the r01 tail; the r13 pin broke the moment
    its own rotation succeeded — VERDICT r13 wrong #1).  The rotation
    is now DERIVED in ``queries._derived_rotation()``; this test
    recomputes the same ground truth independently and pins
    ``all_queries()``'s ordering to births + that rotation, so the
    hand-list failure class is dead for every future round at once.
    """
    import clickhouseocp_spark.queries as q

    latest: dict[str, tuple[int, bool]] = {}
    for f in sorted(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    ):
        r = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for name, v in json.load(open(f)).items():
            green = bool(
                v.get("rows_match")
                and v.get("schema_match", True)
                and v.get("hash_match", True)
            )
            latest[name] = (r, green)
    expected = sorted(latest, key=lambda n: (latest[n][1], latest[n][0], n))
    assert q._derived_rotation() == expected

    # births recomputed independently: staged-but-unrecorded names in
    # staging-list round order (mirrors queries._staged_births())
    births: list[str] = []
    for attr in sorted(
        (a for a in dir(q) if a.startswith("_DRIVER_WINDOW_R")),
        key=lambda a: int(a.rsplit("R", 1)[1]),
    ):
        for name in getattr(q, attr):
            if name not in latest and name not in births:
                births.append(name)
    assert q._staged_births() == births
    ordered = list(q.all_queries())
    head = births + [n for n in expected if n in set(ordered)
                     and n not in set(births)]
    assert ordered[: len(head)] == head, (
        "all_queries() must lead with the staged births followed by the "
        "artifact-derived staleness rotation"
    )


def test_every_registry_query_is_recorded_or_staged():
    """No query may be both driver-UNRECORDED and UNSTAGED: every registry
    name must either already appear in a committed CORRECTNESS_r*.json
    (it has a driver record) or in an explicit _DRIVER_WINDOW_R* staging
    list (it is queued for one).  This is the stage-at-birth discipline
    as an invariant — a new query that skips staging fails here at birth.
    """
    import clickhouseocp_spark.queries as q

    q._load_all()
    staged: set[str] = set()
    for attr in dir(q):
        if attr.startswith("_DRIVER_WINDOW_R") or attr == "_R9_RERECORDS":
            staged |= set(getattr(q, attr))
    recorded: set[str] = set()
    for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        recorded |= set(json.load(open(f)))
    orphans = set(q.REGISTRY) - staged - recorded
    assert not orphans, (
        f"registry queries with NO driver record and NO _DRIVER_WINDOW_R* "
        f"staging slot: {sorted(orphans)}"
    )


def test_func_table_sweep_has_zero_uncovered_names():
    """The FUNC-table sweep (COVERAGE.md §sweep, closed in r11) as a
    standing invariant instead of a manual grep: every string key of
    ``_KQL_SCALARS``, ``FUNC_RULES`` and ``PARAMETRIC_RULES`` must appear
    (word-bounded, case-insensitive) somewhere in the registry query
    modules or in ``tests/`` — i.e. each lowered name is exercised by an
    oracle-backed query or a value-asserting pytest.  A new lowering
    without coverage fails here at birth.
    """
    from clickhouseocp_spark.chsql import FUNC_RULES, PARAMETRIC_RULES
    from clickhouseocp_spark.kql import _KQL_SCALARS

    corpus = []
    for root in (
        os.path.join(REPO, "clickhouseocp_spark", "queries"),
        os.path.join(REPO, "tests"),
    ):
        for dirpath, _dirs, files in os.walk(root):
            for fn in files:
                if fn.endswith(".py") and fn != os.path.basename(__file__):
                    corpus.append(open(os.path.join(dirpath, fn)).read())
    text = "\n".join(corpus).lower()
    names = (
        set(FUNC_RULES) | set(PARAMETRIC_RULES) | set(_KQL_SCALARS)
    )
    uncovered = sorted(
        n for n in names
        if not re.search(rf"\b{re.escape(n.lower())}\b", text)
    )
    assert not uncovered, (
        f"{len(uncovered)} lowered function names have no registry-query "
        f"or pytest coverage: {uncovered}"
    )
