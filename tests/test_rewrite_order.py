"""KQL scalar-rule rewrite-order hazard gate (VERDICT r11 "what's wrong"
#2).

``kql._expr`` applies ``_KQL_SCALARS`` in ONE sequential pass over the
expression text, so a rule A whose RENDERED OUTPUT contains a later rule
B's name as a bare callable gets re-captured by B (round 11 found this
late: ``strrep`` emits ``repeat(...)`` which the ``repeat`` →
``array_repeat`` rule would mangle unless ``repeat`` runs first — fixed
by ordering, guarded only by a comment until now).

This test makes the guard mechanical: for every rule A it renders the
output on dummy arguments, then REPLAYS the tail of the rewrite loop
(every rule after A, via the real ``_rewrite_call``) over that output and
fails if anything changes or raises — i.e. it proves each rendered output
is a fix-point of the remaining pass, which is exactly the property the
single-pass rewriter needs.  Rules whose builders demand literal shapes
the palettes below can't satisfy are skipped per-arity (they then emit
nothing for this palette, so there is nothing to re-capture); a rule that
renders under NO palette fails loudly so the palette gets extended rather
than silently un-checked.
"""

from __future__ import annotations

import re

import pytest

from clickhouseocp_spark.kql import _KQL_SCALARS, _rewrite_call

#: argument palettes tried per arity, in order — column refs first, then
#: the literal shapes the validating builders demand
_PALETTES = [
    lambda k: [f"__c{i}" for i in range(k)],
    lambda k: ["3"] * k,
    lambda k: ["'x'"] * k,
    lambda k: [f"__c{i}" if i == 0 else "3" for i in range(k)],
    lambda k: [f"__c{i}" if i < k - 1 else "'greater'" for i in range(k)],
    lambda k: ["0.95" if i >= k - 2 else f"__c{i}" for i in range(k)],
    lambda k: ["(1, 2)"] * k,
    lambda k: (["__c0", "__c1", "0.95", "'pooled'"] + ["3"] * k)[:k],
]


def _render(build) -> list[str]:
    """Every distinct output the builder produces over the palettes."""
    outs = []
    for arity in range(0, 7):
        for pal in _PALETTES:
            try:
                out = build(pal(arity))
            except Exception:
                continue
            if isinstance(out, str) and out not in outs:
                outs.append(out)
            break  # first palette that renders this arity is enough
    return outs


def test_every_rule_renders_under_some_palette():
    dead = [
        name for name, build in _KQL_SCALARS.items() if not _render(build)
    ]
    # rules that REJECT by design (they raise with guidance for every
    # input shape) are exempt — verify they raise, not silently pass
    for name in list(dead):
        try:
            _KQL_SCALARS[name](["__c0", "__c1"])
        except Exception:
            continue
        pytest.fail(f"rule {name} renders nothing yet does not reject")
    # nothing should be silently unrenderable today; extend _PALETTES if
    # a future rule trips this
    assert len(dead) < len(_KQL_SCALARS) / 4


def test_rendered_outputs_are_fixpoints_of_the_remaining_pass():
    rules = list(_KQL_SCALARS.items())
    hazards = []
    for i, (a_name, a_build) in enumerate(rules):
        for out in _render(a_build):
            for b_name, b_build in rules[i + 1 :]:
                if not re.search(rf"\b{b_name}\s*\(", out, re.IGNORECASE):
                    continue
                try:
                    recaptured = _rewrite_call(out, b_name, b_build)
                except Exception as exc:  # the real pass would raise too
                    hazards.append((a_name, b_name, f"raises: {exc}"))
                    continue
                if recaptured != out:
                    hazards.append((a_name, b_name, "rewrites output"))
    assert not hazards, (
        "rewrite-order hazards — each (A, B) pair means rule A's rendered "
        "output contains later rule B's name and B's pass mangles it; "
        "move B ahead of A in _KQL_SCALARS (the repeat-before-strrep "
        f"rule): {hazards}"
    )


def test_no_duplicate_dict_keys_in_rule_tables():
    """A Python dict literal with duplicate keys silently keeps the LAST
    one — round 12 nearly shipped a second 'tumbleStart' entry that
    shadowed the existing 2-arg lowering 1,000 lines up.  Parse the rule
    modules' ASTs and fail on any duplicate constant key inside one dict
    literal."""
    import ast
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    offenders = []
    for mod in ("chsql.py", "kql.py"):
        tree = ast.parse(
            open(os.path.join(repo, "clickhouseocp_spark", mod)).read()
        )
        for node in ast.walk(tree):
            if not isinstance(node, ast.Dict):
                continue
            seen: set = set()
            for k in node.keys:
                if isinstance(k, ast.Constant):
                    if k.value in seen:
                        offenders.append((mod, node.lineno, k.value))
                    seen.add(k.value)
    assert not offenders, (
        f"duplicate dict-literal keys (the last silently wins): "
        f"{offenders}"
    )
