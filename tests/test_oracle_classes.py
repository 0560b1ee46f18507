"""Round-10 oracle-independence closure (VERDICT r9 task #2): every
registered corpus query carries exactly one oracle class; every
reformulation-class row cites an existing definition-level pin; the
generated docs/ORACLE_CLASSES.md cannot drift from the dict."""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _registry():
    from clickhouse_arrow_spark.queries import load_all

    return {
        n: s for n, s in load_all().items() if not n.startswith("aaa_gate_")
    }


def test_every_query_classified():
    from clickhouse_arrow_spark.oracle_classes import CLASSES

    reg = _registry()
    assert set(reg) - set(CLASSES) == set(), "unclassified queries"
    assert set(CLASSES) - set(reg) == set(), "stale classification rows"


def test_classes_known_and_rowsonly_matches_registry():
    from clickhouse_arrow_spark.oracle_classes import CLASSES, ROLLUP

    reg = _registry()
    for name, (cls, _detail) in CLASSES.items():
        assert cls in ROLLUP, f"{name}: unknown class {cls}"
        assert (reg[name].oracle is None) == (cls == "rows-only"), name


def test_reformulation_rows_cite_existing_pins():
    from clickhouse_arrow_spark.oracle_classes import CLASSES, PIN_REQUIRED

    pin_re = re.compile(r"(tests/[\w.]+\.py)(?:::(\w+))?")
    for name, (cls, detail) in CLASSES.items():
        if cls not in PIN_REQUIRED:
            continue
        cites = pin_re.findall(detail)
        assert cites, f"{name}: no pin citation"
        resolved = False
        for path, test in cites:
            full = os.path.join(REPO, path)
            if not os.path.exists(full):
                continue
            if test and f"def {test}(" not in open(full).read():
                continue
            resolved = True
        assert resolved, f"{name}: no cited pin resolved"


def test_gate_aliases_resolve_to_classified_targets():
    from clickhouse_arrow_spark.oracle_classes import CLASSES
    from clickhouse_arrow_spark.queries.base import _GATE_ALIASES

    for alias, target in _GATE_ALIASES.items():
        assert target in CLASSES, f"{alias} -> {target} unclassified"


def test_scanner_exits_zero_and_doc_current():
    doc = os.path.join(REPO, "docs", "ORACLE_CLASSES.md")
    before = open(doc).read() if os.path.exists(doc) else None
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "gen_oracle_classes.py")],
        capture_output=True, text=True, cwd=REPO,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    after = open(doc).read()
    assert before == after, "docs/ORACLE_CLASSES.md was stale — commit it"


def test_exp_decay_oracle_is_definition_level():
    # the r9 lesson's specific regression: util_exp_decay's oracle must
    # stay a correlated DIRECT sum, never the engine's factored form
    reg = _registry()
    o = reg["util_exp_decay"].oracle
    assert "exp((s.et - t.et)" in " ".join(o.split())
    # the factored prefactor shape must not reappear
    assert "OVER w" not in o
