"""COVERAGE.md's registry inventory table is GENERATED from
plans/registry.py (tools/gen_coverage.py); this is the CI gate that the
committed doc matches the code (round-4 task #10 — docs can't drift)."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import gen_coverage  # noqa: E402


def test_coverage_doc_registry_table_is_current():
    doc = open(os.path.join(REPO, "COVERAGE.md")).read()
    assert gen_coverage.BEGIN in doc and gen_coverage.END in doc
    assert gen_coverage.splice(doc, gen_coverage.generate_block()) == doc, (
        "COVERAGE.md registry table is stale — run "
        "python tools/gen_coverage.py"
    )


def test_every_registered_query_has_a_row():
    import __spark_entry__  # noqa: F401
    from busdata_pipeline_spark.plans.registry import QUERIES

    doc = open(os.path.join(REPO, "COVERAGE.md")).read()
    block = doc[doc.index(gen_coverage.BEGIN): doc.index(gen_coverage.END)]
    for name in QUERIES:
        assert f"| `{name}` |" in block, name
