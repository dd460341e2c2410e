"""Generate COVERAGE.md's registry inventory table FROM the code, so the
doc cannot drift from `plans/registry.py` (round-4 task #10).

The generated block — every registered query name, its oracle mode
(SQL = DuckDB hash-compared / rows-only), the plan module that defines
it, and the test files that mention it — is spliced between the BEGIN/
END markers in COVERAGE.md.  `tests/test_coverage_doc.py` regenerates
the block and asserts the committed file matches, CI-style.

Usage:
    python tools/gen_coverage.py            # rewrite COVERAGE.md in place
    python tools/gen_coverage.py --check    # exit 1 if the doc is stale
"""

from __future__ import annotations

import glob
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BEGIN = "<!-- BEGIN GENERATED REGISTRY TABLE (tools/gen_coverage.py) -->"
END = "<!-- END GENERATED REGISTRY TABLE -->"


def generate_block() -> str:
    import __spark_entry__  # noqa: F401 - imports register every plan module
    from busdata_pipeline_spark.plans.registry import ORACLES, QUERIES

    test_texts = {
        os.path.basename(p): open(p).read()
        for p in glob.glob(os.path.join(REPO, "tests", "test_*.py"))
    }

    lines = [
        BEGIN,
        "",
        f"{len(QUERIES)} registered queries, {len(ORACLES)} with DuckDB "
        "oracles (hash-compared); the rest are rows-only driver checks "
        "with ground-truth pytest coverage.",
        "",
        "| query | oracle | plan module | tests mentioning it |",
        "|---|---|---|---|",
    ]
    for name in sorted(QUERIES):
        mod = QUERIES[name].__module__.removeprefix(
            "busdata_pipeline_spark.plans."
        )
        oracle = "SQL" if name in ORACLES else "rows-only"
        tests = sorted(f for f, txt in test_texts.items() if name in txt)
        lines.append(
            f"| `{name}` | {oracle} | `{mod}` | "
            + (", ".join(f"`{t}`" for t in tests) if tests else "—")
            + " |"
        )
    lines += ["", END]
    return "\n".join(lines)


def splice(doc: str, block: str) -> str:
    if BEGIN in doc and END in doc:
        head = doc[: doc.index(BEGIN)]
        tail = doc[doc.index(END) + len(END):]
        return head + block + tail
    # first run: append as a new section
    return doc.rstrip("\n") + (
        "\n\n## Appendix: generated registry inventory\n\n" + block + "\n"
    )


def main(argv: list[str]) -> int:
    path = os.path.join(REPO, "COVERAGE.md")
    doc = open(path).read()
    new = splice(doc, generate_block())
    if "--check" in argv:
        if new != doc:
            print("COVERAGE.md registry table is STALE — run "
                  "python tools/gen_coverage.py")
            return 1
        print("COVERAGE.md registry table is current")
        return 0
    with open(path, "w") as f:
        f.write(new)
    print(f"wrote registry table ({path})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
