"""Doc-count drift guard (round-6 verdict: COVERAGE.md went stale).

The registry is the single source of truth for operator counts;
README.md and COVERAGE.md must state the same numbers. No Spark
session needed — this is pure text + registry introspection.
"""
import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent


def test_doc_counts_match_registry():
    proc = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "refresh_docs.py")],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stderr or proc.stdout


def test_examples_have_no_underscore_imports():
    # round-6 verdict item 6: examples must exercise only public API
    for p in (ROOT / "examples").glob("*.py"):
        for line in p.read_text().splitlines():
            stripped = line.strip()
            if stripped.startswith(("import ", "from ")):
                names = stripped.split("import", 1)[-1]
                for tok in names.replace(",", " ").split():
                    assert not (
                        tok.startswith("_") and not tok.startswith("__")
                    ), f"{p.name}: private import {tok!r}"
