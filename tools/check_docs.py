"""Docs-vs-artifact consistency checker (VERDICT r4 #5).

Round 4 shipped THREE inconsistent versions of the README equal-time
table because the measurement was refreshed without regenerating the
README. This checker makes README.md a *view* of the committed canonical
artifact docs/perf/equal_time.jsonl: it regenerates the markdown rows via
the same formatting function the measurement tool uses
(tools/equal_time_error.py markdown_rows) and fails if any row -- or the
separately-reported estimator-mean offset -- is missing from README.md
verbatim. Run by tests/test_docs.py on every suite run (pure file
comparison; no rendering).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from equal_time_error import ARTIFACT, markdown_rows  # noqa: E402


def check() -> list:
    """Return a list of human-readable failures (empty = consistent)."""
    failures = []
    if not os.path.exists(ARTIFACT):
        return [f"canonical artifact missing: {ARTIFACT}"]
    with open(ARTIFACT) as f:
        records = [json.loads(line) for line in f if line.strip()]
    with open(os.path.join(REPO, "README.md")) as f:
        readme = f.read()

    for row in markdown_rows(records):
        if row not in readme:
            failures.append(f"README missing/changed equal-time row: {row}")

    offset = next(
        (r["estimator_mean_offset_rms"] for r in records if "estimator_mean_offset_rms" in r),
        None,
    )
    if offset is None:
        failures.append("artifact has no estimator_mean_offset_rms record")
    elif f"{offset:.3f} RMS" not in readme:
        failures.append(
            f"README missing the measured estimator offset '{offset:.3f} RMS'"
        )
    return failures


def main() -> int:
    failures = check()
    for f in failures:
        print("FAIL:", f)
    if not failures:
        print("docs consistent with", os.path.relpath(ARTIFACT, REPO))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
