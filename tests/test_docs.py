"""README numbers must match the canonical measurement artifacts.

VERDICT r4 #5: round 4 carried three inconsistent copies of the
equal-time table (README, r4_p1_equal_time.jsonl, equal_time_final.jsonl)
because a re-measurement skipped the README. The table is now generated
from docs/perf/equal_time.jsonl by tools/equal_time_error.py and this
test (via tools/check_docs.py, the same formatting code path) fails the
suite whenever README drifts from the committed artifact.
"""

import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tools"),
)


def test_readme_equal_time_table_matches_artifact():
    import check_docs

    failures = check_docs.check()
    assert not failures, "\n".join(failures)
