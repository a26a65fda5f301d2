"""Generate COVERAGE.md: SURVEY §2 key → implementation → check kind.

Usage: python tools/coverage_report.py > COVERAGE.md
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nova_pulsar_spark.registry import all_queries  # noqa: E402
from tests.test_plans_and_coverage import SURVEY_KEYS  # noqa: E402


def main() -> None:
    regs = all_queries()
    print("# COVERAGE — SURVEY.md §2 operator inventory → engine queries\n")
    print(f"{len(regs)} registered queries; {sum(1 for r in regs.values() if r.sql)} "
          "DuckDB-oracle-checked, remainder rows-only (stateful/approx/UDF paths "
          "pinned by pytest instead).\n")
    print("## SURVEY §2 promised keys\n")
    print("| query key | check | summary |")
    print("|---|---|---|")
    for k in SURVEY_KEYS:
        r = regs.get(k)
        if r is None:
            print(f"| `{k}` | **MISSING** | |")
            continue
        kind = "oracle" if r.sql else "rows-only + pytest"
        doc = (r.doc or "").strip().splitlines()[0][:110]
        print(f"| `{k}` | {kind} | {doc} |")
    extras = sorted(set(regs) - set(SURVEY_KEYS))
    print(f"\n## Beyond the promised inventory ({len(extras)} additional queries)\n")
    print("| query key | check | summary |")
    print("|---|---|---|")
    for k in extras:
        r = regs[k]
        kind = "oracle" if r.sql else "rows-only + pytest"
        doc = (r.doc or "").strip().splitlines()[0][:110]
        print(f"| `{k}` | {kind} | {doc} |")


if __name__ == "__main__":
    main()
