"""Print the rotation skeleton for __spark_entry__._CHECK_FIRST.

The driver's correctness gate samples the FIRST ~50 queries, so the
entry file's ordering is evidence policy: never-checked queries lead,
this round's code-touched queries re-verify next, then the
longest-unchecked greens backfill (tests/test_entry_contract.py
enforces the stale cohort's presence). This script recomputes the
ledger exactly as the test does and prints the two mechanical
sections — run it at the START of a round, after the driver has
committed the previous round's CORRECTNESS artifact:

    python scripts/rotate_check_first.py

Paste the output into _CHECK_FIRST, then add the round's code-touched
queries by hand as work lands (the one part no script can know).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dwh_spark.plans.all  # noqa: F401,E402
from dwh_spark.plans.registry import QUERIES  # noqa: E402


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, int] = {}
    rounds: list[int] = []
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if m is None:
            continue
        try:
            with open(path) as fh:
                rec = json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue
        r = int(m.group(1))
        rounds.append(r)
        for q in rec:
            latest[q] = max(latest.get(q, 0), r)
    if not rounds:
        print("# no CORRECTNESS artifacts found")
        return
    newest = max(rounds)
    never = sorted(q for q in QUERIES if q not in latest)
    stale = sorted(
        q for q, r in latest.items() if r <= newest - 3 and q in QUERIES
    )
    print(f"# newest committed artifact: r{newest}; registry: {len(QUERIES)}")
    print(f"# never-checked ({len(never)}):")
    for q in never:
        print(f'    "{q}",')
    print(f"# stale (latest verdict <= r{newest - 3}; {len(stale)}):")
    for q in stale:
        print(f'    "{q}",')
    checked_unregistered = sorted(set(latest) - set(QUERIES))
    if checked_unregistered:
        print(f"# WARNING checked-but-unregistered: {checked_unregistered}")


if __name__ == "__main__":
    main()
