"""Print the rotation skeleton for __spark_entry__._CHECK_FIRST.

The driver's correctness gate samples the FIRST ~50 queries, so the
entry file's ordering is evidence policy: never-checked queries lead,
this round's code-touched queries re-verify next, then the
longest-unchecked greens backfill (tests/test_entry_contract.py
enforces the stale cohort's presence). This script recomputes the
ledger exactly as the test does — the union of the driver's
``CORRECTNESS_r*.json`` rows and the committed full-registry sweep's
green ``PARITY_r*.json`` rows (scripts/parity_sweep.py) — and prints
the mechanical sections grouped by verdict round, OLDEST COHORT FIRST
(alphabetical within a cohort), which is the paste order. Run it at
the START of a round, after the driver has committed the previous
round's CORRECTNESS artifact:

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
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dwh_spark.plans.all  # noqa: F401,E402
from dwh_spark.plans.registry import QUERIES  # noqa: E402


def verdict_ledger(root: str) -> tuple[dict[str, int], list[int]]:
    """name -> latest verdict round, over driver CORRECTNESS rows (any
    row) plus green full-registry PARITY sweep rows. Mirrors
    tests/test_entry_contract.py::test_rotation_covers_stalest_verdicts."""
    latest: dict[str, int] = {}
    rounds: list[int] = []
    for path in sorted(
        glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
        + glob.glob(os.path.join(root, "PARITY_r*.json"))
    ):
        m = re.search(r"_r(\d+)\.json$", path)
        if m is None:
            continue
        try:
            with open(path) as fh:
                rec = json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue
        r = int(m.group(1))
        is_parity = os.path.basename(path).startswith("PARITY_")
        rounds.append(r)
        for q, row in rec.items():
            if is_parity and (
                not isinstance(row, dict)
                or row.get("status") not in ("PASS", "ROWS-ONLY")
            ):
                continue
            latest[q] = max(latest.get(q, 0), r)
    return latest, rounds


def driver_ledger(root: str) -> dict[str, int]:
    """name -> latest DRIVER verdict round (CORRECTNESS rows only) —
    what _CHECK_FIRST rotates over: the sampled gate's own staleness,
    independent of the sweep evidence."""
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if m is None:
            continue
        try:
            with open(path) as fh:
                rec = json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue
        for q in rec:
            latest[q] = max(latest.get(q, 0), int(m.group(1)))
    return latest


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest, rounds = verdict_ledger(root)
    if not rounds:
        print("# no CORRECTNESS/PARITY artifacts found")
        return
    newest = max(rounds)
    # run at a round START (after the driver committed the previous
    # round's artifacts): the list being generated serves newest + 1
    this_round = newest + 1
    # the DRIVER window rotates over driver-verdict age (the sweep
    # carries the formal staleness bound; the window stays maximally
    # informative by re-sampling the stalest driver rows) — a query
    # green in a PARITY sweep but never driver-checked still LEADS
    drv = driver_ledger(root)
    never = sorted(q for q in QUERIES if q not in drv)
    drv_by_round: dict[int, list[str]] = defaultdict(list)
    for q in QUERIES:
        if q in drv:
            drv_by_round[drv[q]].append(q)
    stale = {
        q for q, r in latest.items() if r <= newest - 3 and q in QUERIES
    }
    print("# ===== paste into __spark_entry__.py (comment + list) =====")
    print(f"""\
# The driver's correctness gate samples the FIRST ~50 queries in dict
# order, so ordering is evidence policy (rotation): (1) never-checked
# queries lead, (2) queries whose code changed this round re-verify
# next, (3) the window backfills with the LONGEST-UNCHECKED driver
# verdicts oldest-cohort-first, (4) queries touched this round but
# already verified LAST round trail as overflow.
#
# The formal staleness bound is carried by EVIDENCE, not the window:
# scripts/parity_sweep.py runs the FULL registry against the DuckDB
# oracles at sf0.01 every round and commits PARITY_r{{N}}.json, which
# tests/test_entry_contract.py accepts as a verdict source (green
# rows only). _CHECK_FIRST still rotates the driver's ~50-slot window
# over the stalest DRIVER verdicts below.
#
# Round-{this_round} ledger (generated — regenerate with
# scripts/rotate_check_first.py): registry {len(QUERIES)}, newest
# committed artifact r{newest}, combined-stale (<= r{newest - 3}) {len(stale)},
# never-checked {len(never)}.
_CHECK_FIRST = [""")
    print(f"    # -- new round-{this_round} queries: no driver verdict yet")
    for q in never:
        print(f'    "{q}",')
    for r in sorted(drv_by_round):
        cohort = sorted(drv_by_round[r])
        print(f"    # -- latest driver verdict r{r} ({len(cohort)})")
        for q in cohort:
            print(f'    "{q}",')
    print("]")
    checked_unregistered = sorted(set(latest) - set(QUERIES))
    if checked_unregistered:
        print(f"# WARNING checked-but-unregistered: {checked_unregistered}")


if __name__ == "__main__":
    main()
