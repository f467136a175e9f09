"""Driver-row coverage matrix: which `queries()` entries hold a green
row in which round's CORRECTNESS_r{N}.json.

The driver snapshots only the first ~50 dict entries per round (README
"Driver snapshot window"), so per-query hard evidence is the UNION of
rounds.  This prints one line per query — its dict position, the
rounds where it has a green driver row, and a flag for queries whose
only evidence is the local gate — plus a summary.  Run it when
reordering queries() to verify no entry falls out of the union.

Usage: python scripts/coverage_matrix.py [repo_root]
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    import __spark_entry__ as entry

    names = list(entry.queries())
    rounds = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rid = os.path.basename(path).replace("CORRECTNESS_", "").replace(".json", "")
        with open(path) as fh:
            data = json.load(fh)
        rounds[rid] = {
            k
            for k, v in data.items()
            if v.get("rows_match") and v.get("schema_match") and v.get("hash_match")
            and not v.get("err")
        }

    covered_union = set().union(*rounds.values()) if rounds else set()
    print(f"{'pos':>3}  {'query':<32} {'rounds with green driver row'}")
    never = []
    for i, name in enumerate(names, 1):
        hits = [rid for rid in sorted(rounds) if name in rounds[rid]]
        window = "in-window" if i <= 50 else "past-50  "
        mark = "" if hits else "  <-- NO driver row any round"
        if not hits:
            never.append(name)
        print(f"{i:>3}  {name:<32} [{window}] {' '.join(hits)}{mark}")
    print()
    print(
        f"{len(names)} queries; union-covered {len(covered_union & set(names))}; "
        f"never driver-checked: {len(never)}"
        + (f" ({', '.join(never)})" if never else "")
    )
    print(
        f"first-50 window: {len(names[:50])} entries, "
        f"{sum(1 for n in names[:50] if n not in covered_union)} awaiting their "
        f"first driver row this round"
    )


if __name__ == "__main__":
    main()
