#!/usr/bin/env python3
"""Fold a subset `tools/Profile all <names...>` run into an existing
full-sweep profile dump (new-query decade rows without re-running the
whole 191-query sweep).

Usage: python3 tools/addquery.py full.json subset.json

Per-query metrics (seconds/rows/shuffle/spill/state) for every query
present in the subset dump are inserted into the full dump in place;
`n` is recomputed. Queries already present are refused unless the row
counts agree (rows are data — a mismatch means different corpora).
Dev/reporting tool only — not part of the engine.
"""
import json
import sys


def main(full_path, subset_path):
    full = json.load(open(full_path))
    sub = json.load(open(subset_path))
    if full.get("sf", "").rstrip("/").split("/")[-1] != \
       sub.get("sf", "").rstrip("/").split("/")[-1]:
        sys.exit(f"refusing: scale tags differ "
                 f"({full.get('sf')} vs {sub.get('sf')})")
    for q in sub["queries"]:
        r0, r1 = full["rows"].get(q), sub["rows"].get(q)
        if r0 is not None and r0 != r1:
            sys.exit(f"refusing: {q} rows differ ({r0} vs {r1})")
        for key in ("queries", "rows", "shuffle_mb", "spill_mb",
                    "state_rows"):
            full[key][q] = sub[key][q]
    full["n"] = len(full["queries"])
    full["value"] = round(sum(full["queries"].values()), 2)
    json.dump(full, open(full_path, "w"), separators=(",", ":"))
    print(f"{full_path}: +{sorted(sub['queries'])} -> n={full['n']}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
