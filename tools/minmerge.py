#!/usr/bin/env python3
"""Min-merge repeated `tools/Profile all` sweeps into one dump.

Usage: python3 tools/minmerge.py out.json in1.json in2.json [...]

The host this engine is measured on has documented intermittent
throttle windows (BENCH_HISTORY.md): a multi-minute stall can inflate
every query that happens to run inside it, and Profile's own
min-of-2 runs sit close enough together that both land in the same
window. Repeating the whole sweep in a different window and taking
the per-query MIN is the standard noisy-host estimator — the minimum
over independent windows converges on the true cost, while mean or
single-run numbers carry the stall.

Seconds are min-merged; rows must agree (they are data, not timing —
a mismatch means the sweeps saw different corpora and the merge is
refused); shuffle/spill/state metrics are taken from whichever sweep
won the time (they travel with the run).
"""
import json
import sys


def main(argv):
    out_path, in_paths = argv[0], argv[1:]
    dumps = [json.load(open(p)) for p in in_paths]
    base = dumps[0]
    names = set(base["queries"])
    for d in dumps[1:]:
        names &= set(d["queries"])
        for q in names:
            r0, r1 = base["rows"].get(q), d["rows"].get(q)
            if r0 is not None and r1 is not None and r0 != r1:
                sys.exit(f"refusing merge: {q} rows differ ({r0} vs {r1})"
                         f" between {in_paths[0]} and sweeps")
    merged = dict(base)
    for key in ("queries", "rows", "shuffle_mb", "spill_mb", "state_rows"):
        merged[key] = {}
    for q in sorted(names):
        winner = min(dumps, key=lambda d: d["queries"][q])
        merged["queries"][q] = winner["queries"][q]
        for key in ("rows", "shuffle_mb", "spill_mb", "state_rows"):
            if q in winner.get(key, {}):
                merged[key][q] = winner[key][q]
    merged["value"] = round(sum(merged["queries"].values()), 2)
    merged["n"] = len(names)
    merged["merged_from"] = in_paths
    with open(out_path, "w") as f:
        json.dump(merged, f)
    print(f"{out_path}: {len(names)} queries, total {merged['value']}s "
          f"(inputs: {', '.join(str(round(d['value'], 1)) for d in dumps)})")


if __name__ == "__main__":
    main(sys.argv[1:])
