#!/usr/bin/env python3
"""Build BENCH_FLOORS.json — the per-row reference floors the bench's
per-row outlier gate (Bench.loadFloors) compares each query's median
against.

Floor = the MINIMUM of each query's `queries_median` entry across the
given BENCH_DETAIL-style captures. Feed it CLEAN-window captures only
(`"window":"clean"`, or pre-gate captures a quiet-window re-measure
validated): a floor from a contended capture would be inflated and the
gate would under-trigger exactly where it matters.

Usage:
    python3 tools/make_bench_floors.py out.json capture1.json [capture2.json ...]

A query present in ANY capture gets a floor (min over the captures
that carry it); queries added after the newest capture simply have no
floor yet and are un-gated until the next floors refresh.
"""
import json
import sys


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    out, paths = sys.argv[1], sys.argv[2:]
    floors: dict[str, float] = {}
    for p in paths:
        with open(p) as f:
            d = json.load(f)
        med = d.get("queries_median")
        if not med:
            sys.exit(f"{p}: no queries_median map - not a detail capture")
        win = d.get("window")
        if win not in (None, "clean"):
            sys.exit(f"{p}: window={win!r} - floors take clean captures only")
        for name, v in med.items():
            if v < 0:
                continue  # failed row: no floor from a crash
            floors[name] = min(floors.get(name, float("inf")), float(v))
    with open(out, "w") as f:
        json.dump(dict(sorted(floors.items())), f, indent=1)
        f.write("\n")
    print(f"wrote {out}: {len(floors)} floors from {len(paths)} captures")


if __name__ == "__main__":
    main()
