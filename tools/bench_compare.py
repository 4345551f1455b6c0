#!/usr/bin/env python3
"""Per-query bench delta between two rounds (VERDICT r1 item 10).

Usage: bench_compare.py <old> <new> [threshold]
 - <old>/<new>: BENCH_r*.json (driver format: the JSON line may be in
   `parsed` or truncated inside `tail`) or a raw Bench stdout line.
Prints queries whose new/old ratio exceeds the threshold (default 1.5)
plus the biggest movers both ways; exit code is always 0 (reporting
tool, not a gate).
"""
import json
import re
import sys


def load(path: str) -> dict:
    text = open(path).read()
    try:
        doc = json.loads(text)
    except ValueError:
        doc = {"tail": text}
    if isinstance(doc, dict) and isinstance(doc.get("queries"), dict):
        return doc["queries"]  # a raw Bench line
    if isinstance(doc, dict) and isinstance(doc.get("parsed"), dict):
        return doc["parsed"].get("queries", {})
    blob = doc.get("tail", "") if isinstance(doc, dict) else text
    # tolerate a truncated line: harvest every "name":float pair
    pairs = re.findall(r'"([a-z0-9_]+)":(-?[0-9]+\.[0-9]+)', blob)
    return {k: float(v) for k, v in pairs
            if k not in ("value",)}


def main() -> int:
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    common = sorted(set(old) & set(new))
    rows = [(n, old[n], new[n], new[n] / old[n] if old[n] > 0 else float("inf"))
            for n in common if old[n] > 0 and new[n] > 0]
    rows.sort(key=lambda r: -r[3])
    slower = [r for r in rows if r[3] > thresh]
    print(f"{len(common)} common queries; total old="
          f"{sum(old[n] for n in common):.1f}s new="
          f"{sum(new[n] for n in common):.1f}s")
    if slower:
        print(f"\n>{thresh}x SLOWER (needs a named cause):")
        for n, o, v, r in slower:
            print(f"  {n:28s} {o:8.2f}s -> {v:8.2f}s  ({r:.2f}x)")
    print("\nbiggest movers:")
    for n, o, v, r in rows[:5] + rows[-5:]:
        print(f"  {n:28s} {o:8.2f}s -> {v:8.2f}s  ({r:.2f}x)")
    only_new = sorted(set(new) - set(old))
    if only_new:
        print(f"\nnew queries: {', '.join(only_new)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
