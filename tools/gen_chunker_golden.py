#!/usr/bin/env python3
"""Chunker goldens: run the REFERENCE's chunk_lines (extracted from
reader.py) over a randomized multi-byte corpus; store docs + expected
ranges for the Scala parity test.
"""
import json
import random
import re
import sys

src = open("/root/reference/debgpt/reader.py").read()
m = re.search(r"^def chunk_lines\(.*?(?=^def )", src, re.S | re.M)
ns = {"List": list, "Dict": dict, "Tuple": tuple}
exec("from typing import List, Dict, Tuple\n" + m.group(0), ns)
chunk_lines = ns["chunk_lines"]

rng = random.Random(2026)
ALPH = ["a", "bb", "ccc", "中", "文字", "🎉", "x" * 7, ""]


def main():
    cases = []
    for i in range(60):
        n_lines = rng.randint(1, 40)
        lines = ["".join(rng.choice(ALPH) for _ in range(rng.randint(0, 6)))
                 for _ in range(n_lines)]
        budget = rng.randint(1, 150)
        ranges = sorted(chunk_lines(lines, budget).keys())
        cases.append({
            "content": "\n".join(lines),
            "budget": budget,
            "ranges": [[s, e] for s, e in ranges],
        })
    with open(sys.argv[1], "w") as f:
        json.dump({"cases": cases}, f)
    print(f"wrote {len(cases)} chunker golden cases")


if __name__ == "__main__":
    main()
