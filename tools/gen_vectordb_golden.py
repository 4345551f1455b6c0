#!/usr/bin/env python3
"""Golden retrieval results from the REFERENCE's own VectorDB class
(vectordb.py executed with lz4/console stubbed — lz4 is a storage
codec, not semantics). Fixed deterministic vectors; dump (sim, source,
text) triples for top-k queries.
"""
import json
import sys
import types

import numpy as np

# stub lz4 (identity codec) and the rich console before import
lz4 = types.ModuleType("lz4")
frame = types.ModuleType("lz4.frame")
frame.compress = lambda b: b
frame.decompress = lambda b: b
lz4.frame = frame
sys.modules["lz4"] = lz4
sys.modules["lz4.frame"] = frame
defaults = types.ModuleType("debgpt.defaults")


class _C:
    def print(self, *a, **k):
        pass

    def log(self, *a, **k):
        pass


src = open("/root/reference/debgpt/vectordb.py").read()
src = src.replace("from .defaults import console", "")
ns = {"console": _C()}
exec(compile(src, "vectordb.py", "exec"), ns)

DIM = 16


def vec(seed):
    rng = np.random.RandomState(seed)
    return rng.rand(DIM).astype(np.float32)


def main():
    db = ns["VectorDB"](":memory:", dimension=DIM)
    for i in range(10):
        db.add(f"vector_{i}", f"text_{i}", vec(i))
    db.add("ones", "ones_text", np.ones(DIM, dtype=np.float32))

    goldens = {}
    for qname, q in [("ones", np.ones(DIM, dtype=np.float32)),
                     ("seed3", vec(3)), ("seed99", vec(99))]:
        rows = db.retrieve(q, topk=3)
        goldens[qname] = [[round(float(sim), 6), source, text]
                          for sim, source, text in rows]
    # the raw float32 inputs, so Scala inserts identical bits
    goldens["inputs"] = {f"vector_{i}": [float(x) for x in vec(i)]
                         for i in range(10)}
    goldens["inputs"]["ones"] = [1.0] * DIM
    goldens["queries"] = {"ones": [1.0] * DIM,
                          "seed3": [float(x) for x in vec(3)],
                          "seed99": [float(x) for x in vec(99)]}
    with open(sys.argv[1], "w") as f:
        json.dump(goldens, f, indent=1)
    print("wrote", sys.argv[1])
    for k in ("ones", "seed3", "seed99"):
        print(k, goldens[k])


if __name__ == "__main__":
    main()
