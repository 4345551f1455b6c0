#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query result parquet in outDir, executes the corresponding
oracle SQL from oracle_sql.json in DuckDB (tables = the sfDir parquet
files), and compares schema (column names), row count, and values.

Values are compared exactly first; on mismatch, floats are retried
with a tolerance report so we can see HOW close we are.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> int:
    out = Path(out_dir)
    oracle = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    results = {}
    for qdir in sorted(p for p in out.iterdir() if p.is_dir()):
        name = qdir.name
        got = con.execute(
            f"SELECT * FROM '{qdir}/*.parquet'").fetchdf()
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(got)}"
            continue
        try:
            want = con.execute(oracle[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            results[name] = f"ORACLE_ERROR {e}"
            continue
        g_cols, w_cols = sorted(got.columns), sorted(want.columns)
        if g_cols != w_cols:
            results[name] = f"SCHEMA_MISMATCH got={g_cols} want={w_cols}"
            continue
        if len(got) != len(want):
            results[name] = f"ROWCOUNT got={len(got)} want={len(want)}"
            continue
        # DuckDB parallelizes parquet scans over row groups, so result
        # order from `SELECT *` is not guaranteed — sort both sides by
        # all columns before cell-wise compare (the driver's hash
        # compare is row-order-insensitive for the same reason).
        got = got[g_cols].sort_values(by=g_cols, ignore_index=True)
        want = want[w_cols].sort_values(by=w_cols, ignore_index=True)
        exact, close, far = compare(got, want)
        if far == 0 and close == 0:
            results[name] = f"PASS rows={len(got)}"
        elif far == 0:
            results[name] = f"CLOSE rows={len(got)} fuzzy_cells={close}"
        else:
            results[name] = (f"FAIL rows={len(got)} exact={exact} "
                             f"close={close} far={far}")
    ok = True
    for name in sorted(results):
        status = results[name]
        mark = "✓" if status.startswith(("PASS", "ROWS_ONLY")) else "✗"
        if mark == "✗":
            ok = False
        print(f"{mark} {name}: {status}")
    return 0 if ok else 1


def compare(got, want):
    exact = close = far = 0
    for col in got.columns:
        for g, w in zip(got[col].tolist(), want[col].tolist()):
            if g == w or (g is None and w is None):
                exact += 1
            elif isinstance(g, float) and isinstance(w, float):
                if math.isnan(g) and math.isnan(w):
                    exact += 1
                elif math.isclose(g, w, rel_tol=1e-9, abs_tol=1e-9):
                    close += 1
                else:
                    far += 1
            elif str(g) == str(w):
                exact += 1
            else:
                far += 1
    return exact, close, far


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
