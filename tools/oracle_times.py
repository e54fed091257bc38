#!/usr/bin/env python3
"""Time every oracle SQL in DuckDB over the same parquet tables the
engine is benched on — the judge-side half of the 2x performance bar,
committed per round so the ratio is auditable without a re-derivation.

Mirrors the judge recipe exactly: duckdb python, threads=32, views over
<sfDir>/*.parquet, min-of-2 warm runs per query (fetchall, results
discarded). Oracle SQLs come from a graft.Verify dump's oracle_sql.json
(they are scale-independent strings; any Verify run provides them).

Usage:
    python3 tools/oracle_times.py <sfDir> <oracle_sql.json> [out.json]

Output JSON: {"sf": ..., "threads": N, "total": sec,
              "queries": {name: sec, ...}, "failed": [name, ...]}
"""
import glob
import json
import os
import sys
import time

import duckdb

sf_dir = sys.argv[1]
oracle_path = sys.argv[2]
out_path = sys.argv[3] if len(sys.argv) > 3 else None

con = duckdb.connect()
con.execute("PRAGMA threads=32")
for p in sorted(glob.glob(f"{sf_dir}/*.parquet")):
    name = os.path.basename(p)[: -len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

with open(oracle_path) as f:
    oracles = json.load(f)

times, failed = {}, []
for name in sorted(oracles):
    sql = oracles[name]
    try:
        best = None
        for _ in range(2):  # min-of-2 warm: first run pays IO/plan cache
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 4)
    except Exception as e:  # keep timing the rest; record the failure
        failed.append(name)
        print(f"[oracle-fail] {name}: {e}", file=sys.stderr)

result = {
    "sf": sf_dir,
    "threads": 32,
    "total": round(sum(times.values()), 3),
    "queries": times,
    "failed": failed,
}
line = json.dumps(result)
if out_path:
    with open(out_path, "w") as f:
        f.write(line + "\n")
print(f"{len(times)} timed, {len(failed)} failed, total {result['total']} s")
