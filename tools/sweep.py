#!/usr/bin/env python3
"""Refresh BENCH_SWEEP.json: run graft.Bench at each scale factor and
merge the per-SF BENCH_FULL.json records into one sweep file. Bench is
min-of-3 with per-query spread, so each SF's numbers carry their own
noise bound. Usage: python3 tools/sweep.py [sf ...] (default all three).
"""
import json, os, shutil, subprocess, sys

sfs = sys.argv[1:] or ["sf0.001", "sf0.01", "sf0.1"]
runs = {}
for sf in sfs:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=f"/root/testdata/{sf}")
    print(f"[sweep] {sf} ...", flush=True)
    r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"], env=env,
                       capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-2000:]); print(r.stderr[-2000:])
        sys.exit(f"[sweep] bench failed at {sf}")
    with open("BENCH_FULL.json") as f:
        full = json.load(f)
    shutil.copy("BENCH_FULL.json", f"/tmp/BENCH_FULL_{sf}.json")
    runs[sf] = {
        "total": round(full["value"], 2),
        "cache_mb": full["cache_mb"],
        "queries": {k: round(v, 3) for k, v in full["queries"].items()},
        "spread": {k: round(v, 3) for k, v in full.get("spread", {}).items()},
    }
    print(f"[sweep] {sf}: {runs[sf]['total']}s, "
          f"{len(runs[sf]['queries'])} queries", flush=True)

out = {
    "metric": "sweep_totals",
    "unit": "sec",
    "queries_per_run": max(len(r["queries"]) for r in runs.values()),
    "timing": "noop-materialize min-of-3 per query, warm shared session per SF; "
              "spread = max-min over the 3 timed passes",
    "runs": runs,
}
with open("BENCH_SWEEP.json", "w") as f:
    json.dump(out, f)
print("[sweep] BENCH_SWEEP.json written")
