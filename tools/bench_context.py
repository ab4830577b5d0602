#!/usr/bin/env python3
"""Derive tools/bench_context.json — the cross-round comparison context
graft.Bench stamps into its receipts (r15 judge item 3: raw AND
drift-corrected vs-prev ratios in ONE artifact).

Reads the previous round's committed BENCH_FULL.json (via git show) for
the prev suite total, and CALIBRATION.json (tools/calibrate.py, run
against the same prev commit) for the temporal drift estimate —
preferring the artifact-median estimator (median per-query ratio over
the full committed-artifact intersection, ~190 queries) and falling
back to the 3-5-probe temporal median. Bench then computes, at run
time, vs_prev_raw = its_total / prev_total_sec and vs_prev_corrected =
raw / temporal_drift_median, so the stamped ratios are correct for ANY
subsequent full run (including the driver's) without re-deriving the
calibration.

Usage: python3 tools/bench_context.py <previous-round-commit>
Run AFTER tools/calibrate.py <same-commit>; commit the output so the
driver's bench run embeds it.
"""
import json, subprocess, sys

if len(sys.argv) != 2:
    sys.exit("usage: python3 tools/bench_context.py <previous-round-commit>")
prev = sys.argv[1]
prev_full = subprocess.run(["git", "rev-parse", prev], capture_output=True,
                           text=True).stdout.strip()
shown = subprocess.run(["git", "show", f"{prev_full}:BENCH_FULL.json"],
                       capture_output=True, text=True)
if shown.returncode != 0:
    sys.exit(f"[bench_context] no BENCH_FULL.json at {prev_full[:12]}")
prev_artifact = json.loads(shown.stdout)
prev_conf = prev_artifact.get("conf", {})
if prev_conf.get("queryFilter") is not None:
    sys.exit("[bench_context] prev BENCH_FULL.json was a FILTERED run "
             f"(queryFilter={prev_conf['queryFilter']!r}) — its total is "
             "not a full-suite baseline; pick a full-registry round")

calib = json.load(open("CALIBRATION.json"))
if calib.get("prev_commit") != prev_full:
    sys.exit(f"[bench_context] CALIBRATION.json prev_commit "
             f"{calib.get('prev_commit', '?')[:12]} != {prev_full[:12]} — "
             "run tools/calibrate.py against the same commit first")
# The artifact-median estimator compares the prev commit's committed
# BENCH_FULL against HEAD's committed one — when the round has not yet
# committed its own full record (HEAD still carries prev's artifact),
# the two are the SAME file and the "median ratio" is a degenerate 1.0.
# Detect that and fall back to the temporal probe median, which re-times
# the prev commit NOW against its own committed record (r17).
wide = calib.get("artifact_median_query_ratio")
if wide is not None and abs(wide - 1.0) < 1e-9 \
        and calib.get("bench_full_total", {}).get("prev") \
            == calib.get("bench_full_total", {}).get("head"):
    wide = None
drift = wide or calib.get("temporal_drift_ratio")
if not drift:
    print("[bench_context] WARNING: no temporal drift estimate in "
          "CALIBRATION.json; context will carry the raw ratio only")

# OUTPUT CONTRACT (consumed by graft.Bench with line-anchored regexes):
# flat-ish JSON via json.dump(indent=1) — every key starts its own line;
# no key name may be duplicated at a different nesting level. Bench gates
# the calib stamp on sf + conf.cpus + conf.minPartitionSize matching its
# own session, so an env-overridden probe run never stamps a vs_prev
# headline against the default-conf baseline.
out = {
    "prev": f"round commit {prev_full[:12]}",
    "prev_total_sec": round(prev_artifact["value"], 3),
    "sf": prev_artifact.get("sf", "/root/testdata/sf0.1"),
    "conf": {"cpus": prev_conf.get("cpus", "32"),
             "minPartitionSize": prev_conf.get("minPartitionSize", "16k")},
    "temporal_drift_median": drift,
    "drift_estimator": ("artifact_median_query_ratio" if wide
                        else "temporal_drift_ratio (probe median)")
                       if drift else None,
    "calibration_run_utc": calib.get("run_utc"),
    "note": "consumed by graft.Bench: vs_prev_raw = run_total / "
            "prev_total_sec; vs_prev_corrected = vs_prev_raw / "
            "temporal_drift_median (>1 host slower than when prev was "
            "recorded). See CALIBRATION.json for the full bracket.",
}
with open("tools/bench_context.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps({k: out[k] for k in
                  ("prev", "prev_total_sec", "temporal_drift_median")}))
print("[bench_context] tools/bench_context.json written")
