#!/usr/bin/env python3
"""Machine calibration artifact: re-build the PREVIOUS round's commit in
a scratch worktree and time a fixed set of heavy queries under both it
and HEAD, same machine, same hour. Emits CALIBRATION.json so the judge
can separate VM drift from code regressions without re-deriving the
evidence (the round-8 "phantom +11%" lesson, made a standing artifact).

The five probe queries are deliberately ones no round is expected to
touch; if one WAS touched between the two commits, its delta measures
code, not machine — note it in the round log. Expected runtime ~6-10 min
(two sbt builds + two min-of-3 bench passes at sf0.1).
Usage: python3 tools/calibrate.py [prev_commit]   (default: HEAD~ of the
round boundary — pass the previous round's final commit explicitly)
"""
import json, os, subprocess, sys, datetime

# The drift estimate is only valid over probes whose CODE is untouched
# between the two commits — a probe that got optimized measures the code
# delta, not the machine. Round 14 optimized three of the original five
# (events_attribution, product_rank, copurchase_distance); round 15's
# promotions touched gold.scala and llm.scala, so the set was re-drawn
# again onto that round's untouched heavies (serving/search/catalog
# files). REVISE THIS LIST in any round that code-touches a probe,
# before running the bracket — the staleness guard below refuses stale
# sets automatically.
# Widened to a standing set of 10 (r16 judge item 7: the r16 bracket
# dropped 2 of 5 probes as stale and the median sat on 3 queries; with
# 10 heavies spread over four round-over-round-stable files, >= 8 live
# probes survive a typical round's code touches). Selection criteria:
# >= ~0.8 s at sf0.1 (floor-amortized), implementing file untouched in
# recent rounds, no tier-switch posture (Bench measures the same body
# every round).
QUERIES = ["session_overlaps", "bm25_search", "customer_churn_monthly",
           "source_top_terms", "table_profile", "dedup_ngram",
           "vocab_top_approx", "bpe_tokenize", "spend_psi",
           "events_sliding_uniques"]
# r17 (optimization round) re-draw: the round touched gold/llm/search/
# serving — most of the r16 set measures this round's own speedups.
# Re-drawn onto the streaming family (streaming.scala untouched; AQE is
# off in stateful workloads, so the round's Bench conf change cannot
# reach their plans) plus the no-join catalog profiles. All >= ~0.8 s
# at sf0.1 in this round's baseline record.
QUERIES = ["table_profile", "table_profile_approx", "events_stream",
           "events_dedup_stream", "event_sessions_native_stream",
           "events_upsert_publish", "events_hopping_stream",
           "events_stream_enriched", "join_view_maintained",
           "event_sessions_stream"]
SF_DIR = "/root/testdata/sf0.1"

args = [a for a in sys.argv[1:] if a != "--allow-dirty"]
prev = args[0] if args else None
if not prev:
    sys.exit("usage: python3 tools/calibrate.py <previous-round-commit> [--allow-dirty]")
# the HEAD bench runs in the repo root working tree, so a dirty tree
# would label the measurement with a commit it doesn't correspond to —
# refuse unless explicitly overridden (then the artifact records it)
dirty = bool(subprocess.run(["git", "status", "--porcelain"],
                            capture_output=True, text=True).stdout.strip())
if dirty and "--allow-dirty" not in sys.argv:
    sys.exit("[calibrate] working tree is dirty: the HEAD timing would not "
             "correspond to the recorded head_commit; commit first or pass "
             "--allow-dirty to record head_dirty=true")
head = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                      text=True).stdout.strip()
prev_full = subprocess.run(["git", "rev-parse", prev], capture_output=True,
                           text=True).stdout.strip()

# -- probe staleness guard (round-14 lesson, made structural) ---------------
# A probe whose implementing file changed between the two commits measures
# the code delta, not the machine (round 14's first bracket returned a
# nonsense 0.78 because 3/5 probes were that round's own speedups). Drop
# stale probes automatically and REFUSE if fewer than 3 clean ones remain.
# SparkEntry.scala is deliberately NOT in the map: the registry file
# changes every round, almost never in a way that touches a probe's plan —
# a probe whose registry lambda itself changes must be re-drawn by hand.
PROBE_FILES = {
    "session_overlaps": ["src/main/scala/graft/serving.scala"],
    "bm25_search": ["src/main/scala/graft/search.scala"],
    "customer_churn_monthly": ["src/main/scala/graft/serving.scala"],
    "source_top_terms": ["src/main/scala/graft/search.scala"],
    "table_profile": ["src/main/scala/graft/catalog.scala"],
    "table_profile_approx": ["src/main/scala/graft/catalog.scala"],
    "dedup_ngram": ["src/main/scala/graft/llm.scala"],
    "vocab_top_approx": ["src/main/scala/graft/llm.scala"],
    "bpe_tokenize": ["src/main/scala/graft/llm.scala"],
    "spend_psi": ["src/main/scala/graft/serving.scala"],
    "events_sliding_uniques": ["src/main/scala/graft/serving.scala"],
    "events_stream": ["src/main/scala/graft/streaming.scala"],
    "events_dedup_stream": ["src/main/scala/graft/streaming.scala"],
    "event_sessions_native_stream": ["src/main/scala/graft/streaming.scala"],
    "events_upsert_publish": ["src/main/scala/graft/streaming.scala"],
    "events_hopping_stream": ["src/main/scala/graft/streaming.scala"],
    "events_stream_enriched": ["src/main/scala/graft/streaming.scala"],
    "join_view_maintained": ["src/main/scala/graft/streaming.scala"],
    "event_sessions_stream": ["src/main/scala/graft/streaming.scala"],
}
unmapped = [q for q in QUERIES if q not in PROBE_FILES]
if unmapped:
    sys.exit(f"[calibrate] probes without a PROBE_FILES entry: {unmapped} — "
             "map their implementing files before running the bracket")
changed = set(subprocess.run(
    ["git", "diff", "--name-only", f"{prev_full}..{head}"],
    capture_output=True, text=True).stdout.split())
stale = sorted(q for q in QUERIES
               if any(f in changed for f in PROBE_FILES[q]))
if stale:
    print(f"[calibrate] STALE probes dropped (implementing file changed "
          f"{prev_full[:12]}..{head[:12]}): {stale}")
QUERIES = [q for q in QUERIES if q not in stale]
if len(QUERIES) < 5:
    sys.exit(f"[calibrate] only {len(QUERIES)} code-untouched probes remain "
             f"— re-draw QUERIES/PROBE_FILES before running the bracket")
print(f"[calibrate] {len(QUERIES)} live probes: {QUERIES}")


def bench(workdir):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=SF_DIR,
               SPARK_GRAFT_QUERIES=",".join(QUERIES))
    # Bench writes BENCH_FULL.json into its cwd — in the repo root that
    # would clobber the committed full-sweep artifact with this 5-query
    # subset, so save and restore it around the run
    full_path = os.path.join(workdir, "BENCH_FULL.json")
    saved = None
    if os.path.exists(full_path):
        with open(full_path, "rb") as f:
            saved = f.read()
    try:
        r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"], env=env,
                           cwd=workdir, capture_output=True, text=True)
        if r.returncode != 0:
            print(r.stdout[-3000:])
            sys.exit(f"[calibrate] bench failed in {workdir}")
        with open(full_path) as f:
            full = json.load(f)
    finally:
        if saved is not None:
            with open(full_path, "wb") as f:
                f.write(saved)
    # restrict to the probe set and fail loudly on a missing query — an
    # old commit that ignores SPARK_GRAFT_QUERIES would otherwise make
    # the prev/head totals compare mismatched query sets
    missing = [q for q in QUERIES if q not in full["queries"]]
    if missing:
        sys.exit(f"[calibrate] {workdir} bench lacks probe queries: {missing}")
    return {q: round(full["queries"][q], 3) for q in QUERIES}


wt = f"/tmp/graft_calib_{prev_full[:12]}"
subprocess.run(["git", "worktree", "remove", "--force", wt],
               capture_output=True)
r = subprocess.run(["git", "worktree", "add", "--detach", wt, prev_full],
                   capture_output=True, text=True)
if r.returncode != 0:
    sys.exit(f"[calibrate] worktree add failed: {r.stderr[-500:]}")
try:
    print(f"[calibrate] benching previous commit {prev_full[:12]} ...",
          flush=True)
    prev_times = bench(wt)
    print(f"[calibrate] benching HEAD {head[:12]} ...", flush=True)
    head_times = bench(".")
finally:
    subprocess.run(["git", "worktree", "remove", "--force", wt],
                   capture_output=True)

# machine-drift-corrected full-suite ratio: the probe queries are code-
# untouched between the two commits, so head_probe/prev_probe is pure
# machine drift; dividing the full-suite BENCH_FULL ratio by it yields a
# machine-independent cross-round comparison by construction. Uses the
# committed BENCH_FULL.json of each commit (the prev worktree carries
# the previous round's artifact; the repo root carries this round's).
# MEDIAN of the per-query ratios, not the ratio of sums: one probe with
# bimodal scheduling behavior (copurchase_triangles swings 4.5-9s in
# shared-JVM context on IDENTICAL code — measured both commits, round 13)
# would otherwise own the whole drift estimate. The median survives any
# single outlier probe; the per-query ratios are recorded so a reader can
# see which probe disagreed and by how much.
# tolerate probes missing from either artifact (a crashed/renamed query)
# or a zero prev time — build ratios only where both sides are usable,
# and refuse a median over fewer than 3 survivors (too few to be robust).
per_query_ratio = {q: round(head_times[q] / prev_times[q], 4)
                   for q in QUERIES
                   if head_times.get(q) is not None
                   and prev_times.get(q, 0) > 0}
dropped = [q for q in QUERIES if q not in per_query_ratio]
if dropped:
    print(f"[calibrate] probes dropped (missing/zero on one side): {dropped}")
if len(per_query_ratio) < 3:
    sys.exit(f"[calibrate] only {len(per_query_ratio)} usable probe ratios "
             f"({sorted(per_query_ratio)}); need >= 3 for a robust median")
ratios = sorted(per_query_ratio.values())
probe_ratio = ratios[len(ratios) // 2] if len(ratios) % 2 else \
    (ratios[len(ratios) // 2 - 1] + ratios[len(ratios) // 2]) / 2
drift_corrected = None
out_extra = {}
temporal = {}
temporal_drift = None
drift_corrected_temporal = None
full_totals = {}
try:
    shown = subprocess.run(["git", "show", f"{prev_full}:BENCH_FULL.json"],
                           capture_output=True, text=True)
    if shown.returncode != 0:
        raise OSError(f"no BENCH_FULL.json at {prev_full[:12]}")
    prev_artifact = json.loads(shown.stdout)
    full_totals["prev"] = prev_artifact["value"]
    with open("BENCH_FULL.json") as f:
        full_totals["head"] = json.load(f)["value"]
    drift_corrected = round(
        (full_totals["head"] / full_totals["prev"]) / probe_ratio, 4)
    # TEMPORAL machine drift (added r15): the back-to-back probe_ratio
    # above is ~1 by construction (same machine minute, code-identical
    # probes) — it catches a code delta sneaking into the probe set but
    # NOT how much the VM changed since the prev round's committed
    # artifact was measured. That drift is prev-commit-NOW vs the SAME
    # probe inside the prev commit's committed BENCH_FULL: identical
    # code, two points in time. The corrected ratio divides it out.
    for q in QUERIES:
        then = prev_artifact.get("queries", {}).get(q)
        if then and then > 0 and prev_times.get(q):
            temporal[q] = round(prev_times[q] / then, 4)
    tr = sorted(temporal.values())
    if len(tr) >= 3:
        temporal_drift = tr[len(tr) // 2] if len(tr) % 2 else \
            (tr[len(tr) // 2 - 1] + tr[len(tr) // 2]) / 2
        drift_corrected_temporal = round(
            (full_totals["head"] / full_totals["prev"]) / temporal_drift, 4)
    # Widest (and most robust) temporal estimator: the MEDIAN per-query
    # head-artifact/prev-artifact ratio over the FULL intersection of
    # the two committed BENCH_FULLs. With ~190 queries the median is
    # immune both to the handful the round actually code-touched and to
    # any single query's bimodal scheduling — unlike the 3-5 probe
    # median above, which a noisy day can swing by ±30% (measured r15:
    # session_overlaps ran 0.73s and 1.66s in back-to-back brackets).
    prev_q = prev_artifact.get("queries", {})
    with open("BENCH_FULL.json") as f:
        head_q = json.load(f).get("queries", {})
    wide = sorted(head_q[q] / prev_q[q] for q in set(prev_q) & set(head_q)
                  if prev_q[q] > 0.05)
    if len(wide) >= 20:
        artifact_median = wide[len(wide) // 2] if len(wide) % 2 else \
            (wide[len(wide) // 2 - 1] + wide[len(wide) // 2]) / 2
        out_extra["artifact_median_query_ratio"] = round(artifact_median, 4)
        out_extra["drift_corrected_vs_prev_wide"] = round(
            (full_totals["head"] / full_totals["prev"]) / artifact_median, 4)
except (OSError, KeyError, ValueError, ZeroDivisionError) as e:
    print(f"[calibrate] no drift-corrected ratio ({e}); raw probe ratio only")

out = {
    "metric": "machine_calibration",
    "unit": "sec",
    "sf": SF_DIR,
    "run_utc": datetime.datetime.utcnow().strftime("%Y-%m-%dT%H:%MZ"),
    "prev_commit": prev_full,
    "head_commit": head,
    "head_dirty": dirty,
    "stale_probes_dropped": stale,
    "timing": "graft.Bench noop-materialize min-of-3, same machine, back-to-back",
    "queries": {q: {"prev": prev_times.get(q), "head": head_times.get(q),
                    "ratio": per_query_ratio.get(q)}
                for q in QUERIES},
    "total": {"prev": round(sum(prev_times.values()), 3),
              "head": round(sum(head_times.values()), 3)},
    "machine_drift_ratio": round(probe_ratio, 4),
    "bench_full_total": full_totals or None,
    "drift_corrected_vs_prev": drift_corrected,
    "temporal_probe_ratios": temporal or None,
    "temporal_drift_ratio": temporal_drift,
    "drift_corrected_vs_prev_temporal": drift_corrected_temporal,
    **out_extra,
    "note": "machine_drift_ratio = MEDIAN of per-query head/prev ratios "
            "on the code-untouched heavy probes, both benched NOW "
            "back-to-back — ~1 by construction; it catches a code delta "
            "hiding in the probe set, not time. temporal_drift_ratio = "
            "MEDIAN of prev-commit-NOW / prev-commit's committed "
            "BENCH_FULL per probe — identical code at two points in "
            "time, i.e. the actual machine change since the prev round "
            "was recorded. drift_corrected_vs_prev_temporal = "
            "(BENCH_FULL head/prev) / temporal_drift_ratio is the "
            "machine-independent cross-round suite ratio; <1 means the "
            "code got faster. drift_corrected_vs_prev (the pre-r15 "
            "field) divides by the back-to-back ratio instead and "
            "understates machine movement between rounds. "
            "artifact_median_query_ratio = median per-query ratio over "
            "the full committed-artifact intersection (~190 queries) - "
            "the most robust temporal estimator (immune to the few "
            "code-touched queries and to any one bimodal query); "
            "drift_corrected_vs_prev_wide divides by it.",
}
with open("CALIBRATION.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out["total"]))
print("[calibrate] CALIBRATION.json written")
