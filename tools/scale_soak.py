#!/usr/bin/env python3
"""Empirical 10x scale soak (round-15 judge item #4): generate an sf1
dataset (10x sf0.1) with graft.GenScale, bench the heavy query families
at both SFs, and commit the per-query growth ratios as BENCH_SCALE.json.

The 100-TB posture has so far been argued from plan shapes; this
measures the actual sf0.1 -> sf1 scaling curve. GenScale builds sf1 as
10 shards with IDENTICAL internal statistics (bijective text rotation,
orthogonal embedding sign-flips, interleaved keys — see GenScale.scala),
so for every query the expected growth is ~linear (<= ~10x) unless its
complexity class is worse; a ratio far above the flag threshold is a
scaling defect to investigate, not machine noise.

Usage: python3 tools/scale_soak.py [--reuse-sf1]
Expected runtime ~20-35 min (generation ~2 min + two bench passes).
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

# Heavy families: graph, dedup/LSH, similarity, streaming, batch heavies.
QUERIES = [
    # graph
    "product_rank", "copurchase_distance", "copurchase_triangles",
    "copurchase_triangles_approx", "product_communities",
    "community_modularity", "product_kcore", "basket_pairs",
    # dedup / LSH / text
    "dedup_exact", "dedup_ngram", "dedup_ngram_prefix", "dedup_clusters",
    "dedup_minhash", "dedup_simhash", "dedup_embedding",
    "dedup_embedding_lsh", "dedup_containment", "dedup_incremental",
    "span_dedup", "decontaminate", "decontaminate_bloom", "doc_fingerprint",
    "bm25_search", "tfidf_top_terms", "bpe_learn",
    # similarity search
    "knn_bruteforce", "knn_lsh", "knn_ivf", "knn_quantized", "knn_topk_agg",
    # streaming
    "events_attribution", "events_attribution_outer",
    "events_attribution_full", "event_sessions_stream",
    "events_upsert_publish", "ca_monthly_maintained",
    "top_clients_maintained", "join_view_maintained", "events_dedup_stream",
    "events_stream_enriched",
    # batch heavies
    "dim_clients", "client_features", "session_overlaps", "ca_monthly",
    "customer_overlap_matrix", "table_profile", "chi2_country_ticket",
]


def run(cmd, **kw):
    r = subprocess.run(cmd, capture_output=True, text=True, **kw)
    if r.returncode != 0:
        print(r.stdout[-3000:])
        print(r.stderr[-2000:])
        sys.exit(f"[scale_soak] failed: {' '.join(cmd)}")
    return r


def bench(sf_dir):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_QUERIES=",".join(QUERIES))
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
    missing = [q for q in QUERIES if q not in full["queries"]]
    if missing:
        sys.exit(f"[scale_soak] bench at {sf_dir} lacks queries: {missing}")
    if full.get("errors"):
        sys.exit(f"[scale_soak] bench at {sf_dir} had errors: {full['errors']}")
    return {q: full["queries"][q] for q in QUERIES}


if not ("--reuse-sf1" in sys.argv and os.path.isdir(SF1)):
    print(f"[scale_soak] generating sf1 = {R}x {SF01} -> {SF1} ...", flush=True)
    run(["sbt", "-batch", f"runMain graft.GenScale {SF01} {SF1} {R}"])
print("[scale_soak] bench sf0.1 ...", flush=True)
base = bench(SF01)
print("[scale_soak] bench sf1 (10x) ...", flush=True)
big = bench(SF1)

ratios = {q: (round(big[q] / base[q], 2) if base[q] > 0 else None)
          for q in QUERIES}
flagged = sorted(q for q, r in ratios.items() if r is not None and r > FLAG_RATIO)
head = run(["git", "rev-parse", "HEAD"]).stdout.strip()
out = {
    "metric": "scale_soak_sf0.1_to_sf1",
    "unit": "sec",
    "run_utc": datetime.datetime.utcnow().strftime("%Y-%m-%dT%H:%MZ"),
    "head_commit": head,
    "data_growth": R,
    "flag_ratio": FLAG_RATIO,
    "construction": f"sf1 = {R} statistically-identical shards of sf0.1 "
        "(graft.GenScale: interleaved keys, per-shard bijective text "
        "rotation, per-shard orthogonal embedding sign-flips) — every "
        "query's expected growth is <= ~linear in data unless its "
        "complexity class is worse",
    "timing": "graft.Bench noop-materialize min-of-3 per SF, back-to-back "
        "same machine; single-run ratios carry the usual shared-JVM JIT "
        "noise band (see CALIBRATION.json)",
    "queries": {q: {"sf0.1": round(base[q], 3), "sf1": round(big[q], 3),
                    "ratio": ratios[q]} for q in QUERIES},
    "total": {"sf0.1": round(sum(base.values()), 3),
              "sf1": round(sum(big.values()), 3),
              "ratio": round(sum(big.values()) / sum(base.values()), 2)},
    "flagged_superlinear": flagged,
}
with open("BENCH_SCALE.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out["total"]))
if flagged:
    print(f"[scale_soak] SUPER-LINEAR (> {FLAG_RATIO}x): {flagged}")
print("[scale_soak] BENCH_SCALE.json written")
sys.exit(1 if flagged else 0)
