#!/usr/bin/env python3
"""Dev-only sf1 bench runner (not part of the driver contract).

Round-7 finding: running all 130+ registry queries through ONE shared
JVM at sf1 contaminates timings up to ~6x — accumulated JVM state (GC
debt from the per-query cache churn at 10x data) leaks into whoever
runs next (e.g. q10_setops, a 0.6 s query, recorded 43.9 s right after
the q109 monster). The honest protocol at this scale is chunked fresh
JVMs: heavy queries run alone, the rest in small groups, one JSON
merged at the end. The per-round driver bench at sf0.1 keeps the
single-JVM protocol (contamination there is bounded - see BENCH notes).

Usage: python3 tools/bench_sf1.py [sfDir] [outJson] [reps] [onlyPrefixes]

With onlyPrefixes (comma-separated name prefixes), runs just those
queries and MERGES their timings into an existing outJson (keeping the
other entries) - the incremental path for benching newly added queries
without re-running the whole registry.
"""
import json, subprocess, sys, os, time

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/data/sf1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/BENCH_SF1.json"
# round-8 (round-7 verdict item 4): reps=1 at sf1 was the single-run
# trap the sf0.1 harness documents; default to 3-rep medians
REPS = sys.argv[3] if len(sys.argv) > 3 else "3"
ONLY = sys.argv[4].split(",") if len(sys.argv) > 4 else None
CP = "target/scala-2.13/classes:/opt/spark/jars/*"

names = subprocess.run(
    ["java", "-cp", CP, "graft.Names"], capture_output=True, text=True)
if names.returncode != 0:
    sys.exit("graft.Names failed: " + names.stderr[-500:])
all_q = [n for n in names.stdout.split() if n.startswith("q")]
if ONLY:
    all_q = [n for n in all_q if any(n.startswith(p) for p in ONLY)]

# known-heavy at sf1: isolate each in its own JVM
SOLO = {"q109_incremental_minhash", "q28_jaccard_pairs", "q75_containment",
        "q121_phash_neardup", "q114_negative_sample", "q29_minhash_lsh",
        "q53_simhash_neardup", "q58_ngram_jaccard", "q55_dup_clusters",
        "q132_incremental_bm25", "q160_dedup_yield_curve", "q166_apriori_triples",
        "q211_ann_family_search", "q213_containment_reps"}
rest = [n for n in all_q if n not in SOLO]
CHUNK = 12
groups = [[n] for n in sorted(SOLO & set(all_q))] + \
    [rest[i:i + CHUNK] for i in range(0, len(rest), CHUNK)]

# idle gate ONCE at script start: between chunks the 1-min loadavg is
# dominated by the PREVIOUS chunk's decayed spike (stale metric, the
# CPUs are actually free the moment its JVM exits), so the loadavg
# sentinel stays a start-of-run check only.
load_start = os.getloadavg()[0]
if load_start > 2.0:
    print(f"WARNING: starting with load {load_start:.1f} > 2 - "
          "timings will be contended; drain the box first")


def cpu_busy_frac(interval=1.0):
    """Instantaneous whole-box busy fraction from /proc/stat - the
    per-chunk idle signal loadavg cannot be (see above)."""
    def snap():
        with open("/proc/stat") as f:
            v = list(map(int, f.readline().split()[1:]))
        return sum(v), v[3] + v[4]  # total, idle+iowait
    t0, i0 = snap()
    time.sleep(interval)
    t1, i1 = snap()
    return 0.0 if t1 == t0 else 1.0 - (i1 - i0) / (t1 - t0)


# Per-chunk idle gate (round-10, closing the round-9 q121 finding: one
# chunk ran warm — provenance said load_start 4.44 — and its 6.09 s
# entry overstated a 5.5 s query). Nothing of OURS runs between chunks,
# so any busy CPU now is external contention: wait for it to drain
# (bounded), and if it never does, REFUSE the chunk — an old entry or a
# hole is honest, a warm number is not.
BUSY_MAX = float(os.environ.get("SF1_BUSY_MAX", "0.15"))
BUSY_TRIES = int(os.environ.get("SF1_BUSY_TRIES", "18"))

merged, total, chunk_prov = {}, 0.0, []
for g in groups:
    busy = cpu_busy_frac()
    tries = 0
    while busy > BUSY_MAX and tries < BUSY_TRIES:
        print(f"  box busy ({busy:.2f} > {BUSY_MAX}) before chunk "
              f"{g[0]} - waiting for drain ({tries + 1}/{BUSY_TRIES})")
        time.sleep(10)
        busy = cpu_busy_frac()
        tries += 1
    if busy > BUSY_MAX:
        print(f"chunk REFUSED (box busy {busy:.2f} after "
              f"{BUSY_TRIES} waits): {g[0]}..({len(g)}) - existing "
              "entries for these queries are kept, warm ones are not "
              "recorded")
        chunk_prov.append({"head": g[0], "n": len(g),
                           "busy_frac": round(busy, 3),
                           "refused": True})
        continue
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=SF, SPARK_GRAFT_REPS=REPS,
               SPARK_GRAFT_ONLY=",".join(g),
               SPARK_GRAFT_LOAD_MAX=str(os.cpu_count() + 1),
               SPARK_GRAFT_LOAD_WAIT_SECS="60")
    # 8g = the driver's SPARK_DRIVER_MEM default (build.sbt). NOT more:
    # G1 on a 32-100g heap runs this cache-churn workload 2-4x SLOWER
    # (q29 at sf1: 11.4 s at 8g vs 23.7 s at 32g) - measured round 7
    r = subprocess.run(["java", "-Xmx8g", "-cp", CP, "graft.Bench"],
                       capture_output=True, text=True, env=env)
    line = [l for l in r.stdout.splitlines() if l.startswith('{"metric"')]
    if not line:
        print("chunk FAILED:", g[:3], r.stderr[-300:])
        continue
    rec = json.loads(line[-1])
    merged.update(rec["queries"])
    total += rec["value"]
    chunk_prov.append({"head": g[0], "n": len(g),
                       "busy_frac": round(busy, 3),
                       "sec": round(rec["value"], 2)})
    print(f"chunk {g[0]}..({len(g)}): {rec['value']:.1f} s "
          f"(pre-chunk busy {busy:.2f})")

# Per-run provenance: an incremental ONLY merge must not stamp entries
# measured under an older protocol / a loaded box with the latest run's
# settings (round-8 advice). Each run appends a record naming exactly
# which queries it measured and under what conditions; the global
# `protocol`/`load_start` describe only the LATEST run.
this_run = {"queries": sorted(merged), "reps": REPS,
            "load_start": load_start,
            "chunks": chunk_prov,
            "protocol": "chunked fresh JVMs (heavy solo), min-of-reps, "
                        "per-chunk idle gate (busy_frac <= "
                        f"{BUSY_MAX}, refuse-when-warm)"}
runs = [this_run]
if ONLY and os.path.exists(OUT):
    prev = json.load(open(OUT))
    runs = prev.get("runs", [{"queries": sorted(prev["queries"]),
                              "reps": prev.get("reps", "?"),
                              "load_start": prev.get("load_start"),
                              "protocol": prev.get("protocol", "unknown"),
                              "note": "pre-provenance record"}]) + runs
    prev["queries"].update(merged)
    merged = prev["queries"]
    total = sum(merged.values())
out = {"metric": "total", "value": total, "unit": "sec",
       "queries": merged, "sf": SF, "load_start": load_start,
       "protocol": this_run["protocol"], "runs": runs}
with open(OUT, "w") as f:
    json.dump(out, f)
print(f"total {total:.1f} s over {len(merged)} queries -> {OUT}")
