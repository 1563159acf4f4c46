#!/usr/bin/env python3
"""Closing-record bench for the sf0.1 registry (dev-only, not part of
the driver contract).

Round-13 verdict item 6: the round-12 closing record needed a MANUAL
discard of a 95.7 s hot-box attempt, and the driver's own run timed at
loadavg 1.98 — a whisker under Bench.scala's 2.0 sentinel — so it
stamped a warm run `contended=false`. Builder judgment must not be in
the loop: this tool ports bench_sf1.py's per-chunk `busy_frac`
refuse-when-warm gate to the sf0.1 closing protocol and REFUSES or
RE-QUEUES on a warm box by itself.

Round 14: graft.Bench now carries the same protocol INTERNALLY
(busy_frac + loadavg pre-gate with default LOAD_MAX 1.0, post-run
busy re-sample, contended=true on either), so driver-invoked records
are protected too. This tool remains the closing wrapper for what a
main cannot do to itself: sample busy AFTER the JVM fully exits, and
discard-restore-requeue instead of stamping a contended record.

Protocol per attempt (max CLOSING_ATTEMPTS, default 3):
  1. wait (bounded) until the box is idle on BOTH signals —
     instantaneous /proc/stat busy fraction <= CLOSING_BUSY_MAX
     (default 0.15, the sf1 gate) AND 1-min loadavg <= CLOSING_LOAD_MAX
     (default 1.0 — since r14 this MATCHES Bench's own in-main default;
     historically it sat below the old 2.0 sentinel, per the round-12
     verdict); never drains -> hard refuse, exit 2;
  2. run the full-registry graft.Bench (which persists BENCH_LAST.json
     itself on full sf0.1 runs) with the strict load max;
  3. re-sample busy_frac the moment the JVM exits — nothing of ours
     runs anymore, so any busy CPU is the external burst that may have
     landed MID-RUN; a hot post-sample discards the attempt;
  4. a discarded attempt RESTORES the previous BENCH_LAST.json and
     re-queues; an accepted one stamps the gate readings into the
     record as `closing_gate` provenance.

Usage: python3 tools/bench_closing.py [sfDir]
"""
import json, os, shutil, subprocess, sys, time

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = "/root/repo/BENCH_LAST.json"
CP = "target/scala-2.13/classes:/opt/spark/jars/*"
BUSY_MAX = float(os.environ.get("CLOSING_BUSY_MAX", "0.15"))
LOAD_MAX = float(os.environ.get("CLOSING_LOAD_MAX", "1.0"))
ATTEMPTS = int(os.environ.get("CLOSING_ATTEMPTS", "3"))
WAITS = int(os.environ.get("CLOSING_BUSY_TRIES", "18"))


def cpu_busy_frac(interval=1.0):
    """Instantaneous whole-box busy fraction from /proc/stat — the
    idle signal loadavg cannot be (loadavg decays over a minute, so it
    is dominated by whatever JUST exited)."""
    def snap():
        with open("/proc/stat") as f:
            v = list(map(int, f.readline().split()[1:]))
        return sum(v), v[3] + v[4]  # total, idle+iowait
    t0, i0 = snap()
    time.sleep(interval)
    t1, i1 = snap()
    return 0.0 if t1 == t0 else 1.0 - (i1 - i0) / (t1 - t0)


def wait_idle():
    for i in range(WAITS):
        busy, load = cpu_busy_frac(), os.getloadavg()[0]
        if busy <= BUSY_MAX and load <= LOAD_MAX:
            return busy, load
        print(f"  warm box (busy {busy:.2f} > {BUSY_MAX} or load "
              f"{load:.2f} > {LOAD_MAX}) - waiting ({i + 1}/{WAITS})")
        time.sleep(10)
    return None


for attempt in range(1, ATTEMPTS + 1):
    gate = wait_idle()
    if gate is None:
        print("REFUSED: box never drained - no closing record stamped")
        sys.exit(2)
    busy_pre, load_pre = gate
    backup = None
    if os.path.exists(OUT):
        backup = OUT + ".pre-closing"
        shutil.copy(OUT, backup)
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=SF,
               SPARK_GRAFT_LOAD_MAX=str(LOAD_MAX),
               SPARK_GRAFT_LOAD_WAIT_SECS="0")
    print(f"attempt {attempt}: busy {busy_pre:.2f}, load {load_pre:.2f}"
          " - running graft.Bench")
    r = subprocess.run(["java", "-Xmx8g", "-cp", CP, "graft.Bench"],
                       capture_output=True, text=True, env=env)
    busy_post = cpu_busy_frac()
    lines = [l for l in r.stdout.splitlines()
             if l.startswith('{"metric"')]
    rec = json.loads(lines[-1]) if lines else None
    reasons = []
    if rec is None:
        reasons.append("bench emitted no record: " + r.stderr[-300:])
    else:
        if rec.get("contended"):
            reasons.append("bench self-reported contended=true")
        if rec.get("errors"):
            reasons.append(f"{rec['errors']} queries failed inside the "
                           "run (timings are throw-latency, not work)")
        if busy_post > BUSY_MAX:
            reasons.append(f"post-run busy {busy_post:.2f} > {BUSY_MAX}"
                           " (external burst may have landed mid-run)")
    if reasons:
        print(f"attempt {attempt} DISCARDED: " + "; ".join(reasons))
        if backup:
            shutil.move(backup, OUT)  # un-stamp the warm record
        elif os.path.exists(OUT):
            # no prior record to restore: delete what the discarded
            # attempt just stamped (round-14 advice — a first-ever run
            # on a warm box must not leave its record behind)
            os.remove(OUT)
        continue
    rec["closing_gate"] = {
        "busy_pre": round(busy_pre, 3), "busy_post": round(busy_post, 3),
        "load_pre": round(load_pre, 2), "busy_max": BUSY_MAX,
        "load_max": LOAD_MAX, "attempt": attempt}
    with open(OUT, "w") as f:
        json.dump(rec, f)
    if backup and os.path.exists(backup):
        os.remove(backup)
    print(f"closing record: {rec['value']:.1f} s over "
          f"{len(rec['queries'])} queries -> {OUT}")
    sys.exit(0)

print(f"REFUSED: all {ATTEMPTS} attempts discarded - previous record kept")
sys.exit(2)
