"""100x memory rehearsal (r11 VERDICT #7): run the sf1 sweep's heaviest
queries under a deliberately CONSTRAINED memory profile and record, per
query, the smallest driver-JVM heap that stays green plus its measured
peak heap, execution-memory spill, and wall time — proving the engine
SPILLS instead of OOMing when the data-to-memory ratio is pushed toward
what a 100 TB cluster executor sees.

Method: each (query, heap) runs in its OWN subprocess (fresh JVM —
spark.driver.memory must be set before JVM launch, and a previous run's
high-water mark must not pollute the next). Inside a run the Spark UI
REST API (/api/v1) supplies ground-truth stage metrics
(memoryBytesSpilled / diskBytesSpilled) and the driver executor's
peakMemoryMetrics; a sampler thread also records the JVM process RSS
from /proc. Heaps are tried ASCENDING per query, so the first green row
IS the smallest green profile; an OOM/failed run is recorded and the
next heap up is tried.

Profile under test: local[8] (cores scaled down 4x from the bench's 32
so the per-core memory share matches a lean 8-core/heap-constrained
executor), sf1 data (~6M-row lineitem), shuffle.partitions=32.

Usage:
    python tools/memory_rehearsal.py [--sf DIR] [--heaps 2g,4g,8g]
                                     [--queries a,b,c] [--out FILE]
Prints one JSON line per run to stderr and a final markdown table to
stdout (paste into SCALE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

#: sf1 sweep's heaviest queries (spark_sec, localdata/sweep_sf1.json r11)
DEFAULT_QUERIES = (
    "elementwise_battery",      # 157 s
    "weighted_rolling_mean",    # 147 s
    "csv_json_roundtrip",       # 134 s
    "ordered_battery",          # 65 s
    "stats_quantile_describe",  # 56 s
    "stats_battery",            # 40 s
    "merge_battery",            # 24 s
    "exact_dedup",              # 23 s
    "corpus_build_pipeline",    # 15 s
    "rolling_shapes_battery",   # 14 s (WindowExec sorts — the spill case)
)

_CHILD = r'''
import json, os, sys, threading, time, urllib.request

sys.path.insert(0, {repo!r})

peak_rss_kb = [0]
stop = threading.Event()

def _jvm_pids():
    me = os.getpid()
    out = []
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{{pid}}/stat") as f:
                parts = f.read().split()
            with open(f"/proc/{{pid}}/cmdline", "rb") as f:
                cmd = f.read()
        except OSError:
            continue
        if int(parts[3]) == me and b"java" in cmd:
            out.append(int(pid))
    return out

def _sample():
    pids = None
    while not stop.is_set():
        if not pids:
            pids = _jvm_pids()
        for p in pids:
            try:
                with open(f"/proc/{{p}}/statm") as f:
                    pages = int(f.read().split()[1])
                kb = pages * (os.sysconf("SC_PAGE_SIZE") // 1024)
                peak_rss_kb[0] = max(peak_rss_kb[0], kb)
            except OSError:
                pids = None
        time.sleep(0.05)

import __spark_entry__ as em
from parallel_pandas_spark.session import get_spark

spark = get_spark(
    app_name="memrehearsal", cpus={cpus},
    extra_conf={{"spark.ui.enabled": "true", "spark.ui.port": {port!r},
                 "spark.executor.metrics.pollingInterval": "1s"}},
)
threading.Thread(target=_sample, daemon=True).start()
q = em.queries()[{query!r}]
t0 = time.perf_counter()
q(spark, {sf!r}).write.format("noop").mode("overwrite").save()
wall = time.perf_counter() - t0
stop.set()

app = spark.sparkContext.applicationId
# ask the context for the REAL UI url: spark.port.maxRetries moves the
# UI off the requested port when it is taken, and a metrics hiccup must
# not turn a green run into a recorded failure — the query already
# completed, so metric fetches below are best-effort
ui = spark.sparkContext.uiWebUrl or f"http://localhost:{port}"
base = f"{{ui}}/api/v1/applications/{{app}}"
# a failed fetch records None, never a fabricated 0: "0 spill" is a
# MEASUREMENT the SCALE.md evidence table relies on, and a REST hiccup
# must be distinguishable from a genuinely spill-free run
mem_spill = disk_spill = peak_exec = peak_heap = None
try:
    stages = json.load(urllib.request.urlopen(f"{{base}}/stages?status=complete"))
    mem_spill = sum(s.get("memoryBytesSpilled", 0) for s in stages)
    disk_spill = sum(s.get("diskBytesSpilled", 0) for s in stages)
    peak_exec = max((s.get("peakExecutionMemory", 0) for s in stages), default=0)
except Exception:
    pass
try:
    peak_heap = 0
    for e in json.load(urllib.request.urlopen(f"{{base}}/executors")):
        pm = e.get("peakMemoryMetrics") or {{}}
        peak_heap = max(peak_heap, pm.get("JVMHeapMemory", 0))
except Exception:
    peak_heap = None
def _mb(v):
    return None if v is None else round(v / 2**20)
print("MEMREHEARSAL " + json.dumps({{
    "query": {query!r}, "heap": {heap!r}, "wall_s": round(wall, 1),
    "peak_jvm_heap_mb": _mb(peak_heap),
    "peak_exec_mem_mb": _mb(peak_exec),
    "mem_spill_mb": _mb(mem_spill),
    "disk_spill_mb": _mb(disk_spill),
    "peak_rss_mb": round(peak_rss_kb[0] / 1024),
    "metrics_unavailable": mem_spill is None or peak_heap is None,
}}))
'''


def run_one(repo: str, query: str, heap: str, sf: str, cpus: int, port: int,
            timeout: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM=heap)
    code = _CHILD.format(repo=repo, query=query, heap=heap, sf=sf,
                         cpus=cpus, port=str(port))
    try:
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout, env=env,
        )
    except subprocess.TimeoutExpired:
        return {"query": query, "heap": heap, "status": "timeout"}
    for ln in out.stdout.splitlines():
        if ln.startswith("MEMREHEARSAL "):
            rec = json.loads(ln[len("MEMREHEARSAL "):])
            rec["status"] = "green"
            return rec
    status, err_tail = classify_failure(out.stdout or "", out.stderr or "")
    return {"query": query, "heap": heap, "status": status,
            "err_tail": err_tail}


def classify_failure(stdout: str, stderr: str) -> tuple:
    """Classify a non-green child run and pick the diagnostic tail.

    OOM evidence can land on either stream (py4j re-raises JVM errors
    into stdout tracebacks), so both are scanned; the recorded tail
    comes from whichever stream actually carries the matched evidence —
    a stdout-only JVM OOM must not leave an empty err_tail next to an
    "oom" status.
    """
    def _has_evidence(s: str) -> bool:
        return "OutOfMemoryError" in s or "insufficient memory" in s

    status = ("oom" if _has_evidence(stderr[-4000:]) or
              _has_evidence(stdout[-4000:]) else "failed")
    if status == "oom":
        # slice the tail AROUND the matched marker (last occurrence in
        # whichever stream carries it): evidence deep in stderr's scan
        # window would otherwise fall outside a plain last-600 slice
        src = stderr if _has_evidence(stderr[-4000:]) else stdout
        idx = max(src.rfind("OutOfMemoryError"),
                  src.rfind("insufficient memory"))
        return status, src[max(0, idx - 200):idx + 400]
    err_tail = stderr[-600:]
    if not err_tail.strip():
        err_tail = stdout[-600:]
    return status, err_tail


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "localdata/sf1"))
    ap.add_argument("--heaps", default="2g,4g,8g")
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--timeout", type=int, default=2400)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    heaps = args.heaps.split(",")
    rows = []
    port = 4055
    for query in args.queries.split(","):
        for heap in heaps:  # ascending: first green = smallest profile
            rec = run_one(repo, query, heap, args.sf, args.cpus, port,
                          args.timeout)
            print(json.dumps(rec), file=sys.stderr, flush=True)
            rows.append(rec)
            if rec["status"] == "green":
                break
    if args.out:
        with open(args.out, "w") as fh:
            json.dump({"sf": args.sf, "cpus": args.cpus, "rows": rows}, fh,
                      indent=1)
    print("| query | heap | status | wall (s) | peak JVM heap (MB) "
          "| peak exec mem (MB) | spill mem/disk (MB) | peak RSS (MB) |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        if r["status"] != "green":
            print(f"| {r['query']} | {r['heap']} | {r['status']} "
                  "| | | | | |")
            continue
        print(
            f"| {r['query']} | {r['heap']} | green | {r['wall_s']} "
            f"| {r['peak_jvm_heap_mb']} | {r['peak_exec_mem_mb']} "
            f"| {r['mem_spill_mb']}/{r['disk_spill_mb']} "
            f"| {r['peak_rss_mb']} |"
        )


if __name__ == "__main__":
    main()
