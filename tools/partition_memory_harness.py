"""Measure the partition-wise pandas paths' memory contract (SCALE.md
"Windows: memory contract"): peak Python-worker RSS and wall time of
`ewm_multi` (grouped-map EWM) and `rolling_apply` (per-group Arrow UDF) at
sf0.1 under spark.sql.shuffle.partitions ∈ {8, 32, 128}.

Each configuration runs in its OWN subprocess (fresh JVM + fresh Python
workers) so a previous run's allocator high-water mark cannot pollute the
next measurement. Inside a run, a sampler thread polls /proc every 40 ms
for processes whose cmdline mentions pyspark.daemon/worker and records the
maximum single-process RSS and the maximum simultaneous total RSS —
sampled peaks, i.e. lower bounds within one sample interval of the truth.

Usage:  python tools/partition_memory_harness.py            # all configs
        SPARK_GRAFT_SF_DIR=... to point at another scale factor
Prints one markdown table row per (query, partitions) configuration.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PARTITIONS = (8, 32, 128)
QUERIES = ("ewm_battery", "rolling_apply_udf")

_CHILD = """
import json, os, sys, threading, time

sys.path.insert(0, {repo!r})

def _worker_pids():
    out = []
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{{pid}}/cmdline", "rb") as f:
                cmd = f.read()
        except OSError:
            continue
        if b"pyspark.daemon" in cmd or b"pyspark.worker" in cmd:
            out.append(int(pid))
    return out

def _rss_kb(pid):
    try:
        with open(f"/proc/{{pid}}/statm") as f:
            pages = int(f.read().split()[1])
        return pages * (os.sysconf("SC_PAGE_SIZE") // 1024)
    except (OSError, ValueError):
        return 0

peak = {{"single": 0, "total": 0}}
stop = threading.Event()

def _sample():
    while not stop.is_set():
        rss = [_rss_kb(p) for p in _worker_pids()]
        if rss:
            peak["single"] = max(peak["single"], max(rss))
            peak["total"] = max(peak["total"], sum(rss))
        time.sleep(0.04)

import __spark_entry__ as em
from parallel_pandas_spark.session import get_spark

spark = get_spark(app_name="memharness")
spark.conf.set("spark.sql.shuffle.partitions", {parts})
q = em.queries().get({query!r}) or getattr(em, {query!r})
# warm once (codegen, worker forks) so the timed run is steady-state
q(spark, {sf!r}).write.format("noop").mode("overwrite").save()

t = threading.Thread(target=_sample, daemon=True)
t.start()
t0 = time.perf_counter()
q(spark, {sf!r}).write.format("noop").mode("overwrite").save()
wall = time.perf_counter() - t0
stop.set(); t.join(timeout=1)
print(json.dumps({{"query": {query!r}, "partitions": {parts},
                   "wall_s": round(wall, 3),
                   "peak_worker_mb": round(peak["single"] / 1024, 1),
                   "peak_total_mb": round(peak["total"] / 1024, 1)}}))
"""


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rows = []
    for query in QUERIES:
        for parts in PARTITIONS:
            code = _CHILD.format(repo=repo, parts=parts, query=query, sf=SF_DIR)
            out = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True, text=True, timeout=600,
            )
            line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
            if not line:
                print(f"FAILED {query} @ {parts}:\n{out.stderr[-2000:]}", file=sys.stderr)
                continue
            rows.append(json.loads(line[-1]))
            print(json.dumps(rows[-1]), file=sys.stderr)
    print("| query | shuffle.partitions | wall (s) | peak worker RSS (MB) | peak all-workers RSS (MB) |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['query']} | {r['partitions']} | {r['wall_s']} "
            f"| {r['peak_worker_mb']} | {r['peak_total_mb']} |"
        )


if __name__ == "__main__":
    main()
