"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Headline set mirrors the reference's published benchmarks (BASELINE.md):
grouped aggregation, z-score normalize, nunique, rolling mean, regex
extract, grouped UDF transform — plus the engine's scale extensions
(dedup, similarity) so regressions there are visible per round.

SPARK_GRAFT_PROGRESS=1 shows per-query live task progress (the
reference's signature tqdm UX, progress_imap.py:143-221) via
ProgressTracker — driver-side status polling only, so it costs nothing on
the executors; stderr, so the JSON line on stdout stays machine-parsable.

VARIANCE NOTE (r5): identical code measured 19.8-26.6 s total across runs
on this container minutes apart (every query moving together, including
untouched ones) — machine-level noise, not regressions. Compare per-query
RATIOS within a run, and rerun before concluding a cross-round delta.

MEDIANS (r8, verdict #1): every headline query now runs
SPARK_GRAFT_REPS times (default 3) and reports the per-query MEDIAN;
the headline total is the sum of medians, and the raw runs are emitted
under "queries_runs" in localdata/bench_last.json (r17: the stdout line
is SLIM — the driver's capture truncated the r12/r15 full payloads —
while the file keeps everything) so spread is auditable without
rerunning. Single-run
numbers were +/-20% noise two rounds running — medians are the instrument
the 2x-of-baseline criterion needs. The JSON also carries
"r6_comparable": the total minus the arms added after round 6
(text repetition/pii/chunks, cosine quant — measured from the same run's
arm pass), so round-over-round deltas compare equal work. Caveat field
"r6_comparable_note" records what canNOT be subtracted (the corpus
pipeline's fused gopher stage is not a separable arm).

METHODOLOGY CHANGE (r4): queries are forced with a noop-sink write
(``df.write.format("noop")``) instead of ``.count()``. Under count(),
Catalyst prunes projection-only expressions to ``Project []`` — the
operator being benchmarked was optimized away for expression-only
batteries (str_battery, ordered_battery, rolling_moments_battery, ...),
so their r1-r3 numbers are scan+count lower bounds. The noop sink
evaluates every output column and discards rows at the sink, which is
the standard Spark benchmarking idiom. Expect those batteries' timings
to RISE vs r3 — that is the measurement getting honest, not a
regression.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline queries: name -> queries() key. One representative per operator
# family so per-round regressions anywhere are visible.
HEADLINE = [
    "q1_pricing_summary",
    "stats_battery",
    "zscore_normalize",
    "corr_pearson",
    "groupby_agg_spec",
    "groupby_transform_zscore",
    "groupby_apply_demean",
    "pivot_battery",
    "rolling_moments_battery",
    "rolling_shapes_battery",
    "ordered_battery",
    "merge_battery",
    "ewm_battery",
    "chunk_split_by_col",
    "str_battery",
    "minhash_dedup_pairs",
    "cosine_topk",
    "text_doc_battery",
    "event_windows_battery",
    "corpus_build_pipeline",
]


def _force(df) -> None:
    """Force FULL execution of every output expression. A noop-sink write
    evaluates all columns and discards the rows at the sink; ``count()``
    must not be used here — Catalyst rewrites projection-only plans to
    ``Aggregate [count(1)] <- Project []`` and deletes the benched work."""
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    import __spark_entry__ as entrymod
    from parallel_pandas_spark.session import get_spark

    spark = get_spark(app_name="pps-bench")
    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs]
    # warm up EVERY headline query once at the smallest SF (one-time
    # Janino codegen / catalyst analysis / python-worker forks), then once
    # at the target SF (page cache, JIT tiering on the real data volume),
    # so timings reflect the steady state a resident cluster actually
    # runs at (the reference's baseline numbers are steady-state loops
    # too)
    for name in names:
        _force(qs[name](spark, "/root/testdata/sf0.001"))
    for name in names:
        _force(qs[name](spark, SF_DIR))

    progress = os.environ.get("SPARK_GRAFT_PROGRESS", "") not in ("", "0")

    def _run(name: str) -> None:
        df = qs[name](spark, SF_DIR)
        if not progress:
            return _force(df)
        from parallel_pandas_spark.progress import ProgressTracker

        def sink(done: int, active: int, total: int) -> None:
            print(f"\r{name}: {done}/{total} tasks ({active} running)",
                  end="", file=sys.stderr, flush=True)

        with ProgressTracker(spark, sink=sink):
            _force(df)
        print(file=sys.stderr)

    reps = max(1, int(os.environ.get("SPARK_GRAFT_REPS", "3")))
    runs: dict[str, list[float]] = {n: [] for n in names}
    # interleave reps (full sweeps) rather than back-to-back repeats of
    # one query, so a transient machine-load spike hits one sweep, not
    # all reps of one query — the median then rejects it
    for _ in range(reps):
        for name in names:
            t0 = time.perf_counter()
            _run(name)  # force full execution
            runs[name].append(round(time.perf_counter() - t0, 4))
    import statistics

    timings: dict[str, float] = {
        n: round(statistics.median(ts), 4) for n, ts in runs.items()
    }
    total = round(sum(timings.values()), 4)

    # Per-arm attribution (r7): batteries are pad-unions of component
    # queries, so the headline number alone can't say WHICH arm regressed
    # round-over-round. After the headline loop (so its timings are
    # untouched), each composed battery's arms run under their own timer.
    # The arm sum roughly re-runs the battery once, so SPARK_GRAFT_ARMS=0
    # skips this for quick iteration; the headline metric is identical
    # either way.
    # r9: arms are median-of-3 like the headline (interleaved sweeps) —
    # single-run arm times made quant-vs-exact comparisons noise-bound
    arms: dict[str, dict[str, float]] = {}
    if os.environ.get("SPARK_GRAFT_ARMS", "1") not in ("", "0"):
        arm_runs: dict[str, dict[str, list[float]]] = {}
        for _ in range(reps):
            for name in names:
                parts = getattr(qs[name], "__arms__", None)
                if not parts:
                    continue
                per = arm_runs.setdefault(name, {})
                for tag, fn in parts:
                    t0 = time.perf_counter()
                    _force(fn(spark, SF_DIR))
                    per.setdefault(tag, []).append(
                        round(time.perf_counter() - t0, 4)
                    )
        arms = {
            name: {tag: round(statistics.median(ts), 4) for tag, ts in per.items()}
            for name, per in arm_runs.items()
        }
    try:
        sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = None
    # r6-comparable subtotal: subtract the arm-pass times of arms that
    # did not exist at round 6, measured in THIS run's arm pass.
    # r13 (r12 verdict #4): the list now includes the r11/r12 additions
    # (ivfpq inside cosine_topk, the incremental minhash arm) — they had
    # silently inflated the "comparable" series by ~3.9 s.
    post_r6_arms = {
        "text_doc_battery": ["repetition", "pii", "chunks"],
        "cosine_topk": ["quant", "quantstore", "pq", "ivfpq", "opq"],
        "minhash_dedup_pairs": ["incremental"],
    }
    new_arm_cost = sum(
        arms.get(q, {}).get(a, 0.0) for q, al in post_r6_arms.items() for a in al
    )
    r6_comparable = round(total - new_arm_cost, 4) if arms else None
    # r11-comparable: total minus only the arms added AFTER round 11
    post_r11_arms = {
        "cosine_topk": ["ivfpq", "opq"],
        "minhash_dedup_pairs": ["incremental"],
    }
    post_r11_cost = sum(
        arms.get(q, {}).get(a, 0.0)
        for q, al in post_r11_arms.items() for a in al
    )
    r11_comparable = round(total - post_r11_cost, 4) if arms else None

    # Sentinel normalization (r12 verdict #4): this container's wall
    # clock drifts 1.3-1.5x between rounds on identical code, so raw
    # cross-round totals need a host factor. SENTINELS are headline
    # queries that never absorb new arms; the factor is the median of
    # this run's sentinel medians over the previous close-out's
    # (BENCH_PREV.json, committed each round), so a cross-round reader
    # divides by it instead of doing manual forensics.
    SENTINELS = ["q1_pricing_summary", "stats_battery", "corr_pearson",
                 "ewm_battery", "chunk_split_by_col", "str_battery"]
    sentinel_factor, prev_round = None, None
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_PREV.json")) as fh:
            prev = json.load(fh)
        prev_round = prev.get("round")
        ratios = sorted(
            timings[s] / prev["queries"][s]
            for s in SENTINELS
            if s in timings and prev["queries"].get(s)
        )
        if ratios:
            mid = len(ratios) // 2
            sentinel_factor = round(
                ratios[mid] if len(ratios) % 2
                else (ratios[mid - 1] + ratios[mid]) / 2, 4)
    except Exception:
        pass

    # r10: the vector-store economics, measured SEPARATELY — build-store
    # (one-time ingest cost: quantize + hive-partitioned write) vs
    # score-from-store (the steady state a resident store serves). The
    # quantstore arm above measures score time too (warm store); this
    # block forces a COLD build so the one-time cost is on record, then
    # re-times the store read alongside the exact arm for the
    # quant<=exact criterion at equal candidates.
    vec_metrics: dict[str, float] = {}
    if os.environ.get("SPARK_GRAFT_ARMS", "1") not in ("", "0"):
        import shutil
        import statistics as _st

        store_dir = entrymod._ensure_quant_store(spark, SF_DIR)
        shutil.rmtree(store_dir, ignore_errors=True)
        t0 = time.perf_counter()
        entrymod._ensure_quant_store(spark, SF_DIR)
        vec_metrics["build_sec"] = round(time.perf_counter() - t0, 4)
        score_runs, exact_runs = [], []
        # the two arms sit ~0.45 s apart by <10% at sf0.1 — median-of-3
        # is noise-bound for THIS comparison specifically (r9 verdict
        # relitigated parity twice); 7 interleaved reps tighten it
        for _ in range(max(reps, 7)):
            t0 = time.perf_counter()
            _force(entrymod.cosine_quantstore_topk_query(spark, SF_DIR))
            score_runs.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            _force(entrymod.cosine_topk_query(spark, SF_DIR))
            exact_runs.append(time.perf_counter() - t0)
        vec_metrics["score_from_store_sec"] = round(_st.median(score_runs), 4)
        vec_metrics["exact_sec"] = round(_st.median(exact_runs), 4)
        # r11: lifecycle economics — a day-sized ingest (5% of the
        # corpus appended, feed-only encode) plus a tombstone delete,
        # then score-through-tombstones; the append must stay feed-sized
        # (far below build_sec) and the tombstone filter must not move
        # the scoring time
        import tempfile

        from pyspark.sql import functions as _F

        from parallel_pandas_spark.operators import vecstore as _vs
        from parallel_pandas_spark.sources import load_table as _lt

        emb = _lt(spark, SF_DIR, "embeddings")
        lc_dir = os.path.join(tempfile.gettempdir(), "pps_vecstore_lc_bench")
        shutil.rmtree(lc_dir, ignore_errors=True)
        # the tombstone SIBLING must go too: a crashed prior run's stale
        # tombstones would silently shadow rows of the fresh store
        shutil.rmtree(_vs._tomb_path(lc_dir), ignore_errors=True)
        _vs.write_vector_store(
            emb.where(_F.col("vec_id") % 20 != 0), lc_dir, "vec_id",
            "embedding", dim=64, shards=1,
        )
        feed = emb.where(_F.col("vec_id") % 20 == 0)
        t0 = time.perf_counter()
        _vs.append_vector_store(feed, lc_dir, "vec_id", "embedding", dim=64)
        vec_metrics["append_5pct_sec"] = round(time.perf_counter() - t0, 4)
        t0 = time.perf_counter()
        _vs.delete_from_vector_store(
            spark, lc_dir, list(range(0, 400, 7)), "vec_id")
        vec_metrics["delete_sec"] = round(time.perf_counter() - t0, 4)
        queries = emb.where(_F.col("vec_id") < 10)
        lc_runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _force(_vs.quantized_topk_from_store(
                spark, lc_dir, queries, "vec_id", "embedding", k=5))
            lc_runs.append(time.perf_counter() - t0)
        vec_metrics["score_with_tombstones_sec"] = round(
            _st.median(lc_runs), 4)
        shutil.rmtree(lc_dir, ignore_errors=True)
        shutil.rmtree(_vs._tomb_path(lc_dir), ignore_errors=True)

        # r13 (r12 verdict #3): measured recall@k of the ANN paths vs
        # the exact brute-force arm on the same queries — the gauge
        # nprobe/pool tuning needs; without it probe counts are blind
        from parallel_pandas_spark.operators.similarity import recall_at_k

        exact_df = entrymod.cosine_topk_query(spark, SF_DIR)
        vec_metrics["recall_ivf_at5"] = round(recall_at_k(
            entrymod.ivf_store_topk_query(spark, SF_DIR), exact_df), 4)
        vec_metrics["recall_ivfpq_at5"] = round(recall_at_k(
            entrymod.cosine_ivfpq_topk_query(spark, SF_DIR), exact_df), 4)
        vec_metrics["recall_opq_at5"] = round(recall_at_k(
            entrymod.cosine_opq_topk_query(spark, SF_DIR), exact_df), 4)
        vec_metrics["recall_lsh_at5"] = round(recall_at_k(
            entrymod.lsh_topk_query(spark, SF_DIR), exact_df), 4)

        # r14 (r13 verdict #1): the same gauges on the STRUCTURED
        # fixture (clustered + anisotropic, similarity.structured_
        # embeddings) where recall actually discriminates — on the
        # isotropic driver vectors every ANN arm is intrinsically
        # marginal, so these are the numbers probe counts tune against.
        # Floors pinned in tests/test_new_surface_r14.py.
        import numpy as _np

        from parallel_pandas_spark.operators import vecstore as _vs2
        from parallel_pandas_spark.operators.similarity import (
            cosine_topk as _s_cosine,
            ivf_topk as _s_ivf,
            lsh_topk as _s_lsh,
            opq_train as _s_opq_train,
            structured_embeddings as _s_struct,
        )

        s_emb = _s_struct(emb).select(
            "vec_id", _F.col("embedding_s").alias("embedding"), "label"
        ).localCheckpoint(eager=True)
        s_queries = s_emb.where(_F.col("vec_id") < 50)
        s_exact = _s_cosine(s_emb, s_queries, "vec_id", "embedding", k=5)
        vec_metrics["recall_s_ivf_at5"] = round(recall_at_k(
            _s_ivf(s_emb, s_queries, "vec_id", "embedding", k=5,
                   num_centroids=16, nprobe=4), s_exact), 4)
        vec_metrics["recall_s_lsh_at5"] = round(recall_at_k(
            _s_lsh(s_emb, s_queries, "vec_id", "embedding", k=5,
                   num_planes=6, probe_hamming=2, dim=64), s_exact), 4)
        X_s = _np.array(
            s_emb.select("embedding").toPandas()["embedding"].tolist())
        R_s, _ = _s_opq_train(X_s, m=8, ks=16, iters=6)
        s_plain = os.path.join(tempfile.gettempdir(), "pps_bench_s_pq")
        s_opq = os.path.join(tempfile.gettempdir(), "pps_bench_s_opq")
        for p in (s_plain, s_opq):
            shutil.rmtree(p, ignore_errors=True)
            shutil.rmtree(p + ".rotation", ignore_errors=True)
        _vs2.write_ivfpq_store(
            s_emb, s_plain, "vec_id", "embedding", m=8, ks=16, dim=64,
            num_centroids=16)
        _vs2.write_ivfpq_store(
            s_emb, s_opq, "vec_id", "embedding", m=8, ks=16, dim=64,
            num_centroids=16, rotation=R_s.tolist())
        vec_metrics["recall_s_pq_fixedpool_at5"] = round(recall_at_k(
            _vs2.ivfpq_topk_from_store(
                spark, s_plain, s_emb, s_queries, k=5, pool=50, nprobe=4),
            s_exact), 4)
        # r16 (r15 verdict #7): the pool is TUNED, not hand-set — one
        # ADC pass yields the recall-vs-pool curve (tune_pool) and the
        # PQ arm scores at the minimal pool clearing 0.75; the fixed
        # pool=50 number above stays as the equal-cost OPQ comparison.
        s_pq_tuned = _vs2.tune_pool(
            spark, s_plain, s_emb, s_queries, k=5, nprobe=4,
            target_recall=0.75, max_pool=400)
        vec_metrics["s_pq_tuned_pool"] = int(s_pq_tuned["pool"])
        vec_metrics["recall_s_pq_at5"] = round(recall_at_k(
            _vs2.ivfpq_topk_from_store(
                spark, s_plain, s_emb, s_queries, k=5,
                pool=int(s_pq_tuned["pool"]), nprobe=4),
            s_exact), 4)
        vec_metrics["recall_s_opq_at5"] = round(recall_at_k(
            _vs2.ivfpq_topk_from_store(
                spark, s_opq, s_emb, s_queries, k=5, pool=50, nprobe=4),
            s_exact), 4)
        for p in (s_plain, s_opq):
            shutil.rmtree(p, ignore_errors=True)
            shutil.rmtree(p + ".rotation", ignore_errors=True)

        # r15 (r14 verdict #2): the tuner's own readout on the structured
        # store — the SAME call the driver's ivf_topk:tuned arm makes, so
        # the bench records which nprobe the registered query actually ran
        # at and what row fraction it probed
        tuned = _vs2.tune_probes(
            spark, entrymod._ensure_ivfs_store(spark, SF_DIR),
            s_emb, s_emb.where(_F.col("vec_id") < 10),
            "vec_id", "embedding", k=5, target_recall=0.95,
        )
        vec_metrics["tuned_nprobe"] = tuned["nprobe"]
        vec_metrics["tuned_recall"] = round(tuned["recall"], 4)
        vec_metrics["tuned_probed_fraction"] = tuned["probed_fraction"]
        vec_metrics["tuned_hit_target"] = tuned["hit_target"]
        from parallel_pandas_spark.operators.similarity import (
            tune_lsh_probes as _s_tune_lsh,
        )

        tuned_lsh = _s_tune_lsh(
            s_emb, s_emb.where(_F.col("vec_id") < 10),
            "vec_id", "embedding", k=5, num_planes=6,
            target_recall=0.95, dim=64,
        )
        vec_metrics["tuned_lsh_depth"] = tuned_lsh["probe_hamming"]
        vec_metrics["tuned_lsh_recall"] = round(tuned_lsh["recall"], 4)
        vec_metrics["tuned_lsh_bucket_fraction"] = round(
            tuned_lsh["probed_fraction"], 4)
        vec_metrics["tuned_lsh_hit_target"] = tuned_lsh["hit_target"]

    # r10 (r9 VERDICT #2): stamp the measured tree so a bench artifact can
    # never silently claim numbers for code it did not run
    import subprocess

    try:
        git_head = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, cwd=os.path.dirname(__file__) or ".",
        ).stdout.strip()
        git_dirty = bool(
            subprocess.run(
                ["git", "status", "--porcelain"],
                capture_output=True, text=True,
                cwd=os.path.dirname(__file__) or ".",
            ).stdout.strip()
        )
    except Exception:
        git_head, git_dirty = None, None
    if git_dirty:
        print(
            "WARNING: bench ran on a DIRTY tree — numbers may not match "
            f"commit {git_head}",
            file=sys.stderr,
        )
    # r17 (r15/r16 verdict #2): literal baseline-shape twins — OPT-IN via
    # env so the driver's bench contract (headline loop, slim stdout) is
    # untouched; the block lands in the FILE artifact only
    baseline_twins = None
    if os.environ.get("SPARK_GRAFT_BASELINE_TWINS", "") not in ("", "0"):
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "tools"))
        from baseline_twins import run_twins

        baseline_twins = run_twins(spark, reps)

    # r17 (r16 verdict #9): carry the committed sf0.01->sf1 slope study
    # (tools/scaling_slope.py, BENCH_SCALING.json) in the FILE artifact
    # so every round's bench ships per-query scale evidence — the 8-core
    # sf0.1 ratio pair is fixed-cost-dominated and cannot read plan
    # parallelism (r16 verdict scaling note)
    scaling_slopes = None
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_SCALING.json")) as fh:
            _sc = json.load(fh)
        scaling_slopes = {
            "slopes": _sc.get("slopes"),
            "cpus": _sc.get("cpus"),
            "git_head": _sc.get("git_head"),
            "note": (
                "d log(t)/d log(sf) fit over sf0.01/0.1/1 headline "
                "medians; ~1.0 = linear, <1 = fixed overhead still "
                "amortizing (tools/scaling_slope.py)"
            ),
        }
    except Exception:
        pass

    payload = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "reps": reps,
        "queries": timings,
        "queries_runs": runs,
        "arms": arms,
        "r6_comparable": r6_comparable,
        "r6_comparable_note": (
            "total minus post-r6 arms (text repetition/pii/chunks, "
            "cosine quant+quantstore+pq+ivfpq+opq, minhash incremental); "
            "corpus_build_pipeline's fused gopher stage is not a "
            "separable arm and remains included; arm times are "
            "median-of-" + str(reps) + " (r9)"
        ),
        "r11_comparable": r11_comparable,
        "sentinel_factor": sentinel_factor,
        "sentinel_factor_note": (
            "median(this_run/prev_round) over untouched sentinel "
            "queries " + ",".join(SENTINELS) + " vs BENCH_PREV.json "
            f"(round {prev_round}); divide cross-round totals by this "
            "host-noise factor before reading deltas"
        ),
        "vecstore": vec_metrics,
        "baseline_twins": baseline_twins,
        "scaling_slopes": scaling_slopes,
        "git_head": git_head,
        "git_dirty": git_dirty,
        "sf": sf,
    }
    # the full artifact goes to a FILE (the driver's stdout capture
    # truncates long tails — BENCH_r12/r15 both lost their lines that
    # way); stdout carries a SLIM line (<2 KB) with just the fields the
    # driver's round-over-round comparison reads (r16 verdict #1):
    # queries_runs/arms/vecstore/notes live only in the file artifact.
    try:
        os.makedirs(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "localdata"), exist_ok=True)
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "localdata", "bench_last.json"), "w") as fh:
            json.dump(payload, fh)
    except OSError:
        pass
    slim = {
        k: payload[k]
        for k in ("metric", "value", "unit", "reps", "queries",
                  "r6_comparable", "r11_comparable", "sentinel_factor",
                  "git_head", "git_dirty", "sf")
    }
    print(json.dumps(slim))


if __name__ == "__main__":
    main()
