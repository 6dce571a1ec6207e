"""Skew-hardening study (r7, verdict #4): measured evidence that the
engine's grouped/join/window shapes survive a zipfian hot key, and where
they don't, the documented mitigation.

Fixture (deterministic, written once under localdata/skew/):
  skew_events — N_EVENTS rows whose ``user_id`` is zipfian: the hottest
    key holds ~HOT_FRAC of ALL rows (the "one whale user" shape that
    breaks naive hash-partitioning at 100 TB), a middle zipf tail, and a
    uniform cold tail.
  skew_users  — one row per user_id with attributes, big enough that
    Spark will NOT broadcast it (forces the sort-merge/shuffle path the
    skew problem lives in).

Measurements (each timed with a noop-sink force):
  1. groupby-agg on the skewed key       — map-side partial aggregation
     collapses the hot key per input partition BEFORE the shuffle, so
     the reduce side receives ~n_partitions rows per key, not the raw
     multiset. Expected: skew-immune.
  2. events ⋈ users on the skewed key,
     AQE skew-join ON vs OFF             — with AQE on, the hot
     partition is split into advisory-sized sub-partitions (plan shows
     ``skew=true``); with it off, one task drags the stage.
  3. window rank over the skewed key     — a WINDOW partition CANNOT be
     split (all rows of the hot key must meet in one task's sort); AQE
     does not apply. Expected: degrades with the hot-key share — the
     documented bound + the composite-key / pre-aggregation mitigation.

Usage: python tools/skew_study.py [--regen]  (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_DIR = "/root/repo/localdata/skew"
N_EVENTS = 8_000_000
N_USERS = 2_000_000  # ~few hundred MB joined side: too big to broadcast
HOT_FRAC = 0.35
SEED = 77


def generate() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    rng = np.random.default_rng(SEED)
    n_hot = int(N_EVENTS * HOT_FRAC)
    n_zipf = int(N_EVENTS * 0.35)
    n_cold = N_EVENTS - n_hot - n_zipf
    hot = np.zeros(n_hot, dtype=np.int64)  # user 0 is the whale
    zipf = rng.zipf(1.5, n_zipf) % N_USERS  # heavy middle tail
    cold = rng.integers(0, N_USERS, n_cold)
    uid = np.concatenate([hot, zipf, cold])
    rng.shuffle(uid)
    val = rng.normal(10, 3, N_EVENTS).round(4)
    ts = rng.integers(0, 86_400_000_000, N_EVENTS)  # one day of micros
    pq.write_table(
        pa.table({"user_id": uid, "value": val, "ep_us": ts}),
        f"{OUT_DIR}/skew_events.parquet",
        row_group_size=131_072,
    )
    pq.write_table(
        pa.table(
            {
                "user_id": np.arange(N_USERS, dtype=np.int64),
                "seg": rng.integers(0, 50, N_USERS).astype(np.int32),
                "pad": rng.integers(0, 1 << 60, N_USERS),  # defeat tiny-dim broadcast
            }
        ),
        f"{OUT_DIR}/skew_users.parquet",
        row_group_size=131_072,
    )
    print(f"wrote {OUT_DIR}: events={N_EVENTS} users={N_USERS} hot_frac={HOT_FRAC}")


def main() -> None:
    if "--regen" in sys.argv or not os.path.exists(f"{OUT_DIR}/skew_events.parquet"):
        generate()

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from parallel_pandas_spark.plans.explain import explain_str
    from parallel_pandas_spark.session import get_spark

    spark = get_spark(
        app_name="skew-study",
        extra_conf={
            # local volumes are far below the 256 MB default trigger;
            # scale the thresholds down so AQE's skew handling engages at
            # study size exactly as it would at cluster size
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
        },
    )
    ev = spark.read.parquet(f"{OUT_DIR}/skew_events.parquet")
    us = spark.read.parquet(f"{OUT_DIR}/skew_users.parquet")

    def force(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    out: dict = {"n_events": N_EVENTS, "n_users": N_USERS, "hot_frac": HOT_FRAC}

    # 1. grouped aggregation on the skewed key (map-side partial combine)
    agg = ev.groupBy("user_id").agg(
        F.count("*").alias("n"), F.sum("value").alias("s"), F.avg("value").alias("m")
    )
    force(agg)  # warm
    out["groupby_agg_sec"] = force(agg)

    # 2. the skewed join, AQE skew-split ON vs OFF
    join = ev.join(us, "user_id").select("user_id", "value", "seg")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    force(join)  # warm
    out["join_skewjoin_off_sec"] = force(join)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    out["join_skewjoin_on_sec"] = force(join)
    # the skew marker only exists on the POST-EXECUTION adaptive plan
    # (isFinalPlan=true): execute a collapse-to-one-row agg over the same
    # join through the DataFrame's own queryExecution, then explain it
    res = join.groupBy().agg(F.count("*").alias("n"))
    res.collect()
    plan = explain_str(res, "simple")
    out["join_final_plan_marks_skew"] = "skew=true" in plan
    out["join_is_broadcast"] = "BroadcastHashJoin" in plan

    # 3. window over the skewed partition key — the unsplittable case
    w = Window.partitionBy("user_id").orderBy("ep_us")
    rnk = ev.withColumn("rn", F.row_number().over(w))
    force(rnk)  # warm
    out["window_hot_key_sec"] = force(rnk)
    # mitigation: when per-key ORDER is not required downstream (e.g.
    # rank within (user, day)), a composite partition key caps the
    # per-task sort at the sub-key size
    w2 = Window.partitionBy("user_id", F.floor(F.col("ep_us") / 3_600_000_000)).orderBy(
        "ep_us"
    )
    rnk2 = ev.withColumn("rn", F.row_number().over(w2))
    force(rnk2)  # warm
    out["window_composite_key_sec"] = force(rnk2)

    # 4. (r11) CDC log compaction with a whale key — latest-per-key is
    # exactly shape #3 (row_number window, unsplittable by AQE), but
    # UNLIKE a rank the argmax admits a two-pass decomposition: latest
    # per (key, salt) then latest-of-latest (cdc_compact salt_buckets=).
    # Both passes split the hot key across tasks; measure the crossover.
    from parallel_pandas_spark.operators import cdc

    comp = cdc.cdc_compact(
        ev, ["user_id"], ["ep_us", "value"], drop_deleted=False
    )
    force(comp)  # warm
    out["cdc_compact_plain_sec"] = force(comp)
    for nb in (8, 32):
        comp_s = cdc.cdc_compact(
            ev, ["user_id"], ["ep_us", "value"],
            drop_deleted=False, salt_buckets=nb,
        )
        force(comp_s)  # warm
        out[f"cdc_compact_salted{nb}_sec"] = force(comp_s)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
