"""Round-15 surface: the skew-safe salted JOIN (joins.salted_join — the
join half of the whale-key story, r14 verdict #4) and the incremental
SCD-2 driver identity (scd2_apply under the hash oracle, r14 verdict #1
— the full-rebuild equivalence the oracle now value-checks is also
pinned here directly on the driver fixture).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from parallel_pandas_spark.operators import cdc, joins  # noqa: E402
from parallel_pandas_spark.sources import load_table  # noqa: E402


def _whale_lineitem(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_orderkey") % 100 < 95, F.lit(1).cast("long"))
        .otherwise((F.lit(1) + F.col("l_orderkey") % 97).cast("long"))
        .alias("sk"),
        "l_quantity", "l_orderkey", "l_linenumber",
    )


def _dim(spark, sf_dir):
    return load_table(spark, sf_dir, "part").where(
        F.col("p_partkey") <= 97
    ).select(F.col("p_partkey").cast("long").alias("sk"), "p_type")


def _sorted_rows(df):
    # None-safe total order: sort by repr tuple (values compared exactly
    # via the tuple equality in the final assert either way)
    return sorted((tuple(r) for r in df.collect()),
                  key=lambda t: tuple(map(repr, t)))


@pytest.mark.parametrize("how", ["inner", "left", "left_semi", "left_anti"])
def test_salted_join_equals_plain(spark, sf_small, how):
    """salted == plain, row-identical, for every supported how — on the
    whale-skewed fixture (95% of rows on sk=1), with some left keys that
    match nothing (sk > 97 does not occur here, so widen the dim gap by
    shrinking it) and NULL keys on both sides."""
    li = _whale_lineitem(spark, sf_small).limit(2000)
    dim = _dim(spark, sf_small).where(F.col("sk") % 3 != 0)  # unmatched keys
    # inject NULL keys: they must never match, salted or not
    li = li.withColumn(
        "sk", F.when(F.col("l_linenumber") == 7, F.lit(None)).otherwise(
            F.col("sk"))
    )
    dim = dim.unionByName(
        dim.limit(1).select(F.lit(None).cast("long").alias("sk"), "p_type")
    )
    plain = li.join(dim, ["sk"], how)
    salted = joins.salted_join(
        li, dim, ["sk"], how=how, salt_buckets=8,
        salt_cols=["l_orderkey", "l_linenumber"],
    )
    assert salted.columns == plain.columns
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_join_spreads_the_whale(spark, sf_small):
    """The partition-size bound that makes the plan skew-safe: after
    salting, the largest (key, salt) co-group is ~whale/salt_buckets —
    no reducer ever owns the whole whale key."""
    li = _whale_lineitem(spark, sf_small)
    whale = li.where(F.col("sk") == 1).count()
    buckets = 16
    salted = li.withColumn(
        "__salt",
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"),
               F.lit(buckets)).cast("int"),
    )
    sizes = [
        r["n"]
        for r in salted.where(F.col("sk") == 1)
        .groupBy("__salt").agg(F.count("*").alias("n")).collect()
    ]
    assert len(sizes) == buckets  # xxhash64 actually spreads
    assert max(sizes) <= (whale / buckets) * 2  # no residual hot bucket


def test_salted_join_plan_hashes_on_key_and_salt(spark, sf_small):
    """With broadcast off, the exchange partitions on (key, salt) — the
    salt is IN the shuffle key, which is the whole point."""
    li = _whale_lineitem(spark, sf_small)
    dim = _dim(spark, sf_small)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = joins.salted_join(
            li, dim, ["sk"], salt_buckets=16,
            salt_cols=["l_orderkey", "l_linenumber"],
        )
        txt = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    import re

    m = re.search(r"hashpartitioning\(sk[^)]*__salt", txt)
    assert m, f"no (sk, __salt) exchange in plan:\n{txt[:2000]}"


def test_salted_join_refuses_replicating_hows(spark, sf_small):
    li = _whale_lineitem(spark, sf_small)
    dim = _dim(spark, sf_small)
    for how in ("full", "right", "outer"):
        with pytest.raises(ValueError, match="unsupported"):
            joins.salted_join(li, dim, ["sk"], how=how)


def test_salted_join_refuses_degenerate_inputs(spark, sf_small):
    """Self-review r15: salt_buckets<1 silently lost data (empty salt
    array drops every right row; pmod(x,0) NULLs the left salt), and a
    keys-only left side silently salted BY the join key — a constant
    per key value, so the whale stayed in one bucket. Both now refuse."""
    li = _whale_lineitem(spark, sf_small)
    dim = _dim(spark, sf_small)
    with pytest.raises(ValueError, match="salt_buckets"):
        joins.salted_join(li, dim, ["sk"], salt_buckets=0)
    with pytest.raises(ValueError, match="no non-key columns"):
        joins.salted_join(li.select("sk"), dim, ["sk"])


def test_r15_arms_registered_not_new_entries():
    import __spark_entry__ as em

    qs = em.queries()
    assert len(qs) == 50
    for retired in ("skew_join_arm", "ivf_tuned_topk", "lsh_tuned_topk",
                    "stream_session_poststate"):
        assert retired not in qs  # fused as arms, never 51st entries
    assert [t for t, _ in qs["merge_battery"].__arms__] == [
        "inner", "outer", "semi_anti", "verbs", "cdc", "skewjoin"]
    assert [t for t, _ in qs["lsh_topk"].__arms__] == ["base", "tuned"]


def test_scd2_apply_equals_full_rebuild_on_events(spark, sf_small):
    """The driver arm's exact identity, pinned locally: scd2_apply(
    scd2_build(even), odd) == scd2_build(even ∪ odd), on the same
    deterministic change log the cdc_arm derives."""
    ev = load_table(spark, sf_small, "events")
    log = ev.select(
        "event_id", "ts", "user_id", "event_type", "value",
        F.when(F.pmod(F.col("event_id"), F.lit(17)) == 0, F.lit("D"))
        .otherwise(F.lit("U")).alias("op"),
    )
    even = log.where(F.pmod(F.col("event_id"), F.lit(2)) == 0)
    odd = log.where(F.pmod(F.col("event_id"), F.lit(2)) == 1)
    dim = cdc.scd2_build(even, ["user_id"], "ts", order=["ts", "event_id"])
    inc = cdc.scd2_apply(dim, odd, ["user_id"], "ts",
                         order=["ts", "event_id"])
    full = cdc.scd2_build(log, ["user_id"], "ts", order=["ts", "event_id"])
    cols = sorted(full.columns)
    assert _sorted_rows(inc.select(*cols)) == _sorted_rows(
        full.select(*cols))


def test_scd2_apply_standing_dim_never_shuffled(spark, sf_small):
    """Plan fence: the untouched-keys leg of scd2_apply reaches the
    output through broadcast joins only — no exchange on the standing
    dimension's rows (the 100 TB contract: a day's changes must not
    re-shuffle the whole dimension)."""
    ev = load_table(spark, sf_small, "events")
    log = ev.select("event_id", "ts", "user_id", "value",
                    F.lit("U").alias("op"))
    dim = cdc.scd2_build(log, ["user_id"], "ts", order=["ts", "event_id"])
    dimp = dim.localCheckpoint(eager=True)  # sever the build's own plan
    changes = log.where(F.col("user_id") < 5)
    out = cdc.scd2_apply(dimp, changes, ["user_id"], "ts",
                         order=["ts", "event_id"])
    txt = out._jdf.queryExecution().executedPlan().toString()
    # the anti-join (untouched leg) must be broadcast, not shuffled
    assert "BroadcastHashJoin" in txt and "LeftAnti" in txt, txt[:2000]
