"""Round-12: per-touched-group extrema (and HLL) refresh in the
incremental rollup read-out (incremental.refresh_extrema) — closes the
honest gap negate_state documents (min/max don't retract; sketches don't
retract): touched groups recompute from the refreshed corpus, untouched
groups keep stored values bit-for-bit, and the recompute's joins are all
broadcast (the snapshot side never shuffles)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from parallel_pandas_spark.operators import incremental, rollup  # noqa: E402

_DI_SCHEMA = "doc_id long, lang string, n_chars long, fp string"
_CH_SCHEMA = "doc_id long, lang string, n_chars long, fp string, op string"
_SPEC = {"n_chars": (0, 0)}


def _standing(spark, rows):
    di = spark.createDataFrame(rows, _DI_SCHEMA)
    co = incremental.keepers(di)
    return di, co


def _refresh(spark, di, co, state, changes, distinct_cols=()):
    ch = spark.createDataFrame(changes, _CH_SCHEMA)
    di2, co2, added, removed = incremental.refresh_corpus(di, co, ch)
    # delta states carry no sketches (sketches don't retract);
    # allowMissingColumns NULL-fills them so hll_union_agg passes the
    # STORED sketch through the merge — stale for touched groups, which
    # refresh_extrema then rebuilds
    u = state.unionByName(
        rollup.agg_state(added, ["lang"], _SPEC), allowMissingColumns=True
    ).unionByName(
        rollup.negate_state(
            rollup.agg_state(removed, ["lang"], _SPEC), ["n_chars"]),
        allowMissingColumns=True,
    )
    state2 = rollup.merge_state(
        u, ["lang"], ["n_chars"], distinct_cols=distinct_cols)
    state2 = incremental.refresh_extrema(
        state2, co2, added, removed, ["lang"], ["n_chars"],
        distinct_cols=distinct_cols,
    )
    return co2, state2


def _final_map(df):
    return {r["lang"]: tuple(r)[1:] for r in df.collect()}


def test_extrema_refresh_equals_rebuild_after_max_removal(spark):
    """Deleting a group's max is exactly the case stored extrema go
    stale; the refreshed read-out (INCLUDING min/max) must bit-equal a
    from-scratch rebuild."""
    di, co = _standing(spark, [
        (i, "en" if i % 2 else "fr", 100 + 7 * i, f"f{i}")
        for i in range(1, 30)
    ])
    state = rollup.agg_state(co, ["lang"], _SPEC)
    # delete the max and min holders of 'en' (i=29 max, i=1 min), update
    # one 'fr' row; 'de' enters fresh
    changes = [
        (29, None, None, "f29", "D"),
        (1, None, None, "f1", "D"),
        (2, "fr", 5000, "f2", "U"),
        (99, "de", 42, "f99", "U"),
    ]
    co2, state2 = _refresh(spark, di, co, state, changes)
    inc = _final_map(rollup.finalize(state2, ["lang"], _SPEC))
    ref = _final_map(rollup.finalize(
        rollup.agg_state(co2, ["lang"], _SPEC), ["lang"], _SPEC))
    assert inc == ref  # bit-identical doubles, extrema included


def test_untouched_groups_are_never_recomputed(spark):
    """Prove untouched groups stitch through from the STORED state:
    poison an untouched group's stored extremum — if refresh_extrema
    recomputed it, the poison would wash out."""
    di, co = _standing(spark, [
        (1, "en", 100, "a"), (2, "en", 200, "b"),
        (3, "fr", 300, "c"), (4, "fr", 400, "d"),
    ])
    state = rollup.agg_state(co, ["lang"], _SPEC).withColumn(
        "mx_n_chars",
        F.when(F.col("lang") == "fr", F.lit(9999.0)).otherwise(
            F.col("mx_n_chars")),
    )
    # the feed touches only 'en'
    co2, state2 = _refresh(spark, di, co, state, [(2, "en", 150, "b", "U")])
    got = {r["lang"]: r["mx_n_chars"] for r in state2.collect()}
    assert got["fr"] == 9999.0  # stored value passed through untouched
    assert got["en"] == 150.0   # touched group recomputed from corpus2


def test_fully_removed_group_has_null_extrema_and_zero_count(spark):
    di, co = _standing(spark, [
        (1, "en", 100, "a"), (2, "fr", 200, "b"),
    ])
    state = rollup.agg_state(co, ["lang"], _SPEC)
    co2, state2 = _refresh(spark, di, co, state, [(2, None, None, "b", "D")])
    fr = [r for r in state2.collect() if r["lang"] == "fr"]
    assert len(fr) == 1
    assert fr[0]["n_n_chars"] == 0
    assert fr[0]["mn_n_chars"] is None and fr[0]["mx_n_chars"] is None


def test_hll_refresh_matches_rebuild_estimate(spark):
    """distinct sketches can't retract; the touched-group rebuild must
    make the refreshed estimate equal a from-scratch sketch's (same
    sketch over the same rows — identical binary, identical estimate)."""
    di, co = _standing(spark, [
        (i, "en" if i % 2 else "fr", 100 + i, f"f{i}") for i in range(1, 40)
    ])
    state = rollup.agg_state(co, ["lang"], _SPEC, distinct_cols=["fp"])
    ch = [(i, None, None, f"f{i}", "D") for i in range(1, 10)]
    ch += [(100, "en", 777, "f100", "U")]
    co2, state2 = _refresh(spark, di, co, state, ch, distinct_cols=["fp"])
    got = {
        r["lang"]: r["nunique_fp"]
        for r in rollup.distinct_estimate(state2, "fp").collect()
    }
    want = {
        r["lang"]: r["nunique_fp"]
        for r in rollup.distinct_estimate(
            rollup.agg_state(co2, ["lang"], _SPEC, distinct_cols=["fp"]),
            "fp").collect()
    }
    assert got == want


def test_extrema_refresh_never_shuffles_the_snapshot(spark, tmp_path):
    """Production shape: corpus and state read from parquet, a delta-
    sized touched set applied — the recompute and stitch must appear
    only under broadcast joins."""
    di, co = _standing(spark, [
        (i, "en" if i % 3 else "fr", 100 + i, f"f{i}") for i in range(1, 200)
    ])
    co.write.mode("overwrite").parquet(str(tmp_path / "corpus"))
    rollup.agg_state(co, ["lang"], _SPEC).write.mode("overwrite").parquet(
        str(tmp_path / "state"))
    co_p = spark.read.parquet(str(tmp_path / "corpus"))
    st_p = spark.read.parquet(str(tmp_path / "state"))
    added = spark.createDataFrame([(300, "en", 999, "f300")], _DI_SCHEMA)
    removed = spark.createDataFrame([(3, "en", 103, "f3")], _DI_SCHEMA)
    out = incremental.refresh_extrema(
        st_p, co_p, added, removed, ["lang"], ["n_chars"])
    txt = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in txt, txt
    assert "ShuffledHashJoin" not in txt, txt
    assert "BroadcastNestedLoopJoin" not in txt, txt
    assert "BroadcastHashJoin" in txt, txt
