"""Round-11 incremental corpus maintenance (operators/incremental.py):
keeper semantics on engineered corpora, the snapshot-never-shuffled plan
fence with PERSISTED standing artifacts, exact retraction-based rollup
refresh, a hypothesis equivalence property against the from-scratch
rebuild, and the driver-style oracle replay of the battery arm."""

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


def _apply(spark, di, co, changes):
    ch = spark.createDataFrame(changes, _CH_SCHEMA)
    return incremental.refresh_corpus(di, co, ch)


def _members(df):
    return sorted((r.doc_id, r.fp, r.n_chars) for r in df.collect())


def test_refresh_covers_every_dedup_cdc_interaction(spark):
    di, co = _standing(spark, [
        (10, "en", 100, "A"),   # keeper of A
        (20, "en", 100, "A"),   # suppressed duplicate of A
        (30, "en", 200, "B"),   # keeper of B
        (40, "fr", 300, "C"),   # keeper of C
        (50, "fr", 400, "D"),   # keeper of D
    ])
    di2, co2, added, removed = _apply(spark, di, co, [
        (10, "en", 100, "A", "D"),    # delete keeper -> 20 resurrects
        (5, "en", 210, "B", "U"),     # lower-id dup -> replaces 30
        (60, "fr", 310, "C", "U"),    # higher-id dup -> suppressed by 40
        (50, "fr", 390, "D", "U"),    # value update of a keeper (same id)
        (70, "de", 500, "E", "U"),    # brand-new fingerprint
    ])
    assert _members(co2) == [
        (5, "B", 210),      # replacement keeper
        (20, "A", 100),     # resurrected duplicate
        (40, "C", 300),     # survived the higher-id dup
        (50, "D", 390),     # updated in place
        (70, "E", 500),     # insert
    ]
    # the doc index keeps the suppressed duplicates (60 stays live)
    assert _members(di2) == [
        (5, "B", 210), (20, "A", 100), (30, "B", 200), (40, "C", 300),
        (50, "D", 390), (60, "C", 310), (70, "E", 500),
    ]
    # delta is keeper-level and value-aware: the updated keeper 50
    # appears on BOTH sides (old values out, new values in)
    rm = _members(removed)
    ad = _members(added)
    assert (50, "D", 400) in rm and (50, "D", 390) in ad
    assert (10, "A", 100) in rm and (20, "A", 100) in ad
    assert (30, "B", 200) in rm and (5, "B", 210) in ad
    assert (70, "E", 500) in ad
    # C's keeper never changed -> retract+re-add at worst; 40 with SAME
    # values on both sides or absent from both is acceptable, a one-sided
    # appearance is not
    assert ((40, "C", 300) in rm) == ((40, "C", 300) in ad)


def test_retraction_state_refresh_equals_from_scratch(spark):
    di, co = _standing(spark, [
        (i, "en" if i % 2 else "fr", 100 + 7 * i, f"f{i}") for i in range(1, 30)
    ] + [
        (100 + i, "en" if i % 2 else "fr", 100 + 7 * i, f"f{i}")
        for i in range(1, 10)   # suppressed duplicates of f1..f9
    ])
    state = rollup.agg_state(co, ["lang"], _SPEC)
    changes = (
        [(i, None, None, f"f{i}", "D") for i in range(1, 6)]          # deletes
        + [(i, "en" if i % 2 else "fr", 1000 + i, f"f{i}", "U")
           for i in range(10, 14)]                                     # updates
        + [(200, "en", 555, "f200", "U")]                              # insert
    )
    di2, co2, added, removed = _apply(spark, di, co, changes)
    state2 = rollup.merge_state(
        state.unionByName(rollup.agg_state(added, ["lang"], _SPEC))
        .unionByName(rollup.negate_state(
            rollup.agg_state(removed, ["lang"], _SPEC), ["n_chars"])),
        ["lang"], ["n_chars"],
    )
    inc = rollup.finalize(state2, ["lang"], _SPEC, extrema=False)
    scratch = rollup.finalize(
        rollup.agg_state(co2, ["lang"], _SPEC), ["lang"], _SPEC,
        extrema=False,
    )
    a = {r["lang"]: tuple(r)[1:] for r in inc.collect()}
    b = {r["lang"]: tuple(r)[1:] for r in scratch.collect()}
    assert a == b  # bit-identical doubles: exact integer retraction


def test_snapshot_is_never_shuffled_from_persisted_artifacts(spark, tmp_path):
    """The production shape: standing artifacts READ FROM PARQUET, a
    feed-sized change set applied — the snapshot side must appear only
    under broadcast joins (merge_upsert decomposition + broadcast
    semi/anti fingerprint joins), never a shuffled join."""
    di, co = _standing(spark, [
        (i, "en", 100 + i, f"f{i % 40}") for i in range(200)
    ])
    di.write.mode("overwrite").parquet(str(tmp_path / "docindex"))
    co.write.mode("overwrite").parquet(str(tmp_path / "corpus"))
    rollup.agg_state(co, ["lang"], _SPEC).write.mode("overwrite").parquet(
        str(tmp_path / "state"))
    di_p = spark.read.parquet(str(tmp_path / "docindex"))
    co_p = spark.read.parquet(str(tmp_path / "corpus"))
    st_p = spark.read.parquet(str(tmp_path / "state"))
    ch = spark.createDataFrame(
        [(3, "en", 999, "f3", "U"), (7, None, None, "f7", "D"),
         (500, "en", 123, "f1", "U")], _CH_SCHEMA)
    di2, co2, added, removed = incremental.refresh_corpus(di_p, co_p, ch)
    state2 = rollup.merge_state(
        st_p.unionByName(rollup.agg_state(added, ["lang"], _SPEC))
        .unionByName(rollup.negate_state(
            rollup.agg_state(removed, ["lang"], _SPEC), ["n_chars"])),
        ["lang"], ["n_chars"],
    )
    for df in (di2, co2, state2):
        txt = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" not in txt, txt
        assert "ShuffledHashJoin" not in txt, txt
        assert "BroadcastNestedLoopJoin" not in txt, txt
    txt = co2._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in txt, txt


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_docs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=40),            # doc_id
        st.sampled_from(["en", "fr"]),                     # lang
        st.integers(min_value=50, max_value=500),          # n_chars
        st.sampled_from(["a", "b", "c", "d", "e"]),        # fp
    ),
    min_size=1, max_size=25,
).map(lambda rows: list({r[0]: r for r in rows}.values()))

_changes = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50),
        st.sampled_from(["en", "fr"]),
        st.integers(min_value=50, max_value=500),
        st.sampled_from(["a", "b", "c", "d", "e", "f"]),
        st.sampled_from(["U", "D"]),
    ),
    min_size=0, max_size=15,
).map(lambda rows: list({r[0]: r for r in rows}.values()))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_docs, _changes)
def test_incremental_equals_from_scratch_rebuild(spark, docs, changes):
    """THE theorem the arm's driver oracle checks, property-pinned on
    random corpora with heavy fingerprint collisions: refresh_corpus on
    (standing, feed) produces exactly the doc index and keeper set a
    from-scratch build on the post-change document set produces."""
    di, co = _standing(spark, docs)
    di2, co2, _, _ = _apply(spark, di, co, changes)
    # from-scratch: apply changes to the raw doc set, rebuild
    by_id = {r[0]: r for r in docs}
    for (i, lang, n, fp, op) in changes:
        if op == "D":
            by_id.pop(i, None)
        else:
            by_id[i] = (i, lang, n, fp)
    di_s, co_s = _standing(spark, list(by_id.values()) or
                           [(999, "en", 50, "zz")])
    if not by_id:
        assert di2.count() == 0 and co2.count() == 0
        return
    assert _members(di2) == _members(di_s)
    assert _members(co2) == _members(co_s)


def test_incremental_arm_matches_duckdb_oracle(spark, sf_med):
    """Driver-style replay: the incremental arm's Spark output
    value-matches the from-scratch-rebuild SQL at sf0.01."""
    import __spark_entry__ as entry
    from tests.oracle_harness import compare, duck_connection

    con = duck_connection(sf_med)
    errs = compare(
        "corpus_incremental_arm",
        entry.corpus_incremental_arm(spark, sf_med),
        con, entry._inc_oracle(),
    )
    assert not errs, errs


def test_minhash_neardup_against_standing_equals_full_rebuild(spark, sf_med):
    """Incremental near-dup screening == the full minhash pipeline over
    standing ∪ feed, restricted to pairs touching the feed — signatures
    are per-document, so incremental and from-scratch must agree on
    every (id_a, id_b, jaccard) value exactly."""
    from parallel_pandas_spark.operators import dedup
    from parallel_pandas_spark.sources import load_table

    docs = load_table(spark, sf_med, "documents").select("doc_id", "text")
    standing = docs.where(F.col("doc_id") % 4 != 0)
    feed = docs.where(F.col("doc_id") % 4 == 0)
    inc = sorted(map(tuple, dedup.minhash_neardup_against_standing(
        standing, feed, "doc_id", "text", threshold=0.4).collect()))
    full = dedup.minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.4)
    feed_ids = {r.doc_id for r in feed.select("doc_id").collect()}
    want = sorted(
        t for t in map(tuple, full.collect())
        if t[0] in feed_ids or t[1] in feed_ids
    )
    assert inc == want and len(want) > 0


def test_minhash_standing_index_is_never_shuffled(spark, sf_med, tmp_path):
    """Production shape: the standing band index and corpus read from
    parquet, a feed-sized probe broadcast against them — no shuffled
    join anywhere in the incremental screen."""
    from parallel_pandas_spark.operators import dedup
    from parallel_pandas_spark.sources import load_table

    docs = load_table(spark, sf_med, "documents").select("doc_id", "text")
    standing = docs.where(F.col("doc_id") % 4 != 0)
    idx_p = str(tmp_path / "band_index")
    st_p = str(tmp_path / "standing_docs")
    dedup.minhash_band_index(standing, "doc_id", "text").write.parquet(idx_p)
    standing.write.parquet(st_p)
    feed = docs.where(F.col("doc_id") % 4 == 0)
    out = dedup.minhash_neardup_against_standing(
        spark.read.parquet(st_p), feed, "doc_id", "text",
        standing_index=spark.read.parquet(idx_p), threshold=0.4)
    txt = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in txt, txt
    assert "ShuffledHashJoin" not in txt, txt
    assert "BroadcastHashJoin" in txt, txt
    # and the persisted index screens identically to an in-flight one
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, dedup.minhash_neardup_against_standing(
        standing, feed, "doc_id", "text", threshold=0.4).collect()))
    assert a == b


def test_corpus_delta_drives_vector_store_lifecycle(spark, sf_med, tmp_path):
    """The composed incremental loop: a corpus refresh's keeper delta
    (added/removed) is applied to the persisted vector store as
    append + tombstone — scoring from the maintained store then equals a
    store rebuilt from the refreshed corpus' embeddings. Uses vec_id ==
    doc_id (the fixtures share the id space sizes; here we join docs to
    their embeddings by position in the embeddings table)."""
    from parallel_pandas_spark.operators import vecstore
    from parallel_pandas_spark.sources import load_table

    emb = load_table(spark, sf_med, "embeddings")
    # standing corpus = embeddings with vec_id % 6 != 0 (keepers); the
    # "feed" deletes some standing keepers and inserts the rest
    standing = emb.where(F.col("vec_id") % 6 != 0)
    removed = standing.where(F.col("vec_id") % 11 == 1).select("vec_id")
    added = emb.where(F.col("vec_id") % 6 == 0)
    store = str(tmp_path / "vs")
    vecstore.write_vector_store(standing, store, "vec_id", "embedding", dim=64)
    # apply the delta exactly as refresh_corpus hands it over
    vecstore.delete_from_vector_store(spark, store, removed, "vec_id")
    vecstore.append_vector_store(added, store, "vec_id", "embedding", dim=64)
    queries = emb.where(F.col("vec_id") < 6)
    got = sorted(map(tuple, vecstore.quantized_topk_from_store(
        spark, store, queries, "vec_id", "embedding", k=5).collect()))
    corpus2 = standing.join(removed, "vec_id", "left_anti").unionByName(added)
    ref = str(tmp_path / "vs_ref")
    vecstore.write_vector_store(corpus2, ref, "vec_id", "embedding", dim=64)
    want = sorted(map(tuple, vecstore.quantized_topk_from_store(
        spark, ref, queries, "vec_id", "embedding", k=5).collect()))
    assert got == want and len(got) > 0
