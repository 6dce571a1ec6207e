"""Round-12: the LIVE incremental corpus loop (streaming/corpus.py) —
a file-source CDC stream drives refresh_corpus per micro-batch through
the checkpointed foreachBatch runner, is STOPPED mid-stream and resumed
from the same checkpoint, and the final (docindex, corpus, rollup
read-out) must bit-equal a from-scratch batch rebuild on the effective
document set: the streaming composition of the r11 maintenance theorem."""

from __future__ import annotations

import os
import pathlib
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from parallel_pandas_spark.operators import incremental, rollup  # noqa: E402
from parallel_pandas_spark.streaming import corpus as sc  # noqa: E402

_DI_SCHEMA = "doc_id long, lang string, n_chars long, fp string"
_SPEC = {"n_chars": (0, 0)}


def _base(spark):
    rows = [
        (i, "en" if i % 2 else "fr", 100 + 7 * i, f"f{i}") for i in range(1, 40)
    ] + [
        # suppressed duplicates of f1..f9 (keeper deletes must resurrect)
        (100 + i, "en" if i % 2 else "fr", 100 + 7 * i, f"f{i}")
        for i in range(1, 10)
    ]
    return spark.createDataFrame(rows, _DI_SCHEMA)


def _slices():
    """Four ts-ordered CDC slices covering the interaction matrix:
    deletes of keepers (resurrection), superseded ops (within-slice
    compaction), value updates, lower-id duplicate arrivals (keeper
    replacement), inserts, and a group whose max is removed."""
    return [
        # slice 1: delete keepers 1..3 (dups 101..103 resurrect);
        # a superseded insert (ts 10 loses to ts 11 within the slice)
        [(1, None, None, "f1", 10, "D"), (2, None, None, "f2", 10, "D"),
         (3, None, None, "f3", 10, "D"),
         (200, "de", 50, "f200", 10, "U"), (200, "de", 60, "f200", 11, "U")],
        # slice 2: value updates (same keeper id), remove en's max (39)
        [(5, "en", 9000, "f5", 20, "U"), (39, None, None, "f39", 20, "D"),
         (6, "fr", 12, "f6", 20, "U")],
        # slice 3: lower-id duplicates replace standing keepers
        [(0, "en", 777, "f7", 30, "U"), (-1, "fr", 778, "f8", 30, "U")],
        # slice 4: brand-new docs + delete of a slice-1 insert
        [(300, "de", 61, "f300", 40, "U"), (301, "en", 62, "f301", 40, "U"),
         (200, None, None, "f200", 41, "D")],
    ]


def _write_slices(spark, d):
    seen: set = set()
    for k, rows in enumerate(_slices(), start=1):
        spark.createDataFrame(rows, sc.DOC_CHANGES_SCHEMA).coalesce(1).write \
            .mode("append").parquet(d)
        now = set(pathlib.Path(d).glob("part-*.parquet")) - seen
        assert len(now) == 1, now
        os.utime(now.pop(), (1700000000 + k, 1700000000 + k))
        seen = set(pathlib.Path(d).glob("part-*.parquet"))


def _rebuild(spark, base_di):
    """From-scratch truth: apply ALL changes per global ts compaction,
    then keepers."""
    allch = [r for s in _slices() for r in s]
    feed = spark.createDataFrame(allch, sc.DOC_CHANGES_SCHEMA)
    from parallel_pandas_spark.operators import cdc
    comp = cdc.cdc_compact(feed, ["doc_id"], ["ts"], drop_deleted=False)
    effective = base_di.join(
        comp.select("doc_id"), "doc_id", "left_anti"
    ).unionByName(
        comp.where(~F.col("op").eqNullSafe(F.lit("D")))
        .select("doc_id", "lang", "n_chars", "fp")
    )
    return effective, incremental.keepers(effective)


def _members(df):
    return sorted((r.doc_id, r.fp, r.n_chars) for r in df.collect())


def test_live_corpus_loop_restart_bit_equals_batch_rebuild(spark, tmp_path):
    base_di = _base(spark)
    base_co = incremental.keepers(base_di)
    di_p, co_p = str(tmp_path / "base_di"), str(tmp_path / "base_co")
    base_di.write.parquet(di_p)
    base_co.write.parquet(co_p)
    base_state = rollup.agg_state(
        spark.read.parquet(co_p), ["lang"], _SPEC)
    feed_dir = str(tmp_path / "changes")
    _write_slices(spark, feed_dir)
    work = str(tmp_path / "work")
    ckpt = str(tmp_path / "ckpt")

    def make_stream():
        return sc.stream_doc_changes(spark, feed_dir, max_files=1)

    def run(stop=None):
        return sc.run_corpus_refresh_stream(
            spark, make_stream, di_p, co_p, work, ckpt, _SPEC,
            stop_after_batches=stop)

    # crash after two data batches, then resume from the checkpoint
    n1 = run(stop=2)
    assert n1 >= 2
    run()

    di, co, final = sc.corpus_stream_readout(
        spark, base_state, work, _SPEC)
    eff, keep = _rebuild(spark, base_di)
    assert _members(di) == _members(eff)
    assert _members(co) == _members(keep)
    got = {r["lang"]: tuple(r)[1:] for r in final.collect()}
    want = {
        r["lang"]: tuple(r)[1:]
        for r in rollup.finalize(
            rollup.agg_state(keep, ["lang"], _SPEC), ["lang"], _SPEC
        ).collect()
    }
    # bit-identical doubles INCLUDING min/max (refresh_extrema closes
    # the retraction gap) and var/std (exact integer merge theorem)
    assert got == want and len(got) >= 3

    # a third start with nothing new commits no batch and changes nothing
    assert run() == 0
    _, _, again = sc.corpus_stream_readout(spark, base_state, work, _SPEC)
    assert {r["lang"]: tuple(r)[1:] for r in again.collect()} == want


def _setup_loop(spark, tmp_path):
    base_di = _base(spark)
    base_co = incremental.keepers(base_di)
    di_p, co_p = str(tmp_path / "base_di"), str(tmp_path / "base_co")
    base_di.write.parquet(di_p)
    base_co.write.parquet(co_p)
    base_state = rollup.agg_state(spark.read.parquet(co_p), ["lang"], _SPEC)
    feed_dir = str(tmp_path / "changes")
    _write_slices(spark, feed_dir)
    work = str(tmp_path / "work")
    ckpt = str(tmp_path / "ckpt")

    def run(stop=None):
        return sc.run_corpus_refresh_stream(
            spark,
            lambda: sc.stream_doc_changes(spark, feed_dir, max_files=1),
            di_p, co_p, work, ckpt, _SPEC, stop_after_batches=stop)

    return base_di, base_state, work, run


def _final_map(spark, base_state, work):
    _, _, fin = sc.corpus_stream_readout(spark, base_state, work, _SPEC)
    return {r["lang"]: tuple(r)[1:] for r in fin.collect()}


def test_compaction_bounds_state_and_preserves_readout(spark, tmp_path):
    """Fold + vacuum after the loop completes: the delta set empties,
    old artifact versions go, and the read-out (now served straight
    from the snapshot) stays bit-identical — including the min/max the
    fold refreshed at compaction time."""
    import glob as g

    base_di, base_state, work, run = _setup_loop(spark, tmp_path)
    run()
    before = _final_map(spark, base_state, work)
    res = sc.compact_corpus_artifacts(spark, base_state, work, _SPEC)
    assert res["deltas_folded"] == 4 and res["folded_to"] is not None
    assert not g.glob(work + "/delta/b*")  # all folded
    for art in ("docindex", "corpus"):  # keep_last=2 newest survive
        assert len(g.glob(f"{work}/{art}/b*")) == 2
    assert _final_map(spark, base_state, work) == before
    # compaction after compaction folds nothing and changes nothing
    res2 = sc.compact_corpus_artifacts(spark, base_state, work, _SPEC)
    assert res2["deltas_folded"] == 0
    assert _final_map(spark, base_state, work) == before


def test_compaction_mid_stream_then_restart_bit_equals_rebuild(
    spark, tmp_path
):
    """Compact after two batches, resume the remaining batches from the
    checkpoint, and the final read-out (snapshot + post-compaction
    deltas) must still bit-equal the from-scratch batch rebuild — the
    maintenance theorem across a compaction point, with the replayed
    batch reading the retained predecessor version."""
    base_di, base_state, work, run = _setup_loop(spark, tmp_path)
    assert run(stop=2) >= 2
    sc.compact_corpus_artifacts(spark, base_state, work, _SPEC)
    run()  # remaining slices
    di, co, fin = sc.corpus_stream_readout(spark, base_state, work, _SPEC)
    eff, keep = _rebuild(spark, base_di)
    assert _members(di) == _members(eff)
    assert _members(co) == _members(keep)
    got = {r["lang"]: tuple(r)[1:] for r in fin.collect()}
    want = {
        r["lang"]: tuple(r)[1:]
        for r in rollup.finalize(
            rollup.agg_state(keep, ["lang"], _SPEC), ["lang"], _SPEC
        ).collect()
    }
    assert got == want and len(got) >= 3


def test_compaction_anchors_to_delta_horizon_on_midbatch_crash(
    spark, tmp_path
):
    """LEGACY (manifest-less) layout: a batch writes docindex -> corpus
    -> delta with no atomic commit, so a crash between the corpus and
    delta writes of the LAST batch leaves the corpus one version ahead.
    Compaction must fold only up to the newest DELTA (refreshing
    against the corpus at that same version), so the replayed batch's
    delta is not silently discarded as already-folded. (Under the r13
    manifest this window cannot exist — the manifest rename commits all
    three together — but pre-manifest work dirs migrate through this
    exact path.)"""
    import shutil

    base_di, base_state, work, run = _setup_loop(spark, tmp_path)
    run()
    import glob as g

    os.remove(os.path.join(work, "_MANIFEST.json"))  # pre-r13 layout
    last_delta = sorted(g.glob(work + "/delta/b*"))[-1]
    shutil.rmtree(last_delta)  # the crash window: corpus ahead of delta
    res = sc.compact_corpus_artifacts(spark, base_state, work, _SPEC)
    assert res["deltas_folded"] == 3
    # snapshot id is the delta horizon, one behind the newest corpus
    snap = sorted(g.glob(work + "/state/b*"))[-1]
    newest_co = sorted(g.glob(work + "/corpus/b*"))[-1]
    assert int(snap.rsplit("b", 1)[1]) == int(newest_co.rsplit("b", 1)[1]) - 1
    # the replay (here: the runner re-delivering nothing new — rewrite
    # the delta by hand as a replay would) is still merged by read-outs
    # simulate the replay: recompute batch 4's delta exactly as the
    # runner's write_batch does (snapshot below 4 = the retained b3)
    from parallel_pandas_spark.operators import cdc

    di3 = spark.read.parquet(sorted(g.glob(work + "/docindex/b*"))[-2])
    co3 = spark.read.parquet(sorted(g.glob(work + "/corpus/b*"))[-2])
    feed4 = spark.createDataFrame(_slices()[3], sc.DOC_CHANGES_SCHEMA)
    changes = cdc.cdc_compact(
        feed4, ["doc_id"], ["ts"], drop_deleted=False).drop("ts")
    _, _, added, removed = incremental.refresh_corpus(
        di3, co3, changes, id_col="doc_id", fp_col="fp")
    delta4 = rollup.agg_state(added, ["lang"], _SPEC).unionByName(
        rollup.negate_state(
            rollup.agg_state(removed, ["lang"], _SPEC),
            ["n_chars"], keys=["lang"]))
    delta4.write.mode("overwrite").parquet(last_delta)
    # ...and commits it, as write_batch's manifest transaction does
    # (compaction migrated the dir to a manifest)
    man = sc._init_manifest(work)
    b4 = int(os.path.basename(last_delta)[1:])
    man["deltas"] = sorted(set(man["deltas"]) | {b4})
    man["txn"] += 1
    sc._commit_manifest(work, man)

    eff, keep = _rebuild(spark, base_di)
    got = _final_map(spark, base_state, work)
    want = {
        r["lang"]: tuple(r)[1:]
        for r in rollup.finalize(
            rollup.agg_state(keep, ["lang"], _SPEC), ["lang"], _SPEC
        ).collect()
    }
    assert got == want


def test_compaction_purges_uncommitted_snapshot_and_refolds(
    spark, tmp_path
):
    """A fold killed mid-write leaves a state snapshot without Spark's
    _SUCCESS marker. Version resolution must ignore it and the next
    compaction must purge it and re-fold from the still-present deltas
    — treating the partial as committed would skip the fold AND vacuum
    the only data that could rebuild it (permanent corruption)."""
    import glob as g
    import shutil

    base_di, base_state, work, run = _setup_loop(spark, tmp_path)
    run()
    before = _final_map(spark, base_state, work)
    # a real fold, then strip its commit marker to fabricate the crash
    sc.compact_corpus_artifacts(spark, base_state, work, _SPEC)
    snap = sorted(g.glob(work + "/state/b*"))[-1]
    os.remove(os.path.join(snap, "_SUCCESS"))
    # the partial is invisible: read-outs fall back to base + deltas...
    # (deltas are gone post-compaction here, so fabricate one more loop)
    shutil.rmtree(snap)  # reset to pre-compaction for a clean refold
    # re-run the scenario from scratch with a mid-write crash simulated
    work2 = str(tmp_path / "work2")
    ckpt2 = str(tmp_path / "ckpt2")
    feed_dir = str(tmp_path / "changes")
    di_p, co_p = str(tmp_path / "base_di"), str(tmp_path / "base_co")
    sc.run_corpus_refresh_stream(
        spark,
        lambda: sc.stream_doc_changes(spark, feed_dir, max_files=1),
        di_p, co_p, work2, ckpt2, _SPEC)
    # fabricate the crashed fold: partial snapshot dir, no _SUCCESS
    horizon = sorted(g.glob(work2 + "/delta/b*"))[-1]
    partial = os.path.join(work2, "state", os.path.basename(horizon))
    os.makedirs(partial)
    with open(os.path.join(partial, "part-00000.parquet"), "wb") as fh:
        fh.write(b"\x00garbage")
    # read-out ignores the partial (falls back to base + all deltas)
    assert _final_map(spark, base_state, work2) == before
    # compaction purges it, re-folds, and the read-out still matches
    res = sc.compact_corpus_artifacts(spark, base_state, work2, _SPEC)
    assert res["deltas_folded"] == 4
    assert os.path.isfile(
        os.path.join(work2, "state", os.path.basename(horizon), "_SUCCESS"))
    assert _final_map(spark, base_state, work2) == before


def test_readout_keeps_group_whose_stats_are_all_null(spark, tmp_path):
    """A group whose live rows are all NULL in every spec column exists
    in a from-scratch rebuild (an n=0 row); membership must be decided
    against the corpus, not by count_* > 0 — while a fully-RETRACTED
    group (no live rows) must still disappear."""
    base_di, base_state, work, run = _setup_loop(spark, tmp_path)
    # one extra slice: a new lang whose docs carry NULL n_chars, and a
    # full deletion of lang "de" (docs 300 live at ts 40; 200 deleted)
    extra = [(400, "xx", None, "f400", 50, "U"),
             (401, "xx", None, "f401", 50, "U"),
             (300, None, None, "f300", 51, "D"),
             (301, None, None, "f301", 51, "D")]
    feed_dir = str(tmp_path / "changes")
    import pathlib
    spark.createDataFrame(extra, sc.DOC_CHANGES_SCHEMA).coalesce(1).write \
        .mode("append").parquet(feed_dir)
    newest = max(pathlib.Path(feed_dir).glob("part-*.parquet"),
                 key=lambda p: p.stat().st_mtime)
    os.utime(newest, (1700000010, 1700000010))
    run()
    _, co, fin = sc.corpus_stream_readout(spark, base_state, work, _SPEC)
    langs = {r["lang"]: r for r in fin.collect()}
    assert "xx" in langs and langs["xx"]["count_n_chars"] == 0
    assert co.where(F.col("lang") == "xx").count() == 2
    # "de"'s only live docs (200 deleted at ts41, 300/301 deleted here)
    # are gone -> the group must NOT appear
    assert co.where(F.col("lang") == "de").count() == 0
    assert "de" not in langs
