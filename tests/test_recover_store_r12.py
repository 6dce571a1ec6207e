"""Crash-injection coverage for vector-store rewrite recovery (r12).

The r11 ADVICE (low) made store rewrites crash-DETECTABLE (a leftover
``.preswap`` marker refuses further rewrites); this suite pins the r12
completion — :func:`vecstore.recover_store` makes every crash point
AUTOMATICALLY recoverable, with no data loss and no undecidable state:

- a crash while the old layout moves aside (before the ``_MOVED``
  marker) rolls BACK to the byte-identical pre-rewrite store;
- a crash after it (moving staged dirs in, dropping tombstones,
  promoting the IVF quantizer, tearing the aside down) rolls FORWARD
  to a store indistinguishable from a crash-free rewrite — including
  replaying the rewrite's post-swap sidecar steps from the manifest
  (tombstone drop for compact/rebalance but NOT re-shard, quantizer
  promotion for rebalance);
- leftover staging with no swap started is discarded (store untouched).

Crashes are injected into the REAL swap protocol (counting os.rename /
shutil.rmtree calls inside ``_swap_partition_dirs`` and the callers'
post-swap steps), not into hand-built directory states, so the tests
fail if the protocol's ordering ever changes in a way that breaks
decidability.
"""

from __future__ import annotations

import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from parallel_pandas_spark.operators import vecstore  # noqa: E402


def _emb(spark, n=40, d=8):
    rows = [(i, [float((i * 7 + j) % 13) for j in range(d)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _topk(spark, store, queries, k=5):
    return sorted(
        map(
            tuple,
            vecstore.quantized_topk_from_store(
                spark, store, queries, "vec_id", "embedding", k=k
            ).collect(),
        )
    )


def _crash_swap_after_renames(monkeypatch, n):
    """Run the REAL swap protocol but raise on the (n+1)-th os.rename
    inside it — n=1 crashes mid 'move old aside', n=len(old)+1 crashes
    mid 'move staged in'."""
    real_swap = vecstore._swap_partition_dirs

    def patched(path, tmp, part="shard"):
        real_rename = os.rename
        seen = {"n": 0}

        def boom(src, dst):
            if seen["n"] >= n:
                raise RuntimeError("injected crash: rename")
            seen["n"] += 1
            return real_rename(src, dst)

        monkeypatch.setattr(os, "rename", boom)
        try:
            real_swap(path, tmp, part)
        finally:
            monkeypatch.setattr(os, "rename", real_rename)

    monkeypatch.setattr(vecstore, "_swap_partition_dirs", patched)


def _store_with_tombstones(spark, tmp_path, name="vs", shards=2):
    emb = _emb(spark, 40)
    store = str(tmp_path / name)
    vecstore.write_vector_store(
        emb, store, "vec_id", "embedding", dim=8, shards=shards
    )
    vecstore.delete_from_vector_store(spark, store, [3, 17], "vec_id")
    return store, emb


def test_recover_clean_store_is_noop(spark, tmp_path):
    store, emb = _store_with_tombstones(spark, tmp_path)
    q = emb.where(F.col("vec_id") < 3)
    before = _topk(spark, store, q)
    assert vecstore.recover_store(store) == "clean"
    assert _topk(spark, store, q) == before
    assert os.path.isdir(vecstore._tomb_path(store))  # untouched


def test_recover_discards_staged_only_rewrite(spark, tmp_path):
    store, emb = _store_with_tombstones(spark, tmp_path)
    q = emb.where(F.col("vec_id") < 3)
    before = _topk(spark, store, q)
    # a rewrite that crashed after staging, before any swap started
    os.makedirs(store + ".compact.tmp/shard=0")
    assert vecstore.recover_store(store) == "clean"
    assert not os.path.isdir(store + ".compact.tmp")
    assert _topk(spark, store, q) == before
    # afterwards the real rewrite goes through
    assert vecstore.compact_vector_store(spark, store, "vec_id") == 38


def test_recover_rolls_back_crash_while_moving_old_aside(
    spark, tmp_path, monkeypatch
):
    store, emb = _store_with_tombstones(spark, tmp_path)
    q = emb.where(F.col("vec_id") < 3)
    before = _topk(spark, store, q)
    _crash_swap_after_renames(monkeypatch, 1)  # 2 old shards: crash mid-aside
    with pytest.raises(RuntimeError, match="injected"):
        vecstore.compact_vector_store(spark, store, "vec_id")
    assert os.path.isdir(store + ".preswap")
    monkeypatch.undo()

    assert vecstore.recover_store(store) == "rolled_back"
    assert not os.path.isdir(store + ".preswap")
    assert not os.path.isdir(store + ".compact.tmp")
    # byte-identical pre-rewrite state: tombstones still standing,
    # scoring unchanged, and the retried rewrite succeeds
    assert os.path.isdir(vecstore._tomb_path(store))
    assert _topk(spark, store, q) == before
    assert vecstore.compact_vector_store(spark, store, "vec_id") == 38
    assert _topk(spark, store, q) == before


def test_recover_rolls_forward_crash_while_moving_staged_in(
    spark, tmp_path, monkeypatch
):
    store, emb = _store_with_tombstones(spark, tmp_path)
    ref, _ = _store_with_tombstones(spark, tmp_path, name="ref")
    q = emb.where(F.col("vec_id") < 3)
    # old layout (2 dirs) fully aside, crash on the 2nd staged move-in
    _crash_swap_after_renames(monkeypatch, 3)
    with pytest.raises(RuntimeError, match="injected"):
        vecstore.compact_vector_store(spark, store, "vec_id")
    assert os.path.isdir(store + ".preswap")
    monkeypatch.undo()

    assert vecstore.recover_store(store) == "rolled_forward"
    assert not os.path.isdir(store + ".preswap")
    assert not os.path.isdir(store + ".compact.tmp")
    # indistinguishable from a crash-free compact: tombstones dropped,
    # same live rows, scoring bit-equals the crash-free replica
    assert not os.path.isdir(vecstore._tomb_path(store))
    assert vecstore.compact_vector_store(spark, ref, "vec_id") == 38
    assert vecstore.load_vector_store(spark, store, "vec_id").count() == 38
    assert _topk(spark, store, q) == _topk(spark, ref, q)


def test_recover_replays_tombstone_drop_after_swap(
    spark, tmp_path, monkeypatch
):
    """Crash BETWEEN the completed swap and compact's tombstone drop:
    recovery must replay the drop — stale tombstones over a compacted
    store (seqs reset to 0) would shadow live rows."""
    store, emb = _store_with_tombstones(spark, tmp_path)
    ref, _ = _store_with_tombstones(spark, tmp_path, name="ref")
    q = emb.where(F.col("vec_id") < 3)
    real_rmtree = shutil.rmtree
    tpath = vecstore._tomb_path(store)

    def boom(path, *a, **k):
        if str(path).rstrip("/") == tpath.rstrip("/"):
            raise RuntimeError("injected crash: tombstone drop")
        return real_rmtree(path, *a, **k)

    monkeypatch.setattr(shutil, "rmtree", boom)
    with pytest.raises(RuntimeError, match="injected"):
        vecstore.compact_vector_store(spark, store, "vec_id")
    monkeypatch.undo()
    assert os.path.isdir(store + ".preswap")  # manifest survived the crash
    assert os.path.isdir(tpath)  # the dangerous stale tombstones

    assert vecstore.recover_store(store) == "rolled_forward"
    assert not os.path.isdir(tpath)
    assert not os.path.isdir(store + ".preswap")
    assert vecstore.load_vector_store(spark, store, "vec_id").count() == 38
    assert vecstore.compact_vector_store(spark, ref, "vec_id") == 38
    assert _topk(spark, store, q) == _topk(spark, ref, q)


def test_recover_finishes_interrupted_teardown(spark, tmp_path):
    """_clear_preswap crashed between removing the manifest and the
    final rmdir: only the empty aside remains — recovery just finishes
    the teardown (decidable because no staging dir exists)."""
    store, emb = _store_with_tombstones(spark, tmp_path)
    vecstore.compact_vector_store(spark, store, "vec_id")
    q = emb.where(F.col("vec_id") < 3)
    before = _topk(spark, store, q)
    os.makedirs(store + ".preswap")  # empty: manifest already deleted
    assert vecstore.recover_store(store) == "rolled_forward"
    assert not os.path.isdir(store + ".preswap")
    assert _topk(spark, store, q) == before


def test_recover_teardown_crash_with_manifest_is_roll_forward(
    spark, tmp_path
):
    """Manifest present, no _MOVED, no staging: staging is only deleted
    after _MOVED was written, so this state can only come from a crash
    inside the aside teardown — recovery must finish the teardown, NOT
    read it as a rollback (renaming the aside's old dirs onto the new
    layout would ENOTEMPTY and leave the store permanently blocked)."""
    import json

    store, emb = _store_with_tombstones(spark, tmp_path)
    q = emb.where(F.col("vec_id") < 3)
    vecstore.compact_vector_store(spark, store, "vec_id")
    after = _topk(spark, store, q)
    # fabricate the teardown-crash state: an old shard dir still aside,
    # manifest present, _MOVED already deleted, staging long gone
    aside = store + ".preswap"
    os.makedirs(aside + "/shard=0")
    with open(aside + "/_MANIFEST.json", "w") as fh:
        json.dump({"part": "shard", "tmp": os.path.basename(store) + ".compact.tmp"}, fh)

    assert vecstore.recover_store(store) == "rolled_forward"
    assert not os.path.isdir(aside)
    assert _topk(spark, store, q) == after
    # and the store accepts the next rewrite
    assert vecstore.compact_vector_store(spark, store, "vec_id") == 38


def test_recover_never_promotes_stale_staged_quantizer(
    spark, tmp_path, sf_small
):
    """A dangling .centroids.next with no aside dir is PRE-swap staging
    (every post-swap crash leaves the aside in place): promoting it
    would pair new centroids with the old cell layout and silently
    mis-probe every query — recovery must discard it."""
    from parallel_pandas_spark.sources import load_table

    emb = load_table(spark, sf_small, "embeddings")
    q = emb.where(F.col("vec_id") < 4)
    store = str(tmp_path / "ivf")
    vecstore.write_ivf_store(emb, store, "vec_id", "embedding", num_centroids=8)
    before_cents = vecstore.read_ivf_centroids(store)
    before = sorted(
        map(
            tuple,
            vecstore.ivf_topk_from_store(
                spark, store, q, "vec_id", "embedding", k=5, nprobe=8
            ).collect(),
        )
    )
    # a rebalance that crashed after staging its quantizer (and a prior
    # recovery pass that already dropped the staging tmp)
    vecstore._write_centroids(store, [(0, [0.0] * 64)], suffix=".centroids.next")
    assert vecstore.recover_store(store) == "clean"
    assert not os.path.isdir(store + ".centroids.next")
    assert vecstore.read_ivf_centroids(store) == before_cents
    after = sorted(
        map(
            tuple,
            vecstore.ivf_topk_from_store(
                spark, store, q, "vec_id", "embedding", k=5, nprobe=8
            ).collect(),
        )
    )
    assert after == before


def test_recover_reshard_preserves_tombstones(spark, tmp_path, monkeypatch):
    """Roll-forward of a RE-SHARD must keep the tombstone set — the
    rewrite carries shadowed rows as-is, so dropping tombstones (as a
    compact/rebalance recovery does) would resurrect deleted rows."""
    emb = _emb(spark, 40)
    store = str(tmp_path / "vs")
    vecstore.write_vector_store(
        emb, store, "vec_id", "embedding", dim=8, shards=2
    )
    vecstore.delete_from_vector_store(spark, store, [3, 17], "vec_id")
    feed = spark.createDataFrame(
        [(100 + i, [float(i)] * 8) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    _crash_swap_after_renames(monkeypatch, 3)  # mid move-in of 5 shards
    with pytest.raises(RuntimeError, match="injected"):
        vecstore.append_vector_store(
            feed, store, "vec_id", "embedding", dim=8, rows_per_shard=10
        )
    monkeypatch.undo()

    assert vecstore.recover_store(store) == "rolled_forward"
    assert os.path.isdir(vecstore._tomb_path(store))  # NOT dropped
    live = vecstore.load_vector_store(spark, store, "vec_id")
    assert live.count() == 43  # 40 - 2 deleted + 5 appended
    assert live.where(F.col("vec_id").isin([3, 17])).count() == 0
    assert live.where(F.col("vec_id") >= 100).count() == 5
    assert vecstore.store_shard_count(store) == 5


def test_recover_rebalance_rollback_keeps_old_quantizer(
    spark, tmp_path, monkeypatch, sf_small
):
    from parallel_pandas_spark.sources import load_table

    emb = load_table(spark, sf_small, "embeddings")
    q = emb.where(F.col("vec_id") < 4)
    store = str(tmp_path / "ivf")
    vecstore.write_ivf_store(
        emb, store, "vec_id", "embedding", num_centroids=8
    )
    before_cents = vecstore.read_ivf_centroids(store)
    before = sorted(
        map(
            tuple,
            vecstore.ivf_topk_from_store(
                spark, store, q, "vec_id", "embedding", k=5, nprobe=8
            ).collect(),
        )
    )
    _crash_swap_after_renames(monkeypatch, 1)
    with pytest.raises(RuntimeError, match="injected"):
        vecstore.rebalance_ivf_store(spark, store, "vec_id", num_centroids=8)
    monkeypatch.undo()
    assert os.path.isdir(store + ".centroids.next")  # staged quantizer

    assert vecstore.recover_store(store) == "rolled_back"
    # staged quantizer discarded, old one intact, scoring unchanged
    assert not os.path.isdir(store + ".centroids.next")
    assert vecstore.read_ivf_centroids(store) == before_cents
    after = sorted(
        map(
            tuple,
            vecstore.ivf_topk_from_store(
                spark, store, q, "vec_id", "embedding", k=5, nprobe=8
            ).collect(),
        )
    )
    assert after == before


def test_recover_rebalance_forward_promotes_quantizer(
    spark, tmp_path, monkeypatch, sf_small
):
    """Crash after the cell swap but before the quantizer promotion:
    recovery must promote ``.centroids.next`` — the new cell layout
    with the OLD centroids would mis-prune every probe."""
    from parallel_pandas_spark.sources import load_table

    emb = load_table(spark, sf_small, "embeddings")
    q = emb.where(F.col("vec_id") < 4)
    store = str(tmp_path / "ivf")
    ref = str(tmp_path / "ivf_ref")
    for p in (store, ref):
        vecstore.write_ivf_store(
            emb, p, "vec_id", "embedding", num_centroids=8
        )
    real_rmtree = shutil.rmtree
    cpath = store + ".centroids"

    def boom(path, *a, **k):
        if str(path).rstrip("/") == cpath:
            raise RuntimeError("injected crash: quantizer promotion")
        return real_rmtree(path, *a, **k)

    monkeypatch.setattr(shutil, "rmtree", boom)
    with pytest.raises(RuntimeError, match="injected"):
        vecstore.rebalance_ivf_store(spark, store, "vec_id", num_centroids=4)
    monkeypatch.undo()
    assert os.path.isdir(store + ".centroids.next")

    assert vecstore.recover_store(store) == "rolled_forward"
    assert not os.path.isdir(store + ".centroids.next")
    assert not os.path.isdir(store + ".preswap")
    # bit-equals a crash-free rebalance of an identical replica
    vecstore.rebalance_ivf_store(spark, ref, "vec_id", num_centroids=4)
    assert vecstore.read_ivf_centroids(store) == vecstore.read_ivf_centroids(
        ref
    )
    got = sorted(
        map(
            tuple,
            vecstore.ivf_topk_from_store(
                spark, store, q, "vec_id", "embedding", k=5, nprobe=2
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            vecstore.ivf_topk_from_store(
                spark, ref, q, "vec_id", "embedding", k=5, nprobe=2
            ).collect(),
        )
    )
    assert got == want
