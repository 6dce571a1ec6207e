"""Persisted vector store: quantized embedding codes materialized ONCE to
parquet and scored from the store — the architecture where the 4×/32×
storage claims of the quantized/PQ paths are actually true (r9 VERDICT
#1: the in-flight scorers re-encode the corpus on every call, so the
quant arm could only TIE the exact arm; a store-reading scorer pays the
encode once at ingest and every query after that moves 64 packed int8
bytes per row instead of 64 floats).

Store layouts (both hive-partitioned on ``shard = pmod(xxhash64(id), n)``
via the existing partitioned sink — a reader filtering on shard prunes at
plan time, and the write demonstrates the ingest path a 100 TB corpus
would use):

- **int8 store** (:func:`write_vector_store`): one row per vector —
  ``(id, scale double, norm double, codes binary)`` where ``codes`` is
  the d int8 quantization codes packed into d bytes (vs 4d-byte float32 /
  8d-byte float64 raw), ``scale`` reconstructs values
  (``code·scale/127``) and ``norm`` is the exact integer-valued Σcode²
  the cosine denominator needs. Quantization is BIT-IDENTICAL to
  :func:`similarity.quantize_embeddings` (same numpy core as the fused
  scorer); undecodable vectors (NULL / wrong-dimension / null-element)
  store NULL codes so the scorer reproduces the fold path's NULL-tail
  semantics.
- **PQ store** (:func:`write_pq_store`): ``(id, codes binary, rn2
  double)`` with the m uint8 sub-codes packed into m bytes (8 bytes per
  vector at m=8 — 32× smaller than 64 float32s), plus the codebooks at
  ``<path>/_books`` so any session can score without refitting.

Scoring from the store (:func:`quantized_topk_from_store`,
:func:`pq_topk_from_store`) produces BIT-IDENTICAL results to the
in-flight scorers (``similarity.quantized_cosine_topk`` /
``similarity.pq_topk``): the emission half — exact int64 matmul, the
lossless map-side top-k prune, ADC lookup + top-pool, exact re-rank — is
the same shared code (similarity._pairs_frame / _pq_adc_pool_frames),
only the inputs come from codes columns instead of being re-encoded.

Reference parity note: the reference (dubovikmaster/parallel-pandas) has
no storage layer at all (SURVEY.md §1.1) — this module is extension-tier
scale infrastructure for the embedding pipeline operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parallel_pandas_spark.sources.loaders import write_partitioned
from parallel_pandas_spark.operators import similarity
from parallel_pandas_spark.operators.similarity import (
    _collect_quantized_queries,
    _np_quantize,
    _pairs_frame,
    _pq_adc_pool_frames,
    _pq_cn2,
    _pq_encode_batch,
    _pq_luts,
    dot,
    l2_norm,
)


def _int8_encode(corpus: DataFrame, id_col: str, vec_col: str, dim: int, bits: int) -> DataFrame:
    """One Arrow encode pass shared by the initial write and APPEND: per
    row quantization is independent of every other row, so codes written
    at ingest, at append, or by a full rebuild are bit-identical — the
    property the lifecycle tests pin."""
    import numpy as np
    import pandas as pd

    qmax = float((1 << (bits - 1)) - 1)
    id_t = corpus.schema[id_col].dataType.simpleString()
    # null ELEMENTS flatten to NaN on the Arrow transfer — flag JVM-side
    # (same recovery as similarity._quantized_scores_arrow)
    src = corpus.select(
        id_col,
        vec_col,
        F.exists(F.col(vec_col), lambda x: x.isNull()).alias("__hasnull"),
    )

    def gen(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            ok = pdf[vec_col].map(
                lambda v: v is not None and len(v) == dim
            ).to_numpy(dtype=bool) & ~pdf["__hasnull"].to_numpy(dtype=bool)
            scale: list = [None] * n
            norm: list = [None] * n
            codes: list = [None] * n
            if ok.any():
                mat = np.array(
                    [list(v) for v in pdf[vec_col][ok]], dtype=np.float64
                )
                s, cmat = _np_quantize(mat, qmax)
                nrm = (cmat.astype(np.int64) ** 2).sum(axis=1)
                c8 = cmat.astype(np.int8)  # codes in [-(2^(b-1)-1), +]
                for j, i in enumerate(np.nonzero(ok)[0]):
                    scale[i] = float(s[j])
                    norm[i] = float(nrm[j])
                    codes[i] = c8[j].tobytes()
            yield pd.DataFrame(
                {id_col: pdf[id_col], "scale": scale, "norm": norm,
                 "codes": codes}
            )

    return src.mapInPandas(
        gen, f"{id_col} {id_t}, scale double, norm double, codes binary"
    )


def write_vector_store(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    bits: int = 8,
    shards: int = 8,
) -> None:
    """Materialize the int8 quantized store (see module docstring).

    One Arrow pass over the corpus — quantize (bit-identical to the HOF
    expressions via the shared numpy core), pack to d-byte binary, fold
    the exact Σcode² norm — then one shuffle into ``shards`` hive
    partitions. Undecodable vectors keep their row with NULL
    codes/scale/norm: the store is a full mirror of the corpus ids, so
    store-side top-k reproduces the in-flight NULL-tail semantics
    exactly."""
    store = _with_seq(
        _int8_encode(corpus, id_col, vec_col, dim, bits), 0
    ).withColumn("shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(shards)))
    write_partitioned(store, path, "shard")


# --- lifecycle: append / delete / load ------------------------------------
# A real dedup/retrieval pipeline ingests new documents and removes old
# ones daily; a write-once store would force a full re-quantization pass
# per day. The lifecycle contract (pinned in tests): after any sequence
# of appends and deletes, scoring from the store is BIT-IDENTICAL to
# scoring from a store rebuilt from the surviving corpus — appends
# re-encode only the new rows with the shared per-row encoder, and
# deletes are id tombstones filtered out BEFORE top-k selection (so k is
# never starved by deleted neighbors).

_TOMBSTONES = ".tombstones"


def _tomb_path(path: str) -> str:
    """Tombstones live in a SIBLING directory (``<store>.tombstones``):
    Spark's file index silently ignores underscore/dot-prefixed entries
    inside a read path, and a plainly-named subdirectory would be picked
    up as store data — a sibling is the only layout that is both
    readable directly and invisible to the store scan."""
    return path.rstrip("/") + _TOMBSTONES


# --- snapshot-isolation manifest (r14, r13 verdict #4) --------------------
# ONE ``_MANIFEST.json`` inside the store, committed by atomic temp-file
# + rename, is THE commit point for every rewrite — the same protocol
# the streaming corpus loop adopted in r13 (streaming/corpus.py:120).
# It records which artifact versions are live:
#
#   {"txn": N, "data": "." | "_data-v<N>",
#    "tombs": null | ".tombstones" | "_tombs-v<N>",
#    "cents": null | ".centroids" | "_cents-v<N>"}
#
# ``"."`` / ``".tombstones"`` / ``".centroids"`` denote the LEGACY
# in-place layout (data at the store root, sidecars as siblings) — a
# fresh write produces it and needs no manifest; the first REWRITE
# (compact / re-shard / rebalance) stages a complete ``_data-v<txn+1>``
# (plus ``_cents-v`` for a rebalance) INSIDE the store — the leading
# underscore makes staged versions invisible to any legacy root scan —
# and flips the manifest in one rename. Readers resolve the live
# version from the manifest with ZERO directory listings and never see
# a torn state: a crash before the rename leaves the old snapshot
# fully live (staging is an invisible orphan), a crash after it leaves
# the new snapshot fully live (superseded dirs are invisible garbage).
# recover_store / _sweep_store classify every directory purely from
# manifest-vs-version-id arithmetic — no `.preswap` aside trees, no
# `_MOVED` marker archaeology, no multi-step teardown ordering proofs.
#
# Writer contract: ONE writer at a time (same as the corpus loop and
# every LSM store without a lock service). The contract is ENFORCED
# loudly, not assumed (r14 verdict #3): every commit re-reads the
# manifest immediately before its rename and refuses when ``txn`` moved
# since the rewrite began — a second concurrent writer gets a
# ConcurrentStoreWriteError instead of silently last-write-winning the
# rename. This is a loud-failure guard, not a lock service: the
# read-check-rename window is not atomic, so two writers racing inside
# it can still both commit — deployments with genuinely concurrent
# writers need an external lock or a CAS-capable metastore.
#
# Reader contract (r14 ADVICE, medium): snapshot isolation holds for
# RESOLUTION — a reader resolves the complete version set of exactly
# one committed transaction in a single manifest read and can never see
# a torn pair. It does NOT, by default, hold for the lifetime of a lazy
# plan: Spark lists files at read-creation but opens them at job
# execution, and the post-commit sweep rmtree's superseded versions
# immediately, so an in-flight scan resolved against the PREVIOUS
# manifest can fail with FileNotFound if a rewrite lands mid-scan. For
# single-writer batch harnesses (this repo's driver), "finish scans
# before rewriting" is the documented contract; deployments with
# long-lived concurrent readers pass ``retain_versions=N`` to the
# rewrite verbs — superseded snapshots then stay on disk (recorded in
# the manifest's ``retain`` list, exactly Delta's vacuum-window model)
# until :func:`vacuum_store` or a later rewrite ages them out.
#
# Durability scope (r14 ADVICE, low): the protocol is PROCESS-crash
# safe by construction and POWER-LOSS safe on fsync-honoring local
# filesystems: staged version directories are fsynced file-by-file
# (and their directories) before the commit rename, the manifest temp
# file is fsynced before its rename, and the store directory is fsynced
# after it. The previous committed manifest is kept at
# ``_MANIFEST.json.bak`` so recover_store can restore the last good
# snapshot if the final rename itself tears (non-atomic-rename network
# mounts).

import re as _re

_VERSIONED = _re.compile(r"^_(data|tombs|cents)-v(\d+)$")


def _store_manifest_path(path: str) -> str:
    import os

    return os.path.join(path.rstrip("/"), "_MANIFEST.json")


def _read_store_manifest(path: str) -> "dict | None":
    import json

    try:
        with open(_store_manifest_path(path)) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return None
    except (json.JSONDecodeError, ValueError) as exc:
        # store manifests have been write-then-rename from birth, so a
        # torn one can only come from a filesystem whose rename is not
        # atomic (or foreign tampering) — refuse to guess, but point at
        # the automated remedy: recover_store restores the last
        # committed snapshot from _MANIFEST.json.bak (r14 ADVICE)
        raise ValueError(
            f"unreadable store manifest {_store_manifest_path(path)!r}: "
            f"{exc} — run recover_store() to restore the last committed "
            "manifest from its .bak, or restore/remove the store manually"
        )


def _init_store_manifest(path: str) -> dict:
    """The current view as a manifest: the committed one, or the legacy
    in-place layout derived WITHOUT moving anything (migration is a
    pure bookkeeping step — the first rewrite commits it)."""
    import os

    man = _read_store_manifest(path)
    if man is not None:
        return dict(man)
    base = path.rstrip("/")
    return {
        "txn": 0,
        "data": ".",
        "tombs": ".tombstones" if os.path.isdir(_tomb_path(base)) else None,
        "cents": ".centroids" if os.path.isdir(base + ".centroids") else None,
    }


_UNREAD = object()


class ConcurrentStoreWriteError(RuntimeError):
    """A second writer committed to the store while this rewrite was
    staging: the manifest ``txn`` moved between the rewrite's snapshot
    read and its commit. The losing rewrite's staged version is left for
    the sweep; nothing was published. Single-writer fencing (r14 verdict
    #3) — a loud-failure guard, not a lock service (see module notes)."""


def _fsync_tree(root: str) -> None:
    """fsync every regular file under ``root`` (then each directory,
    deepest-first, then ``root`` itself): staged version contents written
    by Spark/pyarrow are otherwise only in the page cache when the
    manifest rename publishes them, so a power loss could leave a
    durable manifest referencing torn parquet (r14 ADVICE, low). Cost is
    one open+fsync per file — file counts per version are partition-
    sized, not row-sized. Each open+fsync is best-effort (same policy as
    :func:`_fsync_path`): on filesystems whose fds reject fsync the
    durability guarantee degrades rather than every rewrite crashing
    with OSError (r15 ADVICE, low)."""
    import os

    if not os.path.isdir(root):
        return
    dirs = []
    for d, _subdirs, files in os.walk(root):
        dirs.append(d)
        for f in files:
            _fsync_path(os.path.join(d, f))
    for d in sorted(dirs, key=len, reverse=True):
        _fsync_path(d)


def _fsync_path(p: str) -> None:
    """fsync a single file or directory path (best-effort on platforms
    whose directory fds reject fsync)."""
    import os

    try:
        fd = os.open(p, os.O_RDONLY)
    except OSError:
        return
    try:
        os.fsync(fd)
    except OSError:
        pass
    finally:
        os.close(fd)


def _commit_store_manifest(path: str, man: dict, expect_txn=_UNREAD) -> None:
    """Publish ``man`` as the store's committed snapshot: temp-file +
    fsync + atomic rename, with the store directory fsynced after the
    rename (the rename itself must be durable) and the PREVIOUS
    committed manifest preserved at ``_MANIFEST.json.bak`` first (the
    recovery source for a torn final rename — r14 ADVICE, low).

    ``expect_txn`` is the single-writer fence (r14 verdict #3): the txn
    the writer observed when it began (None = no manifest existed; the
    default sentinel skips the fence for unguarded callers). The
    manifest is re-read immediately before the rename and the commit
    refuses with :class:`ConcurrentStoreWriteError` when it moved."""
    import json
    import os

    if expect_txn is not _UNREAD:
        cur = _read_store_manifest(path)
        cur_txn = None if cur is None else int(cur["txn"])
        if cur_txn != expect_txn:
            raise ConcurrentStoreWriteError(
                f"store manifest at {path!r} advanced to txn={cur_txn} "
                f"(writer {cur.get('writer') if cur else None!r}) while "
                f"this rewrite (begun at txn={expect_txn}) was staging — "
                "single-writer contract violated; re-run the rewrite "
                "against the new snapshot"
            )
    mp = _store_manifest_path(path)
    if os.path.isfile(mp):
        bak_tmp = mp + ".bak.tmp"
        with open(mp, "rb") as src, open(bak_tmp, "wb") as dst:
            dst.write(src.read())
            dst.flush()
            os.fsync(dst.fileno())
        os.rename(bak_tmp, mp + ".bak")
    import socket

    man = dict(man)
    man["writer"] = f"{socket.gethostname()}:{os.getpid()}"
    tmp = mp + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(man, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.rename(tmp, mp)
    _fsync_path(path.rstrip("/"))


def _data_dir(path: str, man=_UNREAD) -> str:
    """The live data directory — the store root for the legacy layout,
    the manifest's versioned directory otherwise. Pass ``man`` when the
    caller already read the manifest (a reader resolving data AND
    tombstones must use ONE read, or a commit landing between two reads
    hands it a torn pair)."""
    import os

    if man is _UNREAD:
        man = _read_store_manifest(path)
    base = path.rstrip("/")
    if man is None or man["data"] == ".":
        return base
    return os.path.join(base, man["data"])


def _tombs_dir(path: str, man=_UNREAD) -> "str | None":
    """The live tombstone directory, or None when the manifest records
    no tombstones. Legacy stores (no manifest) use the sibling. See
    :func:`_data_dir` on passing ``man``."""
    import os

    if man is _UNREAD:
        man = _read_store_manifest(path)
    base = path.rstrip("/")
    if man is None:
        return _tomb_path(base)
    t = man.get("tombs")
    if t is None:
        return None
    if t == ".tombstones":
        return _tomb_path(base)
    return os.path.join(base, t)


def _retained_dirs(man: dict) -> set:
    """Versioned directory names held by the manifest's ``retain`` list
    (superseded snapshots kept for in-flight readers — r14 ADVICE): the
    sweep must not touch them."""
    out = set()
    for snap in man.get("retain") or []:
        for key in ("data", "tombs", "cents"):
            d = snap.get(key)
            if d and _VERSIONED.match(d):
                out.add(d)
    return out


def _sweep_store(path: str) -> tuple:
    """Garbage-collect everything the manifest does not reference:
    staged-but-uncommitted versions (id > txn — a rewrite crashed
    before its commit), superseded versions and legacy root data /
    sibling sidecars (a rewrite crashed after its commit, or simply
    has not been swept), and a torn ``_MANIFEST.json.tmp``. Versions in
    the manifest's ``retain`` list are NOT garbage — they are kept for
    in-flight readers until :func:`vacuum_store` or a later rewrite
    ages them out. Purely manifest-driven and idempotent. Returns
    (uncommitted_dropped, garbage_dropped) booleans. No-op on a
    manifest-less store."""
    import os
    import shutil

    man = _read_store_manifest(path)
    base = path.rstrip("/")
    uncommitted = garbage = False
    tmp_man = _store_manifest_path(base) + ".tmp"
    if os.path.isfile(tmp_man):
        os.remove(tmp_man)
        uncommitted = True
    if man is None:
        # legacy store: versioned dirs can only be pre-commit staging
        for d in list(os.listdir(base)) if os.path.isdir(base) else []:
            if _VERSIONED.match(d):
                shutil.rmtree(os.path.join(base, d))
                uncommitted = True
        return uncommitted, garbage
    keep = {man["data"], man.get("tombs"), man.get("cents")}
    keep |= _retained_dirs(man)
    for d in os.listdir(base):
        m = _VERSIONED.match(d)
        if m and d not in keep:
            shutil.rmtree(os.path.join(base, d))
            if int(m.group(2)) > int(man["txn"]):
                uncommitted = True
            else:
                garbage = True
    if man["data"] != ".":
        for d in os.listdir(base):
            if d.startswith(("shard=", "cell=")):
                shutil.rmtree(os.path.join(base, d))
                garbage = True
    if man.get("tombs") != ".tombstones" and os.path.isdir(_tomb_path(base)):
        shutil.rmtree(_tomb_path(base))
        garbage = True
    if (
        man.get("cents") is not None
        and man["cents"] != ".centroids"
        and os.path.isdir(base + ".centroids")
    ):
        shutil.rmtree(base + ".centroids")
        garbage = True
    return uncommitted, garbage


def _part_col(path: str) -> str:
    """The store's hive partition column, detected from the LIVE data
    directory's names: ``shard`` for the hash-sharded int8/PQ layouts,
    ``cell`` for the IVF layout. Lifecycle verbs that work on any store
    (delete, compact) must use this instead of assuming ``shard`` — an
    IVF store has no ``shard=*`` directories, so a shard-assuming footer
    scan would silently see an empty store (epoch 0) and record
    tombstones that never shadow appended rows (r11 ADVICE, high)."""
    import glob
    import os

    d = _data_dir(path)
    for part in ("shard", "cell"):
        if glob.glob(os.path.join(d, f"{part}=*")):
            return part
    raise ValueError(f"no shard=*/cell=* partition directories under {d!r}")


def store_shard_count(path: str) -> int:
    """Shard count of an existing store, from its live hive directory
    names (plan-time cheap: a directory listing, no data read)."""
    import glob
    import os

    dirs = glob.glob(os.path.join(_data_dir(path), "shard=*"))
    if not dirs:
        raise ValueError(f"no shard=* directories under {path!r}")
    return max(int(d.rsplit("=", 1)[1]) for d in dirs) + 1


def _store_rows(path: str, part: str = "shard") -> int:
    """Measured row count from parquet footers (no Spark job)."""
    return _dir_rows(_data_dir(path), part)


def _max_seq(path: str, part: str = "shard") -> int:
    """Largest ``seq`` in the store, read from parquet FOOTER column
    statistics (no data pages touched, no Spark job). A store written
    before the lifecycle layer has no seq column — it reads as epoch 0,
    which is exactly how :func:`load_vector_store` treats it."""
    import glob
    import os

    import pyarrow.parquet as pq

    best = 0
    for f in glob.glob(os.path.join(_data_dir(path), f"{part}=*", "*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        if "seq" not in idx:
            continue
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx["seq"]).statistics
            if st is not None and st.max is not None:
                best = max(best, int(st.max))
    return best


def _with_seq(df: DataFrame, seq: int) -> DataFrame:
    return df.withColumn("seq", F.lit(int(seq)).cast("long"))


def recover_store(path: str) -> str:
    """Recover a store whose rewrite (re-shard / compact / IVF
    rebalance) crashed at ANY point, purely from manifest state — the
    r14 protocol has exactly two crash classes and both are decided by
    version-id arithmetic against the committed ``txn``:

    - ``"rolled_back"`` — staged-but-uncommitted version directories
      (id > txn, or any versioned dir on a manifest-less legacy store,
      or a torn ``_MANIFEST.json.tmp``) were discarded: the rewrite
      never committed, the live snapshot was never touched, and the
      store is byte-identical to its pre-rewrite state. Re-run the
      rewrite to retry.
    - ``"rolled_forward"`` — the manifest committed but superseded
      directories were still present (the crash hit between the commit
      rename and the sweep): they are swept and the store equals a
      completed rewrite. Nothing is replayed — the commit ALREADY
      flipped data, tombstones, and quantizer together, which is the
      entire point of the single-manifest protocol.
    - ``"clean"`` — nothing to do (a dangling legacy
      ``.centroids.next`` from the pre-r14 protocol is discarded as
      pre-commit staging, preserving the old semantics).

    A torn FINAL ``_MANIFEST.json`` (possible only on filesystems whose
    rename is not atomic — e.g. some network mounts losing power mid-
    rename) is restored from the previous committed snapshot kept at
    ``_MANIFEST.json.bak`` (r14 ADVICE, low) and classified
    ``"rolled_back"``: the interrupted commit never happened. With no
    readable ``.bak`` the original refusal stands.

    A store interrupted under the PRE-r14 rename-swap protocol (a
    ``.preswap`` aside tree exists) is refused loudly rather than
    guessed at — that protocol's states cannot arise from this code.
    """
    import json
    import os
    import shutil

    base = path.rstrip("/")
    if os.path.isdir(base + ".preswap"):
        raise ValueError(
            f"{base + '.preswap'!r} exists: this store was interrupted "
            "under the pre-r14 rename-swap protocol, which this version "
            "no longer replays — restore it manually"
        )
    restored = False
    try:
        _read_store_manifest(base)
    except ValueError as torn:
        mp = _store_manifest_path(base)
        try:
            with open(mp + ".bak") as fh:
                bak = json.load(fh)
        except (FileNotFoundError, json.JSONDecodeError, ValueError):
            raise torn  # the original refusal: no good .bak to restore
        # restore the last committed snapshot atomically WITHOUT routing
        # through _commit_store_manifest — that would first back the torn
        # final up over the good .bak, and a crash mid-restore would then
        # have destroyed both copies
        tmp = mp + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(bak, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.rename(tmp, mp)
        _fsync_path(base)
        restored = True
    uncommitted, garbage = _sweep_store(base)
    # legacy pre-r14 staging: a quantizer staged beside a store with no
    # in-flight rewrite would pair new centroids with the old layout —
    # discard, never promote
    for sfx in (".centroids.next", ".reshard.tmp", ".compact.tmp",
                ".rebalance.tmp"):
        if os.path.isdir(base + sfx):
            shutil.rmtree(base + sfx)
    if restored or uncommitted:
        return "rolled_back"
    if garbage:
        return "rolled_forward"
    return "clean"


def _rewrite_store(path: str, stage, *, part: str, clear_tombs: bool,
                   new_cents=None,
                   retain_versions: "int | None" = None) -> None:
    """Shared commit path for every store rewrite: derive the next txn,
    let ``stage(data_dir)`` write the complete new data version (and
    write the staged quantizer when ``new_cents`` is given), fsync the
    staged contents (power-loss durability — the manifest must never be
    more durable than the version it references), then flip the manifest
    in ONE atomic FENCED rename and sweep. A crash before the rename
    leaves the old snapshot fully live; after it, fully the new one —
    there is no intermediate state for readers at any point.

    ``retain_versions``: how many superseded snapshots to keep on disk
    for in-flight readers (r14 ADVICE, medium — a lazy Spark plan
    resolved against the previous manifest opens its files at job
    execution, so the default immediate sweep requires scans to finish
    before a rewrite). With N>0 the previous snapshot's versioned dirs
    enter the manifest's ``retain`` list (oldest aged out beyond N and
    swept); legacy root-layout data cannot be retained — the first
    migrating rewrite always reclaims the root (documented one-time
    caveat). An explicit int also persists as the store's
    ``retain_policy`` in the manifest; the default ``None`` means "keep
    the current policy", so a maintenance writer that doesn't pass the
    flag cannot silently sweep snapshots a previous
    ``retain_versions=N`` writer deliberately kept (r15 ADVICE, low —
    retention is a store property, Delta's retention-setting model, not
    a per-writer flag)."""
    import os

    if os.path.isdir(path.rstrip("/") + ".preswap"):
        # a pre-r14 rename-swap crash left part of the old layout aside:
        # the root is INCOMPLETE, and committing a manifest over it would
        # make the loss permanent — same refusal as recover_store
        raise ValueError(
            f"{path.rstrip('/') + '.preswap'!r} exists: this store was "
            "interrupted under the pre-r14 rename-swap protocol; restore "
            "it manually before rewriting"
        )
    man = _init_store_manifest(path)
    expect_txn = (
        None if _read_store_manifest(path) is None else int(man["txn"])
    )
    txn = int(man["txn"]) + 1
    base = path.rstrip("/")
    data_name = f"_data-v{txn:05d}"
    stage(os.path.join(base, data_name))
    _fsync_tree(os.path.join(base, data_name))
    prev_snap = {
        "txn": int(man["txn"]),
        "data": man["data"],
        "tombs": man.get("tombs"),
        "cents": man.get("cents"),
    }
    if retain_versions is None:
        retain_versions = int(man.get("retain_policy") or 0)
    else:
        man["retain_policy"] = int(retain_versions)
    retain = list(man.get("retain") or [])
    if retain_versions > 0 and any(
        d and _VERSIONED.match(d)
        for d in (prev_snap["data"], prev_snap["tombs"], prev_snap["cents"])
    ):
        retain.insert(0, prev_snap)
    man["retain"] = retain[:retain_versions]
    man["txn"] = txn
    man["data"] = data_name
    if clear_tombs:
        man["tombs"] = None
    if new_cents is not None:
        cents_name = f"_cents-v{txn:05d}"
        _write_centroids_dir(os.path.join(base, cents_name), new_cents)
        _fsync_tree(os.path.join(base, cents_name))
        man["cents"] = cents_name
    _commit_store_manifest(base, man, expect_txn=expect_txn)
    _sweep_store(base)


def vacuum_store(path: str, retain_versions: int = 0) -> bool:
    """Age retained superseded snapshots out of the store: trim the
    manifest's ``retain`` list to ``retain_versions`` entries (0 =
    reclaim everything superseded) in one fenced commit, then sweep.
    The explicit GC verb for deployments that rewrite with
    ``retain_versions>0`` — Delta's VACUUM, without the time-based
    window (snapshots are aged by count; callers wanting wall-clock
    retention schedule the vacuum). Returns True when anything was
    reclaimed. No-op (False) on a manifest-less legacy store.

    The vacuum is itself a WRITER: it sweeps first (so a crashed
    rewrite's staged orphan keeps its txn-accurate classification,
    mirroring delete), bumps ``txn`` in its commit, and fences — so a
    rewrite racing a scheduled vacuum fails loudly at its own commit
    instead of publishing a manifest whose staged data the vacuum's
    sweep just removed (self-review r15: a txn-preserving vacuum was
    invisible to the single-writer fence)."""
    man = _read_store_manifest(path)
    if man is None:
        return False
    _sweep_store(path)
    man = _read_store_manifest(path)
    retain = list(man.get("retain") or [])
    if len(retain) > retain_versions:
        begun = int(man["txn"])
        man["retain"] = retain[:retain_versions]
        man["txn"] = begun + 1
        _commit_store_manifest(path, man, expect_txn=begun)
    _uncommitted, garbage = _sweep_store(path)
    return garbage


def append_vector_store(
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    bits: int = 8,
    rows_per_shard: int = 1_000_000,
) -> int:
    """Shard-aligned append: encode ONLY the new vectors (one Arrow pass
    over the feed, never the standing store) and land each row in its
    hashed shard directory — the same ``pmod(xxhash64(id), shards)`` the
    initial write used, so readers' shard pruning stays valid. Appended
    rows carry the next sequence EPOCH (max stored seq + 1, from parquet
    footer stats), which makes delete-then-append the store's upsert:
    the old row stays shadowed by its tombstone, the new row outlives it
    (LSM semantics — see :func:`delete_from_vector_store`).

    Re-sharding: when the MEASURED post-append rows/shard crosses
    ``rows_per_shard`` (parquet footers + a feed-sized count — the
    vecstore sizing rule), the store is rewritten from its own CODES
    (no re-quantization) at the derived shard count, staged as a new
    ``_data-v<txn>`` version and published by the manifest commit;
    seqs and tombstones survive it unchanged. Returns the store's
    shard count.

    Contract: an id must not be appended while LIVE (delete first to
    upsert); appending a live id duplicates its row.
    """
    spark = new_vectors.sparkSession
    shards = store_shard_count(path)
    n_new = new_vectors.count()
    total = _store_rows(path) + n_new
    seq = _max_seq(path) + 1
    enc = _with_seq(_int8_encode(new_vectors, id_col, vec_col, dim, bits), seq)
    if total > rows_per_shard * shards:
        new_shards = max(shards + 1, -(-total // rows_per_shard))
        # mergeSchema (r11 ADVICE, medium): a store mixing pre-lifecycle
        # (seq-less) and appended (seq-ful) files can otherwise infer a
        # seq-less schema from one footer, after which resetting every
        # row to epoch 0 would let standing tombstones (tseq >= 1)
        # permanently shadow live upserted rows through the rewrite
        base = spark.read.option("mergeSchema", "true").parquet(
            _data_dir(path)
        ).drop("shard")
        if "seq" not in base.columns:  # pre-lifecycle store: epoch 0
            base = _with_seq(base, 0)
        base = base.withColumn(
            "seq", F.coalesce(F.col("seq"), F.lit(0).cast("long"))
        )
        merged = base.unionByName(enc).withColumn(
            "shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(new_shards))
        )
        # a re-shard keeps shadowed rows as-is, so tombstones MUST
        # survive the commit (clear_tombs=False)
        _rewrite_store(
            path, lambda d: write_partitioned(merged, d, "shard"),
            part="shard", clear_tombs=False,
        )
        return new_shards
    out = enc.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(shards))
    )
    # appending to a pre-lifecycle store would mix seq-less and seq-ful
    # files; promote the schema by rewriting nothing — readers coalesce a
    # missing seq to 0 via mergeSchema at load
    out.write.mode("append").partitionBy("shard").parquet(_data_dir(path))
    return shards


def delete_from_vector_store(
    spark: SparkSession, path: str, ids, id_col: str = "vec_id"
) -> None:
    """Tombstone the given ids (list or single-column DataFrame): an
    id-sized append to ``<path>.tombstones`` — the store's data files
    are immutable. Each tombstone records the store's CURRENT max seq:
    it shadows every row of that id at or below that epoch, while a
    LATER append of the same id (higher seq) outlives it — LSM
    semantics, so no tombstone ever needs editing. Readers
    (:func:`load_vector_store`) apply tombstones with a broadcast join
    BEFORE any scoring, so deleted vectors can neither rank nor starve
    k. Physical reclamation of heavily-tombstoned shards is the same
    move as the re-shard rewrite and left to store maintenance.

    The tombstone file is written DRIVER-SIDE with pyarrow: the id set
    is driver-sized by contract (it's a delete list), and a Spark job
    for a 60-row parquet costs ~2 s of commit-protocol overhead versus
    ~10 ms here — measured in bench.py's lifecycle block.

    Works on ANY store layout: the partition column (shard vs cell) is
    detected from the directory names, so the recorded epoch is the true
    max seq — on an IVF store a shard-assuming scan would record epoch 0
    and a delete issued after an append would silently never shadow the
    appended rows (delete-after-append pinned in tests for both
    layouts)."""
    import os
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    seq = _max_seq(path, part=_part_col(path))
    if isinstance(ids, DataFrame):
        vals = [r[0] for r in ids.select(id_col).collect()]
    else:
        vals = list(ids)
    tbl = pa.table({
        id_col: pa.array(vals),
        "seq": pa.array([seq] * len(vals), type=pa.int64()),
    })
    tpath = _tombs_dir(path)
    if tpath is None:
        # manifest store whose tombstone set was cleared (compaction /
        # rebalance): open a fresh versioned set and commit it — the
        # manifest stays the single source of truth for readers. Crash
        # semantics: a crash before the commit leaves an orphan dir the
        # sweep discards (the delete simply never happened — retry);
        # there is no partial-delete state a reader can observe.
        # Sweep FIRST (r14 ADVICE, low): a _data-v{txn+1} orphan from a
        # rewrite that crashed pre-commit is discarded now, while its id
        # still reads as staged (> txn) — otherwise this commit's txn
        # bump would alias it into "superseded" and a later recover_store
        # would misreport rolled_forward for a rewrite that rolled back
        _sweep_store(path)
        man = _init_store_manifest(path)
        txn = int(man["txn"]) + 1
        name = f"_tombs-v{txn:05d}"
        tpath = os.path.join(path.rstrip("/"), name)
        # a same-named dir (a crashed earlier delete's uncommitted
        # orphan at the same derived txn) was just removed by the sweep
        # above — id > txn reads as staged — so the name is free
        os.makedirs(tpath)
        pq.write_table(
            tbl, os.path.join(tpath, f"tomb-{uuid.uuid4().hex}.parquet"))
        _fsync_tree(tpath)  # durable before the manifest references it
        man["txn"], man["tombs"] = txn, name
        _commit_store_manifest(path, man, expect_txn=int(man["txn"]) - 1)
        _sweep_store(path)  # mirror _rewrite_store's post-commit sweep
        return
    os.makedirs(tpath, exist_ok=True)
    tf = os.path.join(tpath, f"tomb-{uuid.uuid4().hex}.parquet")
    pq.write_table(tbl, tf)
    _fsync_path(tf)
    _fsync_path(tpath)


# --- IVF-partitioned store: probe-limited scanning ------------------------
# The hash-sharded stores above scan EVERY shard per query batch (the
# scorer is exhaustive). Partitioning by the IVF coarse cell instead
# makes the layout itself the index: a query reads only its nprobe
# cells' directories — at 100 TB that is the difference between a full
# corpus scan and nprobe/num_centroids of it, enforced by plan-time
# partition pruning (PartitionFilters on the literal probe-cell set,
# asserted in tests).

def write_ivf_store(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_centroids: int = 16,
) -> None:
    """Materialize the IVF-flat store: raw vectors + their exact l2 norm,
    hive-partitioned by nearest-centroid cell (the deterministic
    md5-sampled quantizer — a trained k-means slots in unchanged); the
    centroids persist driver-side at ``<path>.centroids`` so scoring
    sessions never refit. Bit-parity contract: scoring from the store
    equals ``similarity.ivf_topk`` on the same corpus (same centroids,
    same probe and cosine expressions — float64 parquet roundtrips
    exactly)."""
    from parallel_pandas_spark.operators.similarity import (
        ivf_assign, ivf_centroids,
    )

    cents = ivf_centroids(corpus, id_col, vec_col, num_centroids)
    c = _with_seq(
        corpus.select(
            id_col,
            F.col(vec_col).alias("v"),
            l2_norm(F.col(vec_col)).alias("cn"),
            ivf_assign(F.col(vec_col), cents).alias("cell"),
        ),
        0,
    )
    write_partitioned(c, path, "cell")
    _write_centroids(path, cents)


def _write_centroids_dir(cpath: str, cents: list) -> None:
    """Write the quantizer into an explicit directory — cleared first,
    because read_ivf_centroids merges every file it finds and a stale
    quantizer beside a new one would duplicate cids."""
    import os
    import shutil
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    shutil.rmtree(cpath, ignore_errors=True)
    os.makedirs(cpath)
    pq.write_table(
        pa.table({
            "cid": pa.array([cid for cid, _ in cents], type=pa.int32()),
            "centroid": pa.array([list(map(float, v)) for _, v in cents],
                                 type=pa.list_(pa.float64())),
        }),
        os.path.join(cpath, f"cents-{uuid.uuid4().hex}.parquet"),
    )


def _write_centroids(path: str, cents: list, suffix: str = ".centroids") -> None:
    """Legacy-layout quantizer sidecar at ``<path><suffix>`` — initial
    writes use it; rewrites stage a versioned ``_cents-v<txn>`` through
    :func:`_rewrite_store` instead."""
    _write_centroids_dir(path.rstrip("/") + suffix, cents)


def read_ivf_centroids(path: str) -> list:
    """The persisted coarse quantizer, as similarity.ivf_centroids
    returns it (float64 roundtrips exactly, so assignments and probe
    distances rebuilt from disk equal the fit-time ones bit-for-bit).
    Resolved through the manifest when one exists — after a rebalance
    the quantizer and the cell layout flip TOGETHER in its commit, so a
    reader can never pair new centroids with old cells."""
    import glob
    import os

    man = _read_store_manifest(path)
    base = path.rstrip("/")
    if man is None or man.get("cents") in (None, ".centroids"):
        cdir = base + ".centroids"
    else:
        cdir = os.path.join(base, man["cents"])

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(cdir, "*.parquet")))
    rows = []
    for f in files:
        t = pq.read_table(f)
        rows.extend(zip(t.column("cid").to_pylist(),
                        t.column("centroid").to_pylist()))
    return [(int(cid), [float(x) for x in v]) for cid, v in sorted(rows)]


def ivf_cell_rows(path: str) -> dict:
    """Measured per-cell row counts from parquet footers (directory
    listing + footer metadata — no Spark job): the store's own drift
    gauge. Deliberately PHYSICAL rows, not live rows: tombstoned and
    superseded rows are still scanned (then filtered) by every probe,
    so footer counts are exactly the per-probe scan cost the rebalance
    bound protects — and the rebalance itself resolves shadowing, so
    firing on dead-row bloat reclaims that cost too."""
    import glob
    import os

    import pyarrow.parquet as pq

    out: dict = {}
    for d in glob.glob(os.path.join(_data_dir(path), "cell=*")):
        cid = int(d.rsplit("=", 1)[1])
        out[cid] = sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in glob.glob(os.path.join(d, "*.parquet"))
        )
    return out


def ivf_skew_ratio(cells: dict) -> float:
    """max/median over the non-empty cells — the imbalance measure the
    rebalance trigger compares against its bound. 1.0 = perfectly even;
    a whale cell drives it up and degrades probe pruning from
    nprobe/num_centroids toward scanning everything."""
    import statistics

    sizes = sorted(v for v in cells.values() if v > 0)
    if not sizes:
        return 1.0
    return max(sizes) / statistics.median(sizes)


def append_ivf_store(
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rebalance_ratio: "float | None" = None,
) -> bool:
    """Cell-aligned append with the PERSISTED quantizer at the next seq
    epoch — delete-then-append upserts exactly as in the hash-sharded
    stores.

    Drift guard (r11 VERDICT #5): the quantizer is fixed at fit time, so
    a long run of appends from a shifted distribution piles rows into a
    few cells and probe pruning degrades toward a full scan. With
    ``rebalance_ratio`` set, the MEASURED post-append cell imbalance
    (parquet footers, :func:`ivf_skew_ratio`) triggers
    :func:`rebalance_ivf_store` when max/median crosses the bound —
    mirroring the hash store's measured re-shard. Returns True when a
    rebalance ran (callers holding a cached file index must re-read)."""
    from parallel_pandas_spark.operators.similarity import ivf_assign

    cents = read_ivf_centroids(path)
    seq = _max_seq(path, part="cell") + 1
    enc = _with_seq(
        new_vectors.select(
            id_col,
            F.col(vec_col).alias("v"),
            l2_norm(F.col(vec_col)).alias("cn"),
            ivf_assign(F.col(vec_col), cents).alias("cell"),
        ),
        seq,
    )
    enc.write.mode("append").partitionBy("cell").parquet(_data_dir(path))
    if rebalance_ratio is not None:
        if ivf_skew_ratio(ivf_cell_rows(path)) > rebalance_ratio:
            rebalance_ivf_store(new_vectors.sparkSession, path, id_col)
            return True
    return False


def rebalance_ivf_store(
    spark: SparkSession,
    path: str,
    id_col: str = "vec_id",
    num_centroids: "int | None" = None,
    retain_versions: "int | None" = None,
) -> float:
    """Re-train the coarse quantizer on the store's LIVE vectors and
    re-partition the store by the new cells — the repair for append
    drift (frozen centroids never re-learn; the md5 sample here re-draws
    from the CURRENT id population, so drifted regions get their share
    of centroids; a trained k-means slots in unchanged, exactly as at
    fit time). Semantics mirror compaction: live rows only (tombstone
    shadowing resolved once — deletes stay deleted), seqs reset to epoch
    0, tombstones dropped, and the new data version AND the new
    quantizer flip together in the ONE manifest commit (r14) — the
    torn-pair window (new cells with old centroids or vice versa)
    cannot exist for any reader at any crash point. Scoring afterwards
    bit-equals a store REBUILT from the surviving corpus at the same
    ``num_centroids`` (pinned in tests), because fit, assignment, and
    scoring all reuse the write-path expressions. Returns the
    post-rebalance skew ratio."""
    from parallel_pandas_spark.operators.similarity import (
        ivf_assign, ivf_centroids,
    )

    if num_centroids is None:
        num_centroids = len(read_ivf_centroids(path))
    live = load_vector_store(spark, path, id_col)
    corpus = live.select(id_col, F.col("v").alias("__v"), "cn")
    cents = ivf_centroids(corpus, id_col, "__v", num_centroids)
    merged = _with_seq(
        corpus.select(
            id_col,
            F.col("__v").alias("v"),
            "cn",
            ivf_assign(F.col("__v"), cents).alias("cell"),
        ),
        0,
    )
    _rewrite_store(
        path, lambda d: write_partitioned(merged, d, "cell"),
        part="cell", clear_tombs=True, new_cents=cents,
        retain_versions=retain_versions,
    )
    return ivf_skew_ratio(ivf_cell_rows(path))


def ivf_topk_from_store(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 4,
    round_to: int = 6,
) -> DataFrame:
    """IVF top-k scored FROM the cell-partitioned store: each query's
    ``nprobe`` nearest cells are computed from the persisted centroids,
    the DISTINCT probe set becomes a LITERAL partition predicate (static
    PartitionFilters — non-probed cell directories are never listed,
    plan-asserted in tests), tombstones are shadowed, and the exact
    cosine re-rank uses the same expressions as ``similarity.ivf_topk``
    — output bit-identical to the in-flight scorer with the same
    centroids (pinned in tests)."""
    from parallel_pandas_spark.operators.similarity import _cent_dist

    cents = read_ivf_centroids(path)
    probe_structs = F.array(
        *[
            F.struct(
                _cent_dist(F.col(vec_col), cvec).alias("d"),
                F.lit(cid).alias("cid"),
            )
            for cid, cvec in cents
        ]
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        l2_norm(F.col(vec_col)).alias("qn"),
        F.explode(F.slice(F.array_sort(probe_structs), 1, nprobe)).alias("p"),
    ).select("query_id", "qv", "qn", F.col("p.cid").alias("cell"))
    # queries are small by the ANN contract (they broadcast below); the
    # distinct probe set is at most num_centroids ids — collect it into
    # a LITERAL IN filter so the pruning is static, not just dynamic
    probes = sorted({r["cell"] for r in q.select("cell").distinct().collect()})
    store = load_vector_store(spark, path, id_col).where(
        F.col("cell").isin(probes)
    )
    c = store.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("v").alias("cv"),
        "cn",
        "cell",
    )
    joined = c.join(F.broadcast(q), "cell").where(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = joined.select(
        "query_id",
        "neighbor_id",
        F.round(
            dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")),
            round_to,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def compact_vector_store(
    spark: SparkSession, path: str, id_col: str = "vec_id",
    retain_versions: "int | None" = None,
) -> int:
    """Physical reclamation for ANY store layout: rewrite the store
    keeping only LIVE rows (tombstone shadowing resolved once, seqs
    reset to epoch 0) and drop the tombstone set — the LSM compaction
    that bounds read-side tombstone work. The rewrite stages a complete
    ``_data-v<txn>`` version and publishes it (tombstones cleared) in
    the ONE manifest commit (r14). Partition assignment is preserved,
    so reader pruning is unaffected: hash-sharded layouts (int8/PQ
    codes) re-derive each row's ``shard`` from the same id hash at the
    same shard count; cell-partitioned layouts (IVF, and the IVF-PQ
    store's ``<path>/codes``) keep each row's stored ``cell`` —
    centroids are NOT retrained (that is :func:`rebalance_ivf_store`'s
    job), so the quantizer sidecars stay valid as-is. Returns the live
    row count. Scoring before vs after is identical by construction
    (pinned in tests): compaction changes bytes on disk, not the live
    row multiset."""
    part = _part_col(path)
    live = _with_seq(load_vector_store(spark, path, id_col), 0)
    if live.limit(1).count() == 0:
        raise ValueError(
            f"compact_vector_store: no live rows under {path!r} — a "
            "fully-tombstoned store has no partition layout to preserve; "
            "delete the store directory instead"
        )
    if part == "shard":
        merged = live.withColumn(
            "shard",
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(store_shard_count(path))),
        )
    else:
        merged = live  # rows keep their stored cell assignment
    staged_rows = {}

    def _stage(d):
        write_partitioned(merged, d, part)
        staged_rows["n"] = _dir_rows(d, part)

    _rewrite_store(path, _stage, part=part, clear_tombs=True,
                   retain_versions=retain_versions)
    return staged_rows["n"]


def _dir_rows(data_dir: str, part: str) -> int:
    """Row count of an explicit data directory from parquet footers."""
    import glob
    import os

    import pyarrow.parquet as pq

    return sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(os.path.join(data_dir, f"{part}=*", "*.parquet"))
    )


def load_vector_store(
    spark: SparkSession, path: str, id_col: str = "vec_id"
) -> DataFrame:
    """The store's LIVE rows: the hive-partitioned codes minus rows
    shadowed by a tombstone of equal-or-higher epoch (broadcast join —
    the tombstone side is id-sized). This is what the scorers should
    read after any lifecycle operation; :func:`quantized_topk_from_store`
    calls it automatically when given a path. The ``seq`` bookkeeping
    column is dropped from the result. Data and tombstone locations
    resolve through the snapshot manifest when one exists (r14): a
    reader can never observe a half-published rewrite — it sees the
    version set of exactly one committed transaction."""
    import os

    man = _read_store_manifest(path)  # ONE read: data+tombs of one txn
    tpath = _tombs_dir(path, man)
    has_tombs = tpath is not None and os.path.isdir(tpath)
    # mergeSchema: an appended store can mix pre-lifecycle (seq-less)
    # and current files; missing seq reads as NULL -> epoch 0
    base = spark.read.option("mergeSchema", "true").parquet(
        _data_dir(path, man))
    if "seq" not in base.columns:
        base = _with_seq(base, 0)
    base = base.withColumn("seq", F.coalesce(F.col("seq"), F.lit(0).cast("long")))
    if has_tombs:
        tombs = spark.read.parquet(tpath).groupBy(id_col).agg(
            F.max("seq").alias("__tseq")
        )
        base = (
            base.join(F.broadcast(tombs), on=id_col, how="left")
            .where(F.col("__tseq").isNull() | (F.col("seq") > F.col("__tseq")))
            .drop("__tseq")
        )
    return base.drop("seq")


def quantized_topk_from_store(
    spark: SparkSession,
    store_path,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    bits: int = 8,
    round_to: int = 6,
) -> DataFrame:
    """int8 top-k scored FROM the persisted store: the corpus-side scan
    moves d code bytes + two doubles per row and does NO re-quantization
    — the whole point of materializing the store. Output is
    bit-identical to ``similarity.quantized_cosine_topk`` on the same
    corpus/queries (pinned in tests): queries are collected + quantized
    with the same shared core, the int64 matmul / lossless map-side
    prune / NULL-tail emission is the same shared ``_pairs_frame``, and
    the divide/sqrt/round stay in identical Spark expressions.

    ``store_path`` may be a path string OR an already-loaded store
    DataFrame: a resident session (or a catalog table) holds the file
    index once instead of re-listing the partition directories on every
    query — at a 2k-row fixture the re-listing costs more than the whole
    scoring job. A path string loads via :func:`load_vector_store`, so
    tombstoned ids are excluded BEFORE the top-k (k never starved); a
    DataFrame is the caller's responsibility (pass
    ``load_vector_store(...)`` after lifecycle operations)."""
    import numpy as np

    qmax = float((1 << (bits - 1)) - 1)
    qids, qmat, qns, qok, d = _collect_quantized_queries(
        queries, id_col, vec_col, qmax
    )
    base = (
        store_path
        if isinstance(store_path, DataFrame)
        else load_vector_store(spark, store_path, id_col)
    )
    store = base.select(id_col, "norm", "codes")
    id_t = store.schema[id_col].dataType.simpleString()
    band = 10.0 ** (-round_to) + 1e-12

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0 or len(qids) == 0:
                continue
            n = len(pdf)
            nids = pdf[id_col].to_numpy()
            # a stored NULL code row is an undecodable vector; a code row
            # of the wrong width is a different-dimension vector — both
            # are "dirty" relative to these queries, exactly like the
            # in-flight scorer's cok predicate
            cok = pdf["codes"].map(
                lambda b: b is not None and len(b) == d
            ).to_numpy(dtype=bool)
            cn = np.full(n, np.nan)
            if cok.any() and qok.any():
                cmat64 = (
                    np.frombuffer(b"".join(pdf["codes"][cok]), dtype=np.int8)
                    .reshape(-1, d)
                    .astype(np.int64)
                )
                # the stored norm IS Σcode² (exact integer-valued double,
                # written once at ingest) — no re-fold
                cn[cok] = pdf["norm"].to_numpy(dtype=np.float64)[cok]
                good = cmat64 @ qmat.T  # exact int64
            else:
                good = np.empty((int(cok.sum()), int(qok.sum())), dtype=np.int64)
            frame = _pairs_frame(nids, cn, cok, good, qids, qns, qok, k, band)
            if frame is not None:
                yield frame

    pairs = store.mapInPandas(
        gen,
        f"neighbor_id {id_t}, cn double, query_id {id_t}, qn double, idot long",
    ).where(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(
            F.col("idot").cast("double")
            / (F.sqrt(F.col("qn")) * F.sqrt(F.col("cn"))),
            round_to,
        ).alias("qcosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qcosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "qcosine", "rank")
    )


def _pq_encode_df(
    corpus: DataFrame, books: list, id_col: str, vec_col: str, dim: int,
    cents: "list | None" = None,
) -> DataFrame:
    """One Arrow PQ-encode pass with FIXED codebooks — shared by the
    initial store write and :func:`append_pq_store`, so appended codes
    are bit-identical to what a rebuild with the same books would write.
    Undecodable vectors are DROPPED (the fused scorer's documented ANN
    store policy). With ``cents``, each row also carries its IVF coarse
    cell (``ivf_assign`` — a JVM expression computed BEFORE the Arrow
    pass and threaded through), the IVF-PQ layout's partition column."""
    import numpy as np
    import pandas as pd

    books_np = [np.asarray(b, dtype=np.float64) for b in books]
    cn2v = _pq_cn2(books)
    id_t = corpus.schema[id_col].dataType.simpleString()
    sel = [
        F.col(id_col),
        F.col(vec_col),
        F.exists(F.col(vec_col), lambda x: x.isNull()).alias("__hasnull"),
    ]
    if cents is not None:
        from parallel_pandas_spark.operators.similarity import ivf_assign

        sel.append(ivf_assign(F.col(vec_col), cents).alias("cell"))
    src = corpus.select(*sel)
    out_schema = f"{id_col} {id_t}, codes binary, rn2 double"
    if cents is not None:
        out_schema += ", cell int"

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ok = pdf[vec_col].map(
                lambda v: v is not None and len(v) == dim
            ).to_numpy(dtype=bool) & ~pdf["__hasnull"].to_numpy(dtype=bool)
            if not ok.any():
                continue
            sub = pdf[ok]
            mat = np.array([list(v) for v in sub[vec_col]], dtype=np.float64)
            codes_list, rn2 = _pq_encode_batch(mat, books_np, cn2v)
            packed = np.stack(codes_list, axis=1).astype(np.uint8)  # n×m
            out = {
                id_col: sub[id_col],
                "codes": [row.tobytes() for row in packed],
                "rn2": rn2,
            }
            if cents is not None:
                out["cell"] = sub["cell"]
            yield pd.DataFrame(out)

    return src.mapInPandas(gen, out_schema)


def write_pq_store(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ks: int = 16,
    dim: int = 64,
    iters: int = 0,
    shards: int = 8,
) -> None:
    """Materialize the PQ code store: fit codebooks once
    (``similarity.pq_codebooks`` — deterministic md5 sample, optional
    Lloyd refinement), encode the corpus in one Arrow pass with the
    shared batch encoder (bit-parity with the fused scorer), pack the m
    sub-codes into m uint8 bytes, and persist the codebooks beside the
    codes at ``<path>/_books`` so scoring sessions never refit.
    Undecodable vectors are DROPPED (the fused scorer's documented ANN
    store policy)."""
    import numpy as np
    import pandas as pd

    if ks > 256:
        # check the cheap argument bound BEFORE the codebook fit — the
        # fit runs a corpus sample collect plus optional Lloyd passes
        raise ValueError(f"ks={ks}: uint8-packed codes need ks <= 256")
    books = similarity.pq_codebooks(
        corpus, id_col, vec_col, m=m, ks=ks, dim=dim, iters=iters
    )
    store = _with_seq(
        _pq_encode_df(corpus, books, id_col, vec_col, dim), 0
    ).withColumn("shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(shards)))
    write_partitioned(store, f"{path}/codes", "shard")
    _write_books(corpus.sparkSession, path, books)


def _write_books(spark: SparkSession, path: str, books: list) -> None:
    """Codebook sidecar: m·ks tiny rows — one flat parquet beside the
    codes, shared by the PQ and IVF-PQ store writers."""
    brows = [
        (s, cid, [float(x) for x in books[s][cid]])
        for s in range(len(books))
        for cid in range(len(books[s]))
    ]
    spark.createDataFrame(
        brows, "s int, cid int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/_books")


def append_pq_store(
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Shard-aligned PQ append: encode ONLY the new vectors with the
    PERSISTED codebooks (standard IVF/PQ practice — the quantizer is
    fixed at fit time; refit = rebuild) and land them in their hashed
    shards at the next epoch, so delete-then-append upserts work exactly
    as in the int8 store. The standing codes are never read or
    shuffled."""
    spark = new_vectors.sparkSession
    books = read_pq_books(spark, path)
    dim = len(books) * books[0].shape[1]
    codes = f"{path}/codes"
    shards = store_shard_count(codes)
    seq = _max_seq(codes) + 1
    enc = _with_seq(
        _pq_encode_df(new_vectors, books, id_col, vec_col, dim), seq
    ).withColumn("shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(shards)))
    enc.write.mode("append").partitionBy("shard").parquet(_data_dir(codes))


def read_pq_books(spark: SparkSession, path: str) -> list:
    """Reconstruct the codebooks list from ``<path>/_books`` (float64
    parquet doubles roundtrip exactly, so cn2/LUTs rebuilt from the
    stored books equal the fit-time ones bit-for-bit). Read driver-side
    with pyarrow (r16): the sidecar is m·ks tiny rows, and the
    spark.read job this used to launch was ~0.15 s of fixed overhead on
    every scoring call; the parquet bytes decode to the same doubles
    either way."""
    import glob as _glob
    import os

    import numpy as np
    import pyarrow.parquet as _pq

    files = sorted(_glob.glob(os.path.join(path, "_books", "*.parquet")))
    rows: list = []
    for f in files:
        t = _pq.read_table(f, columns=["s", "cid", "centroid"]).to_pydict()
        rows.extend(zip(t["s"], t["cid"], t["centroid"]))
    m = max(r[0] for r in rows) + 1
    books = []
    for s in range(m):
        sub = sorted((r for r in rows if r[0] == s), key=lambda r: r[1])
        books.append(np.array([[float(x) for x in r[2]] for r in sub]))
    return books


def pq_topk_from_store(
    spark: SparkSession,
    store_path: str,
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    pool: int = 50,
    round_to: int = 6,
) -> DataFrame:
    """PQ/ADC top-k scored FROM the persisted code store: the ADC scan
    moves m packed bytes + one double per row (vs re-encoding 64 floats
    per call), then the pool is exact-re-ranked against the raw corpus —
    the same broadcast-hinted joins and expressions as
    ``similarity.pq_topk``, so output is bit-identical to the in-flight
    scorer fitted with the same parameters (pinned in tests)."""
    import numpy as np

    books = read_pq_books(spark, store_path)
    m = len(books)
    dsub = books[0].shape[1]
    dim = m * dsub
    qids, luts = _pq_luts(queries, books, id_col, vec_col, dim)
    store = load_vector_store(spark, f"{store_path}/codes", id_col).select(
        id_col, "codes", "rn2"
    )
    id_t = store.schema[id_col].dataType.simpleString()

    def adc_gen(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0 or not qids:
                continue
            packed = np.frombuffer(
                b"".join(pdf["codes"]), dtype=np.uint8
            ).reshape(n, m)
            codes_list = [packed[:, s].astype(np.int64) for s in range(m)]
            rn2 = pdf["rn2"].to_numpy(dtype=np.float64)
            nid_arr = pdf[id_col].to_numpy()
            for frame in _pq_adc_pool_frames(
                nid_arr, codes_list, rn2, qids, luts, m, pool
            ):
                yield frame

    pairs = store.mapInPandas(
        adc_gen,
        f"neighbor_id {id_t}, query_id {id_t}, adc double, rn2 double",
    ).where(F.col("query_id") != F.col("neighbor_id"))
    wp = Window.partitionBy("query_id").orderBy(
        (F.col("adc") / F.sqrt(F.col("rn2"))).desc(), F.col("neighbor_id").asc()
    )
    cand = (
        pairs.withColumn("prank", F.row_number().over(wp))
        .where(F.col("prank") <= pool)
        .select("query_id", "neighbor_id")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        l2_norm(F.col(vec_col)).alias("cn"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        l2_norm(F.col(vec_col)).alias("qn"),
    )
    scored = (
        F.broadcast(cand).join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")),
                round_to,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# --- IVF-PQ: probe-limited scanning of 32x-smaller codes -------------------
# The standard billion-vector layout (Jégou et al., "Product Quantization
# for Nearest Neighbor Search", IEEE TPAMI 2011 — IVFADC): PQ gives the
# compact codes (m bytes per vector), IVF gives the probe-limited scan.
# Composed here as PQ codes hive-partitioned by IVF cell with both
# quantizers as sidecars: a query reads nprobe cells' directories of
# 8-byte codes — partition pruning AND 32x byte reduction multiply.

def _write_rotation(path: str, R) -> None:
    """Persist the OPQ rotation sidecar at ``<path>.rotation`` (one row
    per output component: its literal column of R). Static once
    written: compaction/rebalance rewrite data files, never the
    rotation — codes stay valid because they encode ROTATED vectors."""
    import os
    import shutil
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    rpath = path.rstrip("/") + ".rotation"
    shutil.rmtree(rpath, ignore_errors=True)
    os.makedirs(rpath)
    cols = [[float(R[i][j]) for i in range(len(R))] for j in range(len(R))]
    pq.write_table(
        pa.table({
            "j": pa.array(range(len(cols)), type=pa.int32()),
            "col": pa.array(cols, type=pa.list_(pa.float64())),
        }),
        os.path.join(rpath, f"rot-{uuid.uuid4().hex}.parquet"),
    )


def read_rotation(path: str):
    """The persisted OPQ rotation as a column-major list of lists
    (``R[i][j]`` = weight of input i in output j), or None."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path.rstrip("/") + ".rotation",
                                          "*.parquet")))
    if not files:
        return None
    cols: dict = {}
    for f in files:
        t = pq.read_table(f)
        cols.update(zip(t.column("j").to_pylist(), t.column("col").to_pylist()))
    d = len(cols)
    return [[float(cols[j][i]) for j in range(d)] for i in range(d)]


def _rotated(df: DataFrame, id_col: str, vec_col: str, R) -> DataFrame:
    from parallel_pandas_spark.operators.similarity import rotate_vectors

    return df.select(
        id_col, rotate_vectors(F.col(vec_col), R).alias(vec_col)
    )


def write_ivfpq_store(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ks: int = 16,
    dim: int = 64,
    iters: int = 0,
    num_centroids: int = 16,
    rotation=None,
) -> None:
    """Materialize the IVF-PQ store: fit the coarse quantizer
    (``similarity.ivf_centroids``) and the PQ codebooks
    (``similarity.pq_codebooks``) on the corpus, encode in ONE Arrow
    pass carrying each row's cell, and hive-partition the m-byte codes
    by cell; books persist at ``<path>/_books`` and the coarse quantizer
    at ``<path>.centroids``. Bit-parity contract (pinned in tests):
    scoring from the store equals ``similarity.pq_topk`` with the SAME
    books restricted to each query's probed cells.

    ``rotation`` (r13, OPQ — Ge et al. CVPR 2013 via
    ``similarity.opq_train`` or a seeded orthogonal stand-in): the
    corpus is rotated BEFORE fitting/encoding with the bit-replayable
    JVM fold (``similarity.rotate_vectors``) and the matrix persists at
    ``<path>.rotation`` so scoring sessions rotate queries identically
    — rotation is a pure pre-transform, every downstream stage is
    unchanged."""
    from parallel_pandas_spark.operators.similarity import ivf_centroids

    if ks > 256:
        raise ValueError(f"ks={ks}: uint8-packed codes need ks <= 256")
    if rotation is not None:
        corpus = _rotated(corpus, id_col, vec_col, rotation)
        _write_rotation(path, rotation)
    else:
        # an unrotated rebuild over a previously OPQ-rotated path must
        # drop the stale sidecar — readers apply it unconditionally, so
        # leaving it would rotate queries against unrotated codes
        import shutil

        shutil.rmtree(path.rstrip("/") + ".rotation", ignore_errors=True)
    cents = ivf_centroids(corpus, id_col, vec_col, num_centroids)
    books = similarity.pq_codebooks(
        corpus, id_col, vec_col, m=m, ks=ks, dim=dim, iters=iters
    )
    store = _with_seq(
        _pq_encode_df(corpus, books, id_col, vec_col, dim, cents=cents), 0
    )
    write_partitioned(store, f"{path}/codes", "cell")
    _write_books(corpus.sparkSession, path, books)
    _write_centroids(path, cents)


def append_ivfpq_store(
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Cell-aligned PQ append with BOTH persisted quantizers at the next
    seq epoch — delete-then-append upserts exactly as in the other
    stores (tombstones live at ``<path>/codes.tombstones`` and
    delete_from_vector_store detects the cell partition layout)."""
    spark = new_vectors.sparkSession
    R = read_rotation(path)
    if R is not None:
        new_vectors = _rotated(new_vectors, id_col, vec_col, R)
    books = read_pq_books(spark, path)
    cents = read_ivf_centroids(path)
    dim = len(books) * books[0].shape[1]
    codes = f"{path}/codes"
    seq = _max_seq(codes, part="cell") + 1
    enc = _with_seq(
        _pq_encode_df(new_vectors, books, id_col, vec_col, dim, cents=cents),
        seq,
    )
    enc.write.mode("append").partitionBy("cell").parquet(_data_dir(codes))


def ivfpq_topk_from_store(
    spark: SparkSession,
    store_path: str,
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    pool: int = 50,
    nprobe: int = 4,
    round_to: int = 6,
    keep_pool_rank: bool = False,
    store_df: "DataFrame | None" = None,
) -> DataFrame:
    """IVF-PQ top-k: each query's ``nprobe`` nearest cells come from the
    persisted coarse quantizer; the DISTINCT probe set becomes a LITERAL
    partition predicate (static PartitionFilters — non-probed cell
    directories never listed, plan-fenced in tests); the ADC scan over
    the probed cells applies each query's OWN probe mask inside the
    Arrow kernel BEFORE pooling (an out-of-cell row can never displace
    an in-cell candidate); the pool is exact-re-ranked against the raw
    corpus with the same expressions as ``similarity.pq_topk``. Output
    bit-matches ``pq_topk(books=<stored books>)`` on each query's probed
    sub-corpus (pinned in tests)."""
    import numpy as np

    books = read_pq_books(spark, store_path)
    cents = read_ivf_centroids(store_path)
    # OPQ sidecar: queries and the re-rank vectors enter the SAME
    # rotated space the codes were fit in (rotation preserves cosine;
    # the re-rank uses rotated values so the SQL replay stays
    # bit-twinned). The CORPUS side rotates AFTER the candidate join
    # below — the JVM fold is an interpreted higher-order expression,
    # and rotating the full corpus instead of the ~queries×pool
    # candidate set measured 10.1 s vs ~2 s for the whole arm at sf0.1.
    #
    # The QUERY side is collected ONCE (query-sized by the ANN
    # contract) and rotation, probe assignment and the ADC LUTs are all
    # derived driver-side from that one collect (r16): the previous
    # shape — rotation localCheckpoint job + probe-assign collect job +
    # LUT collect job — was three Spark jobs of pure fixed overhead per
    # call. Every double is reproduced bit-exactly: the rotation fold,
    # the −2·q·c+‖c‖² probe distance and the (d, cid) tiebreak below
    # accumulate strictly left-to-right exactly like the JVM
    # expressions they replace (rotate_vectors / _cent_dist /
    # array_sort on (d, cid) structs), so probe sets, LUTs and the
    # re-rank inputs are unchanged.
    R = read_rotation(store_path)
    m = len(books)
    dim = m * books[0].shape[1]
    qraw = [
        (r[id_col], r[vec_col])
        for r in queries.select(id_col, vec_col).collect()
    ]

    def _ok(v) -> bool:
        return (
            v is not None and len(v) == dim
            and not any(x is None for x in v)
        )

    if R is not None:
        # v @ R with rotate_vectors' exact fold: out[j] starts at 0.0
        # and adds v[i]*R[i][j] in index order (binary64 throughout —
        # Python floats and JVM doubles round identically)
        rcols = [[float(R[i][j]) for i in range(dim)] for j in range(dim)]

        def _rot(v):
            if not _ok(v):
                # the JVM fold nulls every component of an undecodable
                # vector; the drop decision below is the same either way
                return None
            out = []
            for col in rcols:
                acc = 0.0
                for x, rj in zip(v, col):
                    acc = acc + float(x) * rj
                out.append(acc)
            return out

        qrows = [(qid, _rot(v)) for qid, v in qraw]
    else:
        qrows = [
            (qid, [float(x) for x in v] if _ok(v) else None)
            for qid, v in qraw
        ]
    qvalid = [(qid, v) for qid, v in qrows if v is not None]
    qids, luts = similarity._pq_luts_from_rows(qvalid, books, dim)
    # per-query probe cells: sort centroids by (−2·q·c+‖c‖², cid) — the
    # same rank expression and tiebreak as _cent_dist + array_sort;
    # NaN distances order last, as Spark sorts NaN greatest
    import math

    probe_map: dict = {}
    for qid, v in qvalid:
        ds = []
        for cid, cvec in cents:
            acc = 0.0
            for x, c in zip(v, cvec):
                acc = acc + float(x) * float(c)
            d = -2.0 * acc + float(sum(c * c for c in cvec))
            ds.append((d, cid))
        ds.sort(key=lambda t: (isinstance(t[0], float) and math.isnan(t[0]), t[0], t[1]))
        probe_map[qid] = np.array(sorted(cid for _, cid in ds[:nprobe]))
    probes = sorted({int(c) for v in probe_map.values() for c in v})
    # ``store_df`` (r17, r16 verdict #5): a resident session holds the
    # loaded store DataFrame (its file index and merged schema) across
    # scoring calls instead of re-running load_vector_store's
    # mergeSchema footer job (~0.15 s of fixed overhead per call).
    # Passing a DataFrame makes lifecycle visibility the caller's
    # responsibility, exactly like quantized_topk_from_store's
    # DataFrame form; the probe-set partition predicate is still
    # applied per call, so pruning stays query-specific.
    base = (
        store_df
        if store_df is not None
        else load_vector_store(spark, f"{store_path}/codes", id_col)
    )
    store = (
        base
        .where(F.col("cell").isin(probes))
        .select(id_col, "codes", "rn2", "cell")
    )
    id_t = store.schema[id_col].dataType.simpleString()
    empty = np.zeros(0, dtype=np.int64)

    def adc_gen(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0 or not qids:
                continue
            packed = np.frombuffer(
                b"".join(pdf["codes"]), dtype=np.uint8
            ).reshape(n, m)
            codes_list = [packed[:, s].astype(np.int64) for s in range(m)]
            rn2 = pdf["rn2"].to_numpy(dtype=np.float64)
            nid_arr = pdf[id_col].to_numpy()
            cells = pdf["cell"].to_numpy()
            masks = [np.isin(cells, probe_map.get(q, empty)) for q in qids]
            for frame in _pq_adc_pool_frames(
                nid_arr, codes_list, rn2, qids, luts, m, pool, masks=masks
            ):
                yield frame

    pairs = store.mapInPandas(
        adc_gen,
        f"neighbor_id {id_t}, query_id {id_t}, adc double, rn2 double",
    )
    wp = Window.partitionBy("query_id").orderBy(
        (F.col("adc") / F.sqrt(F.col("rn2"))).desc(), F.col("neighbor_id").asc()
    )
    cand = (
        pairs.withColumn("prank", F.row_number().over(wp))
        .where(F.col("prank") <= pool)
        .select("query_id", "neighbor_id", "prank")
    )
    if R is None:
        matched = F.broadcast(cand).join(
            corpus.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).alias("cv"),
                l2_norm(F.col(vec_col)).alias("cn"),
            ),
            "neighbor_id",
        )
    else:
        # rotate ONLY the candidate rows: the projection sits above the
        # broadcast join, so it runs on ~queries*pool rows, never the
        # corpus scan. r17 (r16 verdict #5): the rotation is a
        # vectorized Arrow kernel instead of the interpreted
        # transform/aggregate fold (a CodegenFallback expression doing
        # dim² interpreted MACs per row — measured ~0.4 s of the opq
        # arm). Bit-exactness is preserved: acc starts at the 0.0 the
        # JVM fold starts at and adds v[i]*R[i][j] in strict i order
        # (one binary64 multiply-add per step, vectorized over rows and
        # j, sequential over i), the identical IEEE op sequence.
        import pandas as pd

        Rm = np.array([[float(x) for x in row] for row in R],
                      dtype=np.float64)

        # NOTE: annotations are attached as live objects, not hints —
        # this module uses ``from __future__ import annotations``, so
        # inline hints stringify to 'pd.Series' which pyspark cannot
        # resolve against module globals (pandas is imported locally)
        def _rot_fn(s):
            out: list = []
            vals, idx = [], []
            for i, v in enumerate(s):
                if v is None or len(v) != dim:
                    # the JVM fold nulls every component of a NULL or
                    # wrong-length vector (zip_with pads with null and
                    # the fold absorbs it); null ELEMENTS are handled
                    # by the JVM-side __dirty guard below — Arrow
                    # flattens them to NaN, which the fold would NOT do
                    out.append([None] * dim)
                else:
                    out.append(None)
                    vals.append(np.asarray(v, dtype=np.float64))
                    idx.append(i)
            if vals:
                mat = np.vstack(vals)
                acc = np.zeros((len(vals), dim), dtype=np.float64)
                for i in range(dim):
                    acc += mat[:, i : i + 1] * Rm[i, :]
                for j, i in enumerate(idx):
                    out[i] = acc[j].tolist()
            return pd.Series(out)

        _rot_fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
        _rot_arrow = F.pandas_udf(_rot_fn, "array<double>")

        _all_null = F.array(
            *[F.lit(None).cast("double") for _ in range(dim)]
        )

        matched = (
            F.broadcast(cand)
            .join(
                corpus.select(
                    F.col(id_col).alias("neighbor_id"),
                    F.col(vec_col).alias("__cv0"),
                ),
                "neighbor_id",
            )
            .select(
                "query_id",
                "neighbor_id",
                "prank",
                # null-element guard: the JVM fold turns a vector with
                # ANY null element into dim null components (acc + null
                # = null per output). Arrow cannot see element nulls
                # (they flatten to NaN), so the dirty predicate stays
                # JVM-side — candidate rows are clean by construction,
                # making this a never-taken branch kept for parity
                F.when(
                    F.exists(F.col("__cv0"), lambda x: x.isNull()),
                    _all_null,
                )
                .otherwise(_rot_arrow(F.col("__cv0")))
                .alias("cv"),
            )
            .select("query_id", "neighbor_id", "prank", "cv",
                    l2_norm(F.col("cv")).alias("cn"))
        )
    # the re-rank's query side comes from the SAME collected (and, for
    # OPQ, driver-rotated) rows — a LocalTableScan instead of a second
    # scan/checkpoint of the query frame; values are the bit-identical
    # doubles the JVM projection produced before, so qn/cosine are
    # unchanged
    from pyspark.sql import types as _T

    qdf = spark.createDataFrame(
        qvalid,
        _T.StructType([
            _T.StructField("query_id", queries.schema[id_col].dataType),
            _T.StructField("qv", _T.ArrayType(_T.DoubleType())),
        ]),
    )
    q = qdf.select("query_id", "qv", l2_norm(F.col("qv")).alias("qn"))
    scored = (
        matched
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            "prank",
            F.round(
                dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")),
                round_to,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    out_cols = ["query_id", "neighbor_id", "cosine", "rank"]
    if keep_pool_rank:
        out_cols.append("prank")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(*out_cols)
    )


def tune_pool(
    spark: SparkSession,
    store_path: str,
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 4,
    target_recall: float = 0.9,
    max_pool: int = 200,
    sample_queries: int | None = None,
) -> dict:
    """Recall-targeted re-rank POOL for an IVF-PQ store at a fixed
    ``nprobe`` (r15 verdict #7: the PQ arm's pool was a hand-set
    constant, so its recall floor was whatever pool=50 happened to
    give). Same single-pass closure as :func:`tune_probes`: pool
    candidate sets are nested in the pool size and the re-rank is
    exact, so an exact-top-k member enters the approximate top-k at
    every pool >= its ADC rank and never leaves — any pooled candidate
    that outranks it under the shared (cosine DESC, id ASC) order is
    itself in the exact top-k. ONE ADC job at ``max_pool`` (with pool
    ranks kept) + one exact-top-k job yields the entire recall-vs-pool
    curve; the minimal pool clearing ``target_recall`` is returned with
    ``hit_target=False`` when even ``max_pool`` misses (the nprobe cap
    binds — raise nprobe, not pool).

    Caveat for OPQ-rotated stores: the re-rank scores in rotated space,
    whose ROUNDED cosines can order ties differently from the
    unrotated exact baseline, so the closure is exact for plain PQ
    stores (pinned in tests) and epsilon-approximate under a rotation.

    The curve is reported at each pool size where it steps (a member's
    ADC rank), capped to the first ``max_pool``-visible points."""
    from parallel_pandas_spark.operators.similarity import cosine_topk

    if sample_queries is not None:
        queries = queries.orderBy(F.col(id_col).asc()).limit(sample_queries)
    exact = cosine_topk(corpus, queries, id_col, vec_col, k=k)
    pooled = ivfpq_topk_from_store(
        spark, store_path, corpus, queries, id_col, vec_col,
        k=max_pool, pool=max_pool, nprobe=nprobe, keep_pool_rank=True,
    )
    rows = (
        exact.select("query_id", "neighbor_id")
        .join(pooled.select("query_id", "neighbor_id", "prank"),
              ["query_id", "neighbor_id"], "left")
        .collect()
    )
    n_exact: dict = {}
    pranks: dict = {}
    for r in rows:
        qid = r["query_id"]
        n_exact[qid] = n_exact.get(qid, 0) + 1
        if r["prank"] is not None:
            pranks.setdefault(qid, []).append(int(r["prank"]))

    def _recall(p: int) -> float:
        per = [
            sum(1 for x in pranks.get(qid, []) if x <= p) / n
            for qid, n in n_exact.items()
        ]
        return sum(per) / len(per) if per else float("nan")

    steps = sorted({x for v in pranks.values() for x in v} | {max_pool})
    evaluated, best = [], None
    for p in steps:
        rec = _recall(p)
        evaluated.append({"pool": p, "recall": rec})
        if best is None and rec >= target_recall:
            best = evaluated[-1]
            break
    chosen = best or evaluated[-1]
    return {
        "pool": chosen["pool"],
        "recall": chosen["recall"],
        "hit_target": best is not None,
        "evaluated": evaluated,
    }


def tune_probes(
    spark: SparkSession,
    store_path: str,
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    pool: int = 50,
    target_recall: float = 0.9,
    max_nprobe: int | None = None,
    sample_queries: int | None = None,
    _per_candidate: bool = False,
) -> dict:
    """Recall-targeted nprobe for an IVF or IVF-PQ store (r13 verdict
    #2): evaluate nprobe ascending against the exact top-k on the SAME
    queries and return the first value whose measured recall clears
    ``target_recall`` — with the probed ROW fraction it costs (mean over
    queries of probed-cell live rows / total live rows), so the caller
    sees the recall/scan-cost trade in the unit that matters at 100 TB.

    Probe sets are nested in nprobe, so the ascending scan returns the
    MINIMAL hitting value; IVF-flat recall is monotone in nprobe
    (superset candidates, exact re-rank). For IVF-FLAT the entire
    recall curve comes from ONE exact-top-k job (r15 verdict #1):
    nested candidates + exact re-rank mean an exact member is hit at
    every nprobe >= its stored cell's rank in the query's centroid
    order, so no per-nprobe scoring jobs run at all. The IVF-PQ path
    evaluates candidates ascending (one ADC job each) because the
    pool-bounded pre-rank breaks that closure. Pass
    ``sample_queries=N`` to cap the set deterministically (smallest N
    ids) when the caller's query frame is not already bounded; the
    exact baseline scores every query against the full live corpus, so
    an unbounded query set makes the tuner itself the expensive job.
    The store kind is detected from the ``_books`` sidecar; both kinds
    share the persisted coarse quantizer, so cell sizes come from ONE
    groupBy over live rows.

    Exact-baseline source (r14 ADVICE, low): for the IVF-FLAT path the
    baseline is computed from the store's own LIVE rows
    (``load_vector_store`` — tombstone-shadowed, appends included), so
    recall is measured against what the store can actually return and
    a drifted ``corpus`` argument cannot silently skew it (``corpus``
    is ignored for flat stores). The IVF-PQ path has no raw vectors in
    the store — the exact re-rank NEEDS ``corpus``, whose contract is
    therefore corpus == the store's live rows; violating it yields a
    recall against the wrong reference."""
    import os

    from parallel_pandas_spark.operators.similarity import (
        _cent_dist, cosine_topk, recall_at_k,
    )

    is_pq = os.path.isdir(os.path.join(store_path, "_books"))
    codes_path = f"{store_path}/codes" if is_pq else store_path
    if sample_queries is not None:
        queries = queries.orderBy(F.col(id_col).asc()).limit(sample_queries)
    cents = read_ivf_centroids(store_path)
    n_cells = len(cents)
    if max_nprobe is None:
        max_nprobe = n_cells
    if n_cells == 0 or max_nprobe < 1:
        raise ValueError(
            f"tune_probes: nothing to evaluate — {n_cells} centroids "
            f"under {store_path!r}, max_nprobe={max_nprobe}"
        )

    # live rows per cell — ONE aggregate over the tombstone-shadowed
    # store; drives the probed-fraction report for every candidate.
    # The loaded store DataFrame (manifest resolution + mergeSchema
    # footer job + file index) is held in ``live`` and reused by every
    # consumer below — the per-nprobe loop previously re-ran
    # load_vector_store once per candidate, a fixed-cost job per
    # iteration that reads the same snapshot (r16 verdict #5)
    live = load_vector_store(spark, codes_path, id_col)
    sizes = {
        r["cell"]: r["n"]
        for r in live.groupBy("cell").agg(F.count("*").alias("n")).collect()
    }
    total = float(sum(sizes.values())) or 1.0

    # each query's full centroid ordering, ONCE — nprobe=j probes the
    # first j entries, so per-candidate probe sets need no new jobs
    probe_structs = F.array(*[
        F.struct(_cent_dist(F.col(vec_col), cvec).alias("d"),
                 F.lit(cid).alias("cid"))
        for cid, cvec in cents
    ])
    order_rows = queries.select(
        F.col(id_col).alias("qid"),
        F.transform(F.array_sort(probe_structs),
                    lambda s: s.getField("cid")).alias("cells"),
    ).collect()
    cell_order = {r["qid"]: list(r["cells"]) for r in order_rows}

    if is_pq:
        exact_corpus = corpus
    else:
        # flat store: the raw vectors live in the store itself — derive
        # the baseline from the SAME snapshot the approximate side scores
        exact_corpus = live.select(id_col, F.col("v").alias(vec_col))
    exact = cosine_topk(exact_corpus, queries, id_col, vec_col, k=k)

    def _frac(nprobe: int) -> float:
        return (
            sum(
                sum(sizes.get(c, 0) for c in order[:nprobe])
                for order in cell_order.values()
            )
            / (total * max(1, len(cell_order)))
        )

    if not is_pq and not _per_candidate:
        # ---- single-pass recall curve (r15 verdict #1) ----
        # Probe sets are nested and the re-rank is EXACT, so any
        # candidate outranking an exact-top-k member under the shared
        # (cosine DESC, id ASC) order is itself in the exact top-k:
        # once an exact member's stored cell is probed it can never be
        # displaced. Hence hit(j) per query is just |exact members whose
        # cell-rank <= j| — the whole per-nprobe recall curve falls out
        # of ONE exact-top-k job joined with the store's cell
        # assignment, replacing the up-to-n_cells probe-pruned scoring
        # jobs of the per-candidate loop (the measured +9.2 s on
        # ivf_topk at sf0.01). The per-candidate loop below remains as
        # (a) the IVF-PQ path — a pool-bounded ADC pre-rank can
        # displace a member when more candidates become visible, so the
        # closure argument only holds for exact re-rank — and (b) the
        # reference shape behind ``_per_candidate=True``, pinned equal
        # to this curve in tests.
        cellmap = live.select(F.col(id_col).alias("neighbor_id"), "cell")
        ex_rows = (
            exact.select("query_id", "neighbor_id")
            .join(cellmap, "neighbor_id")
            .collect()
        )
        n_exact: dict = {}
        cranks: dict = {}
        for r in ex_rows:
            qid = r["query_id"]
            n_exact[qid] = n_exact.get(qid, 0) + 1
            cranks.setdefault(qid, []).append(
                cell_order[qid].index(r["cell"]) + 1
            )

        def _recall(j: int) -> float:
            per = [
                sum(1 for c in cranks.get(qid, []) if c <= j) / n
                for qid, n in n_exact.items()
            ]
            return sum(per) / len(per) if per else float("nan")

        evaluated, best = [], None
        for nprobe in range(1, max_nprobe + 1):
            r = _recall(nprobe)
            evaluated.append({
                "nprobe": nprobe, "recall": r,
                "probed_fraction": round(_frac(nprobe), 4),
            })
            if r >= target_recall:
                best = evaluated[-1]
                break
        chosen = best or evaluated[-1]
        return {
            "nprobe": chosen["nprobe"],
            "recall": chosen["recall"],
            "probed_fraction": chosen["probed_fraction"],
            "hit_target": best is not None,
            "evaluated": evaluated,
        }

    evaluated = []
    best = None
    nprobe = 1
    while nprobe <= max_nprobe:
        if is_pq:
            approx = ivfpq_topk_from_store(
                spark, store_path, corpus, queries, id_col, vec_col,
                k=k, pool=pool, nprobe=nprobe, store_df=live)
        else:
            approx = ivf_topk_from_store(
                spark, store_path, queries, id_col, vec_col,
                k=k, nprobe=nprobe)
        r = recall_at_k(approx, exact)
        evaluated.append(
            {"nprobe": nprobe, "recall": r,
             "probed_fraction": round(_frac(nprobe), 4)}
        )
        if r >= target_recall:
            best = evaluated[-1]
            break
        nprobe += 1
    chosen = best or evaluated[-1]
    return {
        "nprobe": chosen["nprobe"],
        "recall": chosen["recall"],
        "probed_fraction": chosen["probed_fraction"],
        "hit_target": best is not None,
        "evaluated": evaluated,
    }
