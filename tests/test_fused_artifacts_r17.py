"""Round-17: the per-batch docindex+corpus artifact pair is written as
ONE partitioned staging job renamed into the standard layout (r16
verdict #6). These tests pin that both write modes produce identical
on-disk artifacts — same readout rows, same legacy _SUCCESS commit
marker — and that the empty-artifact fallback stays readable.
"""

from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parallel_pandas_spark.operators import incremental, rollup  # noqa: E402
from parallel_pandas_spark.streaming import corpus as sc  # noqa: E402

from tests.test_streaming_corpus_r12 import (  # noqa: E402
    _SPEC, _base, _members, _rebuild, _write_slices,
)


def _run_loop(spark, tmp_path, mode: str):
    root = tmp_path / f"mode{mode}"
    root.mkdir()
    base_di = _base(spark)
    base_co = incremental.keepers(base_di)
    di_p, co_p = str(root / "base_di"), str(root / "base_co")
    base_di.write.parquet(di_p)
    base_co.write.parquet(co_p)
    base_state = rollup.agg_state(spark.read.parquet(co_p), ["lang"], _SPEC)
    feed_dir = str(root / "changes")
    _write_slices(spark, feed_dir)
    work, ckpt = str(root / "work"), str(root / "ckpt")
    old = os.environ.get("SPARK_GRAFT_FUSED_ARTIFACTS")
    os.environ["SPARK_GRAFT_FUSED_ARTIFACTS"] = mode
    try:
        sc.run_corpus_refresh_stream(
            spark,
            lambda: sc.stream_doc_changes(spark, feed_dir, max_files=1),
            di_p, co_p, work, ckpt, _SPEC,
        )
    finally:
        if old is None:
            os.environ.pop("SPARK_GRAFT_FUSED_ARTIFACTS", None)
        else:
            os.environ["SPARK_GRAFT_FUSED_ARTIFACTS"] = old
    di, co, fin = sc.corpus_stream_readout(spark, base_state, work, _SPEC)
    return base_di, work, di, co, fin


def test_fused_and_threewrite_modes_bit_identical(spark, tmp_path):
    outs = {}
    for mode in ("0", "1"):
        base_di, work, di, co, fin = _run_loop(spark, tmp_path, mode)
        outs[mode] = (
            _members(di),
            _members(co),
            sorted(tuple(r) for r in fin.collect()),
        )
        # layout invariants the readers (and legacy _versions scan) rely
        # on: per-version directories with a _SUCCESS marker, no staging
        # leftovers
        for art in ("docindex", "corpus", "delta"):
            vers = glob.glob(os.path.join(work, art, "b*"))
            assert vers, (mode, art)
            for d in vers:
                assert os.path.isfile(os.path.join(d, "_SUCCESS")), (mode, d)
        assert not glob.glob(os.path.join(work, ".staging_b*")), mode
        # and both match the from-scratch rebuild
        eff, keep = _rebuild(spark, base_di)
        assert _members(di) == _members(eff), mode
        assert _members(co) == _members(keep), mode
    assert outs["0"] == outs["1"]
