"""Round-10 surface: r9 ADVICE fixes (NULL-tail self-pair parity in the
pruned quantized scorer, NULL PQ codes for undecodable vectors, summed
parquet row bounds, empty-stream drain proof), the persisted vector
store, semantic cluster dedup, and the streaming restart-recovery proof
(the latter in test_streaming.py)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

_EMB_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ]
)


def test_quantized_prune_dirty_self_in_bad_tail_matches_fold(spark):
    """r9 ADVICE (medium): when a query's OWN corpus vector is dirty and
    among the k smallest bad neighbor ids, the shared NULL tail used to
    keep only k bad ids per batch — the post-truncation self-pair filter
    then left k-1 tail rows and a globally-needed bad id was already
    pruned, so vectorized=True diverged from the fold path whenever the
    top-k dipped into the NULL tail. Engineered here: only 2 clean
    corpus rows, k=5, and the query ids themselves are among the 5
    smallest DIRTY corpus ids."""
    from parallel_pandas_spark.operators import similarity

    rows = [(i, None) for i in range(6)]  # dirty rows with the SMALLEST ids
    rows += [(10, [1.0, 2.0, 3.0, 4.0]), (11, [2.0, 1.0, 0.0, 1.0])]
    df = spark.createDataFrame(rows, _EMB_SCHEMA).repartition(2)
    # query ids 0 and 1 are themselves dirty corpus rows in the bad tail
    queries = spark.createDataFrame(
        [(0, [1.0, 1.0, 1.0, 1.0]), (1, [0.5, 1.5, 2.5, 3.5])], _EMB_SCHEMA
    )
    vec = similarity.quantized_cosine_topk(
        df, queries, "vec_id", "embedding", k=5, vectorized=True
    )
    fold = similarity.quantized_cosine_topk(
        df, queries, "vec_id", "embedding", k=5, vectorized=False
    )
    v = sorted(map(tuple, vec.collect()))
    f = sorted(map(tuple, fold.collect()))
    assert v == f and len(v) > 0
    # each query must see k full rows: 2 clean + 3 NULL-tail rows
    per_q = {}
    for r in v:
        per_q[r[0]] = per_q.get(r[0], 0) + 1
    assert per_q == {0: 5, 1: 5}, per_q


def test_quantized_prune_duplicate_id_tail_starvation(spark):
    """The sharpest form of the r9 ADVICE scenario: the query's ONLY
    clean candidate is its own duplicate-id row (excluded as a
    self-pair), so the final top-k is ALL tail — it needs the k smallest
    non-self bad ids, but a k-truncated shared tail containing the
    query's dirty duplicate holds only k-1 of them. The k+1 tail keeps
    parity with the fold path."""
    from parallel_pandas_spark.operators import similarity

    rows = [(0, [1.0, 2.0, 3.0, 4.0])]  # clean row, id 0 (the query's own)
    rows += [(i, None) for i in range(6)]  # dirty ids 0..5 — 0 DUPLICATES
    df = spark.createDataFrame(rows, _EMB_SCHEMA).coalesce(1)
    queries = spark.createDataFrame([(0, [1.0, 1.0, 1.0, 1.0])], _EMB_SCHEMA)
    vec = similarity.quantized_cosine_topk(
        df, queries, "vec_id", "embedding", k=5, vectorized=True
    )
    fold = similarity.quantized_cosine_topk(
        df, queries, "vec_id", "embedding", k=5, vectorized=False
    )
    v = sorted(map(tuple, vec.collect()))
    f = sorted(map(tuple, fold.collect()))
    assert v == f, (v, f)
    assert {r[1] for r in v} == {1, 2, 3, 4, 5}  # the full non-self tail


def test_pq_encode_null_codes_for_undecodable(spark):
    """r9 ADVICE (low): pq_encode on a NULL / ragged / null-element
    vector must emit NULL codes, not an arbitrary valid-looking cid
    (F.least over structs with NULL dist fields picks one)."""
    from parallel_pandas_spark.operators import similarity

    rows = [(i, [float(i + j) for j in range(8)]) for i in range(20)]
    rows += [(100, None), (101, [1.0] * 3), (102, [1.0, None] + [2.0] * 6)]
    df = spark.createDataFrame(rows, _EMB_SCHEMA)
    books = similarity.pq_codebooks(df, "vec_id", "embedding", m=4, ks=8, dim=8)
    codes = similarity.pq_encode(df, books, "vec_id", "embedding")
    got = {r["neighbor_id"]: [r[f"c{s}"] for s in range(4)] for r in codes.collect()}
    for bad in (100, 101, 102):
        assert got[bad] == [None] * 4, (bad, got[bad])
    for good in range(20):
        assert all(c is not None and 0 <= c < 8 for c in got[good])


def test_rows_bound_sums_split_part_files(tmp_path):
    """r9 ADVICE (low): a table split into flat part files
    (lineitem_0.parquet, lineitem_1.parquet) must be bounded by the SUM
    of its parts, not the per-file max — an undercounted bound could
    elect the compact LONG accumulator past its real bound."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __spark_entry__ as entrymod

    d = tmp_path / "sfX"
    d.mkdir()
    t = pa.table({"x": list(range(1000))})
    pq.write_table(t, d / "lineitem_0.parquet")
    pq.write_table(t, d / "lineitem_1.parquet")
    pq.write_table(pa.table({"x": [1, 2]}), d / "nation.parquet")
    bound = entrymod._rows_bound(str(d))
    # 2000 summed rows (not 1000 max); no sfN suffix -> no name floor
    assert bound == 3.0 * 2000, bound


def test_stateful_drain_proof_empty_source(spark, tmp_path):
    """r9 ADVICE (low): a source that is empty from the start never
    produces a batch with non-None offsets — the engine's own no-data
    progress event (zero rows, startOffset == endOffset == None) is the
    only drain evidence it can emit, and must be accepted instead of
    burning the full timeout and raising for a valid empty stream."""
    from parallel_pandas_spark.streaming import events as se

    src = tmp_path / "empty_events"
    src.mkdir()
    stream = se.stream_events(spark, str(src))
    tot = se.user_running_totals_stateful(stream)
    out = se.run_stream_to_memory(
        spark, tot, table="r10_empty_stateful", mode="update",
        timeout_secs=60.0,
    )
    assert out.count() == 0


def test_drain_proof_still_rejects_inflight_batch0_shape():
    """The relaxed predicate must NOT treat a committed batch whose
    startOffset is None but endOffset is NOT (batch 0's shape) as
    drained — only no-offset-movement entries count."""
    # pure predicate check over synthetic progress dicts (the logic the
    # poll loop applies, isolated here so no query is needed)
    def drained(progress):
        for p in progress:
            if p["numInputRows"] != 0:
                continue
            srcs = p.get("sources") or []
            if srcs and all(
                s.get("startOffset") == s.get("endOffset") for s in srcs
            ):
                return True
        return False

    batch0 = {"numInputRows": 0,
              "sources": [{"startOffset": None, "endOffset": "{'log': 3}"}]}
    moving = {"numInputRows": 7,
              "sources": [{"startOffset": "{'log': 1}", "endOffset": "{'log': 2}"}]}
    empty = {"numInputRows": 0,
             "sources": [{"startOffset": None, "endOffset": None}]}
    settled = {"numInputRows": 0,
               "sources": [{"startOffset": "{'log': 3}", "endOffset": "{'log': 3}"}]}
    assert not drained([batch0, moving])
    assert drained([empty])
    assert drained([moving, settled])
