"""Round-9 surface: dirty-corpus semantics of the vectorized quantized
scorer, deterministic streaming drain (see test_streaming.py for the
stress tests), and the r9 operators."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402


def _emb_with_dirt(spark):
    """8 clean 4-d vectors + one NULL + one ragged (3-d) corpus row."""
    rows = [(i, [float(i + j) for j in range(4)]) for i in range(8)]
    rows.append((100, None))
    rows.append((101, [1.0, 2.0, 3.0]))
    return spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.DoubleType())),
            ]
        ),
    )


def test_quantized_vectorized_dirty_corpus_matches_fold(spark):
    """r8 ADVICE (medium): a null or ragged corpus vector must NOT fail
    the vectorized matmul path — it degrades to a NULL qcosine for that
    pair, exactly like the zip_with fold path. Asserted by full top-k
    equality between vectorized=True and vectorized=False on a corpus
    containing both a NULL and a wrong-dimension vector."""
    from parallel_pandas_spark.operators import similarity

    emb = _emb_with_dirt(spark)
    queries = emb.where(F.col("vec_id") < 3)
    vec = similarity.quantized_cosine_topk(
        emb, queries, "vec_id", "embedding", k=9, vectorized=True
    )
    fold = similarity.quantized_cosine_topk(
        emb, queries, "vec_id", "embedding", k=9, vectorized=False
    )
    v = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["qcosine"])
         for r in vec.collect()}
    f = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["qcosine"])
         for r in fold.collect()}
    assert v == f and len(v) > 0


def test_quantized_vectorized_null_query_matches_fold(spark):
    """A NULL query vector produces NULL qcosine pairs in both paths
    (never a driver-side TypeError building the query matrix)."""
    from parallel_pandas_spark.operators import similarity

    emb = _emb_with_dirt(spark).where(F.col("vec_id") < 8)
    queries = _emb_with_dirt(spark).where(
        (F.col("vec_id") < 2) | (F.col("vec_id") == 100)
    )
    vec = similarity.quantized_cosine_topk(
        emb, queries, "vec_id", "embedding", k=9, vectorized=True
    )
    fold = similarity.quantized_cosine_topk(
        emb, queries, "vec_id", "embedding", k=9, vectorized=False
    )
    assert sorted(map(tuple, vec.collect())) == sorted(map(tuple, fold.collect()))


def test_quantize_arrow_bit_parity_fixture(spark, sf_small):
    """The Arrow quantizer must be BIT-identical to the HOF expression
    path on real fixture embeddings: same scale doubles, same int codes,
    and the fused norm equal to the _int_norm fold."""
    from parallel_pandas_spark.operators import similarity
    from parallel_pandas_spark.sources import load_table

    emb = load_table(spark, sf_small, "embeddings")
    hof = similarity.quantize_embeddings(emb, "vec_id", "embedding")
    hof = hof.select(
        "vec_id", "scale", "codes",
        similarity._int_norm(F.col("codes")).alias("norm"),
    )
    arrow = similarity._quantize_arrow(emb, "vec_id", "embedding", with_norm=True)
    h = {r["vec_id"]: (r["scale"], list(r["codes"]), r["norm"]) for r in hof.collect()}
    a = {r["vec_id"]: (r["scale"], list(r["codes"]), r["norm"]) for r in arrow.collect()}
    assert h == a and len(h) > 0


def test_quantize_arrow_bit_parity_edges(spark):
    """Null vector, empty vector, zero vector, negative-tie values (the
    HALF_UP boundary: -2.5/5*127 = -63.5 must round AWAY from zero),
    and ragged lengths — all bit-equal to the HOF path."""
    from parallel_pandas_spark.operators import similarity

    rows = [
        (0, [1.0, -2.5, 5.0, 0.5]),
        (1, None),
        (2, []),
        (3, [0.0, 0.0]),
        (4, [-1.0, 1.0, 1.0]),
        (5, [63.5, -63.5, 127.0, -127.0, 1e-30]),
    ]
    df = spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.DoubleType())),
            ]
        ),
    )
    hof = similarity.quantize_embeddings(df, "vec_id", "embedding")
    arrow = similarity._quantize_arrow(df, "vec_id", "embedding")
    h = {r["vec_id"]: (r["scale"], None if r["codes"] is None else list(r["codes"]))
         for r in hof.collect()}
    a = {r["vec_id"]: (r["scale"], None if r["codes"] is None else list(r["codes"]))
         for r in arrow.collect()}
    assert h == a


def test_quantized_vectorized_ragged_queries_raise(spark):
    """Mixed query dimensions can't form one matmul — a clear ValueError
    pointing at vectorized=False, not a shape error mid-job."""
    from parallel_pandas_spark.operators import similarity

    emb = _emb_with_dirt(spark).where(F.col("vec_id") < 8)
    queries = _emb_with_dirt(spark).where(
        (F.col("vec_id") == 0) | (F.col("vec_id") == 101)
    )
    with pytest.raises(ValueError, match="vectorized=False"):
        similarity.quantized_cosine_topk(
            emb, queries, "vec_id", "embedding", k=3, vectorized=True
        )
