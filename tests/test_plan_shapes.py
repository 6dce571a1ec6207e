"""Physical-plan shape assertions for the registered headline queries.

Correctness rows prove the VALUES; these prove the PLAN is the one that
survives a 100x scale-up: filters pushed to the parquet scan, scans pruned
to the projected columns, small sides broadcast (never sort-merge), window
queries partitioned (never `Exchange SinglePartition`, the single-task-sort
scale killer), and no more shuffles than the operator inherently needs.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as em
from parallel_pandas_spark.plans import explain

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qs():
    q = em.queries()

    # component queries folded into registered batteries keep their module-
    # level functions; plan assertions target the component plans directly
    for name in (
        "merge_inner",
        "rolling_mean_sum",
        "cumulative_scan",
        "rank_methods",
        "stats_mad",
    ):
        q.setdefault(name, getattr(em, name))
    return q


def _txt(df):
    return explain.explain_str(df)


def test_q1_pushdown_pruning_single_shuffle(spark, qs):
    df = qs["q1_pricing_summary"](spark, SF)
    pushed = explain.pushed_filters(df)
    assert any("l_shipdate" in p for p in pushed), pushed
    # 7 of lineitem's 16 columns: quantity/extendedprice/discount/tax/
    # returnflag/linestatus/shipdate
    assert len(explain.read_schema_columns(df)) <= 7
    txt = _txt(df)
    assert txt.count("Exchange (") == 1, txt  # partial+final agg, one shuffle


def test_merge_broadcasts_small_side(spark, qs):
    df = qs["merge_inner"](spark, SF)
    assert explain.has_broadcast_join(df)
    assert not explain.has_sort_merge_join(df)


@pytest.mark.parametrize(
    "name",
    [
        "rolling_mean_sum",
        "cumulative_scan",
        "rank_methods",
        "top3_orders_per_priority",
        "groupby_transform_zscore",
    ],
)
def test_window_queries_are_partitioned_single_shuffle(spark, qs, name):
    df = qs[name](spark, SF)
    txt = _txt(df)
    assert "Exchange SinglePartition" not in txt, f"{name} funnels all rows through one task"
    assert txt.count("Exchange (") == 1, f"{name} shuffles more than once:\n{txt}"


@pytest.mark.parametrize(
    "name,max_exchanges",
    [
        ("zscore_normalize", 2),  # moments agg + broadcast-back
        ("stats_mad", 3),  # means agg + broadcast + final agg
        ("cosine_topk", 2),  # broadcast queries + per-id top-k
    ],
)
def test_shuffle_budget(spark, qs, name, max_exchanges):
    df = qs[name](spark, SF)
    txt = _txt(df)
    assert txt.count("Exchange (") <= max_exchanges, txt


def test_projection_prunes_scan(spark, qs):
    # rank_methods projects 3 working columns + order key; the parquet scan
    # must not read all 16 lineitem columns
    df = qs["rank_methods"](spark, SF)
    assert len(explain.read_schema_columns(df)) <= 5


def test_no_registered_plan_joins_on_raw_shingles(spark, qs):
    """The standalone shingle self-join (dedup.ngram_jaccard_pairs) explodes
    on non-selective shingles; the REGISTERED ngram query must be the
    LSH-banded form whose join keys are (band, bucket-hash), with raw
    shingles appearing only inside per-document signature computation —
    never as a join/exchange key."""
    df = qs["ngram_jaccard_pairs"](spark, SF)
    txt = _txt(df)
    assert "shingle" not in txt, txt
    # and the unsafe primitive itself still exists, with the hazard local
    unsafe = em.dedup.ngram_jaccard_pairs(
        em.load_table(spark, SF, "documents"), "doc_id", "text", n=3, threshold=0.1
    )
    assert "shingle" in explain.explain_str(unsafe)


def test_sampling_is_narrow_no_shuffle(spark, qs):
    """Hash-gated sampling/splitting is pure row-local filtering — any
    Exchange before the final aggregation means the gate stopped being a
    narrow expression."""
    from parallel_pandas_spark.operators import sampling

    docs = em.load_table(spark, SF, "documents")
    s = sampling.train_test_split(
        sampling.stratified_sample(docs, "lang", {"en": 0.3}, ["doc_id"], 1.0),
        ["doc_id"],
        test_fraction=0.15,
    )
    assert "Exchange" not in _txt(s), _txt(s)


def test_packing_single_exchange(spark, qs):
    """Offset packing needs exactly one shuffle (hash bucket) — the window
    sort must reuse the bucket partitioning, and never SinglePartition."""
    df = qs["pack_sequences_query"](spark, SF)
    txt = _txt(df)
    assert "Exchange SinglePartition" not in txt, txt
    # bucket shuffle + final agg shuffle only
    assert txt.count("Exchange (") <= 2, txt


def test_corpus_pipeline_shuffle_budget(spark, qs):
    """Five-stage pipeline: only the dedup window and the pack bucket move
    full data; the two result aggregations shuffle final counters. Any
    fifth exchange means a narrow stage (filter/sample/split) regressed."""
    df = qs["corpus_build_pipeline"](spark, SF)
    txt = _txt(df)
    assert "Exchange SinglePartition" not in txt, txt
    assert txt.count("Exchange (") <= 4, txt
