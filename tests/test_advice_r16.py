"""Round-16 regressions: the four r15 ADVICE items plus verdict #1/#6.

- salted_join refuses inputs that already carry a ``__salt`` column
  instead of silently overwriting/consuming it (ADVICE, low);
- _fsync_tree degrades best-effort on filesystems whose fds reject
  fsync, matching _fsync_path, instead of crashing every rewrite
  (ADVICE, low);
- retention is a persisted STORE policy: a rewrite that doesn't pass
  ``retain_versions`` keeps the previous writer's policy; only an
  explicit int changes it (ADVICE, low);
- tune_probes' single-pass recall curve (verdict #1) is pinned equal —
  same chosen nprobe, same per-nprobe recalls — to the per-candidate
  reference loop on the structured fixture;
- salted_join pins its own shuffled exchange (verdict #6): the plan is
  hashpartitioning on (key, __salt) WITHOUT any broadcast-threshold
  fence in the test — the operator itself refuses the broadcast
  degeneration via the shuffle_hash hint.

(The oracle_sweep sentinel_error fix is exercised by the close-out
sweep artifact, not unit-tested — the block lives inside main().)
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from parallel_pandas_spark.operators import joins  # noqa: E402
from parallel_pandas_spark.operators import similarity as sim  # noqa: E402
from parallel_pandas_spark.operators import vecstore as vs  # noqa: E402
from parallel_pandas_spark.sources import load_table  # noqa: E402


def _skew_sides(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") % 7).alias("sk"),
        "l_quantity", "l_orderkey", "l_linenumber",
    )
    dim = load_table(spark, sf_dir, "part").where(
        F.col("p_partkey") <= 6
    ).select(F.col("p_partkey").alias("sk"), "p_type")
    return li, dim


def test_salted_join_refuses_preexisting_salt_column(spark, sf_small):
    li, dim = _skew_sides(spark, sf_small)
    with pytest.raises(ValueError, match="__salt"):
        joins.salted_join(li.withColumn("__salt", F.lit(1)), dim, ["sk"])
    with pytest.raises(ValueError, match="__salt"):
        joins.salted_join(li, dim.withColumn("__salt", F.lit(1)), ["sk"])


def test_salted_join_shuffles_even_under_auto_broadcast(spark, sf_small):
    """No broadcast-threshold fence here — the default session config
    would happily broadcast the 6-row dim. The operator must still plan
    the salted shuffled exchange (verdict #6)."""
    li, dim = _skew_sides(spark, sf_small)
    out = joins.salted_join(li, dim, ["sk"], salt_buckets=4,
                            salt_cols=["l_orderkey", "l_linenumber"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan, plan
    assert "__salt" in plan and "hashpartitioning" in plan, plan
    # and it is still row-identical to the plain join
    plain = li.join(dim, ["sk"], "inner")
    assert out.exceptAll(plain).count() == 0
    assert plain.exceptAll(out).count() == 0


def test_fsync_tree_best_effort_on_efsync(tmp_path, monkeypatch):
    d = tmp_path / "tree" / "sub"
    d.mkdir(parents=True)
    (d / "f.parquet").write_bytes(b"x" * 16)

    def _refuse(fd):
        raise OSError(22, "fsync rejected")

    monkeypatch.setattr(os, "fsync", _refuse)
    vs._fsync_tree(str(tmp_path / "tree"))  # must not raise


@pytest.fixture()
def flat_store(spark, tmp_path):
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    s = sim.structured_embeddings(emb).select(
        "vec_id", F.col("embedding_s").alias("embedding")
    )
    path = str(tmp_path / "ivf")
    vs.write_ivf_store(s, path, "vec_id", "embedding", num_centroids=8)
    return path, s


def test_retain_policy_persists_across_unflagged_rewrites(
    spark, flat_store
):
    path, _s = flat_store
    # writer A sets the policy
    vs.compact_vector_store(spark, path, retain_versions=1)
    man = vs._read_store_manifest(path)
    assert man["retain_policy"] == 1
    # writer B passes nothing — the retained snapshot must SURVIVE
    vs.compact_vector_store(spark, path)
    man = vs._read_store_manifest(path)
    assert man["retain_policy"] == 1
    assert len(man.get("retain") or []) == 1, man
    base = path.rstrip("/")
    retained = man["retain"][0]["data"]
    assert os.path.isdir(os.path.join(base, retained)), (
        "retained snapshot swept by an unflagged rewrite"
    )
    # explicit 0 clears the policy AND the list
    vs.compact_vector_store(spark, path, retain_versions=0)
    man = vs._read_store_manifest(path)
    assert man["retain_policy"] == 0
    assert not man.get("retain")


def test_tune_probes_single_pass_equals_per_candidate(spark, flat_store):
    """Verdict #1's pinned old-vs-new equivalence: the closed-form
    curve and the per-candidate scoring loop agree on every evaluated
    recall AND on the chosen nprobe."""
    path, s = flat_store
    queries = s.where(F.col("vec_id") < 20)
    new = vs.tune_probes(spark, path, s, queries, target_recall=0.95, k=5)
    old = vs.tune_probes(spark, path, s, queries, target_recall=0.95, k=5,
                         _per_candidate=True)
    assert new["nprobe"] == old["nprobe"]
    assert new["hit_target"] == old["hit_target"]
    assert len(new["evaluated"]) == len(old["evaluated"])
    for a, b in zip(new["evaluated"], old["evaluated"]):
        assert a["nprobe"] == b["nprobe"]
        assert abs(a["recall"] - b["recall"]) < 1e-12, (a, b)
        assert a["probed_fraction"] == b["probed_fraction"]


def test_tune_lsh_probes_single_pass_equals_per_depth(spark, flat_store):
    """The same closure applied to LSH (r16): the one-job Hamming curve
    equals the per-depth lsh_topk scoring loop on every evaluated
    recall and on the chosen depth."""
    _path, s = flat_store
    queries = s.where(F.col("vec_id") < 20)
    new = sim.tune_lsh_probes(s, queries, k=5, num_planes=6,
                              target_recall=0.95, dim=64)
    old = sim.tune_lsh_probes(s, queries, k=5, num_planes=6,
                              target_recall=0.95, dim=64,
                              _per_candidate=True)
    assert new["probe_hamming"] == old["probe_hamming"]
    assert new["hit_target"] == old["hit_target"]
    assert len(new["evaluated"]) == len(old["evaluated"])
    for a, b in zip(new["evaluated"], old["evaluated"]):
        assert a["probe_hamming"] == b["probe_hamming"]
        assert abs(a["recall"] - b["recall"]) < 1e-12, (a, b)
        assert a["probed_fraction"] == b["probed_fraction"]
