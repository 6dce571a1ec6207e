"""Round-13 surface: driver-armed store-maintenance lifecycle (r12
VERDICT #1) — the compact/rebalance/recover cycle now sits under the
hash oracle via ivf_topk's ``maint`` arm; here the same lifecycle is
pinned Spark-side against a FRESH store built from the surviving
corpus (the maintenance theorem: lifecycle result == rebuild result) —
plus the measured ANN recall gauge (r12 VERDICT #3).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as em  # noqa: E402
from parallel_pandas_spark.operators import vecstore  # noqa: E402
from parallel_pandas_spark.sources import load_table  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_maint_lifecycle_bit_equals_fresh_build(spark, tmp_path):
    """build(90%) -> append(10%) -> delete -> compact -> crash-injected
    rebalance (rolled back) -> crash-injected rebalance (rolled forward)
    must score bit-identically to a store freshly BUILT from the live
    corpus — same retrained centroids, same cells, same top-k."""
    got = sorted(
        map(tuple, em.ivf_maint_topk_query(spark, SF).collect())
    )
    emb = load_table(spark, SF, "embeddings")
    live = emb.where(~F.expr(em._IVF_MAINT_DELETE_WHERE))
    ref = str(tmp_path / "ref_store")
    vecstore.write_ivf_store(live, ref, "vec_id", "embedding",
                             num_centroids=16)
    want = sorted(
        map(
            tuple,
            vecstore.ivf_topk_from_store(
                spark, ref, emb.where(F.col("vec_id") < 10),
                "vec_id", "embedding", k=5, nprobe=4,
            ).collect(),
        )
    )
    assert got == want and len(got) > 0


def test_kendall_bucketed_oracle_equals_pair_join():
    """r12 verdict #5: the kendall oracle is now an exact BUCKETED
    decomposition (O(n²/P + n²/B + P·B)) instead of the O(n²) pair join
    that forced a subset gate. Pin the decomposition itself against the
    brute-force join on data small enough to brute-force — including
    heavy y ties (years) and duplicated x values."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        "'/root/testdata/sf0.001/orders.parquet'"
    )
    brute = """
WITH t AS (
  SELECT CAST(o_totalprice AS DOUBLE) AS x,
         CAST(EXTRACT(year FROM o_orderdate) AS DOUBLE) AS y
  FROM orders WHERE o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL
),
pairs AS (
  SELECT SUM(CASE WHEN a.x < b.x AND a.y > b.y THEN 1 ELSE 0 END) AS d
  FROM t a, t b
)
SELECT (SELECT COUNT(*) FROM t) AS n, d FROM pairs
"""
    bn, bd = con.execute(brute).fetchone()
    # the bucketed oracle at several (P, B) — the statistic must be
    # invariant to bucket placement
    for P, B in ((7, 3), (64, 8), (2048, 64)):
        row = con.execute(em._kendall_exact_oracle(P, B)).fetchone()
        assert (row[0], row[1]) == (bn, bd), (P, B, row, bn, bd)
    con.close()


def test_recall_at_k_measured_and_bounded(spark):
    """r12 VERDICT #3: recall@k of the ANN arms vs the exact arm is a
    MEASURED number with a pinned floor (bench.py reports it per round
    under vecstore.recall_*_at5). The synthetic uniform embeddings are
    an adversarial corpus for ANN — near-uniform pairwise cosine — so
    the floors are honest, not aspirational."""
    from parallel_pandas_spark.operators.similarity import recall_at_k

    sf = "/root/testdata/sf0.01"
    exact = em.cosine_topk_query(spark, sf)
    r_ivf = recall_at_k(em.ivf_store_topk_query(spark, sf), exact)
    r_pq = recall_at_k(em.cosine_ivfpq_topk_query(spark, sf), exact)
    assert r_ivf >= 0.5, r_ivf
    assert r_pq >= 0.3, r_pq
    # sanity: exact vs itself is perfect, and disjoint results score 0
    assert recall_at_k(exact, exact) == 1.0


def test_maint_arm_registered_not_new_entry():
    qs = em.queries()
    assert len(qs) == 50
    assert "ivf_maint_topk" not in qs  # fused as an arm, not a 51st entry
    assert [t for t, _ in qs["ivf_topk"].__arms__] == [
        "inflight", "store", "maint", "tuned"]  # tuned: r15
    assert [t for t, _ in qs["cosine_topk"].__arms__] == [
        "exact", "quant", "quantstore", "pq", "ivfpq", "opq"]


# ------------------------------------------------------------- OPQ (r13)


def _correlated_embeddings(spark, n=600, dim=64, seed=7):
    """A corpus where OPQ has something to learn: heavily anisotropic
    (a few dominant directions spread ACROSS PQ subspace boundaries),
    unlike the isotropic driver fixture where rotation is neutral."""
    import numpy as np

    rng = np.random.default_rng(seed)
    basis = np.linalg.qr(rng.standard_normal((dim, dim)))[0]
    scales = np.concatenate([np.full(8, 10.0), np.full(8, 3.0),
                             np.full(dim - 16, 0.3)])
    X = (rng.standard_normal((n, dim)) * scales) @ basis.T
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    rows = [(i, [float(v) for v in X[i]]) for i in range(n)]
    return X, spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")


def test_opq_train_orthogonal_and_monotone(spark):
    import numpy as np

    from parallel_pandas_spark.operators.similarity import opq_train

    X, _ = _correlated_embeddings(spark, n=400)
    R, errs = opq_train(X, m=8, ks=16, iters=6)
    assert np.allclose(R @ R.T, np.eye(64), atol=1e-9)
    for a, b in zip(errs, errs[1:]):
        assert b <= a + 1e-9, errs  # alternating minimization descends
    # the learned rotation beats identity on anisotropic data
    assert errs[-1] < errs[0] * 0.9, errs


def test_opq_store_roundtrip_and_recall_gain(spark, tmp_path):
    import numpy as np

    from parallel_pandas_spark.operators.similarity import (
        opq_train, recall_at_k,
    )
    from parallel_pandas_spark.operators.vecstore import (
        ivfpq_topk_from_store, read_rotation, write_ivfpq_store,
    )

    X, emb = _correlated_embeddings(spark)
    queries = emb.where(F.col("vec_id") < 12)
    exact = em.similarity.cosine_topk(
        emb, queries, "vec_id", "embedding", k=5)

    plain = str(tmp_path / "plain")
    write_ivfpq_store(emb, plain, "vec_id", "embedding", m=8, ks=16)
    r_plain = recall_at_k(
        ivfpq_topk_from_store(spark, plain, emb, queries, k=5, pool=50,
                              nprobe=16),
        exact,
    )

    R, _ = opq_train(X, m=8, ks=16, iters=6)
    opq = str(tmp_path / "opq")
    write_ivfpq_store(emb, opq, "vec_id", "embedding", m=8, ks=16,
                      rotation=R.tolist())
    got_R = read_rotation(opq)
    assert np.allclose(np.array(got_R), R)  # sidecar roundtrips
    r_opq = recall_at_k(
        ivfpq_topk_from_store(spark, opq, emb, queries, k=5, pool=50,
                              nprobe=16),
        exact,
    )
    # the learned rotation must not lose recall, and on anisotropic
    # data it should gain (strict on this seeded corpus)
    assert r_opq > r_plain, (r_opq, r_plain)


# ------------------------------------------- corpus-loop manifest (r13)


def test_manifest_is_the_commit_point(spark, tmp_path):
    """r12 verdict #7: readers resolve the single-file manifest, not
    directory listings — artifact directories written but not yet
    referenced by a manifest transaction (a crash before the atomic
    rename) are INVISIBLE to read-outs and compaction, and the next
    compaction's sweep garbage-collects them."""
    import glob as g
    import shutil

    from parallel_pandas_spark.operators import incremental, rollup
    from parallel_pandas_spark.streaming import corpus as sc

    spec = {"n_chars": (0, 0)}
    rows = [(i, "en" if i % 2 else "fr", 100 + i, f"f{i}")
            for i in range(1, 30)]
    base_di = spark.createDataFrame(
        rows, "doc_id long, lang string, n_chars long, fp string")
    base_co = incremental.keepers(base_di)
    di_p, co_p = str(tmp_path / "di"), str(tmp_path / "co")
    base_di.write.parquet(di_p)
    base_co.write.parquet(co_p)
    base_state = rollup.agg_state(spark.read.parquet(co_p), ["lang"], spec)
    feed_dir = str(tmp_path / "changes")
    spark.createDataFrame(
        [(40, "de", 7, "f40", 10, "U")], sc.DOC_CHANGES_SCHEMA
    ).coalesce(1).write.parquet(feed_dir)
    work, ckpt = str(tmp_path / "work"), str(tmp_path / "ckpt")
    sc.run_corpus_refresh_stream(
        spark, lambda: sc.stream_doc_changes(spark, feed_dir, max_files=1),
        di_p, co_p, work, ckpt, spec)
    assert os.path.isfile(os.path.join(work, "_MANIFEST.json"))
    before = {
        r["lang"]: tuple(r)[1:]
        for r in sc.corpus_stream_readout(
            spark, base_state, work, spec)[2].collect()
    }
    assert "de" in before

    # fabricate a crash-before-commit: a NEWER batch's dirs exist (full
    # Spark writes, _SUCCESS and all) but no manifest references them
    for art in ("docindex", "corpus", "delta"):
        src = sorted(g.glob(os.path.join(work, art, "b*")))[-1]
        shutil.copytree(src, os.path.join(work, art, "b99999"))
    got = {
        r["lang"]: tuple(r)[1:]
        for r in sc.corpus_stream_readout(
            spark, base_state, work, spec)[2].collect()
    }
    assert got == before  # orphans invisible
    sc.compact_corpus_artifacts(spark, base_state, work, spec)
    for art in ("docindex", "corpus", "delta"):
        assert not os.path.isdir(os.path.join(work, art, "b99999")), art
    got = {
        r["lang"]: tuple(r)[1:]
        for r in sc.corpus_stream_readout(
            spark, base_state, work, spec)[2].collect()
    }
    assert got == before


def test_identity_rotation_bit_equals_no_rotation(spark, tmp_path):
    """rotation=I must be a pure no-op in VALUES (the fold multiplies
    by literal 1.0/0.0), proving rotation is a pre-transform and the
    downstream pipeline is untouched."""
    import numpy as np

    from parallel_pandas_spark.operators.vecstore import (
        ivfpq_topk_from_store, write_ivfpq_store,
    )

    _, emb = _correlated_embeddings(spark, n=300, seed=11)
    queries = emb.where(F.col("vec_id") < 8)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_ivfpq_store(emb, a, "vec_id", "embedding", m=8, ks=16)
    write_ivfpq_store(emb, b, "vec_id", "embedding", m=8, ks=16,
                      rotation=np.eye(64).tolist())
    ra = sorted(map(tuple, ivfpq_topk_from_store(
        spark, a, emb, queries, k=5).collect()))
    rb = sorted(map(tuple, ivfpq_topk_from_store(
        spark, b, emb, queries, k=5).collect()))
    assert ra == rb and len(ra) > 0
