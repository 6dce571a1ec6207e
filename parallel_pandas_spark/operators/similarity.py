"""Similarity search over embedding columns (array<float>).

Two tiers:
- ``cosine_topk``: brute-force exact top-k — the correctness baseline. The
  query side is broadcast (queries are small); the corpus is scanned once;
  per-group top-k uses a rank-pushdown window (WindowGroupLimit), so
  nothing bigger than k rows per query survives the shuffle.
- ``lsh_topk``: random-hyperplane LSH bucketing (multi-probe by Hamming
  radius on the bucket code) — the 100 TB path: each query probes a few
  buckets instead of the full corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """JVM-side dot product of two array columns (no UDF): zip_with +
    aggregate fold in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    include_self: bool = False,
    round_to: int = 6,
) -> DataFrame:
    """Exact brute-force cosine top-k: for every query vector, the k most
    similar corpus vectors. Output: (query_id, neighbor_id, cosine, rank).

    Plan shape: broadcast(queries) × corpus scan → cosine expression →
    row_number over (query) — one pass over the corpus regardless of the
    number of queries. Ranking uses the ROUNDED cosine with neighbor-id
    tiebreak: last-ulp cosine differences (engine-dependent fold order)
    must not flip ranks, or the top-k set itself becomes engine-dependent.
    """
    # norms are per-ROW quantities: computing them before the join does
    # one fold per row instead of one per (query × corpus) pair — the
    # pairwise work drops from 3 array folds to 1 (the dot product).
    # FP-identical to cosine(): same values, same qn*cn multiply order.
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        l2_norm(F.col(vec_col)).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        l2_norm(F.col(vec_col)).alias("cn"),
    )
    joined = c.crossJoin(F.broadcast(q))
    if not include_self:
        joined = joined.where(F.col("query_id") != F.col("neighbor_id"))
    scored = joined.select(
        "query_id",
        "neighbor_id",
        F.round(
            dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), round_to
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


def rotate_vectors(vec: Column, R) -> Column:
    """``v @ R`` as a JVM expression: a :func:`dot` fold per output
    component against the literal columns of ``R`` — the SAME sequential
    double arithmetic as the ``_DOT_SQL`` oracle twin, so rotated values
    are bit-identical in Spark and DuckDB (an np.dot rotation would
    round differently and could flip encode argmins). Shaped as ONE
    ``transform`` over a single 2-D literal rather than 64 independent
    fold expressions: the naive form is a ~500k-node expression tree
    that costs Catalyst seconds of DRIVER time per job regardless of
    row count (measured: the opq arm at ~10 s with either corpus- or
    candidate-sized rotation — analysis-bound, not data-bound)."""
    d = len(R)
    # ONE Literal node of array<array<double>>, MEMOIZED by content:
    # building it from d*d F.lit scalars costs Catalyst seconds per job
    # (4096 expression nodes), and even the single nested F.lit costs
    # ~2 s of py4j list conversion per call on a 64-dim matrix — the
    # literal is plan-agnostic, so one JVM object serves every query
    # keyed by the VALUE tuple (a hash() key could collide and silently
    # serve another rotation) and ATTACHED to the live SparkSession —
    # the cached Column is bound to the creating JVM gateway, and a
    # session-held dict dies with its session (an id()-keyed global
    # could be revived by CPython reusing the freed address)
    from pyspark.sql import SparkSession

    sess = SparkSession.getActiveSession()
    cache = (
        _ROTATION_LIT_CACHE if sess is None
        else sess.__dict__.setdefault("_pps_rotation_lit_cache", {})
    )
    key = tuple(tuple(float(x) for x in row) for row in R)
    cols = cache.get(key)
    if cols is None:
        cols = F.lit([[float(R[i][j]) for i in range(d)] for j in range(d)])
        cache[key] = cols
    return F.transform(cols, lambda c: dot(vec, c))


_ROTATION_LIT_CACHE: dict = {}


def seeded_rotation(dim: int, seed: int):
    """Deterministic random orthogonal matrix (QR of a seeded Gaussian,
    columns sign-canonicalized) — the data-independent stand-in the
    driver arm uses so its SQL oracle can embed the rotation as
    LITERALS fixed at import time; :func:`opq_train`'s learned rotation
    slots into the same sidecar unchanged (the established seeded-
    stand-in idiom: md5-sampled quantizers vs trained k-means)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    q, r = np.linalg.qr(rng.standard_normal((dim, dim)))
    return q * np.sign(np.diag(r))


def opq_train(X, m: int, ks: int, iters: int = 8):
    """OPQ rotation (public: Ge et al., "Optimized Product
    Quantization", CVPR 2013) by alternating optimization on a BOUNDED
    driver-side sample (the same class as PQ codebook fitting): fix R,
    fit per-subspace codebooks on X·R and encode; fix codes, solve the
    orthogonal Procrustes problem R = U·Vᵀ from SVD(Xᵀ·Y) where Y is
    the reconstruction. Returns (R, per-iteration reconstruction MSE) —
    the error sequence is non-increasing, pinned in tests. On an
    isotropic corpus the gain is ~zero by symmetry (rotation-invariant
    distribution); the win appears when subspace variances are
    unbalanced."""
    import numpy as np

    X = np.asarray(X, dtype=np.float64)
    n, dim = X.shape
    if dim % m != 0:
        raise ValueError(
            f"opq_train: dim={dim} not divisible by m={m} — trailing "
            "dims would be unquantized and the Procrustes target "
            "undefined for them"
        )
    dsub = dim // m
    R = np.eye(dim)
    Z = X @ R
    # persistent codebooks (init: first ks sample rows per subspace) —
    # re-initializing per iteration would break the alternating-
    # minimization monotonicity the test pins
    cb = [Z[:ks, s * dsub:(s + 1) * dsub].copy() for s in range(m)]
    errs = []
    for _ in range(max(1, iters)):
        Z = X @ R
        Y = np.empty_like(Z)
        err = 0.0
        for s in range(m):
            sub = Z[:, s * dsub:(s + 1) * dsub]
            d2 = ((sub[:, None, :] - cb[s][None, :, :]) ** 2).sum(axis=2)
            code = d2.argmin(axis=1)
            # Lloyd mean update (empty codes keep their centroid)
            for j in np.unique(code):
                cb[s][j] = sub[code == j].mean(axis=0)
            Y[:, s * dsub:(s + 1) * dsub] = cb[s][code]
            err += float(((sub - cb[s][code]) ** 2).sum())
        errs.append(err / n)
        u, _, vt = np.linalg.svd(X.T @ Y)
        R = u @ vt
    return R, errs


def structured_params(
    n_clusters: int = 10,
    dim: int = 64,
    alpha: float = 1.0,
    decay: float = 0.92,
    seed: int = 24,
) -> tuple:
    """The structured fixture's (centroid matrix, decay powers) as plain
    float lists — shared by :func:`structured_embeddings` (JVM literals),
    tools/gen_sf.py's numpy twin, and the driver oracle's DuckDB twin
    (r15): all three must use the SAME float64 values, so they come from
    one place. Decay powers by ITERATIVE multiply, not pow(): libm pow
    is not correctly rounded and Python/numpy disagree in the last ulp
    on 25 of 64 dims — cumulative products are bit-identical
    everywhere."""
    import numpy as np

    rng = np.random.default_rng(seed)
    mu = rng.standard_normal((n_clusters, dim))
    mu /= np.linalg.norm(mu, axis=1, keepdims=True)
    powers, p = [], 1.0
    for _ in range(dim):
        powers.append(float(alpha * p))
        p *= decay
    return [[float(x) for x in row] for row in mu], powers


def structured_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    out_col: str = "embedding_s",
    n_clusters: int = 10,
    dim: int = 64,
    alpha: float = 1.0,
    decay: float = 0.92,
    seed: int = 24,
) -> DataFrame:
    """Deterministic clustered + anisotropic embedding column DERIVED
    from an isotropic one — the structured ANN fixture (r13 verdict #1:
    on the driver's uniform vectors every ANN arm's recall is
    intrinsically marginal, so probe counts can't be tuned against it).

    ``out = mu[label % n_clusters] + alpha * (vec ⊙ decay^d)``: the
    seeded unit centroids give CLUSTER structure (10 centroids in
    64-dim are near-orthogonal, so same-label rows are true neighbors),
    and the geometric per-dimension decay gives ANISOTROPY — subspace
    variance falls ~decay^(2·dsub) per PQ subspace, the regime where
    OPQ's balanced rotation beats identity-PQ (Ge et al. 2013 §4). The
    result is intentionally NOT re-normalized: every consumer is
    cosine- or rank-equivalent-L2-based, both invariant to the ~±5%
    norm spread, and a normalize would either re-evaluate the row norm
    per element inside ``transform`` or need an extra shuffle-visible
    projection.

    Pure JVM expressions over one literal centroid matrix — a
    projection, no Python workers, no extra storage at any scale; works
    unchanged on the read-only driver fixtures."""
    mu, powers = structured_params(n_clusters, dim, alpha, decay, seed)
    mu_lit = F.lit(mu)
    scale = F.lit(powers)
    # pmod, not %: Spark's % keeps the dividend's sign (numpy's doesn't),
    # so a negative label would error (index 0) or silently diverge from
    # the gen_sf numpy twin
    base = F.element_at(
        mu_lit, F.pmod(F.col(label_col), F.lit(n_clusters)).cast("int")
        + F.lit(1)
    )
    noise = F.zip_with(
        F.col(vec_col).cast("array<double>"), scale, lambda v, s: v * s
    )
    return df.withColumn(
        out_col, F.zip_with(base, noise, lambda a, b: a + b)
    )


def tune_lsh_probes(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_planes: int = 6,
    target_recall: float = 0.9,
    seed: int = 42,
    dim: int | None = None,
    _per_candidate: bool = False,
) -> dict:
    """Recall-targeted multi-probe depth for :func:`lsh_topk` (r13
    verdict #2): evaluate ``probe_hamming`` in {0, 1, 2} ascending
    against the exact top-k on the SAME queries and return the first
    depth whose sampled recall clears ``target_recall`` — with the
    probed bucket fraction it costs, so the caller sees the
    recall/scan-cost trade explicitly. Each depth probes
    1 / 1+P / 1+P+C(P,2) of the 2^P buckets.

    Single-pass (r16, the tune_probes closure applied here): candidate
    sets are nested in depth (hamming <= d) and the re-rank is exact
    under the shared (cosine DESC, id ASC) order, so an exact-top-k
    member is in the approximate top-k at every depth >= the Hamming
    distance between its bucket and the query's — any candidate that
    outranks it is itself in the exact top-k. The whole recall-vs-depth
    curve therefore falls out of ONE job (exact top-k joined with both
    sides' bucket codes), replacing one lsh_topk scoring job per depth.
    ``_per_candidate=True`` runs the per-depth reference loop, pinned
    equal in tests."""
    import numpy as np

    exact = cosine_topk(corpus, queries, id_col, vec_col, k=k)
    if dim is None:
        first = corpus.select(F.size(vec_col).alias("d")).first()
        dim = first["d"] if first is not None else 0
    planes = np.random.default_rng(seed).standard_normal((num_planes, dim))
    n_buckets = float(2**num_planes)

    def _frac(depth: int) -> float:
        probes = 1.0
        if depth >= 1:
            probes += num_planes
        if depth >= 2:
            probes += num_planes * (num_planes - 1) / 2
        return min(1.0, probes / n_buckets)

    if not _per_candidate:
        cb = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            _bucket_expr(F.col(vec_col), planes).alias("__nb"),
        )
        qb = queries.select(
            F.col(id_col).alias("query_id"),
            _bucket_expr(F.col(vec_col), planes).alias("__qb"),
        )
        rows = (
            exact.select("query_id", "neighbor_id")
            .join(cb, "neighbor_id")
            .join(F.broadcast(qb), "query_id")
            .select(
                "query_id",
                F.bit_count(
                    F.col("__qb").cast("long").bitwiseXOR(
                        F.col("__nb").cast("long")
                    )
                ).alias("__ham"),
            )
            .collect()
        )
        n_exact: dict = {}
        hams: dict = {}
        for r in rows:
            qid = r["query_id"]
            n_exact[qid] = n_exact.get(qid, 0) + 1
            hams.setdefault(qid, []).append(int(r["__ham"]))
        evaluated, best = [], None
        for depth in (0, 1, 2):
            per = [
                sum(1 for h in hams.get(qid, []) if h <= depth) / n
                for qid, n in n_exact.items()
            ]
            rec = sum(per) / len(per) if per else float("nan")
            evaluated.append({
                "probe_hamming": depth, "recall": rec,
                "probed_fraction": _frac(depth),
            })
            if rec >= target_recall:
                best = evaluated[-1]
                break
        chosen = best or evaluated[-1]
        return {
            "probe_hamming": chosen["probe_hamming"],
            "recall": chosen["recall"],
            "probed_fraction": chosen["probed_fraction"],
            "hit_target": best is not None,
            "evaluated": evaluated,
        }

    evaluated = []
    best = None
    for depth in (0, 1, 2):
        approx = lsh_topk(
            corpus, queries, id_col, vec_col, k=k,
            num_planes=num_planes, probe_hamming=depth, seed=seed, dim=dim,
        )
        r = recall_at_k(approx, exact)
        evaluated.append(
            {"probe_hamming": depth, "recall": r,
             "probed_fraction": _frac(depth)}
        )
        if r >= target_recall:
            best = evaluated[-1]
            break
    return {
        "probe_hamming": (best or evaluated[-1])["probe_hamming"],
        "recall": (best or evaluated[-1])["recall"],
        "probed_fraction": (best or evaluated[-1])["probed_fraction"],
        "hit_target": best is not None,
        "evaluated": evaluated,
    }


def recall_at_k(approx: DataFrame, exact: DataFrame,
                query_col: str = "query_id",
                id_col: str = "neighbor_id") -> float:
    """Measured recall@k of an ANN result against the exact top-k on the
    same queries: mean over queries of |approx ∩ exact| / |exact|. Both
    inputs are (query_col, id_col[, ...]) top-k frames whose ties broke
    identically (both paths order by score DESC, id ASC), so the set
    comparison is fair. The gauge nprobe tuning needs at 100 TB — an
    aggregate over two k-row-per-query frames, returned as one scalar
    (r12 VERDICT #3: without it, probe counts are tuned blind)."""
    hits = (
        approx.select(query_col, id_col)
        .join(exact.select(query_col, id_col), [query_col, id_col],
              "left_semi")
        .groupBy(query_col)
        .agg(F.count("*").alias("__h"))
    )
    per = (
        exact.groupBy(query_col)
        .agg(F.count("*").alias("__n"))
        .join(hits, query_col, "left")
        .select(
            (F.coalesce(F.col("__h"), F.lit(0)) / F.col("__n")).alias("__r")
        )
    )
    row = per.agg(F.avg("__r")).first()
    return float(row[0]) if row[0] is not None else float("nan")


def _bucket_expr(vec: Column, planes) -> Column:
    bits = []
    for p, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        d = dot(vec, arr)
        bits.append(F.when(d >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    out = bits[0]
    for e in bits[1:]:
        out = out + e
    return out


def ivf_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_centroids: int = 16,
) -> list[tuple[int, list[float]]]:
    """Deterministic IVF coarse quantizer: the ``num_centroids`` corpus
    vectors with smallest md5(id) — a seeded pseudo-random sample any
    engine can reproduce. (A trained k-means quantizer slots in here
    unchanged; the index structure below is what matters.)"""
    rows = (
        corpus.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")))
        .limit(num_centroids)
        .collect()
    )
    return [(int(r[id_col]), [float(x) for x in r[vec_col]]) for r in rows]


def _cent_dist(vec: Column, cvec: list[float]) -> Column:
    """Rank-equivalent L2 distance to a literal centroid:
    −2·v·c + ‖c‖² (the ‖v‖² term is constant per row and drops out)."""
    arr = F.array(*[F.lit(float(x)) for x in cvec])
    cc = float(sum(x * x for x in cvec))
    return F.lit(-2.0) * dot(vec, arr) + F.lit(cc)


def ivf_assign(vec: Column, cents: list[tuple[int, list[float]]]) -> Column:
    """Nearest-centroid id (argmin via least-of-structs; ties → lowest
    centroid id, deterministically). A 0/1-centroid list degenerates
    gracefully (F.least needs >= 2 args)."""
    if not cents:
        return F.lit(None).cast("int")
    structs = [
        F.struct(_cent_dist(vec, cvec).alias("d"), F.lit(cid).alias("cid"))
        for cid, cvec in cents
    ]
    if len(structs) == 1:
        return F.lit(cents[0][0])
    return F.least(*structs).getField("cid")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_centroids: int = 16,
    nprobe: int = 4,
    round_to: int = 6,
) -> DataFrame:
    """IVF-flat approximate top-k — the inverted-file scale path: corpus
    vectors are bucketed into ``num_centroids`` cells by nearest centroid;
    each query probes its ``nprobe`` nearest cells and exact cosine
    re-ranks only those candidates — cost per query ≈
    |corpus|·nprobe/num_centroids instead of |corpus|.

    One cell column per corpus row (16 literal dot products, JVM-side),
    probe cells per query via sorted centroid distances, candidate join on
    the cell id (uniform-ish, broadcastable query side)."""
    cents = ivf_centroids(corpus, id_col, vec_col, num_centroids)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        l2_norm(F.col(vec_col)).alias("cn"),
        ivf_assign(F.col(vec_col), cents).alias("cell"),
    )
    probe_structs = F.array(
        *[
            F.struct(_cent_dist(F.col(vec_col), cvec).alias("d"), F.lit(cid).alias("cid"))
            for cid, cvec in cents
        ]
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        l2_norm(F.col(vec_col)).alias("qn"),
        F.explode(
            F.slice(F.array_sort(probe_structs), 1, nprobe)
        ).alias("p"),
    ).select("query_id", "qv", "qn", F.col("p.cid").alias("cell"))

    joined = c.join(F.broadcast(q), "cell").where(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = joined.select(
        "query_id",
        "neighbor_id",
        F.round(
            dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), round_to
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


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_planes: int = 6,
    probe_hamming: int = 1,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: random-hyperplane buckets + multi-probe.

    Corpus rows land in one bucket each; each query probes its own bucket
    plus all buckets within Hamming distance ``probe_hamming`` of its code
    (multi-probe LSH), then exact cosine ranks the candidates. Recall is
    tunable via num_planes/probe_hamming; cost per query is
    |corpus| / 2^num_planes × probes instead of |corpus|.

    Pass ``dim`` when known (inferring costs an eager job; an empty corpus
    returns an empty result instead of raising)."""
    import numpy as np

    if dim is None:
        first = corpus.select(F.size(vec_col).alias("d")).first()
        if first is None:
            return corpus.sparkSession.createDataFrame(
                [], "query_id long, neighbor_id long, cosine double, rank int"
            )
        dim = first["d"]
    planes = np.random.default_rng(seed).standard_normal((num_planes, dim))

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        l2_norm(F.col(vec_col)).alias("cn"),
        _bucket_expr(F.col(vec_col), planes).alias("bucket"),
    )
    # query probes: own bucket + neighbors within hamming radius
    if probe_hamming > 2:
        raise NotImplementedError(
            f"probe_hamming={probe_hamming}: radii above 2 are not "
            "implemented (probe count grows as C(num_planes, r)); raise "
            "recall with more bands/planes instead of silently capping"
        )
    probes = [0]
    if probe_hamming >= 1:
        probes += [1 << i for i in range(num_planes)]
    if probe_hamming >= 2:
        probes += [
            (1 << i) | (1 << j)
            for i in range(num_planes)
            for j in range(i + 1, num_planes)
        ]
    # compute the bucket code ONCE per query row, then XOR the literal
    # probe masks over it (the previous form re-evaluated the full
    # num_planes-dot-product bucket expression per probe mask —
    # 1+n+C(n,2) times the per-row cost)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        l2_norm(F.col(vec_col)).alias("qn"),
        _bucket_expr(F.col(vec_col), planes).alias("__code"),
    ).select(
        "query_id", "qv", "qn",
        F.explode(
            F.array(*[F.col("__code").bitwiseXOR(F.lit(m)) for m in probes])
        ).alias("bucket"),
    )
    joined = c.join(F.broadcast(q), "bucket").where(
        F.col("query_id") != F.col("neighbor_id")
    )
    # rank on the ROUNDED cosine (same contract as cosine_topk): last-ulp
    # fold-order differences must not flip ranks between engines.
    # No dedup needed: a corpus row lives in exactly ONE bucket and the
    # probe masks are distinct, so XOR against a fixed code yields
    # distinct buckets — each (query, neighbor) pair joins at most once
    # (the former dropDuplicates was a pure extra shuffle).
    scored = joined.select(
        "query_id",
        "neighbor_id",
        F.round(
            dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6
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


def pq_codebooks(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ks: int = 16,
    dim: int = 64,
    iters: int = 0,
    sample: int = 2048,
) -> list:
    """Product-quantization codebooks: ``m`` subspaces × ``ks`` centroids
    of ``dim/m`` dims each (≤ m·ks vectors driver-side — the same bounded
    collect as :func:`ivf_centroids`).

    ``iters=0`` (default): the ks md5-smallest corpus vectors sliced into
    subvectors — a deterministic seeded sample ANY engine can replay
    (the SQL oracle re-derives it); ``iters>0``: Lloyd k-means refinement
    per subspace on an md5-bounded sample of ``sample`` vectors
    (deterministic init + fixed iteration count + numpy float64, so the
    result is reproducible — but not SQL-expressible; use it where
    recall matters more than oracle replay). Empty clusters keep their
    previous centroid."""
    import numpy as np

    # undecodable vectors (null / wrong-dimension / null-element) cannot
    # seed a codebook — filter BEFORE the md5 order so the sample is
    # well-defined. JVM-side, SQL-expressible predicates; the arm
    # fixtures are clean, so the SQL oracle's unfiltered sample matches.
    clean = corpus.where(
        F.col(vec_col).isNotNull()
        & (F.size(vec_col) == dim)
        & ~F.exists(F.col(vec_col), lambda x: x.isNull())
    )
    rows = (
        clean.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")))
        .limit(ks)
        .collect()
    )
    if not rows:
        raise ValueError("pq_codebooks: no decodable vectors in the corpus")
    base = np.array([[float(x) for x in r[vec_col]] for r in rows])
    dsub = dim // m
    books = [base[:, s * dsub : (s + 1) * dsub].copy() for s in range(m)]
    if iters > 0:
        srows = (
            clean.select(id_col, vec_col)
            .orderBy(F.md5(F.col(id_col).cast("string")))
            .limit(sample)
            .collect()
        )
        X = np.array([[float(x) for x in r[vec_col]] for r in srows])
        for s in range(m):
            Xs = X[:, s * dsub : (s + 1) * dsub]
            C = books[s]
            for _ in range(iters):
                d2 = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(-1)
                assign = d2.argmin(1)
                for cid in range(ks):
                    pts = Xs[assign == cid]
                    if len(pts):
                        C[cid] = pts.mean(0)
            books[s] = C
    return books


def pq_encode(
    corpus: DataFrame,
    books: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_prefix: str = "c",
) -> DataFrame:
    """Encode each vector into ``m`` sub-codes (argmin centroid per
    subspace) — ONE corpus scan, zero shuffles, pure JVM expressions:
    per subspace the rank-equivalent distance −2·x_sub·c + ‖c‖² over the
    sliced array (the :func:`ivf_assign` construction, so DuckDB's
    ``ROW_NUMBER() OVER (ORDER BY dist, cid)`` replays the selection
    bit-for-bit; ties break to the lowest cid in both engines). At
    dim=64/m=8/int codes this is the 100 TB store-side lever: 8 small
    ints per vector instead of 64 floats.

    Undecodable vectors (NULL / wrong-dimension / null-element) encode
    to NULL codes: every struct's dist field is NULL for them, and
    ``F.least`` over structs with NULL fields would otherwise pick an
    arbitrary-looking but valid cid — silently fabricating codes for
    vectors the documented dirty-input policy says to drop (r9 ADVICE)."""
    m = len(books)
    dsub = books[0].shape[1]
    dim = m * dsub
    undecodable = (
        F.col(vec_col).isNull()
        | (F.size(vec_col) != F.lit(dim))
        | F.exists(F.col(vec_col), lambda x: x.isNull())
    )
    cols = [F.col(id_col).alias("neighbor_id")]
    for s in range(m):
        sl = F.slice(F.col(vec_col), s * dsub + 1, dsub)
        structs = [
            F.struct(
                _cent_dist(sl, [float(x) for x in books[s][cid]]).alias("d"),
                F.lit(cid).alias("cid"),
            )
            for cid in range(len(books[s]))
        ]
        code = F.least(*structs).getField("cid")
        cols.append(
            F.when(undecodable, F.lit(None).cast("int"))
            .otherwise(code)
            .alias(f"{out_prefix}{s}")
        )
    return corpus.select(*cols)


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m: int = 8,
    ks: int = 16,
    dim: int = 64,
    pool: int = 50,
    iters: int = 0,
    round_to: int = 6,
    books: "list | None" = None,
) -> DataFrame:
    """PQ/ADC approximate top-k with EXACT re-rank — the
    product-quantization scale path beside IVF and LSH:

    1. fit codebooks (:func:`pq_codebooks`; bounded driver collect);
    2. encode the corpus (:func:`pq_encode`; one scan, no shuffle);
    3. ADC score: per query a lookup table LUT[s][code] = q_sub·c_sub is
       built ONCE driver-side with strict left-to-right sums (so DuckDB's
       ordered ``list_sum`` fold reproduces every double bit-for-bit) and
       shipped in a ``mapInPandas`` closure — scoring a corpus row is m
       table lookups + m−1 adds per query (vectorized numpy fancy
       indexing per Arrow batch) instead of a dim-length dot: the codes
       scan moves 8 ints/row where the exact arm moves 64 floats;
    4. keep the ``pool`` best candidates per query ordered by the RAW
       ADC cosine adc/√‖x̂‖² (the query-norm divisor is constant per
       query and cannot change the order, so no rounding is needed —
       both engines order bit-identical doubles);
    5. exact re-rank: join the pool pairs back to the full vectors and
       compute the same rounded cosine as :func:`cosine_topk` — output
       values are EXACT cosines, only the candidate set is approximate.

    NOTE: builds the codebooks and LUTs eagerly (bounded driver
    collects) at DataFrame-construction time, like the vectorized
    quantized scorer. Pass ``books`` to score with a FROZEN quantizer
    (fit elsewhere — e.g. on the full corpus while scoring a probed
    sub-corpus, the IVF-PQ parity contract) instead of fitting here;
    ``m``/``ks``/``iters`` are ignored then."""
    import numpy as np
    import pandas as pd

    if books is None and iters == 0:
        # codebook sample + query LUT rows in ONE driver job (r16
        # verdict #5: the two sequential bounded collects — md5-sample
        # then queries — were back-to-back fixed-cost jobs). The union
        # tags each branch; the codebook branch carries its md5 key so
        # the driver re-establishes exactly the order the standalone
        # ``orderBy(md5).limit(ks).collect()`` returned (same doubles,
        # same cid assignment — bit-identical books).
        clean = corpus.where(
            F.col(vec_col).isNotNull()
            & (F.size(vec_col) == dim)
            & ~F.exists(F.col(vec_col), lambda x: x.isNull())
        )
        cb_side = (
            clean.select(
                F.lit(0).alias("__side"),
                F.md5(F.col(id_col).cast("string")).alias("__ord"),
                F.col(id_col).alias("__id"),
                F.col(vec_col).alias("__v"),
            )
            .orderBy("__ord")
            .limit(ks)
        )
        q_side = queries.select(
            F.lit(1).alias("__side"),
            F.lit(None).cast("string").alias("__ord"),
            F.col(id_col).alias("__id"),
            F.col(vec_col).alias("__v"),
        )
        rows = cb_side.unionAll(q_side).collect()
        cb_rows = sorted(
            (r for r in rows if r["__side"] == 0),
            key=lambda r: r["__ord"],
        )
        if not cb_rows:
            raise ValueError(
                "pq_codebooks: no decodable vectors in the corpus"
            )
        base = np.array([[float(x) for x in r["__v"]] for r in cb_rows])
        dsub0 = dim // m
        books = [
            base[:, s * dsub0 : (s + 1) * dsub0].copy() for s in range(m)
        ]
        qrows = [(r["__id"], r["__v"]) for r in rows if r["__side"] == 1]
        m = len(books)
        dsub = dim // m
        books_np = [np.asarray(b, dtype=np.float64) for b in books]
        cn2v = _pq_cn2(books)
        qids, luts = _pq_luts_from_rows(qrows, books, dim)
    else:
        if books is None:
            books = pq_codebooks(
                corpus, id_col, vec_col, m=m, ks=ks, dim=dim, iters=iters
            )
        m = len(books)
        dsub = dim // m
        books_np = [np.asarray(b, dtype=np.float64) for b in books]
        cn2v = _pq_cn2(books)

        qids, luts = _pq_luts(queries, books, id_col, vec_col, dim)
    id_t = corpus.schema[id_col].dataType.simpleString()

    def adc_gen(batches):
        # encode + ADC fused in ONE Arrow pass (the JVM per-subspace
        # argmin was 128 interpreted HOF folds per row — found by the r9
        # bench). Bit-parity with the pq_encode expressions is kept by
        # _pq_encode_batch (see its docstring).
        for pdf in batches:
            n = len(pdf)
            if n == 0 or not qids:
                continue
            # null / wrong-dimension / null-element vectors can't be
            # encoded — drop them (an ANN store skips undecodable
            # vectors; the exact arm is the place for strict null
            # algebra). Null elements flatten to NaN on the Arrow
            # transfer, hence the JVM __hasnull flag.
            okm = pdf[vec_col].map(
                lambda v: v is not None and len(v) == dim
            ).to_numpy(dtype=bool) & ~pdf["__hasnull"].to_numpy(dtype=bool)
            if not okm.any():
                continue
            sub = pdf[okm]
            mat = np.array([list(v) for v in sub[vec_col]], dtype=np.float64)
            codes_list, rn2 = _pq_encode_batch(mat, books_np, cn2v)
            nid_arr = sub[id_col].to_numpy()
            for frame in _pq_adc_pool_frames(
                nid_arr, codes_list, rn2, qids, luts, m, pool
            ):
                yield frame

    pairs = corpus.select(
        id_col,
        vec_col,
        F.exists(F.col(vec_col), lambda x: x.isNull()).alias("__hasnull"),
    ).mapInPandas(
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
    # exact re-rank of the pool: same expressions as cosine_topk
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
    # BROADCAST the candidate set: it is ≤ queries × pool rows by
    # construction, while ``c`` is the full corpus — without the hint a
    # planner with stale stats could elect a full corpus shuffle against
    # ~400 rows at 100× scale (r9 VERDICT #3; plan-fenced in
    # tests/test_plan_shapes.py)
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


def _pq_cn2(books: list) -> list:
    """Centroid norm² per (subspace, code) with STRICT sequential sums —
    the same ((0+t0)+t1)+… association as the SQL oracle's list_sum, so
    every rn2 double is engine-reproducible."""
    import numpy as np

    m = len(books)
    cn2 = [[0.0] * len(books[s]) for s in range(m)]
    for s in range(m):
        for cid in range(len(books[s])):
            acc = 0.0
            for x in books[s][cid]:
                acc = acc + float(x) * float(x)
            cn2[s][cid] = acc
    return [np.array(row) for row in cn2]


def _pq_luts(queries: DataFrame, books: list, id_col: str, vec_col: str, dim: int):
    """Per-query ADC lookup tables LUT[s][code] = q_sub·c_sub, built
    driver-side with strict left-to-right sums (DuckDB's ordered
    list_sum fold reproduces every double). Undecodable queries
    (null / wrong-dimension / null-element) are DROPPED, matching the
    corpus-side policy — never a TypeError at plan-construction time.
    Returns (qids, luts)."""
    qrows = [
        (r[id_col], r[vec_col])
        for r in queries.select(id_col, vec_col).collect()  # query-sized
    ]
    return _pq_luts_from_rows(qrows, books, dim)


def _pq_luts_from_rows(qrows: list, books: list, dim: int):
    """:func:`_pq_luts` over ALREADY-collected ``(qid, vec)`` rows —
    callers that also need the query vectors for probe assignment /
    rotation collect ONCE and share (r16: the extra query-sized Spark
    jobs were pure fixed overhead). Same drop policy, same strict
    left-to-right sums."""
    import numpy as np

    m = len(books)
    dsub = books[0].shape[1]
    qrows = [
        (qid, v)
        for qid, v in qrows
        if v is not None
        and len(v) == dim
        and not any(x is None for x in v)
    ]
    qids = [qid for qid, _ in qrows]
    luts = []
    for _, v in qrows:
        qv = [float(x) for x in v]
        lut = np.zeros((m, max(len(b) for b in books)))
        for s in range(m):
            for cid in range(len(books[s])):
                acc = 0.0
                for j in range(dsub):
                    acc = acc + qv[s * dsub + j] * float(books[s][cid][j])
                lut[s][cid] = acc
        luts.append(lut)
    return qids, luts


def _pq_encode_batch(mat: "np.ndarray", books_np: list, cn2v: list):
    """Encode one batch of clean vectors: per-subspace argmin codes +
    reconstructed norm² rn2. Bit-parity with the pq_encode expressions
    is kept by accumulating the centroid dot SEQUENTIALLY over the dsub
    dims (vectorized across rows, ordered over j — the same
    ((0+t0)+t1)+… association as the F.aggregate fold and DuckDB's
    list_sum), then dist = −2·acc + cc with the same op order;
    np.argmin's first-minimum tiebreak is the (dist, cid) order.
    Returns (codes_list [m arrays of n codes], rn2 [n doubles])."""
    import numpy as np

    m = len(books_np)
    dsub = books_np[0].shape[1]
    n = mat.shape[0]
    codes_list = []
    rn2 = np.zeros(n)
    for s in range(m):
        xs = mat[:, s * dsub : (s + 1) * dsub]
        acc = np.zeros((n, len(books_np[s])))
        for j in range(dsub):
            acc += xs[:, j : j + 1] * books_np[s][:, j][None, :]
        dist = -2.0 * acc + cn2v[s][None, :]
        code = dist.argmin(1)
        codes_list.append(code)
        rn2 = rn2 + cn2v[s][code]
    return codes_list, rn2


def _pq_adc_pool_frames(nid_arr, codes_list, rn2, qids, luts, m, pool,
                        masks=None):
    """ADC-score one encoded batch against every query LUT and emit the
    per-(batch, query) lossless top-pool frames. The pool window orders
    by adc/√rn2 on exactly these doubles (same IEEE div/sqrt both
    sides), so keeping each batch's top ``pool`` rows by
    (score desc, id asc) — row_number's own order — cannot change the
    global pool. Shared by the fused scorer and the store-reading
    scorers (operators/vecstore.py). ``masks[qi]`` (optional bool array
    per query) restricts which batch rows a query may see — the IVF-PQ
    per-query probe-cell filter, applied BEFORE pooling so out-of-cell
    rows can never displace in-cell candidates from a batch pool."""
    import numpy as np
    import pandas as pd

    sq_rn2 = np.sqrt(rn2)
    for qi, qid in enumerate(qids):
        adc = luts[qi][0][codes_list[0]]
        for s in range(1, m):
            adc = adc + luts[qi][s][codes_list[s]]
        score = adc / sq_rn2
        score = np.where(np.isnan(score), np.inf, score)
        sel = nid_arr != qid  # self-pairs out first
        if masks is not None:
            sel = sel & masks[qi]
        valid = np.nonzero(sel)[0]
        order = valid[np.lexsort((nid_arr[valid], -score[valid]))[:pool]]
        yield pd.DataFrame(
            {
                "neighbor_id": nid_arr[order],
                "query_id": np.full(len(order), qid),
                "adc": adc[order],
                "rn2": rn2[order],
            }
        )


def _np_quantize(mat: "np.ndarray", qmax: float):
    """(scale, int32 codes) for a uniform-length float64 matrix — the
    numpy core shared by :func:`_quantize_arrow` and the fused scorer;
    bit-parity contract documented on _quantize_arrow."""
    import numpy as np

    s = np.abs(mat).max(axis=1)
    z = s == 0.0
    r = np.zeros_like(mat)
    np.divide(mat, s[:, None], out=r, where=~z[:, None])
    r *= qmax
    rounded = np.trunc(r + np.copysign(0.5, r))
    rounded[np.isnan(rounded)] = 0.0
    cmat = rounded.astype(np.int32)
    cmat[z] = 0
    return s, cmat


def _quantize_arrow(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    bits: int = 8,
    with_norm: bool = False,
) -> DataFrame:
    """Arrow-vectorized twin of :func:`quantize_embeddings`: one numpy
    pass per batch instead of an interpreted HOF transform per row —
    BIT-IDENTICAL output (pinned in tests):

    - the per-element value is computed as ``(x / s) * qmax`` in float64,
      the same IEEE ops in the same order as the Spark expression;
    - Spark's ``F.round(_, 0)`` is HALF_UP (ties away from zero), which
      ``trunc(r + copysign(0.5, r))`` reproduces EXACTLY for |r| < 128:
      a double of magnitude < 128 spans at most bits 2^6..2^-46, so
      adding 0.5 (2^-1) stays within 53 significant bits and the sum is
      exact — no boundary can be crossed by addition rounding;
    - NaN elements cast to 0 like Spark's non-ANSI double→int cast;
    - a NULL vector yields (scale NULL, codes NULL), an empty vector
      (scale NULL, codes []) — the HOF path's null algebra.

    CAVEAT — null ELEMENTS inside a vector: Arrow flattens them to NaN
    before this function can see them, so they get the NaN treatment
    (code 0) where the HOF path keeps a NULL code. The scorer paths
    recover the distinction with a JVM ``exists(isNull)`` flag computed
    before the transfer (see _quantized_scores_arrow); callers that need
    exact null-element codes should use :func:`quantize_embeddings`.

    ``with_norm=True`` appends ``norm`` = Σ code² as an exact
    integer-valued double (the :func:`_int_norm` fold), saving a second
    pass when the caller needs both."""
    import numpy as np
    import pandas as pd

    qmax = float((1 << (bits - 1)) - 1)
    id_t = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_t}, scale double, codes array<int>"
    if with_norm:
        schema += ", norm double"

    def gen(batches):
        for pdf in batches:
            n = len(pdf)
            # object columns keep the NULL/NaN distinction: a NULL vector
            # gives a NULL scale while a NaN element gives a NaN scale,
            # exactly like the HOF expressions (a Float64 masked array
            # would silently coerce NaN to NA)
            scale: list = [None] * n
            codes: list = [None] * n
            norm: list = [None] * n
            lengths = pdf[vec_col].map(lambda v: -1 if v is None else len(v))
            for length in lengths.unique():
                idx = np.nonzero((lengths == length).to_numpy())[0]
                if length == -1:
                    continue  # NULL vector -> all-NULL row
                if length == 0:
                    for i in idx:
                        codes[i] = []
                        norm[i] = 0.0
                    continue
                mat = np.array(
                    [list(v) for v in pdf[vec_col].iloc[idx]], dtype=np.float64
                )
                s, cmat = _np_quantize(mat, qmax)
                nrm = (cmat.astype(np.int64) ** 2).sum(axis=1).astype(np.float64)
                for j, i in enumerate(idx):
                    scale[i] = float(s[j])
                    codes[i] = cmat[j].tolist()
                    norm[i] = float(nrm[j])
            out = {id_col: pdf[id_col], "scale": scale, "codes": codes}
            if with_norm:
                out["norm"] = norm
            yield pd.DataFrame(out)

    return df.select(id_col, vec_col).mapInPandas(gen, schema)


def quantize_embeddings(
    df: DataFrame, id_col: str, vec_col: str, bits: int = 8
) -> DataFrame:
    """Symmetric per-vector scalar quantization — the storage-scale step of
    an embedding pipeline (int8 cuts an embedding store 4x vs float32).

    code_i = round(v_i / s * (2^(bits-1) − 1)) with s = max|v_i|;
    dequantize as code_i · s / (2^(bits-1) − 1). Zero vectors quantize to
    all-zero codes with scale 0 (no 0/0). Output: (id, scale, codes).

    One narrow scan, two folds per row (max, then the code transform) —
    no shuffle, no UDF. The scale is STAGED into its own projection
    before the code transform references it: higher-order functions run
    interpreted with no invariant hoisting, so an inline ``array_max``
    subtree inside the per-element lambda is re-evaluated for EVERY
    element — O(d²) per row (the same inline-HOF re-execution
    repetition_profile stages away; found by the r7 advice pass). As a
    staged column the lambda reads a bound attribute instead."""
    qmax = float((1 << (bits - 1)) - 1)
    v = F.col(vec_col)
    staged = df.select(
        F.col(id_col),
        v.alias("__v"),
        F.array_max(F.transform(v, lambda x: F.abs(x.cast("double")))).alias("scale"),
    )
    sc = F.col("scale")
    codes = F.when(
        sc == 0.0,
        F.transform(F.col("__v"), lambda x: F.lit(0).cast("int")),
    ).otherwise(
        F.transform(
            F.col("__v"),
            lambda x: F.round(x.cast("double") / sc * F.lit(qmax), 0).cast("int"),
        )
    )
    return staged.select(F.col(id_col), sc, codes.alias("codes"))


def quantized_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    bits: int = 8,
    round_to: int = 6,
    vectorized: bool = True,
) -> DataFrame:
    """Exact top-k over int8-quantized embeddings. The per-vector scales
    CANCEL in the cosine — cos(deq(a), deq(b)) = Σ qa·qb /
    (√Σqa² · √Σqb²) — so the whole score is integer dot products (exact
    on any engine) plus one correctly-rounded divide/sqrt: the quantized
    path is MORE engine-reproducible than the float one, on top of being
    4x smaller to store. Same broadcast-queries × one-corpus-scan plan as
    cosine_topk.

    ``vectorized=True`` (default) computes the pairwise integer dots as
    ONE int64 matrix multiply per Arrow batch (``mapInPandas`` against
    the collected query code matrix — a query-sized driver collect, same
    bound as the broadcast) instead of an interpreted zip_with fold per
    pair. NOTE: that collect runs EAGERLY — building this DataFrame with
    ``vectorized=True`` triggers a Spark job on the query side before
    the caller executes anything (a deliberate departure from lazy-plan
    semantics; use ``vectorized=False`` for speculative plan building).
    Integer matmul is exact, so the scores are bit-identical to the
    fold path (hypothesis-pinned in tests); at sf0.1 this turns the one
    HOF-interpreted per-pair fold the plan had left into BLAS. The
    divide/sqrt/round stay Spark-side so rounding semantics match the
    fold path exactly. ``vectorized=False`` keeps the pure-JVM fold —
    zero Python in the plan, for pipelines that need it."""
    if vectorized:
        # quantize + score FUSED into one Arrow pass over the raw corpus
        # (bit-identical to the HOF expressions — see _quantize_arrow /
        # _np_quantize); the query side collects RAW (a plain collect
        # preserves null ELEMENTS that Arrow would flatten to NaN) and
        # quantizes driver-side with the same numpy core
        scored = _quantized_scores_arrow(
            corpus, queries, round_to, bits=bits,
            id_col=id_col, vec_col=vec_col, prune_k=k,
        )
    else:
        q = quantize_embeddings(queries, id_col, vec_col, bits=bits).select(
            F.col(id_col).alias("query_id"),
            F.col("codes").alias("qc"),
            _int_norm(F.col("codes")).alias("qn"),
        )
        c = quantize_embeddings(corpus, id_col, vec_col, bits=bits).select(
            F.col(id_col).alias("neighbor_id"),
            F.col("codes").alias("cc"),
            _int_norm(F.col("codes")).alias("cn"),
        )
        joined = c.crossJoin(F.broadcast(q)).where(
            F.col("query_id") != F.col("neighbor_id")
        )
        idot = F.aggregate(
            F.zip_with(F.col("qc"), F.col("cc"), lambda a, b: (a * b).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        scored = joined.select(
            "query_id",
            "neighbor_id",
            F.round(
                idot.cast("double") / (F.sqrt(F.col("qn")) * F.sqrt(F.col("cn"))),
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


def _quantized_scores_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    round_to: int,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    prune_k: int | None = None,
) -> DataFrame:
    """(neighbor, query, qcosine): quantize + int64 matmul FUSED in one
    Arrow pass per corpus batch (r9 — the two-stage quantize-then-score
    pipeline paid a second Arrow roundtrip that kept the quant arm above
    the exact arm in the bench).

    ``c`` carries the RAW corpus (neighbor_id, ``vec_col``); each batch
    is quantized with the same numpy core as :func:`_quantize_arrow`
    (bit-parity with the HOF expressions pinned in tests) and scored
    immediately. The query side collects to the driver EAGERLY — at
    DataFrame-construction time, before the caller runs any action (same
    query-sized bound as the broadcast in the fold path) — and ships in
    the UDF closure already quantized. Only integer math runs in numpy —
    exact, engine-independent — while the divide/sqrt/round happen in
    Spark expressions identical to the fold path, so both paths produce
    the same bits.

    Dirty-corpus semantics match the fold path (r8 ADVICE): a null or
    ragged (wrong-dimension) corpus vector yields a NULL idot → NULL
    qcosine for its pairs, never a TypeError from the matmul.

    ``prune_k``: LOSSLESS map-side top-k (r9 — the 100 TB lever: the
    shuffle then moves ≈k rows per query per batch instead of the full
    n×m pair expansion). Per batch and query, keep every row whose RAW
    score is within one rounding quantum (10^−round_to, plus fp slack)
    of the batch's k-th best — after rounding, a dropped row can neither
    exceed nor TIE a kept k-th row, so the global top-k over the kept
    union equals the top-k over all pairs, including neighbor-id
    tiebreaks. NULL-score pairs (dirty vectors / null queries) keep
    their k+1 smallest neighbor ids per batch — k+1, not k, because the
    self-pair filter runs AFTER this truncation: when a query's own
    corpus vector is dirty and among the k smallest bad ids, one kept
    row is the self-pair (dropped downstream), and the k-th smallest
    non-self bad id must still be in the kept set (r9 ADVICE, medium) —
    preserving the nulls-last-by-id tail when fewer than k real
    candidates exist."""
    import numpy as np
    import pandas as pd

    qmax = float((1 << (bits - 1)) - 1)
    qids, qmat, qns, qok, d = _collect_quantized_queries(
        queries, id_col, vec_col, qmax
    )
    id_t = corpus.schema[id_col].dataType.simpleString()
    # null ELEMENTS inside corpus vectors flatten to NaN on the Arrow
    # transfer (indistinguishable from a real NaN in the UDF), so the
    # fold path's NULL-vs-NaN distinction is recovered with a JVM flag
    # computed BEFORE the transfer
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        vec_col,
        F.exists(F.col(vec_col), lambda x: x.isNull()).alias("__hasnull"),
    )

    band = 10.0 ** (-round_to) + 1e-12

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0 or len(qids) == 0:
                # no corpus rows in the batch / no queries at all: an
                # empty query matrix has shape (0,), which would break
                # the matmul — there are simply no pairs to emit
                continue
            # null / ragged / null-element corpus vectors can't enter the
            # matmul; their pairs get a NULL idot (the zip_with fold
            # path's semantics — a null, length-mismatched, or
            # null-element array folds to null). The null-element case
            # rides the JVM __hasnull flag (see above).
            cok = pdf[vec_col].map(
                lambda v: v is not None and len(v) == d
            ).to_numpy(dtype=bool) & ~pdf["__hasnull"].to_numpy(dtype=bool)
            n = len(pdf)
            m = len(qids)
            cn = np.full(n, np.nan)
            if cok.any() and qok.any():
                mat = np.array(
                    [list(v) for v in pdf[vec_col][cok]], dtype=np.float64
                )  # n_ok×d
                _, cmat = _np_quantize(mat, qmax)
                cmat64 = cmat.astype(np.int64)
                cn[cok] = (cmat64**2).sum(axis=1).astype(np.float64)
                good = cmat64 @ qmat.T  # exact int64 (|code|<=127, d bounded)
            else:
                good = np.empty((int(cok.sum()), int(qok.sum())), dtype=np.int64)
            nids = pdf["neighbor_id"].to_numpy()
            frame = _pairs_frame(
                nids, cn, cok, good, qids, qns, qok, prune_k, band
            )
            if frame is not None:
                yield frame

    pairs = c.mapInPandas(
        gen, f"neighbor_id {id_t}, cn double, query_id {id_t}, qn double, idot long"
    ).where(F.col("query_id") != F.col("neighbor_id"))
    return pairs.select(
        "query_id",
        "neighbor_id",
        F.round(
            F.col("idot").cast("double") / (F.sqrt(F.col("qn")) * F.sqrt(F.col("cn"))),
            round_to,
        ).alias("qcosine"),
    )


def _collect_quantized_queries(
    queries: DataFrame, id_col: str, vec_col: str, qmax: float
):
    """Driver-side query collection + quantization shared by the fused
    scorer and the store-reading scorer (operators/vecstore.py) — one
    implementation so both paths are bit-identical by construction.
    Returns (qids, qmat int64 m_ok×d, qns, qok, d). The collect is
    query-sized (the same bound as the broadcast in the fold path) and
    EAGER — it runs at DataFrame-construction time."""
    import numpy as np

    qrows = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).collect()  # query-sized; a plain collect preserves null ELEMENTS
    qids = np.array([r["query_id"] for r in qrows])  # id dtype preserved
    qdims = {len(r["qv"]) for r in qrows if r["qv"] is not None}
    if len(qdims) > 1:
        raise ValueError(
            "quantized top-k (vectorized) needs a fixed query "
            f"embedding dimension, got lengths {sorted(qdims)}; use "
            "vectorized=False for ragged query vectors"
        )
    d = qdims.pop() if qdims else 0
    # null-vector queries — and queries with a null ELEMENT, which the
    # fold path also scores NULL (a null code survives the zip_with) —
    # can't enter the matmul; they produce NULL idots for all pairs
    qok = np.array(
        [
            r["qv"] is not None and not any(x is None for x in r["qv"])
            for r in qrows
        ],
        dtype=bool,
    )
    if qok.any():
        qmat_f = np.array(
            [[float(x) for x in r["qv"]] for r, ok in zip(qrows, qok) if ok],
            dtype=np.float64,
        )
        _, qcodes = _np_quantize(qmat_f, qmax)
        qmat = qcodes.astype(np.int64)  # m_ok×d
        qn_ok = (qmat**2).sum(axis=1).astype(np.float64)
    else:
        qmat = np.empty((0, 0), dtype=np.int64)
        qn_ok = np.empty(0)
    # qn ships in the closure and is tiled into the output alongside cn —
    # re-deriving it with a broadcast join would quantize the query side
    # a second time at execution (review finding)
    qns = np.full(len(qrows), np.nan)
    qns[qok] = qn_ok
    return qids, qmat, qns, qok, d


def _pairs_frame(nids, cn, cok, good, qids, qns, qok, prune_k, band):
    """One Arrow batch's scored (neighbor, query, idot) pairs as a pandas
    frame — the emission half of the fused scorer, shared verbatim with
    the store-reading scorer so the lossless map-side prune and the
    NULL-tail semantics are single-sourced. ``good`` is the exact int64
    dot matrix over the CLEAN rows (cok) × CLEAN queries (qok); see
    :func:`_quantized_scores_arrow` for the prune-losslessness proof.
    Returns None when the batch contributes no pairs."""
    import numpy as np
    import pandas as pd

    n, m = len(nids), len(qids)
    if prune_k is None:
        idot = pd.array(np.zeros(n * m, dtype=np.int64), dtype="Int64")
        pair_ok = np.repeat(cok, m) & np.tile(qok, n)
        idot[~pair_ok] = pd.NA
        idot[pair_ok] = good.reshape(-1)
        return pd.DataFrame(
            {
                "neighbor_id": np.repeat(nids, m),
                "cn": np.repeat(cn, m),
                "query_id": np.tile(qids, n),
                "qn": np.tile(qns, n),
                "idot": idot,
            }
        )
    # --- lossless map-side top-k (see _quantized_scores_arrow) ----------
    kk = prune_k
    nid_ok = nids[cok]
    cn_ok = cn[cok]
    denom_c = np.sqrt(cn_ok)
    bad_idx = np.nonzero(~cok)[0]
    # kk+1, NOT kk: the shared tail is built once for all queries
    # and the self-pair filter runs after truncation — if a
    # query's own (dirty) row is among the kk smallest bad ids,
    # the non-self tail would otherwise lose its kk-th id and the
    # vectorized path would diverge from the fold path whenever
    # the global top-k dips into the NULL tail (r9 ADVICE)
    if len(bad_idx) > kk + 1:
        order = np.argsort(nids[bad_idx], kind="stable")[: kk + 1]
        bad_keep = bad_idx[order]
    else:
        bad_keep = bad_idx
    qcol = np.cumsum(qok) - 1
    p_nid, p_cn, p_qid, p_qn = [], [], [], []
    p_ival, p_imask = [], []
    for qi in range(m):
        qid = qids[qi]
        if qok[qi] and len(nid_ok):
            ivals = good[:, qcol[qi]]
            raw = ivals.astype(np.float64) / (np.sqrt(qns[qi]) * denom_c)
            # NaN scores (0/0 from zero vectors) sort GREATEST in
            # Spark — treat as +inf so they are always kept
            raw = np.where(np.isnan(raw), np.inf, raw)
            self_mask = nid_ok == qid
            raw[self_mask] = -np.inf
            if raw.size > kk:
                th = np.partition(raw, raw.size - kk)[raw.size - kk]
                keep = (raw >= th - band) & ~self_mask
            else:
                keep = ~self_mask
            idx = np.nonzero(keep)[0]
            p_nid.append(nid_ok[idx])
            p_cn.append(cn_ok[idx])
            p_qid.append(np.full(len(idx), qid))
            p_qn.append(np.full(len(idx), qns[qi]))
            p_ival.append(ivals[idx])
            p_imask.append(np.zeros(len(idx), dtype=bool))
            # NULL-score tail: the k+1 smallest bad neighbor ids
            if len(bad_keep):
                p_nid.append(nids[bad_keep])
                p_cn.append(cn[bad_keep])
                p_qid.append(np.full(len(bad_keep), qid))
                p_qn.append(np.full(len(bad_keep), qns[qi]))
                p_ival.append(np.zeros(len(bad_keep), dtype=np.int64))
                p_imask.append(np.ones(len(bad_keep), dtype=bool))
        else:
            # null query (or no clean corpus rows): every pair is
            # NULL — keep the k smallest non-self neighbor ids
            non_self = nids[nids != qid]
            keep_ids = np.sort(non_self, kind="stable")[:kk]
            sel = np.nonzero(np.isin(nids, keep_ids) & (nids != qid))[0]
            p_nid.append(nids[sel])
            p_cn.append(cn[sel])
            p_qid.append(np.full(len(sel), qid))
            p_qn.append(np.full(len(sel), qns[qi]))
            p_ival.append(np.zeros(len(sel), dtype=np.int64))
            p_imask.append(np.ones(len(sel), dtype=bool))
    if not p_nid:
        return None
    idot = pd.arrays.IntegerArray(
        np.concatenate(p_ival).astype(np.int64),
        np.concatenate(p_imask),
    )
    return pd.DataFrame(
        {
            "neighbor_id": np.concatenate(p_nid),
            "cn": np.concatenate(p_cn),
            "query_id": np.concatenate(p_qid),
            "qn": np.concatenate(p_qn),
            "idot": idot,
        }
    )


def _int_norm(codes: Column) -> Column:
    """Σ code² as an exact long-backed double."""
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: acc + (x * x).cast("long"),
    ).cast("double")
