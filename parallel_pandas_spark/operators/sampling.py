"""Deterministic sampling for training-data pipelines.

Spark's ``df.sample()`` is seed-deterministic only for a FIXED partitioning
— add an executor or change file splits and the sample changes, which is
unacceptable for a 100 TB corpus that must reproduce across reruns,
engines, and cluster sizes. Every operator here gates rows on a pure
content hash (``dedup.md5_long``) instead: membership is a function of the
row's key alone, so the same rows survive on any layout, the selection is
one narrow expression (no shuffle, no UDF, whole-stage codegen around the
md5 call), and the DuckDB oracle replays it exactly.

The reference has no sampling surface (single-machine pandas users call
``df.sample``); these are part of the engine's LLM-pipeline extension the
same way dedup/similarity are: domain-stratified downsampling and
deterministic train/val/test splits are the first two operations of any
corpus build.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5_long

_DENOM = 1_000_000  # hash-gate resolution: fractions quantize to 1e-6


def _gate(id_cols: Sequence[str], seed: int) -> Column:
    """Uniform [0, 1e6) deterministic per-row draw from the key columns."""
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in id_cols])
    return F.pmod(md5_long(key, seed=seed), F.lit(_DENOM))


def _gate_sql(id_cols: Sequence[str], seed: int, hexfold) -> str:
    key = " || chr(31) || ".join(f"CAST({c} AS VARCHAR)" for c in id_cols)
    h = hexfold(f"md5('s{seed}:' || {key})")
    return f"(({h}) % {_DENOM})"


def hash_sample(
    df: DataFrame,
    id_cols: Sequence[str],
    fraction: float,
    seed: int = 0,
) -> DataFrame:
    """Deterministic Bernoulli sample: keep a row iff its key hashes under
    ``fraction`` — layout-independent, reproducible anywhere."""
    return df.where(_gate(id_cols, seed) < F.lit(int(fraction * _DENOM)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[object, float],
    id_cols: Sequence[str],
    default_fraction: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Per-stratum deterministic downsampling — e.g. cap an over-represented
    language/domain while keeping rare strata whole. ``fractions`` maps
    stratum value → keep fraction; unlisted strata keep
    ``default_fraction``. The per-row draw is shared across strata (one
    hash), and the threshold is a small CASE expression — no join, no
    shuffle, exact expected proportions per stratum."""
    thr: Column = F.lit(int(default_fraction * _DENOM))
    for val, frac in sorted(fractions.items(), key=lambda kv: str(kv[0])):
        thr = F.when(F.col(strata_col) == F.lit(val), F.lit(int(frac * _DENOM))).otherwise(thr)
    return df.where(_gate(id_cols, seed) < thr)


def resample_by_weight(
    df: DataFrame,
    strata_col: str,
    weights: dict[object, float],
    id_cols: Sequence[str],
    default_weight: float = 1.0,
    seed: int = 0,
    copy_col: str = "copy_id",
) -> DataFrame:
    """Deterministic domain mixing: stratum weight *w* yields an expected
    *w* copies of each row — ``floor(w)`` full copies plus one extra gated
    on the row hash with probability ``frac(w)``. Upsampling rare domains
    (w > 1) and downsampling dominant ones (w < 1) in one pass, entirely
    narrow (explode of a per-row literal-bounded sequence, no shuffle, no
    UDF); output carries ``copy_col`` ∈ [1, n_copies] so downstream dedup
    and packing can tell copies apart. Layout-independent and
    oracle-replayable like every operator in this module."""
    full = F.lit(int(default_weight))
    thr = F.lit(int(round((default_weight - int(default_weight)) * _DENOM)))
    for val, w in sorted(weights.items(), key=lambda kv: str(kv[0])):
        cond = F.col(strata_col) == F.lit(val)
        full = F.when(cond, F.lit(int(w))).otherwise(full)
        thr = F.when(cond, F.lit(int(round((w - int(w)) * _DENOM)))).otherwise(thr)
    extra = (_gate(id_cols, seed) < thr).cast("int")
    n = (full + extra).alias("__n_copies")
    return df.withColumn("__n", n).where(F.col("__n") >= 1).withColumn(
        copy_col, F.explode(F.sequence(F.lit(1), F.col("__n")))
    ).drop("__n")


def resample_by_weight_sql(
    strata_col: str,
    weights: dict[object, float],
    id_cols: Sequence[str],
    hexfold,
    default_weight: float = 1.0,
    seed: int = 0,
    copy_col: str = "copy_id",
) -> str:
    """DuckDB twin: emits a SELECT over ``__SRC__`` producing the same
    exploded copies with ``copy_col``."""
    full = str(int(default_weight))
    thr = str(int(round((default_weight - int(default_weight)) * _DENOM)))
    for val, w in sorted(weights.items(), key=lambda kv: str(kv[0])):
        full = f"CASE WHEN {strata_col} = '{val}' THEN {int(w)} ELSE {full} END"
        thr = (
            f"CASE WHEN {strata_col} = '{val}' "
            f"THEN {int(round((w - int(w)) * _DENOM))} ELSE {thr} END"
        )
    gate = _gate_sql(id_cols, seed, hexfold)
    return f"""
SELECT * EXCLUDE (__n), unnest(range(1, __n + 1)) AS {copy_col}
FROM (SELECT *, ({full}) + (CASE WHEN {gate} < ({thr}) THEN 1 ELSE 0 END) AS __n
      FROM __SRC__)
WHERE __n >= 1
"""


def train_test_split(
    df: DataFrame,
    id_cols: Sequence[str],
    test_fraction: float = 0.1,
    val_fraction: float = 0.0,
    seed: int = 0,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic holdout assignment: adds ``split`` ∈ {train, val,
    test}. Membership is a pure function of the key, so the split is
    stable under reruns, appends, and engine changes — new rows land in
    the same proportions without moving old ones (the property random
    splits lose)."""
    g = _gate(id_cols, seed)
    t = int(test_fraction * _DENOM)
    v = int(val_fraction * _DENOM)
    split = (
        F.when(g < F.lit(t), F.lit("test"))
        .when(g < F.lit(t + v), F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return df.withColumn(out_col, split)


def sample_n(
    df: DataFrame,
    id_cols: Sequence[str],
    n: int,
    seed: int = 0,
) -> DataFrame:
    """Deterministic EXACT-count sample — pandas ``sample(n=)`` with the
    engine's content-hash determinism contract: the kept set is the n
    rows with the smallest seeded content hash, so it is identical on
    any cluster layout, stable under reruns, and changes minimally under
    appends (a new row displaces at most one old row).

    Plan: ``orderBy(hash, key).limit(n)`` → TakeOrderedAndProject — an
    n-row heap per task merged on the driver, NO global sort
    materializes; driver memory is O(n), the same contract as nlargest.
    Ordering uses the FULL 63-bit hash with the key string as tiebreak,
    so the n-boundary is exactly determined (the quantized _gate would
    tie ~n²/1e6 rows)."""
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in id_cols])
    return (
        df.withColumn("__smp", md5_long(key, seed=seed))
        .withColumn("__smpk", key)
        .orderBy("__smp", "__smpk")
        .limit(n)
        .drop("__smp", "__smpk")
    )


def stratified_sample_n(
    df: DataFrame,
    strata_col: str,
    id_cols: Sequence[str],
    n_per_stratum: int,
    seed: int = 0,
) -> DataFrame:
    """Deterministic exact-count sample PER STRATUM (pandas
    ``groupby().sample(n=)``): within each stratum keep the
    ``n_per_stratum`` smallest seeded content hashes. One shuffle on the
    stratum key; the rank filter pushes into the window sort
    (WindowGroupLimit), so only ~n rows per stratum survive each task's
    sort buffer."""
    from pyspark.sql import Window

    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in id_cols])
    w = Window.partitionBy(strata_col).orderBy("__smp", "__smpk")
    return (
        df.withColumn("__smp", md5_long(key, seed=seed))
        .withColumn("__smpk", key)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n_per_stratum)
        .drop("__smp", "__smpk", "__rn")
    )
