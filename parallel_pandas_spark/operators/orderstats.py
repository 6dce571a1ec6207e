"""Bounded-memory EXACT order statistics (distributed k-th element).

Spark's exact ``percentile`` aggregate holds a value→count map ON-HEAP
in the aggregation buffer, invisible to the execution-memory manager —
it cannot spill, and its final merge was the engine's one measured OOM
(SCALE.md: stats_quantile_describe red at a 1 GB heap, peak 1.9 GB with
zero managed execution memory). This module computes the same exact
values with state proportional to BINS, not values: the judge-sketch
two-pass histogram refinement.

Algorithm (one driver-coordinated loop, everything heavy JVM-side):

1. ONE stats scan: per column, the non-NaN count, ±inf counts, and the
   finite min/max. Ranks landing in the ±inf blocks resolve directly.
2. Histogram passes: every unresolved (column, bracket) emits a bucket
   id per member row — ``floor((v - lo) / w)`` over the bracket's
   nominal range, clamped to [0, BINS) — via one shared
   explode→groupBy(BINS-bounded) scan for ALL brackets. The driver
   walks each bracket's cumulative counts to find the bucket holding
   each target rank, re-bases the rank into it, and recurses. Bracket
   MEMBERSHIP is the exact floor-constraint chain (not a float range
   filter), so counted sets and recursed sets are identical and the
   rank bookkeeping is exact even when fp division rounds a value
   across a nominal bucket edge.
3. ONE value pass: brackets whose count is ≤ BINS (or whose width has
   degenerated to ulp scale — massive duplicates) emit their member
   VALUES through the same explode→groupBy; the driver sorts ≤ BINS
   distinct values per bracket and reads the target ranks off the
   cumulative counts.

Executor state: a hash aggregate over ≤ (#brackets × BINS) keys —
kilobytes. Driver state: bracket bookkeeping plus the collected
histograms, ≤ #brackets × BINS rows (the same metadata class as
kendall's bucket bounds). Pass count: each pass shrinks a bracket's
nominal width ~BINS/2×, so even a full double-range column resolves in
≤ 7 histogram scans; real data takes 2-3 total scans.

Interpolation stays the caller's job: :func:`spark_interp` reproduces
Spark's ``percentile`` weighted-average form bit-for-bit
((hi-pos)*lower + (pos-lo)*higher — verified against F.percentile on
adversarial data; the lerp form differs in the last ulp).
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .masks import nan_safe

BINS = 1024

_NEG_INF = float("-inf")
_POS_INF = float("inf")


def spark_interp(v_lo: float, v_hi: float, pos: float) -> float:
    """Spark Percentile's interpolation, bit-for-bit: the weighted
    average ``(hi-pos)*lower + (pos-lo)*higher`` (NOT lower+g*(hi-lo),
    which rounds differently in the last ulp)."""
    lo, hi = math.floor(pos), math.ceil(pos)
    if lo == hi:
        return v_lo
    return (hi - pos) * v_lo + (pos - lo) * v_hi


class _Bracket:
    __slots__ = ("col", "preds", "hlo", "hhi", "count", "targets")

    def __init__(self, col, preds, hlo, hhi, count, targets):
        self.col = col
        self.preds = preds      # [(hlo, hw, b)] floor-constraint chain
        # bounds in HALF-space (v*0.5): hhi - hlo <= DBL_MAX for ANY
        # finite bounds, so a full-double-range column cannot overflow
        # the bucket width to inf (which would have skipped refinement
        # and value-pass-collected every distinct value)
        self.hlo = hlo
        self.hhi = hhi
        self.count = count
        self.targets = targets  # {global_rank: rank_within_bracket}


def _bucket_expr(vd: Column, hlo: float, hw: float) -> Column:
    # *0.5 is exact in IEEE (power of two) except subnormal underflow,
    # where two adjacent tiny values may collide into one bucket — they
    # then refine to width degeneracy and the value pass resolves them
    # on the ORIGINAL values, so correctness is unaffected
    return F.greatest(
        F.lit(0),
        F.least(F.lit(BINS - 1),
                F.floor((vd * F.lit(0.5) - F.lit(hlo)) / F.lit(hw))),
    )


def _member(vd: Column, br: _Bracket) -> Column:
    cond = vd.isNotNull() & (vd > F.lit(_NEG_INF)) & (vd < F.lit(_POS_INF))
    for chlo, chw, cb in br.preds:
        cond = cond & (_bucket_expr(vd, chlo, chw) == F.lit(cb))
    return cond


def _degenerate(br: _Bracket) -> bool:
    if not (br.hhi > br.hlo):
        return True
    hw = (br.hhi - br.hlo) / BINS
    return br.hlo + hw <= br.hlo or not math.isfinite(hw)


def order_stats(
    df: DataFrame,
    col_ranks,
    bins: int = BINS,
) -> tuple[dict, dict]:
    """Exact k-th smallest values at bounded memory.

    ``col_ranks``: {column: callable(n) -> iterable of 0-based ranks
    among the column's non-NaN values sorted ascending} — a callable so
    the single stats scan that fixes ``n`` also serves the caller.
    Returns ``(counts, values)`` with ``counts[c] = n`` and
    ``values[c][rank] = float`` (empty dict when n == 0).
    """
    cols = list(col_ranks)
    vds = {c: nan_safe(df, c).cast("double") for c in cols}
    aggs = []
    for c in cols:
        vd = vds[c]
        fin = F.when((vd > F.lit(_NEG_INF)) & (vd < F.lit(_POS_INF)), vd)
        aggs += [
            F.count(vd).alias(f"n__{c}"),
            F.sum(F.when(vd == F.lit(_NEG_INF), 1).otherwise(0)).alias(
                f"ni__{c}"),
            F.sum(F.when(vd == F.lit(_POS_INF), 1).otherwise(0)).alias(
                f"pi__{c}"),
            F.min(fin).alias(f"mn__{c}"),
            F.max(fin).alias(f"mx__{c}"),
        ]
    stats = df.agg(*aggs).first()

    counts: dict = {}
    values: dict = {c: {} for c in cols}
    brackets: list[_Bracket] = []
    for c in cols:
        n = int(stats[f"n__{c}"] or 0)
        counts[c] = n
        if n == 0:
            continue
        ni = int(stats[f"ni__{c}"] or 0)
        pi = int(stats[f"pi__{c}"] or 0)
        m = n - ni - pi
        finite_targets: dict[int, int] = {}
        for r in col_ranks[c](n):
            r = int(r)
            if not 0 <= r < n:
                raise ValueError(f"rank {r} out of range for n={n} ({c!r})")
            if r < ni:
                values[c][r] = _NEG_INF
            elif r >= ni + m:
                values[c][r] = _POS_INF
            else:
                finite_targets[r] = r - ni
        if finite_targets:
            if m <= 0:
                raise AssertionError("finite rank with no finite values")
            brackets.append(
                _Bracket(c, [], float(stats[f"mn__{c}"]) * 0.5,
                         float(stats[f"mx__{c}"]) * 0.5, m, finite_targets)
            )

    # pass cap sized to the worst VALID case, not typical data: each
    # pass narrows a bracket ~BINS (2^10) in linear width, and the full
    # double range (subnormal ~1e-308 to ~1.8e308) spans ~2^2046, so
    # adversarial values dense at every scale need ~205 passes before
    # the min/max snapping or the <=bins value pass can finish; 256
    # clears that bound with slack while normal data exits in <6
    for _pass in range(256):
        refine = [b for b in brackets if b.count > bins and not _degenerate(b)]
        if not refine:
            break
        entries = []
        for i, br in enumerate(refine):
            vd = vds[br.col]
            # width always over the module BINS: _member replays the
            # recorded (hlo, hw, b) constraints with the BINS clamp, so
            # the split geometry and the replay must agree even when a
            # caller passes a custom value-pass threshold via ``bins``
            hw = (br.hhi - br.hlo) / BINS
            entries.append(
                F.struct(
                    F.lit(i).alias("k"),
                    F.when(_member(vd, br), _bucket_expr(vd, br.hlo, hw))
                    .cast("long").alias("b"),
                    vd.alias("v"),
                )
            )
        # per-bucket min/max ride along: children SNAP to their members'
        # true range, so a duplicate-heavy bucket (all rows at one tiny
        # value inside a huge bracket) resolves in one extra pass
        # instead of crawling the width down 1024x per pass — without
        # snapping, dupes + far outliers needed ~190 passes
        hist = (
            df.select(F.explode(F.array(*entries)).alias("e"))
            .where(F.col("e.b").isNotNull())
            .groupBy(F.col("e.k").alias("k"), F.col("e.b").alias("b"))
            .agg(F.count("*").alias("count"),
                 F.min("e.v").alias("vmin"), F.max("e.v").alias("vmax"))
            .collect()
        )
        per: dict[int, dict[int, tuple]] = {}
        for row in hist:
            per.setdefault(row["k"], {})[row["b"]] = (
                row["count"], float(row["vmin"]), float(row["vmax"]))
        next_brackets = [b for b in brackets if b not in refine]
        for i, br in enumerate(refine):
            bstats = per.get(i, {})
            hw = (br.hhi - br.hlo) / BINS
            order = sorted(bstats)
            cum = 0
            # walk targets (sorted by in-bracket rank) along the
            # cumulative bucket counts; group children by bucket
            children: dict[int, dict[int, int]] = {}
            ti = sorted(br.targets.items(), key=lambda kv: kv[1])
            pos = 0
            for b in order:
                c_here = bstats[b][0]
                while pos < len(ti) and ti[pos][1] < cum + c_here:
                    g, local = ti[pos]
                    children.setdefault(b, {})[g] = local - cum
                    pos += 1
                cum += c_here
            if pos != len(ti):
                raise AssertionError(
                    f"rank bookkeeping drifted: {len(ti) - pos} targets "
                    f"past the histogram of {br.col!r}"
                )
            for b, targets in children.items():
                cnt, vmin, vmax = bstats[b]
                next_brackets.append(
                    _Bracket(br.col, br.preds + [(br.hlo, hw, b)],
                             vmin * 0.5, vmax * 0.5, cnt, targets)
                )
        brackets = next_brackets
    else:
        raise RuntimeError("order_stats did not converge in 256 passes")

    if brackets:
        entries = []
        for i, br in enumerate(brackets):
            vd = vds[br.col]
            entries.append(
                F.struct(
                    F.lit(i).alias("k"),
                    F.when(_member(vd, br), vd).alias("v"),
                )
            )
        rows = (
            df.select(F.explode(F.array(*entries)).alias("e"))
            .where(F.col("e.v").isNotNull())
            .groupBy(F.col("e.k").alias("k"), F.col("e.v").alias("v"))
            .count()
            .collect()
        )
        per_vals: dict[int, list] = {}
        for row in rows:
            per_vals.setdefault(row["k"], []).append((row["v"], row["count"]))
        for i, br in enumerate(brackets):
            vals = sorted(per_vals.get(i, []))
            ti = sorted(br.targets.items(), key=lambda kv: kv[1])
            cum = 0
            pos = 0
            for v, c_here in vals:
                while pos < len(ti) and ti[pos][1] < cum + c_here:
                    values[br.col][ti[pos][0]] = float(v)
                    pos += 1
                cum += c_here
            if pos != len(ti):
                raise AssertionError(
                    f"value pass missed {len(ti) - pos} targets of "
                    f"{br.col!r}"
                )
    return counts, values


def exact_quantile_values(
    df: DataFrame,
    cols: Sequence[str],
    qs: Sequence[float],
) -> tuple[dict, dict]:
    """Linear-interpolation exact quantiles per column at bounded
    memory: ``(counts, {col: [value per q]})`` — each value bit-equals
    ``F.percentile(col, q)`` (the order statistics are exact data
    points and :func:`spark_interp` is Spark's own double arithmetic).
    """
    def ranks(n: int):
        out = set()
        for q in qs:
            pos = float(q) * (n - 1)
            out.add(int(math.floor(pos)))
            out.add(int(math.ceil(pos)))
        return out

    counts, values = order_stats(df, {c: ranks for c in cols})
    out: dict = {}
    for c in cols:
        n = counts[c]
        if n == 0:
            out[c] = [None for _ in qs]
            continue
        vc = values[c]
        res = []
        for q in qs:
            pos = float(q) * (n - 1)
            res.append(
                spark_interp(vc[int(math.floor(pos))],
                             vc[int(math.ceil(pos))], pos)
            )
        out[c] = res
    return counts, out
