"""pandas ``.str`` accessor surface → Spark expressions (SURVEY.md §2.7).

The reference exposes the whole accessor generically via introspection
(/root/reference/parallel_pandas/parallel_str_dt.py:69-131); here each op
is an explicit JVM-side expression (regexp ops compile to codegen'd Java
regex — the only ops where the reference's parallelism ever paid off,
README.md:77-84, are precisely these regex ops, which Spark runs
vectorized on every core for free).
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def lower(col):  # str.lower
    return F.lower(_c(col))


def upper(col):  # str.upper
    return F.upper(_c(col))


def strip(col):  # str.strip
    return F.trim(_c(col))


def lstrip(col):
    return F.ltrim(_c(col))


def rstrip(col):
    return F.rtrim(_c(col))


def length(col):  # str.len
    return F.length(_c(col))


def contains(col, pat: str, regex: bool = True):  # str.contains
    return _c(col).rlike(pat) if regex else _c(col).contains(pat)


def startswith(col, prefix: str):
    return _c(col).startswith(prefix)


def endswith(col, suffix: str):
    return _c(col).endswith(suffix)


def count(col, pat: str):  # str.count (regex occurrences)
    return F.regexp_count(_c(col), F.lit(pat))


def replace(col, pat: str, repl: str, regex: bool = True):  # str.replace
    if regex:
        return F.regexp_replace(_c(col), pat, repl)
    return F.replace(_c(col), F.lit(pat), F.lit(repl))


def slice_(col, start: int = 0, stop: int | None = None):  # str.slice
    # pandas slice is 0-based [start, stop); substring is 1-based length-d
    if stop is None:
        return F.substring(_c(col), start + 1, 2_000_000_000)
    return F.substring(_c(col), start + 1, stop - start)


def zfill(col, width: int):  # str.zfill
    """pandas semantics (r6 fuzz fix): NEVER truncates (Spark lpad cuts a
    longer string to ``width``) and a leading +/- sign stays ahead of the
    inserted zeros ('-5'.zfill(4) == '-005', not '00-5')."""
    c = _c(col)
    has_sign = c.rlike(r"^[+-]")
    sign = F.when(has_sign, c.substr(1, 1)).otherwise(F.lit(""))
    body = F.when(has_sign, c.substr(F.lit(2), F.length(c))).otherwise(c)
    zeros = F.repeat(F.lit("0"), F.greatest(F.lit(0), F.lit(width) - F.length(c)))
    return F.concat(sign, zeros, body)


def pad(col, width: int, side: str = "left", fillchar: str = " "):
    """pandas semantics (r6 fuzz fix): NEVER truncates; ``side='both'``
    centers with the smaller half on the left ((width−len)//2)."""
    c = _c(col)
    n = F.greatest(F.lit(0), F.lit(width) - F.length(c))
    if side == "left":
        return F.concat(F.repeat(F.lit(fillchar), n), c)
    if side == "right":
        return F.concat(c, F.repeat(F.lit(fillchar), n))
    if side != "both":
        raise ValueError(f"side must be left/right/both, got {side!r}")
    left = F.floor(n / 2).cast("int")
    return F.concat(
        F.repeat(F.lit(fillchar), left), c, F.repeat(F.lit(fillchar), n - left)
    )


def extract(col, pattern: str, groups: int) -> list[Column]:
    """str.extract → one column per regex group (frame output in pandas,
    test_str_dt.py:56-60). Non-matching rows yield NULL (Spark returns ''
    for no-match, so wrap)."""
    c = _c(col)
    out = []
    for g in range(1, groups + 1):
        e = F.regexp_extract(c, pattern, g)
        out.append(F.when(c.rlike(pattern), e).alias(f"group_{g - 1}"))
    return out


def split_expand(col, pat: str, n_cols: int, regex: bool = True) -> list[Column]:
    """str.split(expand=True) → fixed number of columns; missing parts NULL."""
    parts = F.split(_c(col), pat if regex else F.lit(pat))
    return [
        F.when(F.size(parts) > i, parts.getItem(i)).alias(f"part_{i}")
        for i in range(n_cols)
    ]


def cat(cols, sep: str = ""):  # str.cat
    return F.concat_ws(sep, *[_c(c) for c in cols])


def title(col):
    """Python/pandas str.title semantics (r6 fuzz fix): a letter is
    uppercased when it FOLLOWS ANY NON-LETTER (apostrophes, hyphens,
    digits...), not only whitespace — "d'angelo-x" -> "D'Angelo-X" where
    Spark's initcap gives "D'angelo-x". Per-char JVM transform (split →
    transform-with-index → array_join), no Python path."""
    c = _c(col)
    chars = F.split(c, "")

    def _tr(x, i):
        prev_alpha = F.element_at(chars, i).rlike(r"^\p{L}$")  # 1-based: char before x
        return F.when((i == F.lit(0)) | ~prev_alpha, F.upper(x)).otherwise(F.lower(x))

    return F.array_join(F.transform(chars, _tr), "")


def repeat(col, n: int):
    return F.repeat(_c(col), n)


def find(col, sub: str):
    """str.find: 0-based index or -1."""
    return F.instr(_c(col), sub) - 1


def accessor(col, method: str, *args, out_type: str = "string", **kwargs):
    """Generic ``.str`` passthrough for the long tail the explicit JVM
    mappings above don't cover (``get``, ``casefold``, ``normalize``,
    ``wrap``, ...). The reference exposes the ENTIRE accessor via
    introspection (parallel_str_dt.py:69-131); this is the same contract,
    compiled to ONE vectorized Arrow ``pandas_udf`` — real pandas
    semantics, batch-at-a-time, ~10-100x a row-wise PythonUDF. Prefer the
    explicit functions for hot-path ops: they stay in whole-stage codegen.
    """
    @F.pandas_udf(out_type)
    def _f(s: pd.Series) -> pd.Series:
        return getattr(s.str, method)(*args, **kwargs)

    return _f(_c(col))


def get_dummies(col, values: "list[str]", sep: str = "|") -> "list[Column]":
    """pandas ``Series.str.get_dummies(sep=)``: membership indicators for
    a ``sep``-joined tag string. Like the frame-level one-hot
    (reshape.get_dummies), the category list IS the output schema — pass
    it explicitly for a static plan; each indicator is one narrow
    ``array_contains(split(...))`` expression."""
    c = _c(col)
    arr = F.split(c, re.escape(sep))
    return [
        F.when(F.array_contains(arr, v), 1).otherwise(0).alias(v)
        for v in values
    ]
