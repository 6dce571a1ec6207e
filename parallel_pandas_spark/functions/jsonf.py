"""JSON column surface (SURVEY.md §2.7 north-star extension): the
testdata's ``events.props`` carries a JSON string, and a training-data
pipeline constantly flattens such payloads (request logs, crawl
metadata, provenance blobs) into typed columns.

All three entry points are pure JVM expressions (Jackson inside
Catalyst's ``from_json``/``get_json_object`` — codegen'd, zero Python):

- :func:`json_get` — one path, string result (``get_json_object``).
- :func:`json_normalize` — schema-driven parse + struct flatten into
  typed top-level columns, pandas ``json_normalize`` with the `sep`
  naming convention. The SCHEMA is explicit: at 100 TB you do not want
  schema inference scanning the corpus twice, and a declared schema
  lets malformed documents yield NULLs (mode PERMISSIVE) instead of
  failing the job.
- :func:`infer_json_schema` — the sampling escape hatch when the schema
  is genuinely unknown: infers from a bounded sample via Spark's JSON
  reader, to be passed back into :func:`json_normalize`.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def json_get(col: Column | str, path: str) -> Column:
    """Single-path extraction: ``$.a.b[0]`` → string (NULL on miss)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, path)


def _flatten(prefix: str, dt: T.DataType, src: Column, sep: str):
    if isinstance(dt, T.StructType):
        out = []
        for f in dt.fields:
            out += _flatten(f"{prefix}{sep}{f.name}" if prefix else f.name,
                            f.dataType, src[f.name], sep)
        return out
    return [(prefix, src)]


def json_normalize(
    df: DataFrame,
    col: str,
    schema: T.StructType | str,
    sep: str = ".",
    keep: bool = False,
) -> DataFrame:
    """Parse a JSON-string column against an explicit schema and flatten
    every (nested) field into a typed top-level column named with pandas
    ``json_normalize`` dotted paths (``sep=``). Malformed rows yield
    NULLs (PERMISSIVE), never job failures."""
    parsed = F.from_json(F.col(col), schema)
    # resolve the schema object for flattening
    st = schema if isinstance(schema, T.StructType) else T.StructType.fromDDL(schema)
    cols = _flatten("", st, parsed, sep)
    keep_cols = df.columns if keep else [c for c in df.columns if c != col]
    clash = sorted(set(n for n, _ in cols) & set(keep_cols))
    if clash:
        raise ValueError(
            f"json_normalize would duplicate existing column(s) {clash}; "
            "rename them first or choose a different sep="
        )
    return df.select(
        *keep_cols, *[expr.alias(name) for name, expr in cols]
    )


def infer_json_schema(
    df: DataFrame, col: str, sample_rows: int = 1000
) -> T.StructType:
    """Infer the JSON schema from a BOUNDED sample (never the full
    corpus): take ``sample_rows`` non-null strings and run Spark's JSON
    reader over them. Pass the result to :func:`json_normalize`."""
    spark = df.sparkSession
    sample = [
        r[0]
        for r in df.select(col).where(F.col(col).isNotNull())
        .limit(sample_rows).collect()
    ]
    if not sample:
        return T.StructType([])
    st = spark.read.json(spark.sparkContext.parallelize(sample)).schema
    # malformed sample docs inject the reader's synthetic corrupt-record
    # field; it is not part of the data's schema
    bad = spark.conf.get(
        "spark.sql.columnNameOfCorruptRecord", "_corrupt_record"
    )
    return T.StructType([f for f in st.fields if f.name != bad])
