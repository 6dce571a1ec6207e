"""parallel_pandas_spark — a PySpark-native analytics engine with the
query/data-processing capabilities of ``dubovikmaster/parallel-pandas``.

The reference library parallelizes pandas operations by chunking frames
across a process pool (see /root/reference/parallel_pandas/main.py:58-267).
This engine re-expresses the same *capability surface* — full-frame
reductions, grouped aggregation/transform/apply, rolling/expanding/EWM
windows, the .str/.dt scalar-function families, merge/pivot, and arbitrary
Python UDFs — as declarative PySpark DataFrame plans so Catalyst/Tungsten
own partitioning, shuffle, codegen and spill, and the same code scales from
``local[32]`` to a 1000-executor cluster.

Design decisions (SURVEY.md §1.4):
- No implicit row index: every ordered operator takes explicit ordering
  column(s); "index" is an ordinary key column.
- pandas NaN ↔ Spark NULL; ``skipna=True`` ↔ Spark's null-ignoring
  aggregates (matches by default).
- UDFs are the slow path: everything expressible as ``pyspark.sql.functions``
  expressions is, and only EWM / weighted windows / arbitrary callables drop
  to Arrow-batched ``applyInPandas`` / ``mapInPandas``.
"""

__version__ = "0.2.0"

from .api import ParallelFrame  # noqa: F401
from .session import get_spark  # noqa: F401
