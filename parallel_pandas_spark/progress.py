"""Progress accounting — the engine's equivalent of the reference's tqdm
progress bars (/root/reference/parallel_pandas/progress_imap.py:143-221:
worker → Manager-queue → rate-limited bar updates).

Spark's analog has two halves:

- **Task progress** (`ProgressTracker`): a daemon thread polls
  ``SparkContext.statusTracker()`` for active stages and reports
  (completed, active, total) task counts through a callback — tqdm if
  installed, a logging line otherwise. Polling the status tracker costs
  one driver-local RPC per interval — nothing touches the executors, so
  it is safe at any cluster size (the reference's Manager queue, by
  contrast, is a per-UDF-call IPC hop).

- **Row progress** (`count_rows`): a named accumulator incremented from
  inside an Arrow batch iterator — the distributed replacement for the
  reference's ``progress_udf_wrapper`` (progress_imap.py:174-195), giving
  rows-processed visibility inside long pandas-UDF stages.
"""

from __future__ import annotations

import logging
import threading
import time
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession

log = logging.getLogger(__name__)


class ProgressTracker:
    """Poll the status tracker while jobs run; report via ``sink``.

    >>> with ProgressTracker(spark) as pt:
    ...     df.count()
    >>> pt.max_active_stages >= 1
    """

    def __init__(
        self,
        spark: SparkSession,
        interval: float = 0.25,
        sink: Callable[[int, int, int], None] | None = None,
    ):
        self._sc = spark.sparkContext
        self._interval = interval
        self._sink = sink or self._default_sink
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.samples: list[tuple[int, int, int]] = []  # (done, active, total)
        self.max_active_stages = 0

    @staticmethod
    def _default_sink(done: int, active: int, total: int) -> None:
        log.info("tasks %d/%d (%d running)", done, total, active)

    def _poll(self) -> None:
        tracker = self._sc.statusTracker()
        while not self._stop.is_set():
            stage_ids = tracker.getActiveStageIds()
            self.max_active_stages = max(self.max_active_stages, len(stage_ids))
            done = active = total = 0
            for sid in stage_ids:
                info = tracker.getStageInfo(sid)
                if info is None:
                    continue
                done += info.numCompletedTasks
                active += info.numActiveTasks
                total += info.numTasks
            if total:
                self.samples.append((done, active, total))
                self._sink(done, active, total)
            time.sleep(self._interval)

    def __enter__(self) -> "ProgressTracker":
        self._thread = threading.Thread(target=self._poll, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)


def count_rows(df: DataFrame, accumulator) -> DataFrame:
    """Instrument a frame so every row passing through increments
    ``accumulator`` (``spark.sparkContext.accumulator(0)``) — visibility
    into pandas-UDF stages without changing results. Arrow iterator form:
    adds one integer add per BATCH, not per row."""

    def _count(batches: Iterator) -> Iterator:
        for pdf in batches:
            accumulator.add(len(pdf))
            yield pdf

    return df.mapInPandas(_count, schema=df.schema)
