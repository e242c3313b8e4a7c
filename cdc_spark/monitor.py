"""Observability: streaming progress listener + stateful LSN-gap monitor.

- ``ProgressRecorder`` is the engine analog of the reference's DogStatsd
  timings (``/root/reference/cdc/utils/stats.py:17-65``, sampled
  ``cdc.message_flushed`` / ``cdc.task_executed``): a
  ``StreamingQueryListener`` appending one row per microbatch (rows, batch
  duration, trigger timestamps) to a queryable parquet metrics table — exact
  aggregates instead of sampled UDP counters.

- ``lsn_gap_monitor`` is a custom stateful streaming operator
  (``applyInPandasWithState``): per table it carries the max contiguous LSN
  across microbatches and emits any gaps it observes — the streaming analog
  of the reference's sequential-id assertion (``cdc/sources/__init__.py:
  91-92``), which crashes on a gap; a distributed engine instead surfaces
  gaps as data (late events may still fill them).
"""

from __future__ import annotations

import os
from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQueryListener
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


class ProgressRecorder(StreamingQueryListener):
    """Append one row per finished microbatch to ``path`` (parquet, written
    driver-side via pandas — the volume is one row per trigger)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)
        self._n = 0

    def onQueryStarted(self, event: Any) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event: Any) -> None:  # noqa: N802
        p = event.progress
        row = {
            "query_id": str(p.id),
            "batch_id": p.batchId,
            "timestamp": p.timestamp,
            "num_input_rows": p.numInputRows,
            "batch_duration_ms": (p.durationMs or {}).get("triggerExecution"),
        }
        pd.DataFrame([row]).to_parquet(
            os.path.join(self.path, f"progress-{p.batchId}-{self._n}.parquet")
        )
        self._n += 1

    def onQueryIdle(self, event: Any) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event: Any) -> None:  # noqa: N802
        pass


GAP_OUTPUT_DDL = "table STRING, gap_start BIGINT, gap_end BIGINT"
GAP_STATE_DDL = "hwm BIGINT"


def _gap_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (table,) = key
    hwm = state.get[0] if state.exists else 0
    lsns: list[int] = []
    for pdf in pdfs:
        lsns.extend(int(x) for x in pdf["lsn"])
    lsns = sorted(set(lsns))
    gaps = []
    prev = hwm
    for x in lsns:
        if x <= prev:
            continue  # duplicate delivery / already seen
        if x > prev + 1:
            gaps.append((table, prev + 1, x - 1))
        prev = x
    state.update((prev,))
    yield pd.DataFrame(gaps, columns=["table", "gap_start", "gap_end"])


def lsn_gap_monitor(envelope: DataFrame) -> DataFrame:
    """Streaming transform: (table, lsn) -> rows describing LSN ranges never
    observed up to each batch. State = per-table contiguous high-watermark.
    Arrow-batched; the per-group pandas work is O(batch rows)."""
    return (
        envelope.select("table", "lsn")
        .groupBy("table")
        .applyInPandasWithState(
            _gap_fn,
            outputStructType=GAP_OUTPUT_DDL,
            stateStructType=GAP_STATE_DDL,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
