"""Streaming observability: a `StreamingQueryListener` that records
per-micro-batch progress — the Spark-native hook for the audit-log
role the reference's procedures played (X6: every call wrote timing
envelopes; a streaming pipeline's equivalent is per-batch progress).

`pyspark.sql.streaming.StreamingQueryListener` is the public Python
API (3.4+): events fire on the driver for every query start /
progress / termination. This collector keeps a bounded in-memory tail
of progress records (query id, batch id, input rows, processed rows
per second, batch duration) — in production the same listener body
would emit to a metrics sink; the shape of the hook is identical.
"""

from __future__ import annotations

from collections import deque
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class ProgressCollector(StreamingQueryListener):
    """Bounded collector of streaming progress events."""

    def __init__(self, max_records: int = 1000):
        self.records: deque[dict[str, Any]] = deque(maxlen=max_records)
        self.started: list[str] = []
        self.terminated: list[str] = []

    def onQueryStarted(self, event) -> None:
        self.started.append(str(event.id))

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self.records.append(
            {
                "query_id": str(p.id),
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "batch_duration_ms": p.batchDuration,
                "sink": p.sink.description if p.sink else None,
            }
        )

    def onQueryTerminated(self, event) -> None:
        self.terminated.append(str(event.id))

    def onQueryIdle(self, event) -> None:  # 3.5+: fired on no-data ticks
        pass

    def total_input_rows(self) -> int:
        return sum(r["num_input_rows"] for r in self.records)


def attach_progress_collector(
    spark: SparkSession, max_records: int = 1000
) -> ProgressCollector:
    """Attach a fresh collector to this session's stream manager.
    Caller detaches with ``spark.streams.removeListener(collector)``."""
    collector = ProgressCollector(max_records)
    spark.streams.addListener(collector)
    return collector
