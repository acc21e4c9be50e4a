"""Streaming metrics: the engine's answer to the reference's
``self.page`` processed-record counter (kafka_s.py:71,175-176 — the only
runtime metric it has, printed per record).

Structured Streaming already meters every micro-batch
(StreamingQueryProgress); this listener aggregates those progress events
into per-query totals without touching the data path — at any scale the
cost is one callback per micro-batch, not per record.
"""

from __future__ import annotations

from collections import defaultdict
from threading import Lock

from pyspark.sql.streaming import StreamingQueryListener


class RecordCounter(StreamingQueryListener):
    """Accumulates rows-in / rows-per-second per streaming query id."""

    def __init__(self) -> None:
        self._lock = Lock()
        self.rows_in: dict[str, int] = defaultdict(int)
        self.batches: dict[str, int] = defaultdict(int)

    # StreamingQueryListener interface -----------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API name)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        with self._lock:
            self.rows_in[str(p.id)] += int(p.numInputRows)
            self.batches[str(p.id)] += 1

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    # convenience --------------------------------------------------------
    def total_rows(self) -> int:
        with self._lock:
            return sum(self.rows_in.values())
