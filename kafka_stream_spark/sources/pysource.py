"""Custom connector via Spark 4's Python DataSource API.

The reference's only source is a hand-rolled Kafka consumer loop
deserializing BSON CDC envelopes one record at a time
(kafka_s.py:149-161). This module re-expresses that ingest surface as a
REGISTERED ENGINE CONNECTOR through the public `pyspark.sql.datasource`
API — the idiomatic Spark 4 way to add a source the built-ins don't
cover (proprietary change feeds, internal RPC services, etc.):

* ``CdcGenDataSource`` (format name ``cdcgen``) — a deterministic
  CDC-envelope generator standing in for the Kafka topic. Batch reads
  are split into ``partitions`` input partitions (parallel scan, no
  driver bottleneck), and the reader PARTICIPATES IN FILTER PUSHDOWN:
  ``pushFilters`` accepts EqualTo/In predicates on the ``op`` column so
  an insert-only pipeline (the reference's ``if 'o' in data`` gate,
  kafka_s.py:163-167) skips delete/update envelopes inside the source
  instead of materializing them.
* ``CdcGenStreamReader`` — the same feed as a micro-batch STREAM via
  ``SimpleDataSourceStreamReader``: offsets are plain dict checkpoints
  ({"seq": n}), each poll emits the next fixed-size slice, giving a
  replayable, checkpointable source for streaming tests without a
  broker.

Determinism contract: row ``i`` is a pure function of ``i`` (md5-free —
plain arithmetic), so any (partition-count, batch-size) configuration
yields the same total relation, which is what makes the connector usable
under the engine's differential-oracle gate.

At 100 TB the shape holds: partitions() returns one split per topic
partition/file-chunk; Spark schedules them across executors and the
driver only ever sees offsets.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

SCHEMA_DDL = "seq BIGINT, op STRING, st_code STRING, title STRING"

_OPS = ("i", "u", "d")


def _row(i: int) -> tuple[int, str, str, str]:
    """Deterministic envelope #i: ~70% inserts, cycling codes/titles."""
    op = _OPS[(i * 7) % 10 % 3] if (i * 7) % 10 < 3 else "i"
    return (
        i,
        op,
        f"83{i % 500:04d}",
        f"doc {i % 97} body {(i * 31) % 1000}",
    )


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class CdcGenReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("rows", "1000"))
        self.n_parts = int(options.get("partitions", "4"))
        self.op_filter: set[str] | None = None

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Accept op = 'x' / op IN (...) — evaluated inside the source —
        and hand every other predicate back to Spark."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("op",):
                s = {f.value}
            elif isinstance(f, In) and f.attribute == ("op",):
                # In.value is a tuple of values (there is no .values field).
                s = set(f.value)
            else:
                yield f
                continue
            # Accepted filters must ALL hold: intersect successive op
            # predicates rather than letting the last one win.
            self.op_filter = s if self.op_filter is None else self.op_filter & s

    def partitions(self) -> Sequence[InputPartition]:
        k = min(self.n_parts, self.n) or 1
        bounds = [round(i * self.n / k) for i in range(k + 1)]
        return [_Range(a, b) for a, b in zip(bounds, bounds[1:]) if a < b]

    def read(self, partition: _Range):
        for i in range(partition.start, partition.end):
            row = _row(i)
            if self.op_filter is None or row[1] in self.op_filter:
                yield row


class CdcGenStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch view of the same feed: offset = {"seq": next_index},
    each poll advances by ``batch_size`` envelopes up to ``rows``."""

    def __init__(self, options):
        self.n = int(options.get("rows", "1000"))
        self.batch = int(options.get("batch_size", "100"))

    def initialOffset(self) -> dict:
        return {"seq": 0}

    def read(self, start: dict):
        lo = start["seq"]
        hi = min(lo + self.batch, self.n)
        return iter([_row(i) for i in range(lo, hi)]), {"seq": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_row(i) for i in range(start["seq"], end["seq"])])


class CdcGenDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "cdcgen"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> CdcGenReader:
        return CdcGenReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> CdcGenStreamReader:
        return CdcGenStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(CdcGenDataSource)
