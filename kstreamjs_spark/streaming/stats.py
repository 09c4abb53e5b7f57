"""Statistics parity with the reference (`Statistics` + `flushStatistics`,
/root/reference/src/context.ts:39-52,218-222 and src/stream.ts:256-260):
snapshot-and-reset counters of received/sent rows and the last event
timestamp, merged across sources.

Spark-native implementation: a StreamingQueryListener accumulating
`numInputRows` / sink `numOutputRows` from each micro-batch progress —
no custom counters threaded through operators.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


def _iso_to_epoch_ms(iso: str) -> int | None:
    """Spark progress reports event-time watermarks as ISO-8601 strings
    (e.g. '2024-01-01T00:00:00.000Z'); Statistics stores epoch millis
    (reference Statistics.lastSentEventTimestamp, src/context.ts:39-52) —
    storing the raw string would make Statistics.merge's max() compare
    strings."""
    try:
        dt = datetime.fromisoformat(iso.replace("Z", "+00:00"))
    except (ValueError, AttributeError):
        return None
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1000)


@dataclass
class Statistics:
    recv_total: int = 0
    send_total: int = 0
    last_sent_event_timestamp: int | None = None  # epoch millis

    def merge(self, other: "Statistics") -> "Statistics":
        ts = [
            t
            for t in (self.last_sent_event_timestamp, other.last_sent_event_timestamp)
            if t is not None
        ]
        return Statistics(
            recv_total=self.recv_total + other.recv_total,
            send_total=self.send_total + other.send_total,
            last_sent_event_timestamp=max(ts) if ts else None,
        )


class StatisticsListener(StreamingQueryListener):
    """Accumulates per-micro-batch input/output row counts.

    ``flush()`` snapshots and resets, matching the reference's
    `flushStatistics` contract.

    StreamingQueryListeners are SESSION-GLOBAL in Spark: without scoping,
    two Streams on one session would each count BOTH queries' rows. Call
    ``watch(query_id)`` (the Stream facade does this for every query it
    starts) to restrict accumulation to this stream's own queries; a
    listener that was never scoped keeps the watch-everything behavior.
    """

    def __init__(self) -> None:
        self._stats = Statistics()
        self._watched: set[str] | None = None

    def watch(self, query_id: str) -> None:
        """Restrict accumulation to the given query id (additive)."""
        if self._watched is None:
            self._watched = set()
        self._watched.add(str(query_id))

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        if self._watched is not None and str(p.id) not in self._watched:
            return
        self._stats.recv_total += int(p.numInputRows or 0)
        sink_rows = getattr(p.sink, "numOutputRows", None)
        if sink_rows is not None and int(sink_rows) >= 0:
            self._stats.send_total += int(sink_rows)
        ts = getattr(p, "eventTime", None) or {}
        max_ts = ts.get("max") if isinstance(ts, dict) else None
        if max_ts:
            ms = _iso_to_epoch_ms(max_ts)
            if ms is not None:
                prev = self._stats.last_sent_event_timestamp
                self._stats.last_sent_event_timestamp = (
                    ms if prev is None else max(prev, ms)
                )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def flush(self) -> Statistics:
        snap = self._stats
        self._stats = Statistics()
        return snap

    def attach(self, spark: SparkSession) -> "StatisticsListener":
        spark.streams.addListener(self)
        return self

    def detach(self, spark: SparkSession) -> None:
        spark.streams.removeListener(self)
