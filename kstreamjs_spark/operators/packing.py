"""Greedy sequence packing for LLM training-data prep: assign documents,
visited in a deterministic pseudo-random order, to consecutive fixed
token-budget packs (pack_id = exclusive running token count // budget).
Sequence packing is how training pipelines turn variable-length documents
into fixed-length training examples without padding waste.

The reference (song9446/kstreamjs) has no ordering or packing surface at
all (its only per-row hooks are map/filter callbacks, src/stream.ts:38-77);
this is a north-star extension.

Scale design (100 TB): packing is a global prefix sum over a total order —
the naive formulation (one window over ORDER BY key) is a single-partition
sort, a driver-sized bottleneck. The distributed idiom used here:

1. ``repartitionByRange`` on the order key — ONE range exchange, the same
   cost as any global sort shard pass; partition p holds a contiguous key
   range below partition p+1.
2. per-partition running sum in one ``mapInPandas`` pass — vectorized
   cumsum, state carried across Arrow batches within the partition, NO
   second shuffle (a window over partition id would re-shuffle the full
   dataset by pid just to restate the distribution Spark already has).
3. per-partition totals (|partitions| rows, thousands at 100 TB) are
   cumulated on the driver — bounded metadata, like a range-partitioner
   sample — and added back as a broadcast map-literal offset.

The output pack_id depends only on the total order, not on where the
range boundaries fall, so the (sampled, hence boundary-nondeterministic)
range partitioner cannot perturb the result — but the frame IS
localCheckpoint-ed after step 2 so the totals collected in step 3 and the
rows projected in step 4 come from the same materialization.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..plans import materialize_once


def sequence_pack(
    df: DataFrame,
    tok_col: str,
    budget: int,
    order_cols: list[str],
    parts: int | None = None,
) -> DataFrame:
    """Add ``pack_id``: greedy fixed-budget packing in ``order_cols`` order.

    ``order_cols`` must be a total order (unique key, e.g. a hash with the
    doc id as tiebreak). A document straddling a budget boundary belongs to
    the pack where it starts (streaming-packing semantics — the oracle can
    state the same in one window expression).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    P = parts or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(P, *order_cols).sortWithinPartitions(
        *order_cols
    )
    out_schema = ", ".join(
        f"{name} {dtype}" for name, dtype in ranged.dtypes
    ) + ", _pid int, _cum long"

    def local_cumsum(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        run = 0
        for pdf in it:
            cum = pdf[tok_col].cumsum() + run
            if len(cum):
                run = int(cum.iloc[-1])
            pdf = pdf.assign(_pid=pid, _cum=cum.astype("int64"))
            yield pdf

    local = materialize_once(ranged.mapInPandas(local_cumsum, out_schema))
    totals = {
        r["_pid"]: r["t"]
        for r in local.groupBy("_pid").agg(F.max("_cum").alias("t")).collect()
    }
    offsets = []
    acc = 0
    for pid in sorted(totals):
        offsets += [F.lit(pid), F.lit(acc)]
        acc += int(totals[pid])
    # Empty input: no partitions produced rows, so there is nothing to
    # offset — create_map() with zero args is typed map<void,void> and
    # would fail analysis on the lookup.
    if offsets:
        cum = F.col("_cum") + F.create_map(*offsets)[F.col("_pid")]
    else:
        cum = F.col("_cum")
    return local.withColumn(
        "pack_id",
        F.floor((cum - F.col(tok_col)) / F.lit(float(budget))).cast("long"),
    ).drop("_pid", "_cum")
