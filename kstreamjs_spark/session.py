"""SparkSession factory.

Scale notes (100 TB target):
- AQE on: runtime coalescing of shuffle partitions, skew-join splitting, and
  dynamic broadcast demotion are the first line of defense at scale.
- ``spark.sql.shuffle.partitions`` defaults to 2x cores locally; on a real
  cluster this should be ~2-3x total executor cores (or left to AQE with a
  high initial value). Queries in this repo never hardcode partition counts.
- Arrow enabled: every Python-side operator here is a Pandas UDF /
  applyInPandas / mapInPandas (Arrow-batched) — no row-at-a-time Python UDFs
  in any hot path.
- Session timezone pinned to UTC so event-time semantics (window alignment,
  epoch math) are deterministic and match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(
    app_name: str = "kstreamjs-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a local SparkSession tuned for the bench harness."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cpus, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # plans.materialize_once upgrades to reliable checkpoint() when a
        # checkpoint dir is set; without this cleaner flag Spark never
        # deletes non-streaming checkpoint files (cleanup happens on RDD
        # GC only when it is on), so a long-lived app would leak one
        # permanent copy of every materialized frame to the checkpoint
        # store. Startup-only conf — cluster submitters must set it too.
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    configure_runtime(spark)
    return spark


def configure_runtime(spark: SparkSession) -> None:
    """Runtime-settable confs we need even on an externally-provided session
    (the correctness driver hands us its own SparkSession)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    except Exception:
        pass
    try:
        # events.parquet carries TIMESTAMP(NANOS) which Spark cannot read
        # natively; read as long (ns) and convert in tables.fix_event_time.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass


def scratch_dir(prefix: str, sf_dir: str) -> str:
    """Pid-scoped scratch directory for queries that exercise the WRITE
    path (q211/q211b/q213/q213b/q215/q215b): concurrent checkers (driver + an
    independent judge selfcheck) never clobber each other's write
    mid-read, the same process reuses its dir across invocations, and an
    ``atexit`` hook removes every dir this process created — the
    ADVICE-flagged leak of pid-scoped temp dirs that outlive the run.

    Cleanup is registered once per path; crashes still leave dirs behind
    (tempdir policy collects those), but every normal exit is clean."""
    import atexit
    import os
    import shutil
    import tempfile

    path = os.path.join(
        tempfile.gettempdir(),
        f"{prefix}_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    if path not in _SCRATCH_REGISTERED:
        _SCRATCH_REGISTERED.add(path)
        atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path


_SCRATCH_REGISTERED: set[str] = set()
