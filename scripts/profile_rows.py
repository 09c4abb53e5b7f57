"""Per-row profile: split DataFrame BUILD time (driver/py4j/plan
construction) from EXECUTE time (noop sink, guide §1.4), and dump the
AQE FINAL plan after execution so ReusedExchange adjudication is
empirical, not guessed from the static plan.

Usage: python scripts/profile_rows.py <query> [query ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
PROFILE_RUNS (default 3, min-of-N on the execute leg).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from kstreamjs_spark.plans import explain_str  # noqa: E402
from kstreamjs_spark.queries import all_queries  # noqa: E402
from kstreamjs_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    runs = int(os.environ.get("PROFILE_RUNS", "3"))
    names = sys.argv[1:]
    qs = all_queries()
    spark = get_spark("profile-rows", cpus=cpus)
    for name in names:
        spec = qs[name]
        # warm: codegen + file index caches (bench methodology)
        spec.fn(spark, sf).collect()
        tb = min(
            _t(lambda: spec.fn(spark, sf)) for _ in range(runs)
        )
        df = spec.fn(spark, sf)
        te = min(
            _t(
                lambda: spec.fn(spark, sf)
                .write.format("noop")
                .mode("overwrite")
                .save()
            )
            for _ in range(runs)
        )
        tc = min(
            _t(lambda: spec.fn(spark, sf).collect()) for _ in range(runs)
        )
        df.collect()
        plan = explain_str(df)
        n_reuse = plan.count("ReusedExchange")
        n_scan = plan.count("Scan parquet")
        print(
            f"{name}: build={tb:.3f}s noop_exec={te:.3f}s collect={tc:.3f}s"
            f" reused_exchanges={n_reuse} parquet_scans={n_scan}"
        )
        out = f"/tmp/final_plan_{name}.txt"
        with open(out, "w") as fh:
            fh.write(plan)
        print(f"  final plan -> {out}")
    spark.stop()
    return 0


def _t(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    raise SystemExit(main())
