"""Decade sweep for the q179 BPE training shape: documents corpus
multiplied 1x/10x (disjoint token prefixes), warm min-of-3 wall in ONE
session — the JIT-honest regime SCALE.md's q203 section established
(fresh-session-per-multiplier sweeps are C2-confounded on this box).

Measures the claim in q179's docstring: training cost is the per-round
pair-count aggregate over the WORD-COUNT table (map-side combined,
O(distinct pairs) rows) + a 1-row argmax — so 10x corpus (10x distinct
words under disjoint prefixes) should cost ~linear task work under the
fixed 6-round x 2-job scheduling floor.

Usage: PYTHONPATH=/root/repo:/root/repo/scripts \
           python scripts/profile_q179_decade.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from stress import multiply  # noqa: E402

from kstreamjs_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("q179-decade", cpus=32, shuffle_partitions=32)

    import kstreamjs_spark.queries.llm as llm
    from unittest import mock

    results = []
    for mult in (1, 10):
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        big = multiply(docs, "doc_id", mult, disjoint_text="text")
        big.createOrReplaceTempView("__q179_docs")

        def run():
            with mock.patch.object(
                llm, "load",
                lambda _s, _sf, *_t: (spark.table("__q179_docs"),),
            ):
                from kstreamjs_spark.queries import all_queries
                return all_queries()["q179_bpe_train"].fn(
                    spark, "ignored"
                ).count()

        walls = []
        n = 0
        for _ in range(3):
            t0 = time.perf_counter()
            n = run()
            walls.append(time.perf_counter() - t0)
        results.append(
            {"mult": mult, "rows": n,
             "wall_min3_s": round(min(walls), 2),
             "walls": [round(w, 2) for w in walls]}
        )
        print(f"=== mult={mult}: {n} words, min-of-3 "
              f"{min(walls):.2f}s {walls} ===", flush=True)
    print(json.dumps(results))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
