"""Decade sweep for the q212 unigram-LM (SentencePiece-style) training
shape: documents corpus multiplied 1x/10x (disjoint token prefixes),
warm min-of-3 wall in ONE session — the JIT-honest regime SCALE.md's
q203/q179 sections established (fresh-session-per-multiplier sweeps are
C2-confounded on this box).

Measures the claim in q212's docstring (the r13 verdict's ask — the one
new compute family without a measured task-seconds decade exponent):
training runs on the WORD-COUNT table, per EM round one Arrow E-step
over the distinct-words frame + one O(vocab)-row piece-count aggregate —
so 10x corpus (10x distinct words under disjoint prefixes) should cost
~linear task work under the fixed rounds x jobs scheduling floor
(seed aggregate + charset collect + top-K + 2 EM rounds + final count).

Caveat mirrored from the q179 sweep: the c{i}_ prefix lengthens every
word by 3-4 chars, so 10x copies also shift the word-length mix toward
the _UNI_MAX_WORD=16 exclusion bound — rows is the honest denominator,
not a guess from mult.

Usage: PYTHONPATH=/root/repo:/root/repo/scripts \
           python scripts/profile_q212_decade.py [sf_dir]
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
    spark = get_spark("q212-decade", cpus=32, shuffle_partitions=32)

    import kstreamjs_spark.queries.llm as llm
    from unittest import mock

    results = []
    for mult in (1, 10):
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        big = multiply(docs, "doc_id", mult, disjoint_text="text")
        big.createOrReplaceTempView("__q212_docs")

        def run():
            with mock.patch.object(
                llm, "load",
                lambda _s, _sf, *_t: (spark.table("__q212_docs"),),
            ):
                from kstreamjs_spark.queries import all_queries
                return all_queries()["q212_unigram_lm_train"].fn(
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
