"""ANN serving: the offline-index / online-query split in production
shape, on this engine's three approximate paths.

Offline (run once per corpus refresh):
  1. train the PQ sub-codebooks on a bounded sample (`pq_codebooks`)
  2. encode every vector to 16 small-int codes (`pq_encode`) and
     persist the (id, codes) table — at 100 TB this is the ~16x-smaller
     table queries actually scan; partition it by IVF cell to multiply
     in partition pruning (q194's IVFADC layout)

Online (per query):
  3. `pq_query_encoded` — ADC scan over the codes table (a pure
     codegen LUT expression) + constant 80-row exact rerank

Run:  python examples/ann_serving.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")

import pyspark.sql.functions as F  # noqa: E402

from kstreamjs_spark.operators import similarity  # noqa: E402
from kstreamjs_spark.session import get_spark  # noqa: E402
from kstreamjs_spark.tables import load  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> int:
    spark = get_spark("ann-serving", cpus=4, shuffle_partitions=4)
    (emb,) = load(spark, sf_dir, "embeddings")

    # ---- offline: build the index once
    books = similarity.pq_codebooks(emb, m=16, n_cent=16)
    index_dir = tempfile.mkdtemp(prefix="pq_index_")
    similarity.pq_encode(emb, books, dim=64).select(
        "vec_id", "codes"
    ).write.mode("overwrite").parquet(index_dir)
    print(f"index built: {index_dir} "
          f"({spark.read.parquet(index_dir).count()} codes rows)")

    # ---- online: serve queries against the persisted codes table
    codes = spark.read.parquet(index_dir)
    qv = emb.filter(F.col("vec_id") == 0).select(
        similarity.as_double(F.col("embedding")).alias("qv")
    )
    top = similarity.pq_query_encoded(
        codes, emb, books, qv, k=10, rerank=8
    )
    print("PQ/ADC top-10:")
    top.show(truncate=False)

    # exact baseline for comparison
    print("exact top-10:")
    similarity.topk_cosine(emb, qv, k=10).show(truncate=False)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(*sys.argv[1:]))
