"""Multimodal dedup + retrieval pipeline: the round-9 operators composed
the way a multimodal training-data run actually uses them:

  1. image dedup       BMP decode -> DCT pHash -> Hamming-bucket pairs ->
                       connected components -> keep each cluster's
                       representative (lowest doc_id)
  2. audio dedup       PCM decode -> energy AFP -> same Hamming machinery
  3. lexical scoring   batched BM25: 24 term-set queries scored over the
                       surviving corpus in ONE pass (broadcast query-term
                       fan-out, per-query WindowGroupLimit top-k)
  4. embedding mining  banded-LSH batch k-NN join: hard-negative
                       candidates per query without broadcasting the batch

Blobs are synthesized from document fields here (the container has no
media corpora); in a real run steps 1-2 start from
spark.read.format("binaryFile"). Every step is a DataFrame
transformation — Catalyst sees each stage end-to-end.

Run:  python examples/multimodal_retrieval.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

from kstreamjs_spark.operators import cluster, dedup, similarity  # noqa: E402
from kstreamjs_spark.session import get_spark  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> int:
    spark = get_spark("multimodal-retrieval", cpus=4, shuffle_partitions=4)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # ---- 1. image dedup: pHash pairs -> clusters -> representatives
    from kstreamjs_spark.queries import all_queries

    qs = all_queries()
    img_pairs = qs["q158_phash_image_neardup"].fn(spark, sf_dir)
    comps = cluster.connected_components(img_pairs, src="d1", dst="d2")
    dupes = comps.filter(F.col("node") != F.col("label")).select(
        F.col("node").alias("doc_id")
    )
    kept = docs.join(dupes, "doc_id", "left_anti")
    n_docs, n_kept = docs.count(), kept.count()
    print(f"image dedup: {n_docs} docs -> {n_kept} after pHash clustering")

    # ---- 2. audio dedup over the SAME generic Hamming machinery
    audio_pairs = qs["q160_audio_fingerprint_neardup"].fn(spark, sf_dir)
    print(f"audio near-dup pairs: {audio_pairs.count()}")

    # ---- 3. batched BM25 over the KEPT corpus (the dedup output feeds
    # retrieval — the same single-pass tf+dl machinery the registered
    # q157b uses, applied to the surviving docs)
    from kstreamjs_spark.queries.llm import (
        _BM25B_QUERIES, _BM25B_TERMS, _bm25_quantized_contrib, _bm25_tf_dl,
    )

    qt = spark.createDataFrame(
        [(qid, t) for qid, ts in sorted(_BM25B_QUERIES.items()) for t in ts],
        "query_id long, token string",
    )
    # round-15 shape: the shared base scan returns (tf frame, 1-row
    # stats) — one corpus pass covers both, no second scan+split here
    tf, st = _bm25_tf_dl(kept, _BM25B_TERMS)
    df_tok = tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("df"))
    contrib = (tf.join(F.broadcast(qt), "token")
               .join(F.broadcast(df_tok), "token")
               .crossJoin(F.broadcast(st)))
    scores = (contrib.select("query_id", "doc_id",
                             _bm25_quantized_contrib().alias("q"))
              .groupBy("query_id", "doc_id").agg(F.sum("q").alias("_qs")))
    w = Window.partitionBy("query_id").orderBy(F.desc("_qs"), "doc_id")
    topk = scores.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= 10)
    print(f"bm25 batch over kept corpus: top-k rows for "
          f"{topk.select('query_id').distinct().count()} queries")

    # ---- 4. banded-LSH batch k-NN (hard-negative mining shape)
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"),
        similarity.as_double(F.col("embedding")).alias("qv"),
    )
    knn = similarity.knn_join_lsh_banded(emb, queries, k=3)
    print(f"banded knn: {knn.count()} (qid, neighbor) rows")

    # exact dedup of text content still composes with all of the above
    fp = kept.withColumn("fp", F.xxhash64("text"))
    print(f"exact-text dedup of kept set: {dedup.exact_dedup(fp, ['fp']).count()}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(*sys.argv[1:2]))
