"""Graph-ANN family end to end: build the k-NN graph once, then serve
every downstream shape off it — plain top-k search, attribute-FILTERED
search, corpus-wide near-dup clusters, and streaming index maintenance.

1. BUILD: `similarity.nn_descent` constructs the top-k cosine neighbor
   graph of every embedding in a few rounds of neighbor-of-neighbor
   equi-joins (q218 — N*(2k)^2 candidate cosines per round, never N^2)
2. SEARCH: `similarity.graph_ann_topk` answers a query batch by greedy
   beam walk — O(entries + hops*beam*2k) scored candidates per query
   instead of a scan (q219)
3. FILTERED SEARCH: same walk, predicate applied LAST over everything
   the walk scored, beam widened to ~k/selectivity (q219c, the ACORN
   strategy)
4. DEDUP: threshold the graph's edges into near-dup candidate pairs
   and resolve with connected components (q218b)
5. MAINTAIN: stream new vectors in — each arrival searches the current
   graph, links both directions, and an arrival-flagged refinement
   round lets same-trigger arrivals find each other (q219b)

Run:  python examples/graph_ann_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import pyspark.sql.functions as F  # noqa: E402

from kstreamjs_spark.operators import cluster, similarity  # noqa: E402
from kstreamjs_spark.session import get_spark  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> int:
    spark = get_spark("graph-ann-example", cpus=4, shuffle_partitions=4)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()

    # 1. build the graph (small k for the example corpus)
    g = similarity.nn_descent(emb, k=8, iters=4).drop("rn")
    g = g.localCheckpoint()
    print(f"graph: {g.count()} edges over {n} vectors")

    # 2. top-5 search for a 4-query batch
    qs = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    vv = emb.select(
        F.col("vec_id").alias("node"), F.col("embedding").alias("vec")
    )
    hits = similarity.graph_ann_topk(g, vv, qs, k=5, beam=12, hops=3)
    print(f"search: {hits.count()} result rows (4 queries x top-5)")

    # 3. the same search restricted to label == 1, oversearched beam
    vvf = emb.select(
        F.col("vec_id").alias("node"),
        F.col("embedding").alias("vec"),
        (F.col("label") == 1).alias("keep"),
    )
    fhits = similarity.graph_ann_topk(
        g, vvf, qs, k=5, beam=32, hops=3, filter_col="keep"
    )
    print(f"filtered search: {fhits.count()} label-1 result rows")

    # 4. near-dup clusters from the graph's high-similarity edges
    pairs = (
        g.filter(F.col("score") >= 0.4)
        .select(
            F.least("src", "dst").alias("d1"),
            F.greatest("src", "dst").alias("d2"),
        )
        .distinct()
    )
    comps = cluster.connected_components(pairs, src="d1", dst="d2")
    print(f"dedup: {comps.select('label').distinct().count()} clusters")

    # 5. streaming maintenance: seed on the first half, insert the rest
    from kstreamjs_spark.queries.streaming_q import (
        knn_graph_insert_stream,
    )
    from kstreamjs_spark.streaming.replay import stream_table

    seed = emb.filter(F.col("vec_id") < n // 2)
    maintained = knn_graph_insert_stream(
        stream_table(spark, sf_dir, "embeddings"),
        seed,
        k=8,
        refine_rounds=1,
    )
    print(f"maintained index: {maintained.count()} edges after insert")

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(*sys.argv[1:]))
