"""End-to-end corpus-curation pipeline: the operators the query inventory
proves one-by-one (SURVEY.md §2B), composed the way a training-data run
actually uses them:

  1. exact dedup        keep the lowest doc_id per content fingerprint
  2. near-dup dedup     MinHash-LSH candidates -> connected components ->
                        longest-member keeper per cluster
  2b. boilerplate cut   exact-substring duplicated-span fraction (q175's
                        suffix-array family) drops template-heavy docs
  3. quality gate       integer band score (length / stopwords / repetition)
  4. decontamination    drop docs sharing 5-gram shingles with the held-out
                        eval slice
  5. weighted sample    sequential Poisson priority draw per language
  6. sequence packing   greedy first-fit into 2048-token bins

Every step is a pure DataFrame transformation — the whole pipeline is ONE
lazy plan until the final actions, so Catalyst sees it end-to-end.

Run:  python examples/curation_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

from kstreamjs_spark.operators import cluster, dedup, packing, sampling, text  # noqa: E402
from kstreamjs_spark.session import get_spark  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> int:
    spark = get_spark("curation-pipeline", cpus=4, shuffle_partitions=4)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1. Exact dedup: lowest doc_id wins per fingerprint.
    wfp = Window.partitionBy("fp").orderBy("doc_id")
    docs = (
        docs.withColumn("fp", text.fingerprint("text"))
        .withColumn("rn", F.row_number().over(wfp))
        .filter(F.col("rn") == 1)
        .drop("fp", "rn")
    )
    n1 = docs.count()

    # 2. Near-dup dedup: LSH pairs -> clusters -> keep the longest member.
    pairs = dedup.minhash_verified_pairs(docs, threshold=0.5)
    labels = cluster.connected_components(pairs, src="d1", dst="d2")
    members = labels.join(
        docs.select(
            F.col("doc_id").alias("node"),
            F.size(F.split("text", " ")).alias("len_"),
        ),
        "node",
    )
    wk = Window.partitionBy("label").orderBy(F.desc("len_"), F.asc("node"))
    drop = (
        members.withColumn("krn", F.row_number().over(wk))
        .filter(F.col("krn") > 1)
        .select(F.col("node").alias("doc_id"))
    )
    docs = docs.join(drop, "doc_id", "left_anti")
    n2 = docs.count()

    # 2b. Sub-document boilerplate cut (q175's suffix-array family):
    #     drop docs where >= 60% of tokens sit inside a duplicated span.
    #     On THIS synthetic corpus duplication is whole-document, so the
    #     doc-level dedup above already caught it and this step passes
    #     everything — on a real crawl (shared headers/footers inside
    #     otherwise-distinct pages) this is the step that bites.
    boiler = (
        dedup.substring_dup_spans(docs, width=8)
        .filter(F.col("dup_permille") >= 600)
        .select("doc_id")
    )
    docs = docs.join(boiler, "doc_id", "left_anti")
    n2b = docs.count()

    # 3. Quality gate: all three integer criteria must hold (band == 3).
    toks = text.tokens("text")
    tri = dedup.shingle_list("text", 3)
    from kstreamjs_spark.queries.llm import ALL_STOP

    docs = docs.withColumn("n_tok", F.size(toks)).filter(
        (F.col("n_tok").between(10, 500))
        & (text.stopword_hits(toks, ALL_STOP) * 10000 >= F.col("n_tok") * 200)
        & (
            F.size(F.array_distinct(tri)) * 10000
            >= F.size(tri) * 7000
        )
    )
    n3 = docs.count()

    # 4. Decontamination against the 2% eval slice (q77's broadcast shape).
    is_eval = sampling.sample_predicate("doc_id", 0.02, seed=13)
    eval_shingles = (
        docs.filter(is_eval)
        .select(F.explode(dedup.shingles("text", 5)).alias("g"))
        .distinct()
    )
    contaminated = (
        docs.filter(~is_eval)
        .select("doc_id", F.explode(dedup.shingles("text", 5)).alias("g"))
        .join(F.broadcast(eval_shingles), "g", "left_semi")
        .select("doc_id")
        .distinct()
    )
    docs = docs.filter(~is_eval).join(contaminated, "doc_id", "left_anti")
    n4 = docs.count()

    # 5. Weighted priority sample, 100 docs per language (q113's draw).
    u = sampling.hash_bucket("doc_id", seed=7) + F.lit(1)
    pr = u.cast("double") / F.greatest(F.col("n_chars"), F.lit(1)).cast("double")
    wl = Window.partitionBy("lang").orderBy("pr", "doc_id")
    docs = (
        docs.withColumn("pr", pr)
        .withColumn("srn", F.row_number().over(wl))
        .filter(F.col("srn") <= 100)
        .drop("pr", "srn")
    )
    n5 = docs.count()

    # 6. Pack into 2048-token bins (distributed prefix sum, q66's operator).
    base = docs.select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tokens"),
        sampling.hash_bucket("doc_id", seed=41).alias("h"),
    )
    packed = packing.sequence_pack(base, "n_tokens", 2048, ["h", "doc_id"])
    n_bins = packed.select("pack_id").distinct().count()

    print(
        f"raw={n0} exact-dedup={n1} near-dedup={n2} boilerplate={n2b} "
        f"quality={n3} decontaminated={n4} sampled={n5} bins={n_bins}"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(*sys.argv[1:]))
