"""Corpus-curation queries, round 4: benchmark decontamination, repetition
filtering, group-aware splits, vocabulary coverage, embedding clustering
and quantization, replication upsampling, lexical-diversity stats, and
text normalization.

None of these exist in the reference (its whole surface is the 12-operator
Kafka DSL, reference src/stream.ts:18-271); they are the north-star
operations a 100 TB training-data pipeline runs between ingestion and
tokenization. Oracles mirror the Spark expressions symbol-for-symbol
(sampling/text helpers own the shared constants)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..operators import dedup, kmeans, sampling, text
from ..operators.sampling import hash_bucket_sql, sample_hash_sql
from ..tables import load
from . import query

# 5-token shingles for decontamination (long enough that a shared shingle
# means real overlap, short enough to catch partial containment).
_DECON_N = 5
_EVAL_FRACTION = 0.02
_EVAL_SEED = 13


def _shingle_sql(n: int, distinct: bool = True) -> str:
    """DuckDB n-gram list over string_split(text,' ') — the SQL mirror of
    operators.dedup.shingles / shingle_list."""
    parts = " || ' ' || ".join(
        f"string_split(text,' ')[i+{j}]" if j else "string_split(text,' ')[i]"
        for j in range(n)
    )
    lst = (
        f"list_transform(generate_series(1, len(string_split(text,' ')) - {n - 1}), "
        f"i -> {parts})"
    )
    return f"list_distinct({lst})" if distinct else lst


# ------------------------------------------- Q77 benchmark decontamination
# One oracle text for BOTH decontamination paths: q77 (exact broadcast
# semi-join) and q77b (bloom prefilter + exact verify) answer the same
# question, so any divergence between the two engine plans is caught by
# the same compare.
_Q77_ORACLE = f"""
        WITH sh AS (
          SELECT doc_id, lang, {_shingle_sql(_DECON_N)} AS s,
                 {sample_hash_sql('doc_id', _EVAL_FRACTION, seed=_EVAL_SEED)}
                     AS is_eval
          FROM documents
        ),
        evs AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE is_eval),
        contam AS (
          SELECT DISTINCT doc_id, lang
          FROM (SELECT doc_id, lang, unnest(s) AS g FROM sh
                WHERE NOT is_eval) t
          WHERE g IN (SELECT g FROM evs)
        )
        SELECT tr.lang,
               CAST(COUNT(*) AS BIGINT) AS n_train,
               CAST(COALESCE(SUM(CASE WHEN c.doc_id IS NOT NULL
                                      THEN 1 END), 0) AS BIGINT)
                   AS n_contaminated
        FROM (SELECT doc_id, lang FROM sh WHERE NOT is_eval) tr
        LEFT JOIN contam c USING (doc_id, lang)
        GROUP BY tr.lang
        ORDER BY tr.lang
    """


@query(
    "q77_decontaminate",
    oracle=_Q77_ORACLE,
    tags=("dedup", "llm", "decontamination"),
    bench=True,
)
def q77(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    5-token shingle with the held-out eval set (here a deterministic 2%
    doc_id-hash carve-out standing in for a real benchmark suite).

    Scale shape (100 TB): the eval side is benchmark-sized (thousands of
    docs -> at most millions of distinct shingles), so its shingle set
    BROADCASTS; the training side is one scan + explode semi-joined
    against that broadcast — no shuffle of the corpus, and the only
    exchange is the contaminated-id distinct (bounded by the hit count).
    """
    from ..operators import bloom as bloom_ops

    (docs,) = load(spark, sf, "documents")
    is_eval = sampling.sample_predicate("doc_id", _EVAL_FRACTION, seed=_EVAL_SEED)
    eval_shingles = (
        docs.filter(is_eval)
        .select(F.explode(dedup.shingles("text", _DECON_N)).alias("g"))
        .distinct()
    )
    train = docs.filter(~is_eval)
    train_shingles = train.select(
        "doc_id", "lang", F.explode(dedup.shingles("text", _DECON_N)).alias("g")
    )
    contaminated = (
        # the shared decontamination entry point, regime PINNED to
        # broadcast so this query stays the explicit exemplar of that
        # plan shape (member_semijoin's auto rule picks the same one
        # here — tests/test_plans.py pins the auto selection)
        bloom_ops.member_semijoin(
            train_shingles, eval_shingles, "g", regime="broadcast"
        )
        .select("doc_id", "lang")
        .distinct()
    )
    return (
        train.groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_train"))
        .join(
            contaminated.groupBy("lang")
            .agg(F.count(F.lit(1)).cast("long").alias("n_contaminated")),
            "lang",
            "left",
        )
        .select(
            "lang",
            "n_train",
            F.coalesce("n_contaminated", F.lit(0).cast("long")).alias(
                "n_contaminated"
            ),
        )
        .orderBy("lang")
    )


@query(
    "q77b_decontaminate_bloom",
    oracle=_Q77_ORACLE,
    tags=("dedup", "llm", "decontamination", "bloom"),
)
def q77b(spark: SparkSession, sf: str) -> DataFrame:
    """q77's exact answer through the BLOOM regime: the pattern for when
    the eval shingle set is too large to broadcast exactly but its bloom
    bits always fit (operators/bloom.py — JVM xxhash64 positions,
    distributed-deduped build, Arrow-vectorized bitset probe).

    Plan shape: the corpus-sized exploded-shingle side is prefiltered
    scan-side by the bloom (no shuffle spent on definite non-members;
    false-positive rate ~2e-4 at this sizing), and only the survivors
    reach the exact verify semi-join that removes bloom false positives
    — so the result is EXACTLY q77's (same oracle text), while the join
    input shrinks from every training shingle to true hits + fpr noise.
    At 100 TB that is the difference between shuffling the corpus and
    shuffling the contamination."""
    from ..operators import bloom as bloom_ops

    (docs,) = load(spark, sf, "documents")
    is_eval = sampling.sample_predicate("doc_id", _EVAL_FRACTION, seed=_EVAL_SEED)
    eval_shingles = (
        docs.filter(is_eval)
        .select(F.explode(dedup.shingles("text", _DECON_N)).alias("g"))
        .distinct()
    )
    train = docs.filter(~is_eval)
    train_shingles = train.select(
        "doc_id", "lang", F.explode(dedup.shingles("text", _DECON_N)).alias("g")
    )
    contaminated = (
        # the shared decontamination entry point, regime PINNED to bloom
        # so this query stays the explicit exemplar of that plan shape.
        # member_semijoin materializes the eval shingle set ONCE (both
        # the bloom build and the verify semi-join consume it;
        # plans.materialize_once upgrades to reliable checkpoint() on a
        # cluster). ~50k distinct eval shingles at sf0.1 -> 1M bits
        # (128 KB) keeps the survivor set at true hits + ~2e-4 noise.
        bloom_ops.member_semijoin(
            train_shingles, eval_shingles, "g",
            regime="bloom", num_bits=1 << 20,
        )
        .select("doc_id", "lang")
        .distinct()
    )
    return (
        train.groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_train"))
        .join(
            contaminated.groupBy("lang")
            .agg(F.count(F.lit(1)).cast("long").alias("n_contaminated")),
            "lang",
            "left",
        )
        .select(
            "lang",
            "n_train",
            F.coalesce("n_contaminated", F.lit(0).cast("long")).alias(
                "n_contaminated"
            ),
        )
        .orderBy("lang")
    )


# --------------------------------------------- Q78 intra-doc repetition
@query(
    "q78_repetition_ratio",
    oracle=f"""
        WITH t AS (
          SELECT doc_id, {_shingle_sql(3, distinct=False)} AS tri
          FROM documents
        )
        SELECT doc_id,
               CAST(len(tri) AS BIGINT) AS n_tri,
               CAST(len(list_distinct(tri)) AS BIGINT) AS n_uniq,
               ROUND((len(tri) - len(list_distinct(tri))) * 1.0
                     / len(tri), 6) AS rep_ratio
        FROM t
        WHERE len(tri) > 0
        ORDER BY doc_id
    """,
    tags=("text", "llm", "quality"),
)
def q78(spark: SparkSession, sf: str) -> DataFrame:
    """Intra-document repetition ratio — the fraction of trigram
    occurrences that are duplicates of an earlier trigram in the SAME
    document (boilerplate / degenerate-generation filter; near-1 means the
    text loops). Pure scan-side array expressions: no explode, no shuffle,
    no UDF — per-doc metrics at 100 TB are a map-only pass."""
    (docs,) = load(spark, sf, "documents")
    tri = dedup.shingle_list("text", 3)
    out = docs.select(
        "doc_id",
        F.size(tri).cast("long").alias("n_tri"),
        F.size(F.array_distinct(tri)).cast("long").alias("n_uniq"),
    )
    return (
        out.filter(F.col("n_tri") > 0)
        .withColumn(
            "rep_ratio",
            F.round(
                (F.col("n_tri") - F.col("n_uniq")) * F.lit(1.0) / F.col("n_tri"), 6
            ),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------- Q79 group-aware train split
_SPLIT_SEED = 29
_TRAIN_FRACTION = 0.9


def _source_split():
    """The source-atomic train/val split expression — THE single
    definition (q79 declares it; q100/q106/q106b/q116 must audit the
    same split, so they all call this instead of re-spelling it)."""
    return F.when(
        sampling.hash_bucket(
            text.portable_string_hash("source"), seed=_SPLIT_SEED
        )
        < F.lit(int(_TRAIN_FRACTION * 4294967296)),
        F.lit("train"),
    ).otherwise(F.lit("val"))


# DuckDB spelling of _source_split(), interpolated into every
# split-bearing oracle — same single-source-of-truth rule.
_SPLIT_CASE_SQL = (
    f"CASE WHEN {hash_bucket_sql(text.portable_string_hash_sql('source'), _SPLIT_SEED)}"
    f" < {int(_TRAIN_FRACTION * 4294967296)}"
    " THEN 'train' ELSE 'val' END"
)


@query(
    "q79_group_split",
    oracle=f"""
        WITH d AS (
          SELECT lang, source,
                 {_SPLIT_CASE_SQL} AS split
          FROM documents
        )
        SELECT split, lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
        FROM d
        GROUP BY split, lang
        ORDER BY split, lang
    """,
    tags=("sampling", "llm"),
)
def q79(spark: SparkSession, sf: str) -> DataFrame:
    """Group-aware train/val split: the split key is the SOURCE (domain),
    not the document, so near-duplicates within one source can never leak
    across the boundary — the property a random row-level split destroys.
    Deterministic (portable string hash -> LCG bucket), scan-side, zero
    shuffle for the split itself. Group-atomicity is unit-tested: every
    source lands in exactly one split."""
    (docs,) = load(spark, sf, "documents")
    split = _source_split()
    return (
        docs.select(split.alias("split"), "lang", "source")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("source").cast("long").alias("n_sources"),
        )
        .orderBy("split", "lang")
    )


# --------------------------------------------- Q80 vocabulary coverage
_VOCAB_K = 100


@query(
    "q80_vocab_coverage",
    oracle=f"""
        WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token
                     FROM documents),
        c AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token),
        total AS (SELECT SUM(cnt) AS n FROM c),
        top AS (SELECT token, cnt FROM c
                ORDER BY cnt DESC, token LIMIT {_VOCAB_K})
        SELECT CAST(ROW_NUMBER() OVER w AS BIGINT) AS rank,
               token,
               CAST(cnt AS BIGINT) AS cnt,
               ROUND(CAST(SUM(cnt) OVER w AS DOUBLE)
                     / (SELECT n FROM total), 6) AS cum_share
        FROM top
        WINDOW w AS (ORDER BY cnt DESC, token
                     ROWS UNBOUNDED PRECEDING)
        ORDER BY rank
    """,
    tags=("text", "llm"),
)
def q80(spark: SparkSession, sf: str) -> DataFrame:
    """Top-100 vocabulary with cumulative corpus coverage — the curve a
    tokenizer budget is tuned against. The token count is a map-combined
    aggregation (shuffle is vocabulary-sized, not corpus-sized); the
    cumulative window runs AFTER the top-K cut, over exactly K rows in one
    bounded partition (the corpus-sized prefix sum this avoids is q66's
    operator). The grand total rides along as a broadcast scalar."""
    (docs,) = load(spark, sf, "documents")
    counts = (
        docs.select(F.explode(text.tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    total = counts.agg(F.sum("cnt").cast("long").alias("n"))
    top = counts.orderBy(F.col("cnt").desc(), "token").limit(_VOCAB_K)
    w = (
        Window.orderBy(F.col("cnt").desc(), "token")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            F.row_number()
            .over(Window.orderBy(F.col("cnt").desc(), "token"))
            .cast("long")
            .alias("rank"),
            "token",
            "cnt",
            F.round(
                F.sum("cnt").over(w).cast("double") / F.col("n"), 6
            ).alias("cum_share"),
        )
        .orderBy("rank")
    )


# --------------------------------------------- Q81 spherical k-means assign
_KMEANS_K = 8


def _kmeans_assign_oracle_cte(extra_cols: tuple[str, ...] = ()) -> str:
    """Shared DuckDB fragment (CTEs ``c`` + ``a``): first-k centroids and
    the rank-based max-cosine assignment, ties to the lowest cid — the SQL
    mirror of kmeans.initial_centroids + kmeans.assign, with one spelling
    for every oracle that consumes an assignment (q87, q91; q81's adds a
    sim column and q81b re-derives centroids per Lloyd round, so those two
    keep their specialized variants)."""
    sel = "".join(f", e.{c}" for c in extra_cols)
    keep = "".join(f", {c}" for c in extra_cols)
    return f"""c AS (
          SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid,
                 embedding::DOUBLE[] AS cv
          FROM embeddings ORDER BY vec_id LIMIT {_KMEANS_K}
        ),
        a AS (
          SELECT vec_id{keep}, cid FROM (
            SELECT e.vec_id{sel}, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                       ORDER BY list_cosine_similarity(
                                    e.embedding::DOUBLE[], c.cv) DESC,
                                c.cid) AS rn
            FROM embeddings e CROSS JOIN c) WHERE rn = 1
        )"""


@query(
    "q81_kmeans_assign",
    oracle=f"""
        WITH c AS (
          SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid,
                 embedding::DOUBLE[] AS cv
          FROM embeddings ORDER BY vec_id LIMIT {_KMEANS_K}
        ),
        s AS (
          SELECT e.vec_id, c.cid,
                 list_cosine_similarity(e.embedding::DOUBLE[], c.cv) AS sim
          FROM embeddings e CROSS JOIN c
        ),
        b AS (
          SELECT vec_id, cid, sim,
                 ROW_NUMBER() OVER (PARTITION BY vec_id
                                    ORDER BY sim DESC, cid) AS rn
          FROM s
        )
        SELECT CAST(cid AS BIGINT) AS cid,
               CAST(COUNT(*) AS BIGINT) AS n_vecs,
               ROUND(CAST(SUM(CAST(floor(sim * 10000 + 0.5) AS BIGINT))
                          AS DOUBLE) / (COUNT(*) * 10000.0), 6) AS mean_sim
        FROM b WHERE rn = 1
        GROUP BY cid ORDER BY cid
    """,
    tags=("similarity", "llm", "clustering"),
    bench=True,
)
def q81(spark: SparkSession, sf: str) -> DataFrame:
    """Spherical k-means ASSIGNMENT (k=8, deterministic first-k init):
    every embedding goes to its max-cosine centroid, ties to the lowest
    cid. The centroids are plan literals, so the whole assignment is one
    codegen'd projection over the scan — no join, no shuffle (see
    operators/kmeans.py for the 100 TB argument). Mean similarity uses the
    quantized-sum idiom for cross-engine double determinism."""
    (emb,) = load(spark, sf, "embeddings")
    cents = kmeans.initial_centroids(emb, _KMEANS_K)
    assigned = kmeans.assign(emb, cents)
    return (
        assigned.select(
            "cid", F.floor(F.col("sim") * 10000 + 0.5).cast("long").alias("qsim")
        )
        .groupBy("cid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.round(
                F.sum("qsim").cast("double")
                / (F.count(F.lit(1)) * F.lit(10000.0)),
                6,
            ).alias("mean_sim"),
        )
        .orderBy("cid")
    )


def _q81b_oracle(k: int, iters: int) -> str:
    """DuckDB unroll of ``iters`` Lloyd refinements (deterministic first-k
    init): because the iteration count and seeding are fixed, the "loop"
    is a finite CTE chain — assign (rank by cosine, ties to lowest cid) ->
    per-(cid,dim) mean of UNIT vectors -> renormalize (empty cluster keeps
    its previous centroid; zero-norm mean divides by 1.0, both mirroring
    operators/kmeans.py:lloyd_iterate) -> repeat -> final assignment
    counts. Counts are exact integers, so the comparison is a true
    hash-match; fp noise between engines only matters at exact
    centroid-similarity ties."""

    def assign_cte(label: str, cents: str) -> str:
        return f"""
        {label} AS (
          SELECT vec_id, cid FROM (
            SELECT e.vec_id, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                       ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid)
                       AS rn
            FROM e CROSS JOIN {cents} c) WHERE rn = 1
        )"""

    def update_ctes(i: int, prev_assign: str, prev_cents: str) -> str:
        return f"""
        m{i} AS (
          SELECT cid, dim,
                 SUM(CAST(floor(x * 1000000000 + 0.5) AS BIGINT))
                     / (COUNT(*) * 1000000000.0) AS m
          FROM (
            SELECT {prev_assign}.cid, generate_subscripts(u.uv, 1) AS dim,
                   unnest(u.uv) AS x
            FROM {prev_assign} JOIN u USING (vec_id))
          GROUP BY cid, dim),
        g{i} AS (
          SELECT cid, ml, CASE WHEN s = 0 THEN 1.0 ELSE s END AS s FROM (
            SELECT cid, ml, sqrt(list_sum(list_transform(ml, y -> y*y))) AS s
            FROM (SELECT cid, list(m ORDER BY dim) AS ml
                  FROM m{i} GROUP BY cid))),
        c{i} AS (
          SELECT c.cid, CASE WHEN g.ml IS NULL THEN c.cv
                 ELSE list_transform(g.ml, x -> x / g.s) END AS cv
          FROM {prev_cents} c LEFT JOIN g{i} g USING (cid))"""

    parts = [f"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        u AS (SELECT vec_id,
                     list_transform(v, x -> CASE WHEN nrm = 0 THEN 0.0
                                            ELSE x / nrm END) AS uv
              FROM (SELECT vec_id, v,
                           sqrt(list_sum(list_transform(v, y -> y*y))) AS nrm
                    FROM e)),
        c0 AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
               FROM e ORDER BY vec_id LIMIT {k})"""]
    prev_c = "c0"
    for i in range(1, iters + 1):
        parts.append(assign_cte(f"a{i}", prev_c))
        parts.append(update_ctes(i, f"a{i}", prev_c))
        prev_c = f"c{i}"
    parts.append(assign_cte("af", prev_c))
    return ("WITH " + ",".join(parts) + """
        SELECT CAST(cid AS BIGINT) AS cid, CAST(COUNT(*) AS BIGINT) AS n_vecs
        FROM af GROUP BY cid ORDER BY cid""")


@query(
    "q81b_kmeans_lloyd",
    oracle=_q81b_oracle(_KMEANS_K, 2),
    tags=("similarity", "llm", "clustering"),
)
def q81b(spark: SparkSession, sf: str) -> DataFrame:
    """Two Lloyd refinements on top of q81's init, then the final cluster
    sizes. Iterative, but with a FIXED iteration count and deterministic
    init it is SQL-expressible after all: the oracle (_q81b_oracle) unrolls
    both refinements as DuckDB CTEs, promoting this from a rows-only check
    to a full hash-match. The objective-improvement property is
    additionally unit-tested in tests/test_corpus.py."""
    (emb,) = load(spark, sf, "embeddings")
    cents = kmeans.initial_centroids(emb, _KMEANS_K)
    cents = kmeans.lloyd_iterate(emb, cents, iters=2)
    return (
        kmeans.assign(emb, cents)
        .groupBy("cid")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vecs"))
        .orderBy("cid")
    )


# --------------------------------------------- Q82 replication upsampling
_UPSAMPLE_K = 200
_UPSAMPLE_SEED = 31


@query(
    "q82_upsample_replicate",
    oracle=f"""
        WITH n AS (SELECT lang, COUNT(*) AS n_l FROM documents GROUP BY lang),
        rep AS (
          SELECT d.doc_id, d.lang, t.rep_idx
          FROM documents d
          JOIN n USING (lang),
          UNNEST(generate_series(1,
                 CAST(({_UPSAMPLE_K} + n.n_l - 1) // n.n_l AS BIGINT)))
              AS t(rep_idx)
        ),
        ranked AS (
          SELECT lang, doc_id, rep_idx,
                 ROW_NUMBER() OVER (
                     PARTITION BY lang
                     ORDER BY {hash_bucket_sql('doc_id', _UPSAMPLE_SEED)},
                              doc_id, rep_idx) AS rn
          FROM rep
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM ranked WHERE rn <= {_UPSAMPLE_K}
        GROUP BY lang ORDER BY lang
    """,
    tags=("sampling", "llm"),
)
def q82(spark: SparkSession, sf: str) -> DataFrame:
    """Low-resource upsampling by integer replication to a fixed per-lang
    row budget (K=200): each document repeats ceil(K / n_lang) times, then
    the stream is trimmed to exactly K rows per lang in deterministic hash
    order — so every language exits with exactly K rows (over-represented
    ones downsample, scarce ones replicate). All-integer arithmetic ->
    engine-exact.
    Scale: the per-lang counts are a tiny broadcast; replication is a
    scan-side explode of a sequence (no shuffle); the trim is one
    window per lang with WindowGroupLimit pushing rn<=K below the
    exchange."""
    (docs,) = load(spark, sf, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_l"))
    # ceil(K / n_l) in exact integer arithmetic (mirrors the oracle's
    # (K + n_l - 1) // n_l), so n_l * factor >= K always: the rn <= K trim
    # lands on exactly K rows per language.
    factor = F.floor(
        (F.lit(_UPSAMPLE_K) + F.col("n_l") - 1) / F.col("n_l")
    ).cast("long")
    rep = (
        docs.select("doc_id", "lang")
        .join(F.broadcast(counts), "lang")
        .withColumn("rep_idx", F.explode(F.sequence(F.lit(1).cast("long"), factor)))
    )
    rn = F.row_number().over(
        Window.partitionBy("lang").orderBy(
            sampling.hash_bucket("doc_id", _UPSAMPLE_SEED), "doc_id", "rep_idx"
        )
    )
    return (
        rep.withColumn("rn", rn)
        .filter(F.col("rn") <= _UPSAMPLE_K)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
        )
        .orderBy("lang")
    )


# --------------------------------------------- Q83 lexical diversity stats
@query(
    "q83_ttr_stats",
    oracle="""
        WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS token
                     FROM documents),
        c AS (SELECT lang, token, COUNT(*) AS cnt FROM tok GROUP BY 1, 2)
        SELECT lang,
               CAST(SUM(cnt) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_hapax,
               ROUND(COUNT(*) * 1.0 / SUM(cnt), 6) AS ttr
        FROM c GROUP BY lang ORDER BY lang
    """,
    tags=("text", "llm"),
)
def q83(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language lexical diversity: token count, type (distinct token)
    count, hapax legomena count, and type-token ratio — the corpus-health
    numbers that catch template-generated or looping text at a glance.
    One explode + two map-combined aggregations; the shuffle carries
    (lang, token) counts, i.e. vocabulary-sized."""
    (docs,) = load(spark, sf, "documents")
    c = (
        docs.select("lang", F.explode(text.tokens("text")).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        c.groupBy("lang")
        .agg(
            F.sum("cnt").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_hapax"),
            F.round(
                F.count(F.lit(1)) * F.lit(1.0) / F.sum("cnt"), 6
            ).alias("ttr"),
        )
        .orderBy("lang")
    )


# --------------------------------------------- Q84 text normalization
@query(
    "q84_normalize_text",
    oracle=f"""
        SELECT doc_id, {text.normalize_text_sql('text')} AS norm_text
        FROM documents ORDER BY doc_id
    """,
    tags=("text", "llm"),
)
def q84(spark: SparkSession, sf: str) -> DataFrame:
    """Canonical text normalization (lowercase, strip punctuation,
    collapse whitespace) — the first step before fingerprinting or
    shingling. Byte-for-byte hash-matched against the SQL mirror; the
    regexes are character-class-only so Java and RE2 agree. Pure
    scan-side codegen, zero shuffle."""
    (docs,) = load(spark, sf, "documents")
    return docs.select(
        "doc_id", text.normalize_text("text").alias("norm_text")
    ).orderBy("doc_id")


# ------------------------------------------ Q84b Unicode NFC normalization
@query(
    "q84b_unicode_nfc",
    oracle="""
        SELECT doc_id,
               CAST(length(decorated) AS BIGINT) AS len_decomposed,
               CAST(length(nfc_normalize(decorated)) AS BIGINT) AS len_nfc,
               nfc_normalize(decorated) AS nfc_text
        FROM (SELECT doc_id,
                     text || ' cafe' || chr(769) || ' A' || chr(778)
                          || ' n' || chr(771) AS decorated
              FROM documents)
        ORDER BY doc_id
    """,
    tags=("text", "llm"),
)
def q84b(spark: SparkSession, sf: str) -> DataFrame:
    """Unicode NFC normalization (round 12; UAX #15, public) — the step
    q84's regex-class normalization skips and every real multilingual
    pipeline needs: canonically equivalent strings ("e" + COMBINING
    ACUTE vs precomposed U+00E9) must hash/shingle/dedup identically.
    The corpus text is ASCII, so each doc is DECORATED with a
    deterministic decomposed suffix (combining acute/ring/tilde, built
    from identical literals on both engines) and normalized through the
    Arrow kernel (operators/text.py:unicode_normalize, stdlib
    unicodedata); the oracle runs DuckDB's utf8proc ``nfc_normalize``
    on the same bytes — codepoint lengths before/after AND the full
    normalized string hash-match, proving the two normalization tables
    agree. BMP-only suffix so Spark's UTF-16 length == DuckDB's
    codepoint length. Scan-side projection, zero shuffle; the
    composition test (fingerprint stability across NFC/NFD variants)
    lives in tests/test_corpus.py."""
    (docs,) = load(spark, sf, "documents")
    decorated = F.concat(
        # decomposed combining sequences, escape-built so nothing
        # can silently precompose them (mirrors the oracle chr()s)
        "text", F.lit(" cafe\u0301 A\u030a n\u0303")
    ).alias("decorated")
    return (
        docs.select("doc_id", decorated)
        .select(
            "doc_id",
            F.length("decorated").cast("long").alias("len_decomposed"),
            # normalize ONCE and derive both columns from the alias —
            # two unicode_normalize calls are two distinct pandas_udf
            # instances Spark cannot common-subexpression-eliminate
            # (round-12 review find: the Arrow round-trip ran twice)
            text.unicode_normalize("decorated", "NFC").alias("nfc_text"),
        )
        .select(
            "doc_id",
            "len_decomposed",
            F.length("nfc_text").cast("long").alias("len_nfc"),
            "nfc_text",
        )
        .orderBy("doc_id")
    )


# --------------------------------------------- Q85 embedding quantization
@query(
    "q85_quantize_embeddings",
    oracle="""
        WITH q AS (
          SELECT vec_id,
                 list_transform(
                     embedding::DOUBLE[],
                     x -> CASE WHEN m = 0 THEN CAST(0 AS BIGINT)
                          ELSE GREATEST(-127, LEAST(127,
                               CAST(floor(x * (127.0 / m) + 0.5) AS BIGINT)))
                          END
                 ) AS qv
          FROM (SELECT vec_id, embedding,
                       list_max(list_transform(embedding::DOUBLE[],
                                               x -> abs(x))) AS m
                FROM embeddings)
        )
        SELECT vec_id,
               CAST(list_sum(qv) AS BIGINT) AS q_sum,
               CAST(len(list_filter(qv, x -> abs(x) = 127)) AS BIGINT)
                   AS n_sat
        FROM q ORDER BY vec_id
    """,
    tags=("similarity", "llm"),
)
def q85(spark: SparkSession, sf: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column (per-vector
    absmax scaling — the storage/ANN-memory reduction step). The check
    compares the exact integer checksum and saturation count per vector;
    the scale arithmetic is plain IEEE double (identical across engines)
    and floor(x+0.5) avoids the engines' round() tie conventions. An
    all-zero vector (absmax m=0, which would make 127.0/m = Inf and
    0.0*Inf = NaN — with engine-dependent NaN propagation) quantizes to
    all zeros, guarded identically on both sides. The vector and its
    absmax are bound once per row (dedup.bind) — referencing m inside the
    transform lambda would recompute the absmax per element. Pure
    scan-side array expressions, zero shuffle."""
    from ..operators.dedup import bind
    from ..operators.similarity import as_double

    (emb,) = load(spark, sf, "embeddings")

    def quant(dv: F.Column, m: F.Column) -> F.Column:
        return F.transform(
            dv,
            lambda x: F.when(m == 0.0, F.lit(0).cast("long")).otherwise(
                F.greatest(
                    F.lit(-127).cast("long"),
                    F.least(
                        F.lit(127).cast("long"),
                        F.floor(x * (F.lit(127.0) / m) + 0.5),
                    ),
                )
            ),
        )

    qv = bind(
        as_double(F.col("embedding")),
        lambda dv: bind(F.array_max(F.transform(dv, F.abs)), lambda m: quant(dv, m)),
    )
    return emb.select(
        "vec_id",
        F.aggregate(qv, F.lit(0).cast("long"), lambda a, x: a + x).alias("q_sum"),
        F.size(F.filter(qv, lambda x: F.abs(x) == 127)).cast("long").alias("n_sat"),
    ).orderBy("vec_id")


# --------------------------------------- Q87 cluster evaluation: purity
@query(
    "q87_cluster_purity",
    oracle=f"""
        WITH {_kmeans_assign_oracle_cte(("label",))},
        cl AS (SELECT cid, label, COUNT(*) AS n_label
               FROM a GROUP BY cid, label),
        tot AS (SELECT cid, SUM(n_label) AS n_total FROM cl GROUP BY cid),
        maj AS (
          SELECT cid, label, n_label FROM (
            SELECT cid, label, n_label,
                   ROW_NUMBER() OVER (PARTITION BY cid
                       ORDER BY n_label DESC, label) AS rn
            FROM cl) WHERE rn = 1
        )
        SELECT maj.cid,
               CAST(maj.label AS BIGINT) AS majority_label,
               CAST(maj.n_label AS BIGINT) AS n_label,
               CAST(tot.n_total AS BIGINT) AS n_total,
               ROUND(maj.n_label * 1.0 / tot.n_total, 6) AS purity
        FROM maj JOIN tot USING (cid)
        ORDER BY cid
    """,
    tags=("similarity", "llm", "clustering", "evaluation"),
)
def q87(spark: SparkSession, sf: str) -> DataFrame:
    """Clustering evaluation against the embeddings table's ground-truth
    `label` column: per k-means cluster (q81's deterministic assignment),
    the majority label, its count, the cluster size, and the purity
    ratio — the go/no-go metric before using cluster-balanced sampling
    downstream. All counting is exact integers; purity is one exact
    int/int division rounded at 6 dp. Scale: reuses q81's zero-shuffle
    assignment; everything after is k×|labels| aggregate cells."""
    (emb,) = load(spark, sf, "embeddings")
    cents = kmeans.initial_centroids(emb, _KMEANS_K)
    assigned = kmeans.assign(emb, cents)
    cl = assigned.groupBy("cid", "label").agg(
        F.count(F.lit(1)).alias("n_label")
    )
    tot = cl.groupBy("cid").agg(F.sum("n_label").alias("n_total"))
    w = Window.partitionBy("cid").orderBy(F.desc("n_label"), F.asc("label"))
    maj = cl.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        maj.join(tot, "cid")
        .select(
            "cid",
            F.col("label").cast("long").alias("majority_label"),
            F.col("n_label").cast("long").alias("n_label"),
            F.col("n_total").cast("long").alias("n_total"),
            F.round(
                F.col("n_label") * F.lit(1.0) / F.col("n_total"), 6
            ).alias("purity"),
        )
        .orderBy("cid")
    )


# ------------------------------- Q88 percentile length trim (histogram)
def _length_bounds_sql(src: str) -> str:
    """Shared DuckDB fragment (CTEs ``n``/``h``/``cum``/``lo``/``hi``):
    exact per-lang [p5, p95] length thresholds from the (lang, L)
    histogram of ``src`` — one spelling for every oracle that trims by
    length percentile (q88 over raw documents, q111 over the repetition
    survivors)."""
    return f"""n AS (SELECT lang, COUNT(*) AS n_l FROM {src} GROUP BY lang),
        h AS (SELECT lang, L, COUNT(*) AS c FROM {src} GROUP BY lang, L),
        cum AS (SELECT lang, L,
                       SUM(c) OVER (PARTITION BY lang ORDER BY L) AS cc
                FROM h),
        lo AS (SELECT lang, MIN(L) AS lo FROM cum JOIN n USING (lang)
               WHERE cc * 20 >= n_l GROUP BY lang),
        hi AS (SELECT lang, MIN(L) AS hi FROM cum JOIN n USING (lang)
               WHERE cc * 20 >= 19 * n_l GROUP BY lang)"""


def _length_bounds(d: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Spark twin of :func:`_length_bounds_sql`: (lo, hi) threshold frames
    from a frame with (lang, L) — histogram + cumulative window over the
    histogram, all-integer threshold tests."""
    n = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_l"))
    h = d.groupBy("lang", "L").agg(F.count(F.lit(1)).alias("c"))
    # Round 16 (guide §3.3): lo and hi below each replayed the whole
    # histogram + cumulative window (and its upstream corpus split)
    # from the scan. The cumulated histogram is (lang, length)-bounded
    # — kilobytes — so cut the lineage once, lazily.
    from ..plans import materialize_once

    cum = materialize_once(
        h.withColumn(
            "cc",
            F.sum("c").over(
                Window.partitionBy("lang")
                .orderBy("L")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        ).join(F.broadcast(n), "lang"),
        eager=False,
    )
    lo = (
        cum.filter(F.col("cc") * 20 >= F.col("n_l"))
        .groupBy("lang")
        .agg(F.min("L").alias("lo"))
    )
    hi = (
        cum.filter(F.col("cc") * 20 >= 19 * F.col("n_l"))
        .groupBy("lang")
        .agg(F.min("L").alias("hi"))
    )
    return lo, hi


@query(
    "q88_length_trim",
    oracle=f"""
        WITH d AS (SELECT doc_id, lang,
                          CAST(len(string_split(text, ' ')) AS BIGINT) AS L
                   FROM documents),
        {_length_bounds_sql('d')}
        SELECT d.lang,
               CAST(COUNT(*) AS BIGINT) AS n_kept,
               CAST(SUM(d.L) AS BIGINT) AS kept_tokens,
               MIN(d.L) AS min_len,
               MAX(d.L) AS max_len
        FROM d JOIN lo USING (lang) JOIN hi USING (lang)
        WHERE d.L BETWEEN lo.lo AND hi.hi
        GROUP BY d.lang
        ORDER BY d.lang
    """,
    tags=("text", "llm", "filtering"),
)
def q88(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language length trimming at the exact 5th/95th percentiles —
    the outlier cut (truncated boilerplate, concatenation accidents)
    before token budgeting. The thresholds come from a LENGTH HISTOGRAM,
    not a per-row rank: per-(lang, length) counts (bounded by max doc
    length, not corpus size), a cumulative window over that tiny
    histogram, and all-integer threshold tests (cc*20 >= n_l, i.e.
    cc >= 5% of n_l without any division) — so the trap of a
    percent_rank window over ALL documents of a language (one giant
    partition at 100 TB) never appears, and the oracle matches exactly
    with no floating-point percentile interpolation to disagree on.
    Thresholds broadcast back to the scan; the final rollup is
    per-lang."""
    (docs,) = load(spark, sf, "documents")
    # Round 16 (guide §3.3): (doc_id, lang, L) feeds the two histogram
    # rollups AND the final threshold join — three subtrees, each
    # previously re-splitting the text from the scan (audit: 5 scans).
    # 24 B/row, so one lazy cut replaces two corpus re-splits.
    from ..plans import materialize_once

    d = materialize_once(
        docs.select(
            "doc_id",
            "lang",
            F.size(F.split("text", " ")).cast("long").alias("L"),
        ),
        eager=False,
    )
    lo, hi = _length_bounds(d)
    return (
        d.join(F.broadcast(lo), "lang")
        .join(F.broadcast(hi), "lang")
        .filter(F.col("L").between(F.col("lo"), F.col("hi")))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.sum("L").cast("long").alias("kept_tokens"),
            F.min("L").alias("min_len"),
            F.max("L").alias("max_len"),
        )
        .orderBy("lang")
    )


# ----------------------------- Q91 cluster-balanced corpus downsampling
_BALANCE_M = 100
_BALANCE_SEED = 43


@query(
    "q91_cluster_balanced_sample",
    oracle=f"""
        WITH {_kmeans_assign_oracle_cte()}
        SELECT cid, vec_id FROM (
          SELECT cid, vec_id,
                 ROW_NUMBER() OVER (PARTITION BY cid
                     ORDER BY {hash_bucket_sql('vec_id', _BALANCE_SEED)},
                              vec_id) AS rn
          FROM a)
        WHERE rn <= {_BALANCE_M}
        ORDER BY cid, vec_id
    """,
    tags=("sampling", "llm", "clustering"),
)
def q91(spark: SparkSession, sf: str) -> DataFrame:
    """Cluster-balanced downsampling — the curation op the k-means
    assignment exists FOR: at most M=100 vectors per semantic cluster,
    chosen in deterministic hash order (reproducible, engine-portable),
    flattening topic imbalance before training. Composition of q81's
    zero-shuffle assignment with q67's quota trim: the only exchange is
    the per-cid window, and WindowGroupLimit keeps ≤M rows per cluster
    per task before it."""
    (emb,) = load(spark, sf, "embeddings")
    cents = kmeans.initial_centroids(emb, _KMEANS_K)
    assigned = kmeans.assign(emb, cents)
    rn = F.row_number().over(
        Window.partitionBy("cid").orderBy(
            sampling.hash_bucket("vec_id", _BALANCE_SEED), "vec_id"
        )
    )
    return (
        assigned.select("cid", "vec_id")
        .withColumn("rn", rn)
        .filter(F.col("rn") <= _BALANCE_M)
        .select("cid", "vec_id")
        .orderBy("cid", "vec_id")
    )


# ------------------------------- Q92 embedding centroid-outlier mining
@query(
    "q92_embedding_outliers",
    oracle="""
        WITH q AS (
          SELECT vec_id,
                 list_transform(embedding::DOUBLE[],
                                x -> CAST(floor(x * 1000000 + 0.5)
                                          AS BIGINT)) AS qv
          FROM embeddings
        ),
        cells AS (
          SELECT dim, SUM(x) AS qs, COUNT(*) AS n FROM (
            SELECT generate_subscripts(qv, 1) AS dim, unnest(qv) AS x
            FROM q)
          GROUP BY dim
        ),
        cent AS (
          SELECT list(qs / (n * 1000000.0) ORDER BY dim) AS cv FROM cells
        )
        SELECT vec_id,
               ROUND(list_cosine_similarity(e.embedding::DOUBLE[], cent.cv),
                     6) AS cos_centroid
        FROM embeddings e CROSS JOIN cent
        ORDER BY cos_centroid ASC, vec_id
        LIMIT 20
    """,
    tags=("similarity", "llm", "quality"),
)
def q92(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-space outlier mining: the 20 vectors least aligned with
    the corpus mean direction — the semantic-garbage sweep (mis-embedded,
    off-distribution, or corrupt rows) run before clustering or ANN
    indexing. Determinism across engines: each embedding value is
    quantized to int64 at 1e-6 BEFORE the per-dimension sum, so the mean
    vector is an exact rational — identical doubles on both sides — and
    the per-row cosine is then pure IEEE row arithmetic. Scale: the
    centroid is one k=1 aggregation (dim-sized shuffle) collected and
    re-broadcast as plan literals; the scoring pass is one codegen'd
    projection + TakeOrderedAndProject(20)."""
    from ..operators.similarity import as_double, cosine, lit_doubles

    (emb,) = load(spark, sf, "embeddings")
    qv = F.transform(
        as_double(F.col("embedding")),
        lambda x: F.floor(x * 1_000_000 + 0.5).cast("long"),
    )
    cells = (
        emb.select(F.posexplode(qv).alias("dim", "x"))
        .groupBy("dim")
        .agg(F.sum("x").alias("qs"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    cent = [
        r["qs"] / (r["n"] * 1_000_000.0)
        for r in sorted(cells, key=lambda r: r["dim"])
    ]
    cent_lit = lit_doubles(cent)
    return (
        emb.select(
            "vec_id",
            F.round(
                cosine(as_double(F.col("embedding")), cent_lit), 6
            ).alias("cos_centroid"),
        )
        .orderBy(F.asc("cos_centroid"), "vec_id")
        .limit(20)
    )


# --------------------------- Q97 exact distributed Pearson correlation
@query(
    "q97_length_type_corr",
    oracle="""
        WITH d AS (
          SELECT lang,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS x,
                 CAST(len(list_distinct(string_split(text, ' ')))
                      AS BIGINT) AS y
          FROM documents
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               ROUND((CAST(COUNT(*) AS DOUBLE) * CAST(SUM(x * y) AS DOUBLE)
                      - CAST(SUM(x) AS DOUBLE) * CAST(SUM(y) AS DOUBLE))
                     / (sqrt(CAST(COUNT(*) AS DOUBLE)
                             * CAST(SUM(x * x) AS DOUBLE)
                             - CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE))
                        * sqrt(CAST(COUNT(*) AS DOUBLE)
                               * CAST(SUM(y * y) AS DOUBLE)
                               - CAST(SUM(y) AS DOUBLE)
                                 * CAST(SUM(y) AS DOUBLE))),
                     6) AS pearson_r
        FROM d GROUP BY lang ORDER BY lang
    """,
    tags=("text", "llm", "statistics"),
)
def q97(spark: SparkSession, sf: str) -> DataFrame:
    """Exact distributed Pearson correlation between document length and
    type (distinct-token) count, per language — the length/diversity
    relationship that flags template-heavy languages (types grow sub-
    linearly when text is boilerplate). NOT F.corr: that streams doubles
    through an order-dependent merge, so two engines (or two runs at
    different parallelism) disagree in the last bits. Instead the five
    sufficient statistics (Σx, Σy, Σxy, Σx², Σy²) are EXACT integer sums
    of scan-side values — order-free, engine-identical — and r is one
    deterministic double expression over them. The pattern generalizes
    to any moment-based statistic (variance, covariance, OLS slope) at
    any scale: integers shuffle, doubles never accumulate."""
    (docs,) = load(spark, sf, "documents")
    toks = F.split("text", " ")
    d = docs.select(
        "lang",
        F.size(toks).cast("long").alias("x"),
        F.size(F.array_distinct(toks)).cast("long").alias("y"),
    )
    # Per-row products fit int64 but their SUMS are accumulated in
    # DECIMAL(38,0): sum(x^2) alone passes 2^63 around 1e9 long docs and
    # non-ANSI Spark would wrap silently where the oracle's HUGEINT sum
    # stays exact. The finished sums combine in DOUBLE (decimal->double
    # and HUGEINT->double round identically), so nothing order-dependent
    # ever accumulates and nothing integer ever wraps.
    dec = "decimal(38,0)"
    n = F.count(F.lit(1)).cast("double")
    sx = F.sum(F.col("x").cast(dec)).cast("double")
    sy = F.sum(F.col("y").cast(dec)).cast("double")
    sxy = F.sum((F.col("x") * F.col("y")).cast(dec)).cast("double")
    sxx = F.sum((F.col("x") * F.col("x")).cast(dec)).cast("double")
    syy = F.sum((F.col("y") * F.col("y")).cast(dec)).cast("double")
    r = F.round(
        (n * sxy - sx * sy)
        / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
        6,
    )
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            r.alias("pearson_r"),
        )
        .orderBy("lang")
    )


# ------------------------------------ Q100 split-leakage audit
@query(
    "q100_split_leakage",
    oracle=f"""
        WITH d AS (
          SELECT doc_id, lang,
                 {text.fingerprint_sql('text')} AS fp,
                 {_SPLIT_CASE_SQL} AS split
          FROM documents
        ),
        trainfp AS (SELECT DISTINCT fp FROM d WHERE split = 'train')
        SELECT d.lang,
               CAST(COUNT(*) AS BIGINT) AS n_val,
               CAST(COALESCE(SUM(CASE WHEN t.fp IS NOT NULL THEN 1 END), 0)
                    AS BIGINT) AS n_leaked
        FROM d LEFT JOIN trainfp t ON d.fp = t.fp
        WHERE d.split = 'val'
        GROUP BY d.lang
        ORDER BY d.lang
    """,
    tags=("dedup", "llm", "evaluation"),
)
def q100(spark: SparkSession, sf: str) -> DataFrame:
    """Split-leakage audit: how many validation documents share an exact
    content fingerprint with ANY training document — the check that q79's
    group-aware split exists to minimize, quantified. (A source-atomic
    split stops within-source duplicate leakage by construction, but
    cross-source exact dups — q95's matrix — still leak; this measures
    exactly that residual, per language.) Plan: one scan computes
    fingerprint + split side by side; the train fingerprint set reduces
    to distinct values before the join, so at 100 TB the join probe
    carries fingerprints only. AQE broadcasts the val side's probe when
    small; nothing ever shuffles document text."""
    (docs,) = load(spark, sf, "documents")
    split = _source_split()
    d = docs.select(
        "doc_id", "lang",
        text.fingerprint("text").alias("fp"),
        split.alias("split"),
    )
    trainfp = d.filter(F.col("split") == "train").select("fp").distinct()
    val = d.filter(F.col("split") == "val")
    leaked = (
        val.join(trainfp, "fp", "left_semi")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_leaked"))
    )
    return (
        val.groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_val"))
        .join(leaked, "lang", "left")
        .select(
            "lang",
            "n_val",
            F.coalesce("n_leaked", F.lit(0).cast("long")).alias("n_leaked"),
        )
        .orderBy("lang")
    )


# --------------------------- Q106 near-dup split leakage (Jaccard)
@query(
    "q106_split_leakage_neardup",
    oracle=f"""
        WITH d AS (
          SELECT doc_id, lang,
                 list_distinct(list_transform(
                     generate_series(1, len(string_split(text,' ')) - 2),
                     i -> string_split(text,' ')[i] || ' ' ||
                          string_split(text,' ')[i+1] || ' ' ||
                          string_split(text,' ')[i+2])) AS sh,
                 {_SPLIT_CASE_SQL} AS split
          FROM documents
        ),
        ex AS (SELECT doc_id, lang, split, unnest(sh) AS s,
                      len(sh) AS n FROM d),
        pairs AS (
          SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common,
                 any_value(a.n) AS n1, any_value(b.n) AS n2,
                 any_value(a.split) AS s1, any_value(b.split) AS s2,
                 any_value(a.lang) AS l1, any_value(b.lang) AS l2
          FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        leaked AS (
          SELECT DISTINCT CASE WHEN s1 = 'val' THEN d1 ELSE d2 END
                     AS val_doc,
                 CASE WHEN s1 = 'val' THEN l1 ELSE l2 END AS lang
          FROM pairs
          WHERE s1 <> s2
            AND ROUND(common * 1.0 / (n1 + n2 - common), 6) >= 0.5
        )
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_neardup_leaked
        FROM leaked GROUP BY lang ORDER BY lang
    """,
    tags=("dedup", "llm", "evaluation"),
)
def q106(spark: SparkSession, sf: str) -> DataFrame:
    """NEAR-duplicate leakage across q79's source-atomic split: validation
    documents with a >=0.5-Jaccard near-dup in training — the leakage
    class the exact-fingerprint audit (q100) cannot see (paraphrased or
    lightly-edited copies), and the number that decides whether the val
    set actually measures generalization. The pair space is q26's
    single-shuffle shingle equi-join WITHOUT a blocking partition
    (leaks cross sources by definition), restricted to cross-split
    pairs, then reduced to distinct leaked val docs per language.
    max_df is deliberately OFF here so the oracle states plain unblocked
    Jaccard — this is the small-scale reference variant; q106b is the
    production-shaped audit with the ceiling ACTIVE and the DF-filtered
    metric hash-matched (q26e's pattern on the split-audit shape)."""
    (docs,) = load(spark, sf, "documents")
    split = _source_split()
    tagged = docs.withColumn("split", split)
    pairs = dedup.jaccard_pairs(tagged, threshold=0.5, partition_col=None)
    meta = tagged.select("doc_id", "lang", "split")
    m1 = meta.select(
        F.col("doc_id").alias("d1"), F.col("lang").alias("l1"),
        F.col("split").alias("s1"),
    )
    m2 = meta.select(
        F.col("doc_id").alias("d2"), F.col("lang").alias("l2"),
        F.col("split").alias("s2"),
    )
    leaked = (
        pairs.join(m1, "d1")
        .join(m2, "d2")
        .filter(F.col("s1") != F.col("s2"))
        .select(
            F.when(F.col("s1") == "val", F.col("d1"))
            .otherwise(F.col("d2")).alias("val_doc"),
            F.when(F.col("s1") == "val", F.col("l1"))
            .otherwise(F.col("l2")).alias("lang"),
        )
        .distinct()
    )
    return (
        leaked.groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_neardup_leaked"))
        .orderBy("lang")
    )


@query(
    "q106b_split_leakage_maxdf",
    oracle=f"""
        WITH d AS (
          SELECT doc_id, lang,
                 list_distinct(list_transform(
                     generate_series(1, len(string_split(text,' ')) - 2),
                     i -> string_split(text,' ')[i] || ' ' ||
                          string_split(text,' ')[i+1] || ' ' ||
                          string_split(text,' ')[i+2])) AS sh,
                 {_SPLIT_CASE_SQL} AS split
          FROM documents
        ),
        ex0 AS (SELECT doc_id, lang, split, unnest(sh) AS s FROM d),
        hot AS (SELECT s FROM ex0 GROUP BY s HAVING COUNT(*) > 2),
        ex AS (SELECT e.doc_id, e.lang, e.split, e.s
               FROM ex0 e ANTI JOIN hot h ON e.s = h.s),
        n AS (SELECT doc_id, COUNT(*) AS n FROM ex GROUP BY doc_id),
        pairs AS (
          SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common,
                 any_value(a.split) AS s1, any_value(b.split) AS s2,
                 any_value(a.lang) AS l1, any_value(b.lang) AS l2
          FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        leaked AS (
          SELECT DISTINCT CASE WHEN s1 = 'val' THEN d1 ELSE d2 END
                     AS val_doc,
                 CASE WHEN s1 = 'val' THEN l1 ELSE l2 END AS lang
          FROM pairs
          JOIN n na ON pairs.d1 = na.doc_id
          JOIN n nb ON pairs.d2 = nb.doc_id
          WHERE s1 <> s2
            AND ROUND(common * 1.0 / (na.n + nb.n - common), 6) >= 0.5
        )
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_neardup_leaked
        FROM leaked GROUP BY lang ORDER BY lang
    """,
    tags=("dedup", "llm", "evaluation", "skew"),
)
def q106b(spark: SparkSession, sf: str) -> DataFrame:
    """q106 with the document-frequency ceiling ACTIVE (max_df=2, global —
    the pair space is unblocked by definition, so the ceiling is global
    too): the production-shaped cross-split near-dup leakage audit. A
    boilerplate shingle shared across the whole corpus would make q106's
    join bucket quadratic at 100 TB; here such shingles are dropped from
    BOTH the intersection and the per-doc set sizes before Jaccard
    (operators/dedup.py jaccard_pairs max_df), and the oracle mirrors the
    DF-filtered metric exactly — the r5 verdict's ask: the variant a user
    runs on a REAL corpus split is the hash-matched one (q26e proved this
    pattern source-blocked; this is the unblocked split-audit shape)."""
    (docs,) = load(spark, sf, "documents")
    split = _source_split()
    tagged = docs.withColumn("split", split)
    pairs = dedup.jaccard_pairs(
        tagged, threshold=0.5, partition_col=None, max_df=2
    )
    meta = tagged.select("doc_id", "lang", "split")
    m1 = meta.select(
        F.col("doc_id").alias("d1"), F.col("lang").alias("l1"),
        F.col("split").alias("s1"),
    )
    m2 = meta.select(
        F.col("doc_id").alias("d2"), F.col("lang").alias("l2"),
        F.col("split").alias("s2"),
    )
    leaked = (
        pairs.join(m1, "d1")
        .join(m2, "d2")
        .filter(F.col("s1") != F.col("s2"))
        .select(
            F.when(F.col("s1") == "val", F.col("d1"))
            .otherwise(F.col("d2")).alias("val_doc"),
            F.when(F.col("s1") == "val", F.col("l1"))
            .otherwise(F.col("l2")).alias("lang"),
        )
        .distinct()
    )
    return (
        leaked.groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_neardup_leaked"))
        .orderBy("lang")
    )


# ------------------------------- Q111 curation-cascade yield report
_YIELD_REP_MAX = 0.2


@query(
    "q111_curation_yield",
    oracle=f"""
        WITH d AS (
          SELECT doc_id, lang,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS L,
                 {_shingle_sql(3, distinct=False)} AS tri,
                 {text.fingerprint_sql('text')} AS fp
          FROM documents
        ),
        s1 AS (
          SELECT * FROM d
          WHERE len(tri) = 0
             OR (len(tri) - len(list_distinct(tri))) * 1.0 / len(tri)
                <= {_YIELD_REP_MAX}
        ),
        {_length_bounds_sql('s1')},
        s2 AS (SELECT s1.* FROM s1 JOIN lo USING (lang) JOIN hi USING (lang)
               WHERE s1.L BETWEEN lo.lo AND hi.hi),
        s3 AS (SELECT * FROM (
                 SELECT *, ROW_NUMBER() OVER (PARTITION BY fp
                                              ORDER BY doc_id) AS rn
                 FROM s2) WHERE rn = 1)
        SELECT stage, stage_name,
               CAST(n_docs AS BIGINT) AS n_docs,
               CAST(n_tokens AS BIGINT) AS n_tokens
        FROM (
          SELECT 0 AS stage, 'raw' AS stage_name,
                 COUNT(*) AS n_docs, SUM(L) AS n_tokens FROM d
          UNION ALL
          SELECT 1, 'repetition_filter', COUNT(*), SUM(L) FROM s1
          UNION ALL
          SELECT 2, 'length_trim', COUNT(*), SUM(L) FROM s2
          UNION ALL
          SELECT 3, 'exact_dedup', COUNT(*), SUM(L) FROM s3
        )
        ORDER BY stage
    """,
    tags=("llm", "quality", "pipeline"),
)
def q111(spark: SparkSession, sf: str) -> DataFrame:
    """The curation-cascade yield report: documents and tokens surviving
    each stage of raw -> repetition filter (trigram dup ratio <= 0.2,
    q78's metric; shingle-free short docs pass) -> per-lang [p5, p95]
    length trim (q88's histogram thresholds, computed over the
    repetition survivors — cascade semantics) -> exact content dedup
    (first doc_id per fingerprint wins). This one table is what a corpus
    build reviews before tokenization: where the tokens went, stage by
    stage. Every stage reuses the operator the standalone query proved
    (q78/q88/q25-q36) — the percentile thresholds come from the SAME
    _length_bounds helper as q88, over the repetition survivors. The
    scan-side metrics (trigram ratio, fingerprint, length) are computed
    once and PERSISTED: the four stage aggregates are separate union
    branches, and without the persist each branch would re-run the
    shingle transform and fingerprint fold over the full corpus (4 scans
    instead of 1; the cached projection is a few long columns per doc —
    no text). The report (4 rows) is materialized eagerly inside the
    query and the cache UNPERSISTED before returning — a long-lived
    shared session (CLI runner, driver verify loop, bench sweeps) must
    not accumulate one cached copy per invocation (ADVICE r5); the
    4-row collect is bounded by construction."""
    (docs,) = load(spark, sf, "documents")
    tri = dedup.shingle_list("text", 3)
    d = docs.select(
        "doc_id", "lang",
        F.size(F.split("text", " ")).cast("long").alias("L"),
        F.size(tri).cast("long").alias("n_tri"),
        F.size(F.array_distinct(tri)).cast("long").alias("n_uniq"),
        text.fingerprint("text").alias("fp"),
    ).persist()
    s1 = d.filter(
        (F.col("n_tri") == 0)
        | (
            (F.col("n_tri") - F.col("n_uniq")) * F.lit(1.0) / F.col("n_tri")
            <= _YIELD_REP_MAX
        )
    )
    lo, hi = _length_bounds(s1)
    s2 = (
        s1.join(F.broadcast(lo), "lang")
        .join(F.broadcast(hi), "lang")
        .filter(F.col("L").between(F.col("lo"), F.col("hi")))
    )
    s3 = (
        s2.withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("fp").orderBy("doc_id")),
        )
        .filter(F.col("rn") == 1)
    )

    def stage(i: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(i).cast("long").alias("stage"),
            F.lit(name).alias("stage_name"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("L").cast("long").alias("n_tokens"),
        )

    report = (
        stage(0, "raw", d)
        .unionByName(stage(1, "repetition_filter", s1))
        .unionByName(stage(2, "length_trim", s2))
        .unionByName(stage(3, "exact_dedup", s3))
        .orderBy("stage")
    )
    try:
        rows = report.collect()  # 4 rows, one per stage — bounded
    finally:
        # unpersist even when the collect fails mid-flight — a retried
        # invocation in a long-lived session (CLI runner, driver verify
        # loop) must not stack another cached copy per failed attempt
        d.unpersist()
    return spark.createDataFrame(rows, report.schema)


# ------------------------------------ Q172 distributed Gram matrix (PCA prep)
# One home for the quantized Gram SQL — q172's oracle AND the base of
# q172b's power-iteration chain.
_GRAM_SQL = """
  SELECT i.i AS i, j.j AS j,
         CAST(SUM(CAST(floor(CAST(embedding[i.i+1] AS DOUBLE)
                     * CAST(embedding[j.j+1] AS DOUBLE) * 1000000 + 0.5)
                  AS BIGINT)) AS BIGINT) AS cell_q
  FROM embeddings, range(64) i(i), range(64) j(j)
  WHERE i.i <= j.j
  GROUP BY 1, 2
"""

_PCA_ITERS = 96


def _power_iteration_oracle(iters: int = _PCA_ITERS) -> str:
    """DuckDB mirror of `similarity.power_iteration_infnorm`, unrolled:
    every step is a quantized int64 matvec (floor per term, exact int
    sum — order-free) scaled by the exact integer max |component|, so
    the chain is bit-identical to the engine's driver-side iteration.
    CTEs are MATERIALIZED — inlined CTEs would re-evaluate the whole
    chain per reference (exponential blowup)."""
    steps = [
        f"g AS MATERIALIZED ({_GRAM_SQL})",
        "m AS MATERIALIZED (SELECT i, j, cell_q FROM g "
        "UNION ALL SELECT j, i, cell_q FROM g WHERE i < j)",
        "v0 AS MATERIALIZED (SELECT i.i AS i, CAST(0.125 AS DOUBLE) AS v "
        "FROM range(64) i(i))",
    ]
    for t in range(1, iters + 1):
        steps.append(
            f"w{t} AS MATERIALIZED (SELECT m.i AS i, "
            f"SUM(CAST(floor(CAST(m.cell_q AS DOUBLE) * v{t-1}.v + 0.5) "
            f"AS BIGINT)) AS w FROM m JOIN v{t-1} ON m.j = v{t-1}.i "
            f"GROUP BY m.i)"
        )
        steps.append(
            f"v{t} AS MATERIALIZED (SELECT i, CAST(w AS DOUBLE) / "
            f"CAST((SELECT MAX(ABS(w)) FROM w{t}) AS DOUBLE) AS v "
            f"FROM w{t})"
        )
    return (
        "WITH "
        + ",\n".join(steps)
        + f"""
        SELECT e.vec_id,
               CAST(SUM(CAST(floor(CAST(e.embedding[v.i+1] AS DOUBLE)
                           * v.v * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
                   AS pc1_q
        FROM embeddings e, v{iters} v
        GROUP BY e.vec_id ORDER BY e.vec_id"""
    )


@query(
    "q172_embedding_gram",
    oracle=_GRAM_SQL + " ORDER BY 1, 2",
    tags=("similarity", "llm"),
)
def q172(spark: SparkSession, sf: str) -> DataFrame:
    """Distributed Gram (uncentered second-moment) matrix of the
    embedding table — the one-pass linear-algebra precursor to
    covariance/PCA whitening in embedding curation (whiten before
    SemDeDup q170 / ANN indexing). `similarity.gram_upper`: ONE
    Arrow-batched mapInPandas pass emits a dim x dim int64 partial per
    partition (vectorized einsum in chunked sub-batches), then a single
    tiny exchange of O(partitions * dim^2/2) rows folds the partials —
    shuffle volume is independent of N, the 100 TB shape. Per-row
    products are quantized to int64 BEFORE any sum (floor(x*y*1e6+0.5),
    the repo idiom), so the result is bit-identical on any partitioning
    and on the oracle."""
    from ..operators.similarity import gram_upper

    (emb,) = load(spark, sf, "embeddings")
    return gram_upper(emb, vec_col="embedding").orderBy("i", "j")


@query(
    "q172b_pca_power_iteration",
    oracle=_power_iteration_oracle(),
    tags=("similarity", "llm"),
)
def q172b(spark: SparkSession, sf: str) -> DataFrame:
    """Leading-principal-direction projection of every embedding — PCA
    via POWER ITERATION, hash-matched end-to-end against a DuckDB
    oracle that unrolls all 96 steps as a generated CTE chain. The
    iterative linear algebra is exactly reproducible across engines
    because no floating-point SUM ever occurs: the matvec quantizes
    each term to int64 and sums exact integers, and scaling divides by
    the exact integer max |component| (infinity norm) instead of an
    order-sensitive L2 norm (`similarity.power_iteration_infnorm`).

    Plan shape: the distributed work is q172's one-pass Gram (shuffle
    O(partitions * dim^2), never O(N)) plus ONE zero-shuffle codegen
    projection of the final direction (a plan literal) over the scan
    (`similarity.project_quantized`); the 96-step iteration itself runs
    driver-side on the collected dim x dim matrix — BOUNDED by
    construction (2080 cells, the k-means-centroid collect policy),
    equivalent at any corpus size. Convergence on real spectra is the
    behavioral pytest's claim (cos >= 0.99 vs numpy eigh at this
    fixture's 1.017 spectral-gap ratio, the slow-convergence regime);
    the hash match pins the deterministic computation itself."""
    from ..operators.similarity import (
        gram_upper,
        power_iteration_infnorm,
        project_quantized,
    )

    (emb,) = load(spark, sf, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    cells = {
        (r["i"], r["j"]): r["cell_q"]
        for r in gram_upper(emb, vec_col="embedding").collect()
    }
    v = power_iteration_infnorm(cells, dim, iters=_PCA_ITERS)
    return (
        project_quantized(emb, v, vec_col="embedding", out_col="pc1_q")
        .select("vec_id", "pc1_q")
        .orderBy("vec_id")
    )
