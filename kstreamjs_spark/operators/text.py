"""Text-analysis operators over a token-separated text column: tokenization,
language ID (stopword n-gram heuristic), quality scoring, token counting,
and document fingerprinting (rolling hash).

All pure Catalyst expressions (higher-order array functions) — no Python in
the hot path, so these run inside whole-stage codegen and scale linearly
with input splits; no shuffle is needed for any per-document metric.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# Tiny per-language stopword lists for the language-ID heuristic. The point
# is a deterministic, SQL-expressible scoring function (oracle-checkable),
# not linguistic accuracy — swap in fastText/CLD3 via mapInPandas for real
# pipelines.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in"),
    "es": ("el", "la", "de", "y", "que", "en"),
    "de": ("der", "die", "das", "und", "zu", "ein"),
    "fr": ("le", "la", "de", "et", "un", "une"),
}

FINGERPRINT_MOD = 1_000_000_007


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization as an array column."""
    return F.split(text, " ")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("long")


def stopword_hits(toks: Column, words: tuple[str, ...]) -> Column:
    """Number of tokens (with multiplicity) in ``words``."""
    return F.size(F.filter(toks, lambda t: t.isin(list(words)))).cast("long")


def lang_scores(toks: Column) -> dict[str, Column]:
    return {lang: stopword_hits(toks, ws) for lang, ws in STOPWORDS.items()}


def lang_id(toks: Column) -> Column:
    """argmax language by stopword hits; ties broken by the fixed key order
    of STOPWORDS ('unknown' when no stopword appears at all)."""
    scores = lang_scores(toks)
    best = F.greatest(*scores.values())
    expr = F.lit("unknown")
    # build the when-chain in reverse so earlier langs win ties
    for lang in reversed(list(STOPWORDS)):
        expr = F.when((scores[lang] > 0) & (scores[lang] == best), lang).otherwise(
            expr
        )
    return expr


def quality_score(text: Column | str) -> Column:
    """Deterministic quality heuristic in [0,1]: length credit x
    (1 - stopword density). Real pipelines plug model-based scorers in via
    mapInPandas; the Spark plumbing is identical."""
    toks = tokens(text)
    n = F.size(toks).cast("double")
    all_stop = tuple(w for ws in STOPWORDS.values() for w in ws)
    stop_ratio = stopword_hits(toks, all_stop).cast("double") / n
    return F.round(F.least(F.lit(1.0), n / 100.0) * (1.0 - stop_ratio), 6)


def _portable_token_hash(t: Column) -> Column:
    """Engine-portable token hash (expressible identically in DuckDB SQL for
    the oracle): length*131 + 7*codepoint(first char) + codepoint(last
    char). NOT a quality hash — the fingerprint op is about the distributed
    plumbing; swap xxhash64 in for production use."""
    return (
        F.length(t).cast("long") * 131
        + F.ascii(F.substring(t, 1, 1)).cast("long") * 7
        + F.ascii(F.substring(t, -1, 1)).cast("long")
    )


def fingerprint(text: Column | str) -> Column:
    """Rolling polynomial hash over the token stream:
    fp = fold(tokens, acc -> (acc*31 + h(token)) mod 1e9+7).
    Sequential left fold — deterministic, order-sensitive (a true document
    fingerprint), O(tokens) per row, no shuffle."""
    hashed = F.transform(tokens(text), _portable_token_hash)
    return F.aggregate(
        hashed,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % FINGERPRINT_MOD,
    )


def fingerprint_sql(expr: str) -> str:
    """DuckDB spelling of :func:`fingerprint` (shared by the q36 oracle and
    every oracle that joins on content fingerprints): same token hash, same
    sequential left fold, same modulus."""
    return f"""list_reduce(
                 list_prepend(CAST(0 AS BIGINT),
                   list_transform(string_split({expr}, ' '),
                     t -> CAST(length(t) * 131 + ascii(t) * 7 +
                               ascii(right(t, 1)) AS BIGINT))),
                 (acc, x) -> (acc * 31 + x) % {FINGERPRINT_MOD}
               )"""


def normalize_text(text: Column | str) -> Column:
    """Canonical text normalization for dedup/fingerprint pre-processing:
    lowercase, non-alphanumerics to spaces, whitespace collapsed, trimmed.
    Pure codegen expressions; the regexes use only character classes so the
    Java (Spark) and RE2 (DuckDB) engines agree byte-for-byte — the SQL
    mirror is :func:`normalize_text_sql`."""
    t = F.col(text) if isinstance(text, str) else text
    t = F.lower(t)
    t = F.regexp_replace(t, "[^a-z0-9 ]", " ")
    t = F.regexp_replace(t, " +", " ")
    return F.trim(t)


def normalize_text_sql(expr: str) -> str:
    """DuckDB spelling of :func:`normalize_text` — note the explicit 'g'
    flag: DuckDB's regexp_replace substitutes only the FIRST match by
    default, Spark's substitutes all."""
    return (
        "TRIM(regexp_replace(regexp_replace("
        f"lower({expr}), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"
    )


def portable_string_hash(s: Column | str) -> Column:
    """Engine-portable hash of a short string key (for group-aware splits
    on e.g. a source/domain column): length*131 + 7*first-codepoint +
    last-codepoint — the string analogue of the LCG key hash, expressible
    identically in DuckDB (:func:`portable_string_hash_sql`). Collisions
    only merge groups (never split them), which preserves the leakage
    guarantee a grouped split exists for."""
    t = F.col(s) if isinstance(s, str) else s
    return _portable_token_hash(t)


def portable_string_hash_sql(expr: str) -> str:
    """DuckDB mirror of :func:`portable_string_hash`, edge-case aligned with
    Spark: Spark's ``ascii('')`` returns 0 where DuckDB's ``ord('')``
    returns -1 (verified; ``ascii('')`` is 0 there but ``ord`` is the
    codepoint function), so each ord is guarded with NULLIF/COALESCE —
    ``''`` hashes to 0 on both engines instead of -8 vs 0. A NULL key
    stays NULL on both sides (``length(NULL)`` nulls the whole sum;
    Spark's ``ascii(NULL)`` likewise)."""
    first = f"COALESCE(ord(NULLIF(substring({expr}, 1, 1), '')), 0)"
    last = f"COALESCE(ord(NULLIF(substring({expr}, -1, 1), '')), 0)"
    return f"(length({expr}) * 131 + {first} * 7 + {last})"


def compressibility(df, text_col: str = "text", id_col: str = "doc_id",
                    level: int = 6):
    """Per-document zlib compression ratio — the Gopher/C4-family
    quality signal SQL cannot express (a DEFLATE pass over the bytes):
    highly repetitive text compresses far below normal prose, while
    random or binary-ish content barely compresses at all, so the ratio
    separates both failure modes with one number.

    Arrow-batched mapInPandas (stdlib zlib, one Python roundtrip per
    batch — the documented non-SQL exception, never per-row Python in a
    separate task). Deterministic for a fixed zlib level within an
    engine; there is no SQL oracle restatement, so the driver's check
    for queries built on this is rows-only by design and the behavioral
    contract is pinned in pytest instead (repetition compresses below
    prose, prose below noise).

    Returns (id_col, n_bytes, n_compressed, comp_ratio) with
    comp_ratio = n_compressed / n_bytes rounded to 6 dp."""
    import zlib

    import pandas as pd

    def batches(it):
        for pdf in it:
            n, comp, ratio = [], [], []
            for t in pdf[text_col]:
                if t is None:
                    # NULL text is normal in real corpora this gate is
                    # pitched at — propagate null metrics, don't crash
                    # the task
                    n.append(None)
                    comp.append(None)
                    ratio.append(None)
                    continue
                b = t.encode("utf-8")
                c = len(zlib.compress(b, level))
                n.append(len(b))
                comp.append(c)
                ratio.append(round(c / len(b), 6) if b else None)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "n_bytes": pd.Series(n, dtype="Int64"),
                    "n_compressed": pd.Series(comp, dtype="Int64"),
                    "comp_ratio": pd.Series(ratio, dtype="float64"),
                }
            )

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, text_col).mapInPandas(
        batches,
        f"{id_col} {id_type}, n_bytes long, n_compressed long, "
        "comp_ratio double",
    )


def unicode_normalize(text: Column | str, form: str = "NFC") -> Column:
    """Unicode normalization (UAX #15, public) as an Arrow-batched
    kernel — the step every multilingual corpus pipeline runs BEFORE
    tokenization/shingling/fingerprinting, because canonically
    equivalent strings ("e" + U+0301 vs precomposed U+00E9) otherwise
    hash, shingle, and dedup as different documents (CCNet and C4 both
    normalize first). ``form`` is NFC/NFD/NFKC/NFKD per stdlib
    ``unicodedata``; DuckDB's ``nfc_normalize`` (utf8proc) mirrors the
    NFC form, which is how q84b hash-matches it cross-engine.

    Arrow-batched pandas_udf (the documented non-SQL-expression
    exception, like ``compressibility``): normalization tables are not
    expressible in Catalyst, so this is one Python roundtrip per batch,
    scan-side, zero shuffle, NULL-preserving.
    """
    import unicodedata

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form: {form!r}")

    # no type hints: postponed annotation evaluation (future.annotations)
    # turns them into strings pandas_udf cannot resolve; the returnType
    # argument carries the schema instead (the q48 idiom)
    @F.pandas_udf("string")
    def _norm(s):
        return s.map(
            lambda t: None if t is None else unicodedata.normalize(form, t)
        )

    return _norm(F.col(text) if isinstance(text, str) else text)
