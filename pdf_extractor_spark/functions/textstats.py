"""Text-analysis operators for training-data pipelines.

All implemented with native Spark SQL expressions (no UDFs — these run
inside whole-stage codegen and scale linearly with executors):

- token counting (whitespace + regex-token BPE-ish)
- language-ID heuristic (stopword ratio)
- quality scoring (length / punctuation / token-shape ratios)
- document fingerprinting (normalized md5)

Each has an exact ANSI-SQL twin in the query catalog so DuckDB can
verify values at small scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small fixed English stopword list (deterministic, embedded — no
# external data). Enough for a ratio-based language signal.
EN_STOPWORDS = (
    "the", "of", "and", "to", "in", "a", "is", "for", "on", "that",
    "with", "as", "by", "at", "from",
)

# token regex shared verbatim with the DuckDB oracle (Java regex and
# RE2 agree on this subset: alternation + char classes only)
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def ws_tokens(col: str = "text") -> Column:
    return F.split(F.col(col), " ")


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace tokens + regex tokens per document."""
    return docs.select(
        "doc_id",
        F.size(ws_tokens()).alias("n_ws_tokens"),
        F.size(F.expr(f"regexp_extract_all(text, '{TOKEN_REGEX}', 0)"))
        .alias("n_re_tokens"),
    )


def stopword_langid(docs: DataFrame) -> DataFrame:
    """Language-ID heuristic: fraction of whitespace tokens that are
    English stopwords; predict 'en' above a fixed threshold."""
    stop_list = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    ratio = F.expr(
        "cast(size(filter(split(text, ' '), "
        f"x -> x in ({stop_list}))) as double) "
        "/ cast(size(split(text, ' ')) as double)"
    )
    return docs.select(
        "doc_id",
        F.size(ws_tokens()).alias("n_tokens"),
        F.round(ratio, 4).alias("stopword_ratio"),
        F.when(ratio >= 0.10, F.lit("en")).otherwise(F.lit("other"))
        .alias("lang_pred"),
    )


# char-class ranges for script detection (mirror of
# operators/charclass.py ranges, as regex character classes)
CJK_CLASS = "぀-ゟ゠-ヿ一-鿿　-〿"
ASCII_ALPHA_CLASS = "A-Za-z"


def charclass_langid(docs: DataFrame) -> DataFrame:
    """Script-level language ID by char-class ratios (the n-gram-
    heuristic family at n=1): CJK-script ratio ≥ 0.3 → 'cjk', else
    ASCII-letter ratio ≥ 0.5 → 'latin', else 'other'. Pure native
    string expressions — one scan, no shuffle, codegen'd."""
    n = F.length("text")
    cjk = F.length(
        F.regexp_replace("text", f"[^{CJK_CLASS}]", "")
    )
    alpha = F.length(
        F.regexp_replace("text", f"[^{ASCII_ALPHA_CLASS}]", "")
    )
    cjk_ratio = F.when(n > 0, cjk.cast("double") / n).otherwise(F.lit(0.0))
    alpha_ratio = F.when(n > 0, alpha.cast("double") / n).otherwise(
        F.lit(0.0)
    )
    return docs.select(
        "doc_id",
        F.round(cjk_ratio, 4).alias("cjk_ratio"),
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        F.when(cjk_ratio >= 0.3, F.lit("cjk"))
        .when(alpha_ratio >= 0.5, F.lit("latin"))
        .otherwise(F.lit("other"))
        .alias("script_pred"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Deterministic quality score from length / punctuation / token
    shape (the A6 quality-dimension pattern at dataset level)."""
    n_chars = F.length("text")
    n_tokens = F.size(ws_tokens())
    # punctuation chars = length minus length-with-punct-removed
    n_punct = n_chars - F.length(
        F.regexp_replace("text", "[^A-Za-z0-9 ]", "")
    )
    avg_tok = n_chars.cast("double") / n_tokens.cast("double")
    punct_ratio = n_punct.cast("double") / n_chars.cast("double")
    score = (
        F.least(n_tokens.cast("double") / F.lit(100.0), F.lit(1.0)) * 50.0
        + (F.lit(1.0) - F.least(punct_ratio * 5.0, F.lit(1.0))) * 30.0
        + F.when((avg_tok >= 3.0) & (avg_tok <= 9.0), F.lit(20.0))
        .otherwise(F.lit(0.0))
    )
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(avg_tok, 4).alias("avg_token_len"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(score, 4).alias("quality_score"),
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Document fingerprint: md5 over whitespace-normalized lowercase
    text (stable across engines — md5 is bit-identical everywhere)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), "\\s+", " "))
    return docs.select(
        "doc_id", F.md5(norm).alias("fingerprint")
    )


# Embedded unigram "language model": deterministic token costs in
# centinats (scaled negative log-probs — integers so Spark and DuckDB
# aggregate bit-identically). The CCNet-style perplexity filter shape:
# cheap LM cost per document, threshold on the per-token average.
UNIGRAM_VOCAB: tuple[tuple[str, int], ...] = tuple(
    (w, 100 + 5 * i)
    for i, w in enumerate(
        (
            "the", "fast", "key", "order", "sort", "table", "scan",
            "merge", "part", "window", "small", "hash", "join", "batch",
            "stream", "spark", "dup", "of", "and", "to", "in", "a",
            "is", "for", "on", "that", "with", "as", "by", "at",
            "from", "query",
        )
    )
)
UNIGRAM_OOV_COST = 800       # centinats charged per out-of-vocab token
UNIGRAM_KEEP_BELOW = 400     # keep documents averaging under this


def unigram_costs(docs: DataFrame) -> DataFrame:
    """Unigram LM cost scoring (the perplexity-filter shape of
    CCNet-style corpus cleaning): explode whitespace tokens, price
    each against the embedded vocabulary (OOV pays a flat penalty),
    roll up per document, keep documents whose per-token average cost
    stays under the threshold.

    Plan shape at 100 TB: explode is a narrow map, the vocabulary is a
    broadcast hash join (thousands of rows at most — a real LM table
    still broadcasts), and the rollup is one partial/final hash
    aggregate on doc_id — the same single-shuffle profile as a word
    count. All arithmetic integer-exact for the DuckDB oracle."""
    spark = docs.sparkSession
    vocab = spark.createDataFrame(
        list(UNIGRAM_VOCAB), "token string, cost long"
    )
    toks = docs.select("doc_id", F.explode(ws_tokens()).alias("token"))
    priced = toks.join(F.broadcast(vocab), "token", "left").select(
        "doc_id",
        F.coalesce(F.col("cost"), F.lit(UNIGRAM_OOV_COST)).alias("cost"),
    )
    agg = priced.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum("cost").alias("total_cost_e2"),
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        "total_cost_e2",
        F.expr("total_cost_e2 div n_tokens").alias("avg_cost_e2"),
        (F.expr("total_cost_e2 div n_tokens") < UNIGRAM_KEEP_BELOW)
        .alias("keep"),
    )
