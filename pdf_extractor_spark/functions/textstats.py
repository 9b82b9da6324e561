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
# strong RTL scripts: Hebrew, Arabic (+supplement/Extended-A), Syriac,
# Thaana, NKo, plus both presentation-form blocks (mirrors
# operators/bidi.py's gate — the scripts whose PDFs arrive in visual
# order and whose pages should route to RTL-aware post-processing)
RTL_CLASS = "֐-߿ࢠ-ࣿיִ-﷿ﹰ-ﻼ"


def charclass_langid(docs: DataFrame) -> DataFrame:
    """Script-level language ID by char-class ratios (the n-gram-
    heuristic family at n=1): CJK-script ratio ≥ 0.3 → 'cjk', else
    RTL-script ratio ≥ 0.3 → 'rtl', else ASCII-letter ratio ≥ 0.5 →
    'latin', else 'other'. Pure native string expressions — one
    scan, no shuffle, codegen'd."""
    n = F.length("text")
    cjk = F.length(
        F.regexp_replace("text", f"[^{CJK_CLASS}]", "")
    )
    rtl = F.length(
        F.regexp_replace("text", f"[^{RTL_CLASS}]", "")
    )
    alpha = F.length(
        F.regexp_replace("text", f"[^{ASCII_ALPHA_CLASS}]", "")
    )
    cjk_ratio = F.when(n > 0, cjk.cast("double") / n).otherwise(F.lit(0.0))
    rtl_ratio = F.when(n > 0, rtl.cast("double") / n).otherwise(F.lit(0.0))
    alpha_ratio = F.when(n > 0, alpha.cast("double") / n).otherwise(
        F.lit(0.0)
    )
    return docs.select(
        "doc_id",
        F.round(cjk_ratio, 4).alias("cjk_ratio"),
        F.round(rtl_ratio, 4).alias("rtl_ratio"),
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        F.when(cjk_ratio >= 0.3, F.lit("cjk"))
        .when(rtl_ratio >= 0.3, F.lit("rtl"))
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


# explicit ASCII whitespace class, NOT \s: Java regex \s includes
# vertical tab (U+000B) while RE2's does not, so a \s-based twin pair
# would fingerprint a \x0B-bearing document differently per engine
WS_CLASS = "[ \\t\\n\\x0B\\f\\r]"


def fingerprints(docs: DataFrame) -> DataFrame:
    """Document fingerprint: md5 over whitespace-normalized lowercase
    text (stable across engines — md5 is bit-identical everywhere,
    and the whitespace class is spelled out so both engines agree on
    every control character)."""
    norm = F.trim(
        F.regexp_replace(F.lower(F.col("text")), f"{WS_CLASS}+", " ")
    )
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


# ------------------------------------------------- web-corpus rule batteries
#
# Gopher quality rules (Rae et al. 2021, appendix A1.1) and C4 cleanup
# rules (Raffel et al. 2020 §2.2) — the standard web-corpus filters a
# training-data pipeline applies right after extraction. All native
# expressions (one codegen'd scan per document; the bigram mode adds
# one hash-aggregate shuffle) with exact DuckDB twins.
#
# The synthetic `documents` table is one unbroken line of unpunctuated
# vocab words, so line- and sentence-based rules would be degenerate on
# it. The catalog queries therefore apply a deterministic "web-ify"
# rewrite first — a '.' after every 11th token, a newline after every
# 8th — identically in both engines; unit tests exercise the rules on
# hand-built multi-line docs with bullets/ellipses as well.

# insert '. ' after every 11 tokens, then '\n' after every 8
_SENTENCE_EVERY = 11
_LINE_EVERY = 8
GOPHER_MIN_WORDS = 50          # published defaults (Gopher A1.1)
GOPHER_MAX_WORDS = 100_000
GOPHER_MEAN_WLEN = (3.0, 10.0)
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_RATIO = 0.8
GOPHER_MAX_DUP_LINE_FRAC = 0.3
GOPHER_MAX_TOP_BIGRAM_FRAC = 0.2
GOPHER_MIN_STOPWORDS = 2


def webify(col: str = "text") -> Column:
    """Deterministic re-punctuation/re-lining of the single-line
    fixture text (sequential non-overlapping regex replace — RE2 and
    Java regex agree on this pattern class)."""
    dotted = F.regexp_replace(
        F.col(col),
        r"(\S+(?: \S+){%d}) " % (_SENTENCE_EVERY - 1),
        "$1. ",
    )
    return F.regexp_replace(
        dotted, r"(\S+(?: \S+){%d}) " % (_LINE_EVERY - 1), "$1\n"
    )


def duck_webify(col: str = "text") -> str:
    """DuckDB twin of :func:`webify` (RE2 ``\\1`` backrefs, 'g' flag)."""
    dotted = (
        rf"regexp_replace({col}, '(\S+(?: \S+){{{_SENTENCE_EVERY - 1}}}) ',"
        r" '\1. ', 'g')"
    )
    return (
        rf"regexp_replace({dotted}, '(\S+(?: \S+){{{_LINE_EVERY - 1}}}) ',"
        r" e'\\1\n', 'g')"
    )


# ------------------------------------------------------- readability
#
# Flesch reading ease + Flesch-Kincaid grade as corpus-quality
# features (readability is a standard quality dimension next to the
# Gopher/C4 batteries: training mixes often oversample mid-difficulty
# prose). Syllables use the classic vowel-group heuristic (runs of
# [aeiouy] in lowercased text — the approximation every readability
# library ships); sentences count terminal-punctuation runs. All
# arithmetic integer milli-units with floor division in ONE fixed
# association, so both engines agree bit-for-bit — no doubles, no
# rounding modes.

_VOWEL_GROUP = "[aeiouy]+"
# terminal punctuation incl. the CJK full stops/marks (。．！？) —
# a readability op over a web corpus sees mixed-script documents
_SENT_END = "[.!?。．！？]+"


def readability_scores(
    docs: DataFrame, text_col: Column | None = None
) -> DataFrame:
    """(doc_id, n_words, n_sentences, n_syllables, fre_milli,
    fkg_milli, band): FRE = 206.835 − 1.015·(W/S) − 84.6·(Syl/W),
    FKG = 0.39·(W/S) + 11.8·(Syl/W) − 15.59, both in integer
    milli-units with W/S/Syl floored at 1 (degenerate docs score as
    one-sentence one-word text instead of dividing by zero). One
    narrow map — no shuffle, no UDF."""
    t = text_col if text_col is not None else F.col("text")
    lowered = docs.select("doc_id", F.lower(t).alias("lt"))
    counted = lowered.select(
        "doc_id",
        F.greatest(F.size(F.split("lt", " ")), F.lit(1))
        .cast("long").alias("w_"),
        F.greatest(
            F.size(F.expr(
                f"regexp_extract_all(lt, '{_SENT_END}', 0)"
            )),
            F.lit(1),
        ).cast("long").alias("s_"),
        F.greatest(
            F.size(F.expr(
                f"regexp_extract_all(lt, '{_VOWEL_GROUP}', 0)"
            )),
            F.lit(1),
        ).cast("long").alias("syl_"),
    )
    # integer floor division: `div` (Spark) == `//` (DuckDB); all
    # operands positive, ONE fixed association — bit-identical twins
    fre = F.expr(
        "206835 - (1015 * w_) div s_ - (84600 * syl_) div w_"
    )
    fkg = F.expr(
        "(390 * w_) div s_ + (11800 * syl_) div w_ - 15590"
    )
    return counted.select(
        "doc_id",
        F.col("w_").alias("n_words"),
        F.col("s_").alias("n_sentences"),
        F.col("syl_").alias("n_syllables"),
        fre.cast("long").alias("fre_milli"),
        fkg.cast("long").alias("fkg_milli"),
        F.when(fre >= 90000, F.lit("very_easy"))
        .when(fre >= 60000, F.lit("standard"))
        .when(fre >= 30000, F.lit("difficult"))
        .otherwise(F.lit("very_difficult"))
        .alias("band"),
    )


def duck_readability_sql(
    source: str = "documents", text_expr: str = "text"
) -> str:
    """DuckDB twin of :func:`readability_scores` — same milli-unit
    integer arithmetic, same floor divisions, same band cuts."""
    return f"""
WITH counted AS (
  SELECT doc_id,
         greatest(len(string_split({text_expr}, ' ')), 1)::BIGINT AS w_,
         greatest(len(regexp_extract_all(lower({text_expr}),
                  '{_SENT_END}')), 1)::BIGINT AS s_,
         greatest(len(regexp_extract_all(lower({text_expr}),
                  '{_VOWEL_GROUP}')), 1)::BIGINT AS syl_
  FROM {source}
)
SELECT doc_id,
       w_ AS n_words,
       s_ AS n_sentences,
       syl_ AS n_syllables,
       (206835 - (1015 * w_) // s_ - (84600 * syl_) // w_)::BIGINT
         AS fre_milli,
       ((390 * w_) // s_ + (11800 * syl_) // w_ - 15590)::BIGINT
         AS fkg_milli,
       CASE WHEN 206835 - (1015 * w_) // s_ - (84600 * syl_) // w_
                 >= 90000 THEN 'very_easy'
            WHEN 206835 - (1015 * w_) // s_ - (84600 * syl_) // w_
                 >= 60000 THEN 'standard'
            WHEN 206835 - (1015 * w_) // s_ - (84600 * syl_) // w_
                 >= 30000 THEN 'difficult'
            ELSE 'very_difficult' END AS band
FROM counted
"""


def gopher_rules(docs: DataFrame, text_col: Column | None = None) -> DataFrame:
    """Gopher repetition/quality rule battery per document. Returns the
    rule inputs plus the combined ``gopher_pass`` flag.

    Plan shape: one narrow codegen'd projection for the word/line
    rules; the top-bigram mode is explode → (doc_id, bigram) partial/
    final count → per-doc max — ONE extra shuffle on doc_id, never on
    text. At 100 TB the bigram aggregate is the word-count profile; all
    other rules are scan-local."""
    t = (text_col if text_col is not None else F.col("text")).alias("t")
    # materialize the token and line arrays ONCE — six downstream
    # expressions reference them; inlining split() into each lambda
    # would re-tokenize the document per rule (measured ~2× on the
    # bench battery, and the webified text_col pays its regex chain
    # per copy too)
    # localCheckpoint: `base` feeds BOTH the scan-local metrics
    # projection and the bigram aggregate, which join at the end —
    # Catalyst treats the two references as independent subplans, so
    # without materialization the webify regex chain + both splits
    # execute twice per action
    base = docs.select("doc_id", t).select(
        "doc_id",
        "t",
        F.split(F.col("t"), " ").alias("ws"),
        F.split(F.col("t"), "\n").alias("ls"),
    ).localCheckpoint(eager=False)
    n_words = F.size(F.col("ws"))
    sum_wlen = F.expr(
        "aggregate(transform(ws, w -> length(w)), 0L, (a, x) -> a + x)"
    )
    mean_wlen = sum_wlen.cast("double") / n_words.cast("double")
    n_alpha_words = F.size(
        F.expr("filter(ws, w -> w rlike '[A-Za-z]')")
    )
    alpha_frac = n_alpha_words.cast("double") / n_words.cast("double")
    n_symbols = F.length("t") - F.length(
        F.regexp_replace("t", "[#…]", "")
    )
    symbol_ratio = n_symbols.cast("double") / n_words.cast("double")
    stop_list = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    n_stop = F.size(F.expr(f"filter(ws, w -> w in ({stop_list}))"))
    n_lines = F.size(F.col("ls"))
    dup_line_frac = (
        (n_lines - F.size(F.array_distinct(F.col("ls")))).cast("double")
        / n_lines.cast("double")
    )
    metrics = base.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        F.round(mean_wlen, 4).alias("mean_word_len"),
        F.round(alpha_frac, 4).alias("alpha_word_frac"),
        F.round(symbol_ratio, 4).alias("symbol_ratio"),
        n_stop.cast("long").alias("n_stopwords"),
        F.round(dup_line_frac, 4).alias("dup_line_frac"),
    )
    # top-bigram fraction: the repetition rule — distributed mode
    # computation (explode + two-level aggregate), not a per-row loop
    bigrams = base.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(ws) >= 2 THEN "
                "transform(sequence(0, size(ws) - 2), i -> "
                "concat(ws[i], ' ', ws[i+1])) "
                "ELSE array() END"
            )
        ).alias("bg"),
    )
    top = (
        bigrams.groupBy("doc_id", "bg")
        .count()
        .groupBy("doc_id")
        .agg(
            F.max("count").alias("top_bg"),
            F.sum("count").alias("n_bg"),
        )
        .select(
            "doc_id",
            F.round(
                F.col("top_bg").cast("double") / F.col("n_bg").cast("double"),
                4,
            ).alias("top_bigram_frac"),
        )
    )
    out = metrics.join(top, "doc_id", "left").withColumn(
        "top_bigram_frac", F.coalesce("top_bigram_frac", F.lit(0.0))
    )
    gpass = (
        (F.col("n_words") >= GOPHER_MIN_WORDS)
        & (F.col("n_words") <= GOPHER_MAX_WORDS)
        & (F.col("mean_word_len") >= GOPHER_MEAN_WLEN[0])
        & (F.col("mean_word_len") <= GOPHER_MEAN_WLEN[1])
        & (F.col("alpha_word_frac") >= GOPHER_MIN_ALPHA_RATIO)
        & (F.col("symbol_ratio") <= GOPHER_MAX_SYMBOL_RATIO)
        & (F.col("dup_line_frac") <= GOPHER_MAX_DUP_LINE_FRAC)
        & (F.col("top_bigram_frac") <= GOPHER_MAX_TOP_BIGRAM_FRAC)
        & (F.col("n_stopwords") >= GOPHER_MIN_STOPWORDS)
    )
    return out.withColumn("gopher_pass", gpass)


C4_MIN_SENTENCES = 3
C4_MIN_LINE_WORDS = 5


def c4_rules(docs: DataFrame, text_col: Column | None = None) -> DataFrame:
    """C4 cleanup rule battery per document: sentence count, terminal-
    punctuation and ≥5-word line fractions, the lorem-ipsum / curly-
    brace / javascript page flags, and the combined ``c4_keep``. Pure
    scan-local expressions — no shuffle at any scale."""
    t = (text_col if text_col is not None else F.col("text")).alias("t")
    # materialize the line array once (three rules reference it)
    base = docs.select("doc_id", t).select(
        "doc_id", "t", F.split(F.col("t"), "\n").alias("ls")
    )
    n_sentences = F.size(F.split(F.col("t"), "[.!?]")) - 1
    n_lines = F.size(F.col("ls"))
    end_punct = F.size(
        F.expr(r"filter(ls, l -> l rlike '[.!?\"”]$')")
    )
    ge5w = F.size(
        F.expr(
            f"filter(ls, l -> size(split(l, ' ')) >= {C4_MIN_LINE_WORDS})"
        )
    )
    has_lorem = F.lower(F.col("t")).contains("lorem ipsum")
    has_brace = F.col("t").contains("{")
    has_js = F.lower(F.col("t")).rlike("\\bjavascript\\b")
    out = base.select(
        "doc_id",
        n_sentences.cast("long").alias("n_sentences"),
        F.round(
            end_punct.cast("double") / n_lines.cast("double"), 4
        ).alias("end_punct_line_frac"),
        F.round(ge5w.cast("double") / n_lines.cast("double"), 4).alias(
            "ge5w_line_frac"
        ),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        has_js.alias("has_js"),
    )
    keep = (
        (F.col("n_sentences") >= C4_MIN_SENTENCES)
        & ~F.col("has_lorem")
        & ~F.col("has_brace")
        & ~F.col("has_js")
    )
    return out.withColumn("c4_keep", keep)


def duck_fingerprint_sql(source: str = "documents") -> str:
    """DuckDB twin of :func:`fingerprints` — the ONE definition every
    consumer (catalog entry, recipe oracle) composes from, so the
    normalization can never drift between them. Uses the same
    explicit whitespace class as the Spark side (Java ``\\s`` and RE2
    ``\\s`` disagree on vertical tab)."""
    return rf"""
SELECT doc_id,
       md5(trim(regexp_replace(lower(text),
                '[ \t\n\x0B\f\r]+', ' ', 'g')))
         AS fingerprint
FROM {source}
"""


# ------------------------------------------------- bigram LM fluency cost
#
# The CCNet/KenLM-class filter one order up from unigram_costs: score
# each document by the average corpus-conditional probability of its
# bigrams, p(w2|w1) = c(w1 w2) / c(w1 ·), in integer basis points so
# both engines agree bit-for-bit. Fluent documents reuse corpus-common
# continuations and score high; garbled or off-distribution text
# scores low. Counts are self-trained on the scored corpus (the
# held-split LM of a production pipeline trains once, is keyed by the
# same 60-bit hashes, and broadcasts at probe time).

# keep docs averaging >= 330 bp (3.3 % mean conditional probability).
# Fixture-measured: splits every SF non-vacuously (keep fraction
# 0.86-0.93), integer-exact in both engines so the boundary is stable.
BIGRAM_KEEP_AT_LEAST = 330

# 60-bit md5 hashes (the repo-standard key): bigram and its prefix
_BIGRAM_PAIRS = (
    "CASE WHEN size(toks) >= 2 THEN "
    "transform(sequence(0, size(toks) - 2), i -> named_struct("
    "'h', cast(conv(substring(md5(concat_ws(' ', toks[i], toks[i+1])),"
    " 1, 15), 16, 10) as bigint), "
    "'h1', cast(conv(substring(md5(toks[i]), 1, 15), 16, 10) as bigint)"
    ")) ELSE array() END"
)


def bigram_costs(docs: DataFrame) -> DataFrame:
    """Per-document bigram LM score:
    (doc_id, n_bigrams, sum_pbp, avg_pbp, keep) with
    p_bp(bigram) = (10000 * c2) div c1 and avg = sum div n.

    Scale shape: one narrow map hashes every bigram (text never
    leaves the scan); corpus counts are two word-count-shaped
    aggregates with map-side combine; the probe join ships 8-byte
    keys against the count table (broadcast in production — a pruned
    LM table is bounded); the rollup is one hash aggregate on doc_id.
    Docs under 2 tokens carry no bigrams: scored 0, dropped."""
    pairs = (
        docs.withColumn("toks", F.split("text", " "))
        .select("doc_id", F.explode(F.expr(_BIGRAM_PAIRS)).alias("p"))
        .select("doc_id", "p.h", "p.h1")
    )
    # lazy localCheckpoint: pairs feeds both the corpus-count
    # aggregates and the per-doc probe join, and Catalyst has no
    # common-subplan reuse — without it every document is re-split
    # and every bigram re-md5'd per consumer (the dominant map cost).
    # Mirrors the DuckDB twin's `pairs AS MATERIALIZED`.
    pairs = pairs.localCheckpoint(eager=False)
    c2 = pairs.groupBy("h", "h1").agg(F.count("*").alias("c2"))
    c1 = c2.groupBy("h1").agg(F.sum("c2").alias("c1"))
    priced = c2.join(c1, "h1").select(
        "h", F.expr("(10000 * c2) div c1").alias("p_bp")
    )
    per_doc = (
        pairs.join(priced, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("p_bp").alias("sum_pbp"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("sum_pbp", F.lit(0)).alias("sum_pbp"),
            F.coalesce(
                F.expr("sum_pbp div n_bigrams"), F.lit(0)
            ).alias("avg_pbp"),
            (
                F.coalesce(F.expr("sum_pbp div n_bigrams"), F.lit(0))
                >= BIGRAM_KEEP_AT_LEAST
            ).alias("keep"),
        )
    )


def duck_bigram_sql(source: str = "documents") -> str:
    """DuckDB twin of :func:`bigram_costs` — relational (unnest +
    group-by) like the other LM twins; same 60-bit hash keys."""
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM {source}
), pairs AS MATERIALIZED (
  SELECT doc_id,
         CAST('0x' || substr(md5(b.bg), 1, 15) AS BIGINT) AS h,
         CAST('0x' || substr(md5(b.w1), 1, 15) AS BIGINT) AS h1
  FROM toks,
  LATERAL (
    SELECT unnest(CASE WHEN len(t) >= 2 THEN
             list_transform(generate_series(1, len(t) - 1),
               i -> t[i] || ' ' || t[i+1])
           ELSE [] END) AS bg,
           unnest(CASE WHEN len(t) >= 2 THEN
             list_transform(generate_series(1, len(t) - 1), i -> t[i])
           ELSE [] END) AS w1
  ) b
), c2 AS (
  SELECT h, h1, count(*) AS c2 FROM pairs GROUP BY h, h1
), c1 AS (
  SELECT h1, sum(c2) AS c1 FROM c2 GROUP BY h1
), priced AS (
  SELECT c2.h, (10000 * c2.c2) // c1.c1 AS p_bp
  FROM c2 JOIN c1 ON c2.h1 = c1.h1
), per_doc AS (
  SELECT p.doc_id, count(*) AS n_bigrams, sum(pr.p_bp) AS sum_pbp
  FROM pairs p JOIN priced pr ON p.h = pr.h
  GROUP BY p.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(per_doc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(per_doc.sum_pbp, 0) AS BIGINT) AS sum_pbp,
       CAST(coalesce(per_doc.sum_pbp // per_doc.n_bigrams, 0)
            AS BIGINT) AS avg_pbp,
       coalesce(per_doc.sum_pbp // per_doc.n_bigrams, 0)
         >= {BIGRAM_KEEP_AT_LEAST} AS keep
FROM {source} d LEFT JOIN per_doc ON d.doc_id = per_doc.doc_id
"""


# ---------------------------------------------- character entropy
#
# Shannon entropy of the character distribution — the classic cheap
# spam/keyboard-mash/binary-leak signal: natural prose sits in a
# narrow entropy band (~2.7-3.3 nats for English), repeated-token
# spam falls below it, random/encoded bytes rise above it. Computed
# as ln(n) - sum(c*ln c)/n over per-character counts so one grouped
# pass suffices. Scale shape: explode to (doc_id, char) rows ->
# partial-aggregable count -> per-doc combine; the exchange carries
# (doc_id, char, count) triples, bounded by alphabet size per doc,
# never raw text.


def char_entropy(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chars, entropy) — entropy in nats rounded to 4
    decimals (both engines derive it from identical IEEE ops on
    identical integer counts)."""
    chars = docs.select(
        "doc_id", F.explode(F.split("text", "")).alias("ch")
    )
    counts = chars.groupBy("doc_id", "ch").agg(
        F.count("*").alias("c")
    )
    return (
        counts.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_chars"),
            F.round(
                F.expr(
                    "ln(cast(sum(c) as double)) - "
                    "sum(c * ln(cast(c as double))) / sum(c)"
                ),
                4,
            ).alias("entropy"),
        )
        .orderBy("doc_id")
    )


def duck_char_entropy_sql(source: str = "documents") -> str:
    return f"""
WITH chars AS (
  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM {source}
), counts AS (
  SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY doc_id, ch
)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_chars,
       round(ln(CAST(sum(c) AS DOUBLE))
             - sum(c * ln(CAST(c AS DOUBLE))) / sum(c), 4) AS entropy
FROM counts
GROUP BY doc_id
ORDER BY doc_id
"""


# ---------------------------- interpolated Kneser-Ney trigram LM cost
#
# The tier above the bigram filter: interpolated Kneser-Ney with
# absolute discount D = 3/4 at both backoff levels — the smoothing
# KenLM/CCNet-class filters actually use. Lower-order distributions
# are CONTINUATION counts (how many distinct left contexts a unit
# completes), not raw frequencies: "Francisco" is frequent but only
# ever follows "San", so its continuation probability is tiny — the
# property raw-backoff models get wrong.
#
#   p_cont(w3)      = cu(w3) / Nt          (distinct w2 preceding w3
#                                           over distinct bigram types)
#   p2(w3|w2)       = (max(cc2 - D, 0) + D * N1p2(w2) * p_cont(w3))
#                     / ccctx(w2)          (continuation counts)
#   p3(w3|w1 w2)    = (max(c3 - D, 0) + D * N1p3(w1 w2) * p2(w3|w2))
#                     / c2ctx(w1 w2)       (raw counts, top level)
#
# Exact integer contract: D = 3/4 multiplies through (4c - 3), and
# the backoff chains through a QUANTIZED intermediate
# p2_bp8 = floor(1e8 * p2) so both engines floor identically. Bound:
# the p2 numerator 1e8 * (4*cc2*Nt + 3*N1p2*cu) fits int64 while
# cc2*Nt < ~2.3e10 (likewise N1p3*p2_bp8 < ~9.2e14 for p3) — holds
# for any pruned LM vocabulary; a raw 100 TB corpus with billions of
# distinct bigram types would need the Nt factor divided out (with a
# matching oracle change) or DECIMAL(38) intermediates:
#   p2_bp8 = (1e8 * (max(4*cc2-3, 0) * Nt + 3 * N1p2 * cu))
#            div (4 * ccctx * Nt)
#   p3_bp  = (1e4 * (max(4*c3-3, 0) * 1e8 + 3 * N1p3 * p2_bp8))
#            div (4 * c2ctx * 1e8)
#
# Scale shape: ONE word-count-shaped aggregate over trigram rows
# (map-side combine) is the heavy stage; every other table derives
# from it by small re-aggregations; the probe join ships 8-byte
# hashes (broadcast in production — a pruned LM is bounded); text
# never leaves the scan that hashes it.

# keep docs averaging >= 540 bp. Fixture-measured: splits every SF
# non-vacuously (keep fraction 0.69 at sf0.001, 0.75 at sf0.01),
# integer-exact in both engines so the boundary is stable.
KN_KEEP_AT_LEAST = 540

_TRIGRAM_STRUCTS = (
    "CASE WHEN size(toks) >= 3 THEN "
    "transform(sequence(0, size(toks) - 3), i -> named_struct("
    "'hctx', cast(conv(substring(md5(concat_ws(' ', toks[i],"
    " toks[i+1])), 1, 15), 16, 10) as bigint), "
    "'hw2', cast(conv(substring(md5(toks[i+1]), 1, 15), 16, 10)"
    " as bigint), "
    "'hw3', cast(conv(substring(md5(toks[i+2]), 1, 15), 16, 10)"
    " as bigint)"
    ")) ELSE array() END"
)


def trigram_kn_costs(docs: DataFrame) -> DataFrame:
    """(doc_id, n_trigrams, sum_bp, avg_bp, keep) — interpolated
    Kneser-Ney trigram score per document, integer basis points,
    self-trained on the scored corpus."""
    tri = (
        docs.withColumn("toks", F.split("text", " "))
        .select(
            "doc_id", F.explode(F.expr(_TRIGRAM_STRUCTS)).alias("t")
        )
        .select("doc_id", "t.hctx", "t.hw2", "t.hw3")
    )
    # feeds the count cascade AND the probe join (no common-subplan
    # reuse in Catalyst) — same justification as bigram_costs
    tri = tri.localCheckpoint(eager=False)
    c3 = tri.groupBy("hctx", "hw2", "hw3").agg(
        F.count("*").alias("c3")
    )
    c3 = c3.localCheckpoint(eager=False)  # parent of 4 aggregates
    ctx3 = c3.groupBy("hctx").agg(
        F.sum("c3").alias("c2ctx"), F.count("*").alias("n1p3")
    )
    cc2 = c3.groupBy("hw2", "hw3").agg(F.count("*").alias("cc2"))
    cc2 = cc2.localCheckpoint(eager=False)  # parent of 3 aggregates
    ctx2 = cc2.groupBy("hw2").agg(
        F.sum("cc2").alias("ccctx"), F.count("*").alias("n1p2")
    )
    cu = cc2.groupBy("hw3").agg(F.count("*").alias("cu"))
    nt = cc2.agg(F.count("*").alias("nt"))
    p2 = (
        cc2.join(ctx2, "hw2")
        .join(cu, "hw3")
        .crossJoin(F.broadcast(nt))
        .select(
            "hw2", "hw3",
            F.expr(
                "(100000000 * (greatest(4 * cc2 - 3, 0) * nt"
                " + 3 * n1p2 * cu)) div (4 * ccctx * nt)"
            ).alias("p2bp8"),
        )
    )
    p3 = (
        c3.join(ctx3, "hctx")
        .join(p2, ["hw2", "hw3"])
        .select(
            "hctx", "hw3",
            F.expr(
                "(10000 * (greatest(4 * c3 - 3, 0) * 100000000"
                " + 3 * n1p3 * p2bp8)) div (4 * c2ctx * 100000000)"
            ).alias("p3bp"),
        )
    )
    per_doc = (
        tri.join(p3, ["hctx", "hw3"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_trigrams"),
            F.sum("p3bp").alias("sum_bp"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_trigrams", F.lit(0)).alias("n_trigrams"),
            F.coalesce("sum_bp", F.lit(0)).alias("sum_bp"),
            F.coalesce(
                F.expr("sum_bp div n_trigrams"), F.lit(0)
            ).alias("avg_bp"),
            (
                F.coalesce(F.expr("sum_bp div n_trigrams"), F.lit(0))
                >= KN_KEEP_AT_LEAST
            ).alias("keep"),
        )
    )


def duck_trigram_kn_sql(source: str = "documents") -> str:
    """DuckDB twin of :func:`trigram_kn_costs` (same hash keys,
    same two-stage integer quantization)."""
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM {source}
), tri AS MATERIALIZED (
  SELECT doc_id,
         CAST('0x' || substr(md5(g.ctx), 1, 15) AS BIGINT) AS hctx,
         CAST('0x' || substr(md5(g.w2), 1, 15) AS BIGINT)  AS hw2,
         CAST('0x' || substr(md5(g.w3), 1, 15) AS BIGINT)  AS hw3
  FROM toks,
  LATERAL (
    SELECT unnest(CASE WHEN len(t) >= 3 THEN
             list_transform(generate_series(1, len(t) - 2),
               i -> t[i] || ' ' || t[i+1])
           ELSE [] END) AS ctx,
           unnest(CASE WHEN len(t) >= 3 THEN
             list_transform(generate_series(1, len(t) - 2),
               i -> t[i+1])
           ELSE [] END) AS w2,
           unnest(CASE WHEN len(t) >= 3 THEN
             list_transform(generate_series(1, len(t) - 2),
               i -> t[i+2])
           ELSE [] END) AS w3
  ) g
), c3 AS MATERIALIZED (
  SELECT hctx, hw2, hw3, count(*) AS c3
  FROM tri GROUP BY hctx, hw2, hw3
), ctx3 AS (
  SELECT hctx, sum(c3) AS c2ctx, count(*) AS n1p3
  FROM c3 GROUP BY hctx
), cc2 AS MATERIALIZED (
  SELECT hw2, hw3, count(*) AS cc2 FROM c3 GROUP BY hw2, hw3
), ctx2 AS (
  SELECT hw2, sum(cc2) AS ccctx, count(*) AS n1p2
  FROM cc2 GROUP BY hw2
), cu AS (
  SELECT hw3, count(*) AS cu FROM cc2 GROUP BY hw3
), nt AS (
  SELECT count(*) AS nt FROM cc2
), p2 AS (
  SELECT cc2.hw2, cc2.hw3,
         (100000000 * (greatest(4 * cc2.cc2 - 3, 0) * nt.nt
          + 3 * ctx2.n1p2 * cu.cu)) // (4 * ctx2.ccctx * nt.nt)
           AS p2bp8
  FROM cc2
  JOIN ctx2 ON cc2.hw2 = ctx2.hw2
  JOIN cu ON cc2.hw3 = cu.hw3
  CROSS JOIN nt
), p3 AS (
  SELECT c3.hctx, c3.hw3,
         (10000 * (greatest(4 * c3.c3 - 3, 0) * 100000000
          + 3 * ctx3.n1p3 * p2.p2bp8))
         // (4 * ctx3.c2ctx * 100000000) AS p3bp
  FROM c3
  JOIN ctx3 ON c3.hctx = ctx3.hctx
  JOIN p2 ON c3.hw2 = p2.hw2 AND c3.hw3 = p2.hw3
), per_doc AS (
  SELECT tri.doc_id, count(*) AS n_trigrams, sum(p3.p3bp) AS sum_bp
  FROM tri JOIN p3 ON tri.hctx = p3.hctx AND tri.hw3 = p3.hw3
  GROUP BY tri.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(per_doc.n_trigrams, 0) AS BIGINT) AS n_trigrams,
       CAST(coalesce(per_doc.sum_bp, 0) AS BIGINT) AS sum_bp,
       CAST(coalesce(per_doc.sum_bp // per_doc.n_trigrams, 0)
            AS BIGINT) AS avg_bp,
       coalesce(per_doc.sum_bp // per_doc.n_trigrams, 0)
         >= {KN_KEEP_AT_LEAST} AS keep
FROM {source} d LEFT JOIN per_doc ON d.doc_id = per_doc.doc_id
"""
