"""Mojibake detection and repair — the ftfy-class encoding-damage
fixer every web corpus runs before dedup and quality filtering.

The damage class: UTF-8 bytes that some upstream system decoded as
Latin-1, turning every multi-byte sequence into 2–4 spurious chars
("café" → "cafÃ©", "—" → "â€" + U+0094).  On real crawls a few
percent of pages carry it (the page was transcoded after the lie,
so the extractor's charset sniffing can no longer see it).  Repair
is the exact inverse: re-encode the TEXT as Latin-1 (codepoint ==
byte, lossless for chars ≤ U+00FF) and decode the bytes as UTF-8 —
both native Spark expressions, so the whole operator is one narrow
whole-stage-codegen map: zero UDFs, zero exchanges (plan-pinned).

Safety gate (the part naive fixers get wrong): repair ONLY fires
when (a) a mojibake signature is present (a Latin-1 char in the
UTF-8 lead-byte range followed by chars in the continuation range)
AND (b) the WHOLE string matches the RFC 3629 UTF-8 well-formedness
grammar when read as Latin-1 bytes — otherwise ``decode(...,
'UTF-8')`` would mangle clean accented text or raise under ANSI
mode.  Both regexes are generated from one table so the Spark (Java
regex) and DuckDB (RE2) forms cannot drift.  Like every statistical
mojibake detector, (a) can in principle false-positive on adversarial
clean text (e.g. "é" followed by two continuation-range chars); the
validity gate keeps repair lossless-or-skipped, never corrupting.

Convention note: this implements the Latin-1 (ISO-8859-1) mis-decode,
where bytes map to codepoints 1:1.  The Windows-1252 variant (the
"â€™" that renders with a euro sign) differs only in the 0x80–0x9F
row; the Latin-1 form is the canonical round-trippable one and the
one both engines reproduce bit-for-bit.

Fixture (closed form): ``doc_id % 3`` → 0: ASCII only (untouched);
1: a proper UTF-8 tail with 2- and 3-byte chars (must be detected as
clean and NOT altered); 2: the same tail run through the Latin-1
mis-decode (detected, repaired, and the repaired string equals the
class-1 form — so the oracle predicts the output md5 exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: RFC 3629 well-formed UTF-8, expressed over Latin-1 codepoints.
#: Each row is one alternative: items are "XX" (single) or "XX-YY"
#: (range) hex classes.  Shared by both engines' pattern generators.
_UTF8_SEQS: tuple[tuple[str, ...], ...] = (
    ("00-7F",),
    ("C2-DF", "80-BF"),
    ("E0", "A0-BF", "80-BF"),
    ("E1-EC", "80-BF", "80-BF"),
    ("ED", "80-9F", "80-BF"),
    ("EE-EF", "80-BF", "80-BF"),
    ("F0", "90-BF", "80-BF", "80-BF"),
    ("F1-F3", "80-BF", "80-BF", "80-BF"),
    ("F4", "80-8F", "80-BF", "80-BF"),
)

#: mojibake signature: a 2-, 3- or 4-byte UTF-8 sequence read as
#: Latin-1 (loose lead classes — the validity gate does the strict
#: structural check before repair fires)
_SIG_SEQS: tuple[tuple[str, ...], ...] = (
    ("C2-DF", "80-BF"),
    ("E0-EF", "80-BF", "80-BF"),
    ("F0-F4", "80-BF", "80-BF", "80-BF"),
)


def _cls(item: str, fmt) -> str:
    if "-" in item:
        lo, hi = item.split("-")
        return f"[{fmt(lo)}-{fmt(hi)}]"
    return fmt(item)


def _pattern(seqs, fmt, anchor: bool) -> str:
    alts = "|".join("".join(_cls(i, fmt) for i in seq) for seq in seqs)
    return f"^(?:{alts})*$" if anchor else alts


def _java(hx: str) -> str:
    return f"\\u00{hx.lower()}"


def _re2(hx: str) -> str:
    return f"\\x{{{hx.upper()}}}"


JAVA_VALID_UTF8 = _pattern(_UTF8_SEQS, _java, anchor=True)
RE2_VALID_UTF8 = _pattern(_UTF8_SEQS, _re2, anchor=True)
JAVA_SIG = _pattern(_SIG_SEQS, _java, anchor=False)
RE2_SIG = _pattern(_SIG_SEQS, _re2, anchor=False)

#: fixture tails: 2-byte (é, ï, è) and 3-byte (— em-dash) UTF-8 chars
TAIL_CLEAN = " — café naïve très"
TAIL_MOJI = TAIL_CLEAN.encode("utf-8").decode("latin-1")


def synth_encoding_classes(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, text) with the per-class tail appended."""
    cls = F.col("doc_id") % 3
    tail = (
        F.when(cls == 1, F.lit(TAIL_CLEAN))
        .when(cls == 2, F.lit(TAIL_MOJI))
        .otherwise(F.lit(""))
    )
    return docs.select(
        "doc_id", F.concat(F.col("text"), tail).alias("text")
    )


def repair_mojibake(col: F.Column) -> F.Column:
    """The guarded repair expression: signature AND whole-string
    UTF-8-as-Latin-1 validity → re-encode/decode; else identity."""
    gated = col.rlike(JAVA_SIG) & col.rlike(JAVA_VALID_UTF8)
    return F.when(
        gated, F.decode(F.encode(col, "ISO-8859-1"), "UTF-8")
    ).otherwise(col)


def mojibake_report(pages: DataFrame) -> DataFrame:
    """(doc_id, text) → per-document repair report: detection flag,
    whether repair fired, char lengths before/after, and the md5 of
    the final text (the value the oracle predicts).  Pure narrow map."""
    t = F.col("text")
    detected = t.rlike(JAVA_SIG)
    repairable = detected & t.rlike(JAVA_VALID_UTF8)
    fixed = repair_mojibake(t)
    return pages.select(
        "doc_id",
        detected.alias("moji_detected"),
        repairable.alias("repaired"),
        F.length(t).cast("bigint").alias("n_before"),
        F.length(fixed).cast("bigint").alias("n_after"),
        F.md5(F.encode(fixed, "UTF-8")).alias("out_md5"),
    ).orderBy("doc_id")


def _duck_lit(s: str) -> str:
    """DuckDB expression for string ``s`` with every non-ASCII or
    quote char as ``chr()`` — dodges literal-encoding pitfalls."""
    parts: list[str] = []
    run = ""
    for ch in s:
        if 32 <= ord(ch) < 127 and ch != "'":
            run += ch
        else:
            if run:
                parts.append(f"'{run}'")
                run = ""
            parts.append(f"chr({ord(ch)})")
    if run:
        parts.append(f"'{run}'")
    return " || ".join(parts) if parts else "''"


def duck_mojibake_sql(source: str = "documents") -> str:
    """DuckDB twin.  The synthesis appends the same tails; detection
    uses the generated RE2 forms of the same grammars; the REPAIRED
    text is constructed directly from the known class structure
    (class 2's repair == class 1's tail), which is exactly what the
    Spark side must compute through encode/decode."""
    clean, moji = _duck_lit(TAIL_CLEAN), _duck_lit(TAIL_MOJI)
    return f"""
WITH pages AS (
  SELECT doc_id, text AS orig,
         text || CASE doc_id % 3
                   WHEN 1 THEN {clean}
                   WHEN 2 THEN {moji}
                   ELSE '' END AS t
  FROM {source}
), flags AS (
  SELECT doc_id, orig, t,
         regexp_matches(t, '{RE2_SIG}') AS moji_detected,
         regexp_matches(t, '{RE2_SIG}')
           AND regexp_matches(t, '{RE2_VALID_UTF8}') AS repaired
  FROM pages
), fixed AS (
  SELECT doc_id, moji_detected, repaired, t,
         CASE WHEN repaired THEN orig || {clean} ELSE t END AS out
  FROM flags
)
SELECT doc_id, moji_detected, repaired,
       CAST(length(t) AS BIGINT) AS n_before,
       CAST(length(out) AS BIGINT) AS n_after,
       md5(out) AS out_md5
FROM fixed ORDER BY doc_id
"""
