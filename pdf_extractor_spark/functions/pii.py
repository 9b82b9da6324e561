"""PII scrubbing battery (training-data pipeline op).

Before text ships into a training corpus, pipelines replace personal
identifiers with typed placeholder tokens (the C4/Dolma/FineWeb
recipe): emails, phone numbers, IP addresses, US SSNs. Everything is
native ``regexp_replace`` / ``regexp_extract_all`` — one narrow map,
no UDFs, no shuffle — with DuckDB twins for the oracle. Patterns are
written to the Java-regex ∩ RE2 common dialect (no lookarounds, no
backrefs) so both engines match identically.

Replacement ORDER matters: emails first (their local part can contain
digits that downstream patterns would chew on), then SSNs (the
ddd-dd-dddd shape is more specific than phones), then IPs (dotted
digits), then phones.

Scale notes (100 TB): a pure map with four precompiled regexes per
row — whole-stage codegen, scan-local, embarrassingly parallel. The
only design decision at scale is running it BEFORE dedup (so
placeholder tokens, not raw PII, enter the minhash shingles) — the
catalog query reflects that ordering contract in its docstring.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
SSN_RE = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
IP_RE = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
# country code OPTIONAL: "(555) 123-4567" and "555-123-4567" — the
# dominant bare US forms — must match, not only "+1 ..." spellings.
# Two guards (Java regex ∩ RE2, no lookarounds) keep the pattern off
# mid-digit-run substrings like "released 20240101-5678" and
# "order 123456-7890" (serials/dates, not phones): \b anchors on
# every digit-initial branch, and the area-code separator is
# REQUIRED unless the (ddd) parenthesised form supplies the boundary
# itself — "123456-7890" has neither and no longer matches.
# NB: the boundary sits AFTER the optional '+' — "\\b\\+?" can never
# assert when '+' follows a space (two non-word chars, no boundary),
# which silently dropped the '+' from every "+1 ..." match and left a
# stray '+' in scrubbed text.
PHONE_RE = (
    "(?:\\+?\\b\\d{1,2}[ -])?"
    "(?:\\(\\d{3}\\)[ -]?|\\b\\d{3}[ -])"
    "\\d{3}-\\d{4}\\b"
)

# (pattern, placeholder, count column) — applied in this order
PII_RULES: tuple[tuple[str, str, str], ...] = (
    (EMAIL_RE, "<EMAIL>", "n_email"),
    (SSN_RE, "<SSN>", "n_ssn"),
    (IP_RE, "<IP>", "n_ip"),
    (PHONE_RE, "<PHONE>", "n_phone"),
)


def scrub_pii(text: Column) -> Column:
    """Typed-placeholder replacement, fixed rule order."""
    out = text
    for pat, token, _n in PII_RULES:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_counts(text: Column) -> list[Column]:
    """Per-type match counts, measured at the same chain position the
    replacement runs at (an email is counted before, not after, its
    digits could be eaten by the phone rule)."""
    cols = []
    cur = text
    for pat, token, name in PII_RULES:
        cols.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), 0)).alias(name)
        )
        cur = F.regexp_replace(cur, pat, token)
    return cols


def duck_scrub_chain(expr: str) -> tuple[str, list[str]]:
    """DuckDB twin: returns (scrubbed expression, [count exprs])."""
    counts = []
    cur = expr
    for pat, token, name in PII_RULES:
        counts.append(
            f"CAST(len(regexp_extract_all({cur}, '{pat}')) AS INTEGER)"
            f" AS {name}"
        )
        cur = f"regexp_replace({cur}, '{pat}', '{token}', 'g')"
    return cur, counts


# deterministic PII injection for the fixture documents table (the
# synthetic text is PII-free; the real pipeline scrubs crawl text)
def inject_pii(docs: DataFrame) -> Column:
    d = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.lit(" Contact: user"), d.cast("string"),
        F.lit("@example.com"),
        F.when(d % 3 == 0, F.lit(" SSN 123-45-6789")).otherwise(
            F.lit("")
        ),
        F.lit(" call +1 (555) 010-"),
        F.lpad((d % 10000).cast("string"), 4, "0"),
        F.lit(" from 10.0."), (d % 256).cast("string"),
        F.lit("."), ((d * 7) % 256).cast("string"),
    )


DUCK_INJECT_PII = (
    "text || ' Contact: user' || CAST(doc_id AS VARCHAR) || "
    "'@example.com' || "
    "CASE WHEN doc_id % 3 = 0 THEN ' SSN 123-45-6789' ELSE '' END || "
    "' call +1 (555) 010-' || "
    "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || "
    "' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || "
    "CAST((doc_id * 7) % 256 AS VARCHAR)"
)


def pii_scrub_report(docs: DataFrame) -> DataFrame:
    """(doc_id, n_email, n_ssn, n_ip, n_phone, scrubbed) over
    PII-injected fixture text — one narrow map stage."""
    injected = inject_pii(docs)
    return docs.select(
        "doc_id",
        *pii_counts(injected),
        scrub_pii(injected).alias("scrubbed"),
    )
