"""MIME sniffing — WHATWG-subset content-type audit for parse routing.

The extraction pipeline routes every payload to the PDF or HTML
branch by looking at the BYTES (``sources/pages.py`` trusts
``%PDF-``, never the Content-Type header), because declared types on
the real web lie constantly — mislabeled binaries crash naive
parsers and mislabeled HTML gets skipped.  This operator is the
corpus-level audit of that routing rule: sniff every payload with a
WHATWG "rules for identifying an unknown MIME type" subset
(https://mimesniff.spec.whatwg.org/ §7.1) and report the
declared-vs-sniffed confusion matrix, which tells a crawl operator
exactly how much of each host's Content-Type metadata is reliable.

Sniff grammar (spec order, the subset our branches route on):

1. UTF-8 BOM ⇒ ``text/plain`` — the BOM check PRECEDES tag patterns
   in the spec, so BOM + ``<html>`` sniffs text/plain, a deliberate
   fixture family proving order matters;
2. whitespace-skipped, case-insensitive ``<!DOCTYPE HTML`` / ``<html``
   ⇒ ``text/html``;
3. ``%PDF-`` ⇒ ``application/pdf``;
4. PNG / GIF87a|GIF89a magic ⇒ ``image/png`` / ``image/gif``;
5. ``1F 8B`` ⇒ ``application/x-gzip``;
6. otherwise ``application/octet-stream``.

Fixture shape (closed form, both engines): six payload families from
``doc_id % 6`` (PDF, PNG, GIF, gzip, BOM+HTML, whitespace+DOCTYPE);
the declared type is honest except every 7th document, which declares
the NEXT family's type.  Expected mismatches are therefore exactly
the liars plus the BOM family (spec step 1).

Scale shape (100 TB contract): the Spark side sniffs a REAL binary
column (``unhex`` → ``decode(payload, 'ISO-8859-1')`` — latin-1 is
the byte-transparent decode, the same trick the WARC reader uses)
with pure native expressions — one narrow map, no UDF, whole-stage
codegen; only the two small MIME-name strings reach the one
partially-aggregable exchange.  The DuckDB twin builds the identical
latin-1 string via ``chr()`` composition and applies the same grammar.

Reference tie-in: the reference extractor trusts file extensions
(single-machine CLI); the Spark pipeline's byte-based routing is the
web-scale replacement, and this operator measures why it is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: payload family prefixes, doc_id % 6
FAMILY_BYTES: dict[int, bytes] = {
    0: b"%PDF-1.7\n",
    1: b"\x89PNG\r\n\x1a\n",
    2: b"GIF89a",
    3: b"\x1f\x8b\x08",
    4: b"\xef\xbb\xbf<html><body>ok",
    5: b" \n\t<!DOCTYPE HTML>",
}

#: the type each family's emitter declares when honest
FAMILY_DECLARED: dict[int, str] = {
    0: "application/pdf",
    1: "image/png",
    2: "image/gif",
    3: "application/x-gzip",
    4: "text/html",
    5: "text/html",
}


def _duck_str(bs: bytes) -> str:
    """Render ``bs`` as a DuckDB expression producing the latin-1
    decode of those bytes (printable runs as literals, the rest as
    ``chr()``)."""
    parts: list[str] = []
    run = ""
    for b in bs:
        if 32 <= b < 127 and chr(b) != "'":
            run += chr(b)
        else:
            if run:
                parts.append(f"'{run}'")
                run = ""
            parts.append(f"chr({b})")
    if run:
        parts.append(f"'{run}'")
    return " || ".join(parts)


#: synthesis twins: payload bytes (hex on the Spark side — unhex makes
#: a real binary column) + declared type, with every 7th doc lying
_TAIL_SPARK = "lpad(hex(32 + pmod(doc_id, 200)), 2, '0')"
_TAIL_DUCK = "chr(CAST(32 + doc_id % 200 AS INT))"

SPARK_PAYLOAD_HEX = (
    "concat(CASE "
    + " ".join(
        f"WHEN doc_id % 6 = {k} THEN '{v.hex()}'"
        for k, v in FAMILY_BYTES.items()
    )
    + f" END, {_TAIL_SPARK})"
)
DUCK_PAYLOAD_STR = (
    "(CASE "
    + " ".join(
        f"WHEN doc_id % 6 = {k} THEN {_duck_str(v)}"
        for k, v in FAMILY_BYTES.items()
    )
    + f" END) || {_TAIL_DUCK}"
)

_DECLARED_CASE = " ".join(
    "WHEN fam = {k} THEN '{v}'".format(k=k, v=v)
    for k, v in FAMILY_DECLARED.items()
)
SPARK_DECLARED = (
    "CASE WHEN doc_id % 7 = 0 THEN"
    " CASE " + _DECLARED_CASE.replace(
        "fam", "(doc_id % 6 + 1) % 6") + " END"
    " ELSE CASE " + _DECLARED_CASE.replace("fam", "doc_id % 6")
    + " END END"
)
DUCK_DECLARED = SPARK_DECLARED  # pure integer CASE — identical SQL

#: the WHATWG-subset grammar over the latin-1 decode ``{s}``; ``{ws}``
#: is the engine's literal for the leading-whitespace regex (Spark SQL
#: unescapes string literals before the regex engine sees them — and
#: does NOT know ``\f`` — so the Spark form must double the
#: backslashes to ship ``\t``/``\f`` as JAVA-REGEX escapes)
_SNIFF_T = (
    "CASE"
    " WHEN substring({s}, 1, 3) = concat(char(239), char(187),"
    " char(191)) THEN 'text/plain'"
    " WHEN lower(regexp_replace({s}, {ws}, ''))"
    " LIKE '<!doctype html%'"
    " OR lower(regexp_replace({s}, {ws}, ''))"
    " LIKE '<html%' THEN 'text/html'"
    " WHEN substring({s}, 1, 5) = '%PDF-' THEN 'application/pdf'"
    " WHEN substring({s}, 1, 8) = concat(char(137), 'PNG', char(13),"
    " char(10), char(26), char(10)) THEN 'image/png'"
    " WHEN substring({s}, 1, 6) IN ('GIF87a', 'GIF89a')"
    " THEN 'image/gif'"
    " WHEN substring({s}, 1, 2) = concat(char(31), char(139))"
    " THEN 'application/x-gzip'"
    " ELSE 'application/octet-stream' END"
)
SPARK_SNIFF = _SNIFF_T.format(
    s="decode(payload, 'ISO-8859-1')",
    ws="'^[ \\\\t\\\\r\\\\n\\\\f]+'",
)
_DUCK_SNIFF = _SNIFF_T.format(
    s="payload_s",
    ws="'^[ \t\r\n\f]+'",
).replace("char(", "chr(")


def synth_payloads(docs: DataFrame) -> DataFrame:
    """Fixture ``(payload: binary, declared: string)`` synthesis."""
    return docs.select(
        F.expr(f"unhex({SPARK_PAYLOAD_HEX})").alias("payload"),
        F.expr(SPARK_DECLARED).alias("declared"),
    )


def sniff_report(pages: DataFrame) -> DataFrame:
    """Declared-vs-sniffed confusion matrix from a
    ``(payload, declared)`` frame: (declared, sniffed, n_docs,
    mismatch)."""
    return (
        pages.select(
            "declared", F.expr(SPARK_SNIFF).alias("sniffed")
        )
        .groupBy("declared", "sniffed")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .select(
            "declared", "sniffed", "n_docs",
            F.expr("declared != sniffed").alias("mismatch"),
        )
        .orderBy("declared", "sniffed")
    )


def duck_sniff_sql(source: str = "documents") -> str:
    """DuckDB twin — identical latin-1 payload, identical grammar."""
    return f"""
WITH pages AS (
  SELECT {DUCK_PAYLOAD_STR} AS payload_s,
         {DUCK_DECLARED} AS declared
  FROM {source}
), sniffed AS (
  SELECT declared, {_DUCK_SNIFF} AS sniffed FROM pages
)
SELECT declared, sniffed, CAST(count(*) AS BIGINT) AS n_docs,
       declared <> sniffed AS mismatch
FROM sniffed GROUP BY declared, sniffed ORDER BY declared, sniffed
"""
