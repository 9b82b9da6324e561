"""JSONL (NDJSON) ingestion — the interchange format training
corpora actually ship as (one JSON object per line: Dolma, RedPajama,
FineWeb all publish this shape). The engine-relevant part is that
parsing stays JVM-SIDE: records synthesize as JSON strings in
codegen'd expressions and parse back with ``from_json`` — Spark's
native Jackson path with PERMISSIVE corrupt-record semantics — so
the whole leg is whole-stage codegen with zero Python.

Fixture schedule (deterministic in doc_id):

    line = {"id": doc_id, "text": <documents.text>,
            "lang": "en", "meta": {"bucket": doc_id % 7}}
    every 5th doc escapes its text through JSON \\uXXXX escapes for
      EVERY char — astral codepoints as surrogate pairs (legal
      JSON, same decoded value)
    every 11th doc is CORRUPT: the closing brace is dropped —
      from_json must yield a null struct, and the leg reports the
      document as rejected rather than silently dropping it

The DuckDB twin computes expected fields straight from the
schedule — if Spark's JSON parser mangled an escape or accepted a
corrupt line, the values or the reject flags would diverge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

JSONL_SCHEMA = (
    "id bigint, text string, lang string, "
    "meta struct<bucket: bigint>"
)


def _json_line() -> str:
    """Codegen'd JSON-line synthesis: to_json on a struct gives the
    canonical escaping; the every-5th \\u-escape variant rebuilds
    the text field through a unicode escape of every char (astral
    codepoints become surrogate pairs, so the line stays valid
    JSON and decodes identically); the every-11th corrupt
    variant drops the trailing brace."""
    canonical = (
        "to_json(named_struct("
        "'id', doc_id, 'text', text, 'lang', 'en', "
        "'meta', named_struct('bucket', doc_id % 7)))"
    )
    # \uXXXX-escape the text payload per char, concatenated —
    # transform()+array_join() keeps it codegen'd. Codepoints above
    # the BMP must round-trip as UTF-16 surrogate PAIRS (a 5-hex
    # escape like backslash-u1F600 is not legal JSON).
    cp = "ascii(substring(text, i, 1))"
    escaped_text = (
        "array_join(transform(sequence(1, length(text)), i -> "
        f"CASE WHEN {cp} > 65535 THEN concat("
        f"printf('\\\\u%04x', 55296 + ({cp} - 65536) div 1024), "
        f"printf('\\\\u%04x', 56320 + ({cp} - 65536) % 1024)) "
        f"ELSE printf('\\\\u%04x', {cp}) END), '')"
    )
    escaped = (
        "concat('{\"id\": ', cast(doc_id as string), "
        "', \"text\": \"', " + escaped_text + ", "
        "'\", \"lang\": \"en\", \"meta\": {\"bucket\": ', "
        "cast(doc_id % 7 as string), '}}')"
    )
    return (
        f"CASE WHEN doc_id % 11 = 10 THEN "
        f"substring({canonical}, 1, length({canonical}) - 1) "
        f"WHEN doc_id % 5 = 4 THEN {escaped} "
        f"ELSE {canonical} END"
    )


def jsonl_parse_report(docs: DataFrame) -> DataFrame:
    """(doc_id, ok, text_match, lang, bucket) — synthesize the
    JSONL line, parse it back natively, compare the text field to
    the source column. Plan shape: one codegen'd projection, no
    exchange, no Python."""
    line = docs.select(
        "doc_id", "text", F.expr(_json_line()).alias("line")
    )
    parsed = line.select(
        "doc_id",
        "text",
        F.from_json("line", JSONL_SCHEMA).alias("j"),
    )
    # PERMISSIVE mode materializes a struct of NULLs for a corrupt
    # line (not a null struct) — field-level nullness is the reject
    # signal
    return parsed.select(
        "doc_id",
        F.col("j.id").isNotNull().alias("ok"),
        F.coalesce(
            F.col("j.text") == F.col("text"), F.lit(False)
        ).alias("text_match"),
        F.coalesce("j.lang", F.lit("")).alias("lang"),
        F.coalesce("j.meta.bucket", F.lit(-1)).alias("bucket"),
    )


def duck_jsonl_sql(source: str = "documents") -> str:
    """Closed-form twin of the schedule (corrupt docs reject; every
    parseable doc roundtrips its text and carries its bucket)."""
    return f"""
SELECT doc_id,
       doc_id % 11 <> 10                     AS ok,
       doc_id % 11 <> 10                     AS text_match,
       CASE WHEN doc_id % 11 = 10 THEN ''
            ELSE 'en' END                    AS lang,
       CASE WHEN doc_id % 11 = 10 THEN -1
            ELSE doc_id % 7 END              AS bucket
FROM {source}
"""
