"""Z-order (Morton) clustering keys for write layout.

At 100 TB the cheapest query is the one that never reads a file:
parquet row-group and file pruning works off min/max statistics, and
those statistics only help when the write layout CLUSTERS the
predicate columns. Sorting by one column (host) destroys locality in
the other (time) and vice versa; interleaving the bits of both —
the Z-order curve — gives every range shard a bounded span in BOTH
dimensions, so host-scoped and time-scoped scans each prune most
shards. This is the layout trick behind Delta/Iceberg ``ZORDER BY``;
here it is computed as a pure native-expression key usable with
``repartitionByRange(z_key)`` + sortWithinPartitions at write time.

Implementation: the classic magic-mask bit spread (public-domain
"Interleave bits by Binary Magic Numbers" from Stanford's Bit
Twiddling Hacks), 31 bits per dimension → a 62-bit non-negative
key, expressed with shifts/AND/OR only so it stays inside
whole-stage codegen and the DuckDB twin is the same arithmetic. The
host dimension is an md5-derived 31-bit hash (stable across engines
and runs); the sequence dimension is the document id (standing in
for warc_ts in the fixture schema — the real pages table interleaves
``hash(host)`` with ``unix_ts``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# spread masks for 31-bit → even-bit positions of a 62-bit word
_MASKS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)

Z_SHARDS = 16


def _spread_expr(col: str, shift_fmt: str) -> str:
    """Bit-spread ``col`` (31-bit int) so its bits occupy the even
    positions. ``shift_fmt`` renders a left shift: '{x} << {n}' for
    DuckDB, 'shiftleft({x}, {n})' for Spark SQL."""
    x = f"({col} & 2147483647)"
    for n, mask in _MASKS:
        shifted = shift_fmt.format(x=x, n=n)
        x = f"(({x} | {shifted}) & {mask})"
    return x


def _morton_expr(xcol: str, ycol: str, shift_fmt: str) -> str:
    sx = _spread_expr(xcol, shift_fmt)
    sy = _spread_expr(ycol, shift_fmt)
    return f"({sx} | {shift_fmt.format(x=sy, n=1)})"


SPARK_SHIFT = "shiftleft({x}, {n})"
DUCK_SHIFT = "({x} << {n})"


def _spark_host_hash() -> str:
    # 31-bit md5-derived host hash — same family as sampling.py
    return (
        "(cast(conv(substring(md5(host), 1, 15), 16, 10) as bigint) "
        "& 2147483647)"
    )


def _duck_host_hash() -> str:
    return (
        "(CAST('0x' || substr(md5(host), 1, 15) AS BIGINT) "
        "& 2147483647)"
    )


def zorder_shard_report(
    docs: DataFrame, shards: int = Z_SHARDS
) -> DataFrame:
    """Assign every document its Morton key over (host-hash,
    doc-sequence) and split the key space into ``shards`` equal
    Z-ranges. Report per shard: n_docs, n_hosts, the host-span and
    sequence-span the shard covers — the numbers that show BOTH
    dimensions stay bounded per shard (the pruning guarantee a
    single-column sort cannot give). Scale shape: the key is one
    narrow codegen map; the report is one hash aggregate."""
    from .sampling import host_of, synth_url

    with_host = docs.select(
        "doc_id", synth_url().alias("url")
    ).withColumn("host", host_of())
    # normalize the sequence dimension onto the full 31-bit range so
    # its top bits (the ones the shard split reads) actually vary:
    # scale = 2^31 div (max+1), a 1-row broadcast aggregate — the
    # real pages table uses unix_ts minus the crawl epoch instead
    top = with_host.agg(F.max("doc_id").alias("max_id"))
    scaled = with_host.crossJoin(F.broadcast(top)).withColumn(
        "seq", F.expr(f"doc_id * ({1 << 31} div (max_id + 1))")
    )
    z = _morton_expr(_spark_host_hash(), "(seq & 2147483647)",
                     SPARK_SHIFT)
    keyed = scaled.select(
        "doc_id",
        "host",
        F.expr(z).alias("z_key"),
    )
    # equal Z-ranges over the full 62-bit space
    shard = F.expr(f"cast(z_key div {(1 << 62) // shards} as int)")
    return (
        keyed.select("doc_id", "host", "z_key", shard.alias("shard"))
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("host").alias("n_hosts"),
            F.min("z_key").alias("min_z"),
            F.max("z_key").alias("max_z"),
            (F.max("doc_id") - F.min("doc_id")).alias("seq_span"),
        )
        .orderBy("shard")
    )


def duck_zorder_shard_sql(
    source: str = "documents", shards: int = Z_SHARDS
) -> str:
    from .sampling import DUCK_SYNTH_URL, HOST_REGEX

    z = _morton_expr(_duck_host_hash(), "(seq & 2147483647)",
                     DUCK_SHIFT)
    return f"""
WITH hosts AS (
  SELECT doc_id,
         regexp_extract({DUCK_SYNTH_URL}, '{HOST_REGEX}', 1) AS host
  FROM {source}
), top AS (
  SELECT max(doc_id) AS max_id FROM hosts
), scaled AS (
  SELECT doc_id, host,
         doc_id * ({1 << 31} // (max_id + 1)) AS seq
  FROM hosts CROSS JOIN top
), keyed AS (
  SELECT doc_id, host, {z} AS z_key FROM scaled
)
SELECT CAST(z_key // {(1 << 62) // shards} AS INT) AS shard,
       CAST(count(*) AS BIGINT)              AS n_docs,
       CAST(count(DISTINCT host) AS BIGINT)  AS n_hosts,
       CAST(min(z_key) AS BIGINT)            AS min_z,
       CAST(max(z_key) AS BIGINT)            AS max_z,
       CAST(max(doc_id) - min(doc_id) AS BIGINT) AS seq_span
FROM keyed
GROUP BY 1
ORDER BY 1
"""
