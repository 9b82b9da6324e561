"""Distributed sketch operators: HyperLogLog distinct counting and
Count-Min heavy-hitter estimation.

At 100 TB these are the primitives that replace exact answers whose
state is proportional to the data: an exact per-group COUNT(DISTINCT)
shuffles every distinct value; an exact global top-K over tokens
shuffles every distinct token with its count. Both sketches bound the
shuffled state by a CONSTANT (m registers / d×w counters) regardless
of corpus size, and both are pure hash-aggregate shapes with map-side
combine — the partial registers/counters collapse inside each task
before the exchange.

Everything here is DETERMINISTIC and engine-portable: the hash is
md5 over the stringified key (the same family `sampling.hash_bucket`
uses), register math is integer-exact until one final IEEE-double
step, so Spark and DuckDB produce bit-identical sketches and the
DuckDB oracle verifies the whole pipeline, not a tolerance band.

HyperLogLog (Flajolet et al. 2007, the standard formulation):
  - p = 8 → m = 256 registers (σ ≈ 1.04/√m ≈ 6.5 %).
  - bucket  = first 8 bits of md5 (hex chars 1-2).
  - w       = next 48 bits (hex chars 3-14); ρ = 49 − bitlength(w),
    i.e. leading zeros in the 48-bit window plus one (ρ = 49 for
    w = 0). bitlength is taken as length(bin(w)) — identical
    builtin in Spark SQL and DuckDB — so no float log anywhere.
  - register M_j = max ρ over keys in bucket j.
  - Σ 2^−M_j is computed as the INTEGER Σ 2^(50−M_j) (≤ 2^58,
    exact in int64; the 2^50 scale divides out in the estimate), so
    the only floating-point is the final α·m²·2^50/S division and
    the small-range linear-counting branch m·ln(m/V).

Count-Min (Cormode & Muthukrishnan 2005):
  - d = 4 rows × w = 1024 buckets; row-i bucket = md5(i‖token).
  - estimate(token) = min_i counter[i][h_i(token)] — never an
    underestimate; collisions only inflate. The demo query reports
    the exact top-K next to their CMS estimates so the overestimate
    contract is visible in the output.

Scale shape (both): explode tokens (narrow) → partial hash aggregate
(map-side combine inside the scan task) → exchange of AT MOST
m·|groups| / d·w rows → final aggregate. Document text never
shuffles; the exchange carries fixed-size sketch state only. Merging
two HLL sketches is max() per register and two CMS tables add —
which is why these, unlike exact distinct, compose across days of a
rolling crawl without reprocessing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HLL_P = 8
HLL_M = 1 << HLL_P          # 256 registers
# α_256 = 0.7213 / (1 + 1.079/256) — the bias constant for m ≥ 128,
# frozen as a literal so both engines multiply the same double
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / 256.0)
HLL_POW2_50 = float(1 << 50)

CMS_D = 4
CMS_W = 1024
CMS_TOPK = 10


# --------------------------------------------------------------- HLL

def _spark_hex2long(hexpr: str) -> str:
    return f"cast(conv({hexpr}, 16, 10) as bigint)"


def _duck_hex2long(hexpr: str) -> str:
    return f"CAST('0x' || {hexpr} AS BIGINT)"


def hll_distinct_report(docs: DataFrame) -> DataFrame:
    """Per-language distinct-token cardinality: exact vs HLL.

    Output: (lang, n_exact, hll_estimate, err_bp) — err_bp is the
    absolute relative error in basis points, the number a pipeline
    monitors to decide whether m needs to grow. The exact leg exists
    to make the estimate auditable at test scale; at 100 TB only the
    sketch leg runs (the exact leg IS the cost being avoided).
    """
    toks = docs.select(
        "lang", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    h = "md5(tok)"
    bucket = _spark_hex2long(f"substring({h}, 1, 2)")
    w = _spark_hex2long(f"substring({h}, 3, 12)")
    rho = f"case when {w} = 0 then 49 else 49 - length(bin({w})) end"
    regs = (
        toks.select(
            "lang",
            F.expr(bucket).alias("bucket"),
            F.expr(rho).alias("rho"),
        )
        .groupBy("lang", "bucket")
        .agg(F.max("rho").alias("m_j"))
    )
    per_lang = regs.groupBy("lang").agg(
        F.sum(F.expr("shiftleft(1L, 50 - m_j)")).alias("s_present"),
        F.count("*").alias("n_present"),
    )
    est = per_lang.select(
        "lang",
        # empty registers contribute 2^50 each (M_j = 0)
        F.expr(
            f"s_present + ({HLL_M} - n_present) * {1 << 50}L"
        ).alias("s_total"),
        (F.lit(HLL_M) - F.col("n_present")).alias("n_zero"),
    ).select(
        "lang",
        F.expr(
            f"cast({HLL_ALPHA!r} as double) * {HLL_M} * {HLL_M} "
            f"* {HLL_POW2_50!r} / cast(s_total as double)"
        ).alias("e_raw"),
        "n_zero",
    ).select(
        "lang",
        F.when(
            (F.col("e_raw") <= 2.5 * HLL_M) & (F.col("n_zero") > 0),
            F.expr(f"{HLL_M} * ln({HLL_M} / cast(n_zero as double))"),
        )
        .otherwise(F.col("e_raw"))
        .alias("hll_estimate"),
    )
    exact = toks.groupBy("lang").agg(
        F.countDistinct("tok").alias("n_exact")
    )
    return (
        exact.join(est, "lang")
        .select(
            "lang",
            "n_exact",
            F.round("hll_estimate", 2).alias("hll_estimate"),
            # err from the ROUNDED estimate — the published number —
            # so both engines derive it from identical inputs
            F.round(
                F.abs(F.round("hll_estimate", 2) - F.col("n_exact"))
                / F.col("n_exact")
                * 10000.0,
                1,
            ).alias("err_bp"),
        )
        .orderBy("lang")
    )


def duck_hll_distinct_sql(source: str = "documents") -> str:
    h = "md5(tok)"
    bucket = _duck_hex2long(f"substr({h}, 1, 2)")
    w = _duck_hex2long(f"substr({h}, 3, 12)")
    rho = f"CASE WHEN {w} = 0 THEN 49 ELSE 49 - length(bin({w})) END"
    return f"""
WITH toks AS (
  SELECT lang, unnest(string_split(text, ' ')) AS tok FROM {source}
), nz AS (
  SELECT lang, tok FROM toks WHERE tok <> ''
), regs AS (
  SELECT lang, {bucket} AS bucket, max({rho}) AS m_j
  FROM nz GROUP BY lang, {bucket}
), per_lang AS (
  SELECT lang,
         sum((CAST(1 AS BIGINT) << (50 - m_j))) AS s_present,
         count(*) AS n_present
  FROM regs GROUP BY lang
), est AS (
  SELECT lang,
         CAST({HLL_ALPHA!r} AS DOUBLE) * {HLL_M} * {HLL_M}
           * {HLL_POW2_50!r}
           / CAST(s_present + ({HLL_M} - n_present)
                  * (CAST(1 AS BIGINT) << 50) AS DOUBLE) AS e_raw,
         {HLL_M} - n_present AS n_zero
  FROM per_lang
), fin AS (
  SELECT lang,
         CASE WHEN e_raw <= {2.5 * HLL_M} AND n_zero > 0
              THEN {HLL_M} * ln({HLL_M} / CAST(n_zero AS DOUBLE))
              ELSE e_raw END AS hll_estimate
  FROM est
), exact AS (
  SELECT lang, count(DISTINCT tok) AS n_exact FROM nz GROUP BY lang
)
SELECT x.lang,
       CAST(x.n_exact AS BIGINT) AS n_exact,
       round(f.hll_estimate, 2) AS hll_estimate,
       round(abs(round(f.hll_estimate, 2) - x.n_exact)
             / x.n_exact * 10000.0, 1) AS err_bp
FROM exact x JOIN fin f ON x.lang = f.lang
ORDER BY x.lang
"""


# --------------------------------------------------------- Count-Min

def cms_heavy_hitters(docs: DataFrame, k: int = CMS_TOPK) -> DataFrame:
    """Exact top-``k`` corpus tokens with their Count-Min estimates.

    Output: (tok, n_exact, cms_estimate) — cms_estimate ≥ n_exact
    always (the CMS overestimate guarantee; equality when none of the
    token's d buckets collides with another token). The exact leg is
    the audit; the sketch leg's state is d·w counters independent of
    corpus size, which is what a 10^12-row job ships to the driver.
    """
    toks = docs.select(
        F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    toks = toks.localCheckpoint(eager=False)  # feeds sketch + exact legs
    # all d bucket coordinates in ONE pass over the tokens (a
    # unionAll of d selects would re-read the token frame d times)
    def _buckets(i: int) -> str:
        b = _spark_hex2long(
            f"substring(md5(concat('{i}|', tok)), 1, 12)"
        )
        return f"struct({i} as row, ({b}) % {CMS_W} as bucket)"

    coords = ", ".join(_buckets(i) for i in range(CMS_D))
    rows = toks.select(
        F.explode(F.expr(f"array({coords})")).alias("rb")
    ).select("rb.row", "rb.bucket")
    table = rows.groupBy("row", "bucket").agg(F.count("*").alias("c"))
    top = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("n_exact"))
        .orderBy(F.desc("n_exact"), "tok")
        .limit(k)
    )
    probes = None
    for i in range(CMS_D):
        b = _spark_hex2long(
            f"substring(md5(concat('{i}|', tok)), 1, 12)"
        )
        p = top.select(
            "tok",
            "n_exact",
            F.lit(i).alias("row"),
            (F.expr(b) % CMS_W).alias("bucket"),
        )
        probes = p if probes is None else probes.unionAll(p)
    return (
        probes.join(table, ["row", "bucket"])
        .groupBy("tok", "n_exact")
        .agg(F.min("c").alias("cms_estimate"))
        .orderBy(F.desc("n_exact"), "tok")
    )


def duck_cms_heavy_hitters_sql(
    source: str = "documents", k: int = CMS_TOPK
) -> str:
    def bucket(i: int) -> str:
        h = _duck_hex2long(f"substr(md5('{i}|' || tok), 1, 12)")
        return f"({h} % {CMS_W})"

    rows = " UNION ALL ".join(
        f"SELECT {i} AS row, {bucket(i)} AS bucket FROM nz"
        for i in range(CMS_D)
    )
    probes = " UNION ALL ".join(
        f"SELECT tok, n_exact, {i} AS row, {bucket(i)} AS bucket FROM top"
        for i in range(CMS_D)
    )
    return f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM {source}
), nz AS (
  SELECT tok FROM toks WHERE tok <> ''
), rows_ AS (
  {rows}
), tbl AS (
  SELECT row, bucket, count(*) AS c FROM rows_ GROUP BY row, bucket
), top AS (
  SELECT tok, count(*) AS n_exact FROM nz GROUP BY tok
  ORDER BY n_exact DESC, tok LIMIT {k}
), probes AS (
  {probes}
)
SELECT p.tok,
       CAST(p.n_exact AS BIGINT) AS n_exact,
       CAST(min(t.c) AS BIGINT) AS cms_estimate
FROM probes p JOIN tbl t ON p.row = t.row AND p.bucket = t.bucket
GROUP BY p.tok, p.n_exact
ORDER BY p.n_exact DESC, p.tok
"""


# -------------------------------------------- ANALYZE column stats
#
# The ANALYZE TABLE primitive: per-column min / max / null count /
# distinct estimate in ONE scan. These are the statistics a
# cost-based optimizer prices joins with and a layout manager sizes
# shards by; at 10^12 rows the only affordable NDV is a sketch, so
# the distinct column reuses the HLL register machinery (same md5
# hash family, engine-bit-identical). The one-scan shape matters as
# much as the sketch: K columns are unpivoted into (column, value)
# rows by ONE narrow stack() — a per-column loop would scan the
# table K times.

ANALYZE_COLUMNS = ("doc_id", "lang", "source")


def analyze_column_stats(
    docs: DataFrame, columns: tuple[str, ...] = ANALYZE_COLUMNS
) -> DataFrame:
    """(column, n_rows, n_null, min_val, max_val, ndv_exact,
    ndv_hll) per analyzed column — values carried as strings (the
    cross-type ANALYZE convention), the HLL estimate next to the
    exact NDV so the sketch is auditable at test scale."""
    k = len(columns)
    stacked = docs.select(
        F.expr(
            "stack({}, {}) as (col, val)".format(
                k,
                ", ".join(
                    f"'{c}', cast({c} as string)" for c in columns
                ),
            )
        )
    )
    h = "md5(val)"
    bucket = _spark_hex2long(f"substring({h}, 1, 2)")
    w = _spark_hex2long(f"substring({h}, 3, 12)")
    rho = f"case when {w} = 0 then 49 else 49 - length(bin({w})) end"
    regs = (
        stacked.where(F.col("val").isNotNull())
        .select(
            "col",
            "val",
            F.expr(bucket).alias("bucket"),
            F.expr(rho).alias("rho"),
        )
        .groupBy("col", "bucket")
        .agg(F.max("rho").alias("m_j"))
    )
    hll = (
        regs.groupBy("col")
        .agg(
            F.sum(F.expr("shiftleft(1L, 50 - m_j)")).alias("s_present"),
            F.count("*").alias("n_present"),
        )
        .select(
            "col",
            F.expr(
                f"s_present + ({HLL_M} - n_present) * {1 << 50}L"
            ).alias("s_total"),
            (F.lit(HLL_M) - F.col("n_present")).alias("n_zero"),
        )
        .select(
            "col",
            F.expr(
                f"cast({HLL_ALPHA!r} as double) * {HLL_M} * {HLL_M} "
                f"* {HLL_POW2_50!r} / cast(s_total as double)"
            ).alias("e_raw"),
            "n_zero",
        )
        .select(
            "col",
            F.round(
                F.when(
                    (F.col("e_raw") <= 2.5 * HLL_M)
                    & (F.col("n_zero") > 0),
                    F.expr(
                        f"{HLL_M} * ln({HLL_M} / "
                        "cast(n_zero as double))"
                    ),
                )
                .otherwise(F.col("e_raw")),
                2,
            ).alias("ndv_hll"),
        )
    )
    base = stacked.groupBy("col").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("val").isNull().cast("long")).alias("n_null"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
        F.countDistinct("val").alias("ndv_exact"),
    )
    return (
        base.join(hll, "col")
        .select(
            F.col("col").alias("column"),
            "n_rows",
            "n_null",
            "min_val",
            "max_val",
            "ndv_exact",
            "ndv_hll",
        )
        .orderBy("column")
    )


def duck_analyze_sql(
    source: str = "documents",
    columns: tuple[str, ...] = ANALYZE_COLUMNS,
) -> str:
    stack = " UNION ALL ".join(
        f"SELECT '{c}' AS col, CAST({c} AS VARCHAR) AS val "
        f"FROM {source}"
        for c in columns
    )
    h = "md5(val)"
    bucket = _duck_hex2long(f"substr({h}, 1, 2)")
    w = _duck_hex2long(f"substr({h}, 3, 12)")
    rho = f"CASE WHEN {w} = 0 THEN 49 ELSE 49 - length(bin({w})) END"
    return f"""
WITH stacked AS (
  {stack}
), regs AS (
  SELECT col, {bucket} AS bucket, max({rho}) AS m_j
  FROM stacked WHERE val IS NOT NULL GROUP BY col, {bucket}
), per_col AS (
  SELECT col,
         sum((CAST(1 AS BIGINT) << (50 - m_j))) AS s_present,
         count(*) AS n_present
  FROM regs GROUP BY col
), est AS (
  SELECT col,
         CAST({HLL_ALPHA!r} AS DOUBLE) * {HLL_M} * {HLL_M}
           * {HLL_POW2_50!r}
           / CAST(s_present + ({HLL_M} - n_present)
                  * (CAST(1 AS BIGINT) << 50) AS DOUBLE) AS e_raw,
         {HLL_M} - n_present AS n_zero
  FROM per_col
), hll AS (
  SELECT col,
         round(CASE WHEN e_raw <= {2.5 * HLL_M} AND n_zero > 0
                    THEN {HLL_M} * ln({HLL_M}
                         / CAST(n_zero AS DOUBLE))
                    ELSE e_raw END, 2) AS ndv_hll
  FROM est
), base AS (
  SELECT col,
         count(*) AS n_rows,
         sum(CASE WHEN val IS NULL THEN 1 ELSE 0 END) AS n_null,
         min(val) AS min_val,
         max(val) AS max_val,
         count(DISTINCT val) AS ndv_exact
  FROM stacked GROUP BY col
)
SELECT b.col AS "column",
       CAST(b.n_rows AS BIGINT)    AS n_rows,
       CAST(b.n_null AS BIGINT)    AS n_null,
       b.min_val,
       b.max_val,
       CAST(b.ndv_exact AS BIGINT) AS ndv_exact,
       h.ndv_hll
FROM base b JOIN hll h ON b.col = h.col
ORDER BY "column"
"""
