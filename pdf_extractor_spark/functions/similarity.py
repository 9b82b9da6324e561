"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the exact baseline: a broadcast of the
query vector + a native ``aggregate(zip_with(...))`` dot product —
whole-stage-codegen'd, no Python, no shuffle until the final top-k
(which is a tree-aggregated ``orderBy().limit()``).

Scale path: LSH bucketing by sign-random-projection (embedding sign
bits as bucket key) restricts candidates to matching buckets — same
two-stage recall/precision shape as MinHash dedup. The bucketed
variant lives in :func:`srp_bucketed_topk`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * "
    "cast(y as double)), 0D, (acc, v) -> acc + v)"
)


def _norm(col: str) -> str:
    return f"sqrt({_DOT.format(a=col, b=col)})"


def cosine_topk(
    embeddings: DataFrame, query_vec: list[float], k: int = 10,
    exclude_id: int | None = None,
) -> DataFrame:
    """Exact top-k by cosine similarity to ``query_vec``.

    The query vector becomes a literal array (broadcast by Catalyst as
    a constant); ordering ties break on vec_id for determinism.
    """
    qlit = "array({})".format(
        ", ".join(f"cast({float(v)!r} as double)" for v in query_vec)
    )
    df = embeddings.withColumn(
        "cosine",
        F.expr(
            f"{_DOT.format(a='embedding', b=qlit)} / "
            f"({_norm('embedding')} * {_norm(qlit)})"
        ),
    )
    if exclude_id is not None:
        df = df.where(F.col("vec_id") != exclude_id)
    return (
        df.select("vec_id", F.round("cosine", 3).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def srp_bucketed_topk(
    embeddings: DataFrame, query_vec: list[float], k: int = 10,
    n_bits: int = 4,
) -> DataFrame:
    """Approximate top-k: sign-random-projection bucket (first
    ``n_bits`` dimension signs as the bucket key — deterministic, no
    random state), search only the query's bucket. At 100 TB this
    prunes the scan to ~1/2^n_bits of rows before any distance math;
    the projection is a partition-pruning-friendly derived column that
    an Iceberg layout could cluster on."""
    bucket_expr = "concat_ws('', transform(slice(embedding, 1, {n}), " \
        "x -> case when x >= 0 then '1' else '0' end))".format(n=n_bits)
    qbucket = "".join("1" if v >= 0 else "0" for v in query_vec[:n_bits])
    pruned = embeddings.where(F.expr(bucket_expr) == F.lit(qbucket))
    return cosine_topk(pruned, query_vec, k)


def ivf_probe_topk(
    embeddings: DataFrame, query_vec: list[float], k: int = 10,
    n_cells: int = 8, n_probe: int = 2, exclude_id: int | None = None,
) -> DataFrame:
    """IVF-style ANN: assign every vector to its nearest cell of a
    small deterministic codebook (the first ``n_cells`` vectors by
    vec_id — a fixed-sample codebook instead of k-means keeps the
    operator deterministic and oracle-checkable), then search only the
    query's ``n_probe`` nearest cells.

    Scale shape: the codebook is collected once (tiny, standard IVF
    practice) and inlined as literal arrays, so cell assignment is a
    PURE MAP expression — array of cosines → argmax — with no join and
    no shuffle; the cell id is a derived column an Iceberg layout could
    cluster on. Only ~n_probe/n_cells of rows reach the distance math.
    """
    cents = sorted(
        (
            (r["vec_id"], [float(v) for v in r["embedding"]])
            for r in embeddings.where(F.col("vec_id") < n_cells)
            .select("vec_id", "embedding").collect()
        ),
    )

    def _lit(vec: list[float]) -> str:
        return "array({})".format(
            ", ".join(f"cast({float(v)!r} as double)" for v in vec)
        )

    cos_exprs = ", ".join(
        f"{_DOT.format(a='embedding', b=_lit(v))} / "
        f"({_norm('embedding')} * {_norm(_lit(v))})"
        for _cid, v in cents
    )

    def _cos(a: list[float], b: list[float]) -> float:
        num = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return num / (na * nb)

    # cell ids are POSITIONS into the sorted codebook (not the centroid
    # rows' vec_ids, which need not be 0-based or contiguous); the
    # probe list uses the same positional space.
    probe = [
        pos
        for pos, _cv in sorted(
            enumerate(cents),
            key=lambda pc: (-_cos(pc[1][1], query_vec), pc[0]),
        )[:n_probe]
    ]
    # argmax over the cosine array (array_position → first hit =
    # lowest-index tie-break). NOTE: the two-step withColumn form is
    # for readability only — Catalyst pushes the cell_id predicate
    # back through the projections and re-inlines the array into both
    # argmax operands (verified via explain); the actual dedup happens
    # at runtime in whole-stage codegen's subexpression elimination,
    # identically for inline and withColumn forms.
    pruned = (
        embeddings.withColumn("cell_cos", F.expr(f"array({cos_exprs})"))
        .withColumn(
            "cell_id",
            F.expr("array_position(cell_cos, array_max(cell_cos)) - 1"),
        )
        .where(F.col("cell_id").isin(probe))
        .select("vec_id", "embedding")
    )
    return cosine_topk(pruned, query_vec, k, exclude_id=exclude_id)


def embedding_near_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.3, n_bits: int = 4,
    k: int = 20,
) -> DataFrame:
    """Embedding-cosine near-duplicate candidates: SRP-bucketed
    self-join (pairs must share the first ``n_bits`` sign bits — the
    blocking key that keeps the join off the full n² cross product),
    then exact cosine ≥ ``threshold``, top-``k`` by similarity.

    At 100 TB the bucket column is the shuffle key: the self-join
    shuffles (bucket, vec_id, embedding) and each bucket joins locally;
    skewed buckets split under AQE since this is a plain equi-join."""
    bucket_expr = "concat_ws('', transform(slice(embedding, 1, {n}), " \
        "x -> case when x >= 0 then '1' else '0' end))".format(n=n_bits)
    b = embeddings.select(
        "vec_id", "embedding", F.expr(bucket_expr).alias("bucket")
    )
    a, c = b.alias("a"), b.alias("b")
    pair_cos = _DOT.format(a="a.embedding", b="b.embedding")
    norm_a = _norm("a.embedding")
    norm_b = _norm("b.embedding")
    return (
        a.join(
            c,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(
                F.expr(f"{pair_cos} / ({norm_a} * {norm_b})"), 3
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
        .orderBy(F.desc("cosine"), F.asc("vec_a"), F.asc("vec_b"))
        .limit(k)
    )
