"""Host-level link-graph PageRank — the crawl-curation quality prior.

Web-corpus pipelines (Common-Crawl curation in particular) rank HOSTS
by the link graph and use the rank as a document-quality prior: a page
on a well-linked host survives sampling, a page on a link-farm island
does not. This module derives a deterministic host→host outlink graph
from the fixture ``documents`` table (a real pipeline extracts
outlinks during the HTML parse — the extraction branch already walks
every anchor; here the graph is synthesized from ``doc_id`` the same
way :mod:`.blocklist` synthesizes urls) and runs a fixed number of
PageRank iterations over it.

Scale shape (the part that matters at 100 TB):

- The corpus is touched ONCE, by a narrow map reading exactly one
  column (``doc_id`` here; ``url`` + outlinks in production). The
  doc→edge aggregation is a count — partially aggregable, so the one
  corpus-wide shuffle carries fixed-width ``(src, dst)`` int pairs
  after map-side combine, never text.
- Everything after that runs on the HOST graph, which is orders of
  magnitude smaller than the corpus (~10^8 hosts vs 10^12 pages).
  Each iteration is one equi join (ranks × edges on ``src``) + one
  partial-aggregable sum — the classic iterative-DataFrame shape.
- Iterative plans grow lineage linearly; without truncation Catalyst
  re-derives the whole prefix per iteration and the final plan tree
  is O(iters²). The edge frame and each iteration's rank frame take a
  lazy ``localCheckpoint`` — the frames are host-graph sized, tiny
  next to the corpus.
- Dangling mass (hosts with inlinks but no outlinks) is redistributed
  uniformly — the standard closed form; the dangling sum is a 1-row
  aggregate broadcast into the update, never a driver action.

Numerics: ranks are **fixed-point bigints** (total mass = 10^12), all
updates integer multiply/``div`` — bit-identical across engines and
independent of partial-aggregation order, which float summation is
not. The DuckDB twin unrolls the same iterations as CTEs.

No reference counterpart (the reference is a single-document
extractor) — this is a training-pipeline operator from the task
brief's beyond-the-reference list.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: number of hosts in the synthetic graph (prime, so modular link
#: targets spread uniformly)
N_HOSTS = 101
#: per-doc outlink multipliers (distinct odd primes — three links per
#: document with unrelated target sequences)
_LINK_PRIMES = (131, 197, 277)
#: total PageRank mass in fixed-point units
TOTAL_FP = 1_000_000_000_000
#: damping factor 0.85 expressed as the integer pair (85, 100)
_DAMP_NUM, _DAMP_DEN = 85, 100

PAGERANK_ITERS = 3


def synth_host(doc_id: Column) -> Column:
    """The host a document lives on: ``doc_id % N_HOSTS``."""
    return (doc_id % N_HOSTS).cast("int")


def _dst_expr(j: int) -> str:
    """Integer expression for the j-th outlink target of ``doc_id``.
    ``(src + 1 + ((doc_id*p + j) % (H-1))) % H`` is never equal to
    ``src`` (the offset is in [1, H-1]) — no self-edges by
    construction."""
    p = _LINK_PRIMES[j]
    h = N_HOSTS
    return (
        f"cast(((doc_id % {h}) + 1 + ((doc_id * {p} + {j}) % {h - 1}))"
        f" % {h} as int)"
    )


def synth_outlink_edges(docs: DataFrame) -> DataFrame:
    """(src, dst, w) weighted host→host edge list from the documents
    table. One narrow map (doc_id only — column pruning keeps text
    out of the scan) + one partially-aggregated count shuffle of int
    pairs."""
    links = docs.select(
        synth_host(F.col("doc_id")).alias("src"),
        F.explode(
            F.array(*[F.expr(_dst_expr(j)) for j in range(3)])
        ).alias("dst"),
    )
    return links.groupBy("src", "dst").agg(
        F.count("*").cast("bigint").alias("w")
    )


def host_pagerank(
    docs: DataFrame, iters: int = PAGERANK_ITERS, *,
    checkpoint: bool = True,
) -> DataFrame:
    """Fixed-point PageRank over the synthetic host graph:
    (host, rank_fp) after ``iters`` damped iterations, rank mass
    summing to ≤ TOTAL_FP (integer floor losses only). ``iters`` is
    small and unrolled here; a production run uses the same loop body
    with a convergence check on the rank delta (one extra 1-row
    aggregate per iteration).

    ``checkpoint=False`` disables lineage truncation so plan tests
    can inspect the full tree; production always truncates."""
    def _cp(df: DataFrame) -> DataFrame:
        return df.localCheckpoint(eager=False) if checkpoint else df

    # checkpoint the EDGE frame itself, before anything derives from
    # it: outw / e / nodes / the per-iteration dangling probe all
    # consume edges, and Catalyst has no common-subplan reuse — every
    # un-truncated consumer would re-run the corpus scan. This is the
    # one boundary that makes "corpus touched ONCE" true.
    edges = _cp(synth_outlink_edges(docs))
    outw = edges.groupBy("src").agg(F.sum("w").alias("wout"))
    # e and nodes are re-probed every iteration; truncating them too
    # avoids re-running the (host-graph-sized) join/distinct per round
    e = _cp(edges.join(outw, "src"))
    nodes = _cp(
        edges.select(F.col("src").alias("host"))
        .union(edges.select(F.col("dst").alias("host")))
        .distinct()
    )
    nn = nodes.agg(F.count("*").cast("bigint").alias("n"))

    rank = (
        nodes.crossJoin(F.broadcast(nn))
        .select("host", F.expr(f"{TOTAL_FP} div n").alias("rank"))
    )
    for _ in range(iters):
        inc = (
            e.join(rank, e["src"] == rank["host"])
            .groupBy("dst")
            .agg(
                F.sum(
                    F.expr(
                        f"(rank * {_DAMP_NUM} * w)"
                        f" div (wout * {_DAMP_DEN})"
                    )
                ).alias("inc")
            )
        )
        # dangling hosts: inlinks but no outlinks — their mass is
        # redistributed uniformly (1-row aggregate, broadcast)
        dang = (
            rank.join(outw, rank["host"] == outw["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0)).alias("dang"))
        )
        rank = (
            nodes.crossJoin(F.broadcast(nn))
            .crossJoin(F.broadcast(dang))
            .join(inc, F.col("host") == inc["dst"], "left")
            .select(
                "host",
                F.expr(
                    f"cast(({TOTAL_FP} * {_DAMP_DEN - _DAMP_NUM})"
                    f" div ({_DAMP_DEN} * n)"
                    f" + coalesce(inc, 0)"
                    f" + (dang * {_DAMP_NUM}) div ({_DAMP_DEN} * n)"
                    " as bigint)"
                ).alias("rank"),
            )
        )
        # truncate the per-iteration lineage growth (see module
        # docstring) — host-graph sized, tiny
        rank = _cp(rank)
    return rank.select(
        "host", F.col("rank").alias("rank_fp")
    ).orderBy("host")


def duck_pagerank_sql(iters: int = PAGERANK_ITERS) -> str:
    """DuckDB twin: identical integer fixed-point updates, iterations
    unrolled as CTEs. States the semantics directly — the Spark side's
    iterative-join shape must reproduce it bit-for-bit."""
    h = N_HOSTS
    link_sel = "\n  UNION ALL ".join(
        f"SELECT doc_id % {h} AS src, "
        f"((doc_id % {h}) + 1 + ((doc_id * {_LINK_PRIMES[j]} + {j})"
        f" % {h - 1})) % {h} AS dst FROM documents"
        for j in range(3)
    )
    parts = [
        f"""WITH links AS (
  {link_sel}
), edges AS (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS w
  FROM links GROUP BY src, dst
), outw AS (
  SELECT src, SUM(w) AS wout FROM edges GROUP BY src
), nodes AS (
  SELECT src AS host FROM edges UNION SELECT dst FROM edges
), nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM nodes
), r0 AS (
  SELECT host, {TOTAL_FP} // n AS rank FROM nodes CROSS JOIN nn
)"""
    ]
    for k in range(1, iters + 1):
        prev = f"r{k - 1}"
        parts.append(
            f""", i{k} AS (
  SELECT e.dst AS host,
         SUM((r.rank * {_DAMP_NUM} * e.w)
             // (o.wout * {_DAMP_DEN})) AS inc
  FROM edges e
  JOIN outw o ON e.src = o.src
  JOIN {prev} r ON r.host = e.src
  GROUP BY e.dst
), d{k} AS (
  SELECT COALESCE(SUM(r.rank), 0) AS dang
  FROM {prev} r LEFT JOIN outw o ON r.host = o.src
  WHERE o.src IS NULL
), r{k} AS (
  SELECT n.host,
         CAST(({TOTAL_FP} * {_DAMP_DEN - _DAMP_NUM})
                // ({_DAMP_DEN} * nn.n)
              + COALESCE(i.inc, 0)
              + (d.dang * {_DAMP_NUM}) // ({_DAMP_DEN} * nn.n)
           AS BIGINT) AS rank
  FROM nodes n
  CROSS JOIN nn
  CROSS JOIN d{k} d
  LEFT JOIN i{k} i ON n.host = i.host
)"""
        )
    parts.append(
        f"""
SELECT host, rank AS rank_fp FROM r{iters} ORDER BY host"""
    )
    return "".join(parts)


# ------------------------------------------------- link-spam signals
#
# The complement of PageRank's quality prior: per-host SPAM signals
# from the same edge list. Two classics from the link-spam literature
# (nepotistic linking / link farms): (a) RECIPROCITY — farms trade
# links, so a high fraction of outlink weight whose reverse edge
# exists is suspicious; (b) TARGET CONCENTRATION — a host whose
# outlinks overwhelmingly point at one target is a feeder page, not
# an editorial site. Both are emitted as integer basis points, left
# unthresholded: they are PRIORS a sampling recipe combines, not a
# verdict (the spam literature's lesson — single signals misfire on
# legitimate hub sites).
#
# Scale shape: everything runs on the host-graph edge list (the one
# corpus-wide shuffle already paid by synth_outlink_edges); the
# reciprocity join is edges-to-edges on (dst, src) int pairs, and the
# concentration max is one more partial aggregate. Corpus text is
# never touched.


def link_spam_report(docs: DataFrame) -> DataFrame:
    """(host, out_w, out_deg, reciprocal_bp, top_frac_bp) per host
    with outlinks: total outlink weight, distinct targets, fraction
    of weight on reciprocated edges, and the heaviest target's share
    — all integer-exact basis points."""
    edges = synth_outlink_edges(docs).localCheckpoint(eager=False)
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    ).distinct()
    recip = (
        edges.join(rev, ["src", "dst"])
        .groupBy("src")
        .agg(F.sum("w").alias("recip_w"))
    )
    per_host = edges.groupBy("src").agg(
        F.sum("w").alias("out_w"),
        F.count("*").alias("out_deg"),
        F.max("w").alias("top_w"),
    )
    return (
        per_host.join(recip, "src", "left")
        .na.fill({"recip_w": 0})
        .select(
            F.col("src").alias("host"),
            "out_w",
            "out_deg",
            F.expr("recip_w * 10000 div out_w").alias("reciprocal_bp"),
            F.expr("top_w * 10000 div out_w").alias("top_frac_bp"),
        )
        .orderBy("host")
    )


def duck_link_spam_sql(source: str = "documents") -> str:
    h = N_HOSTS
    link_sel = "\n  UNION ALL ".join(
        f"SELECT doc_id % {h} AS src, "
        f"((doc_id % {h}) + 1 + ((doc_id * {_LINK_PRIMES[j]} + {j})"
        f" % {h - 1})) % {h} AS dst FROM {source}"
        for j in range(3)
    )
    return f"""
WITH links AS (
  {link_sel}
), edges AS (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS w
  FROM links GROUP BY src, dst
), rev AS (
  SELECT DISTINCT dst AS src, src AS dst FROM edges
), recip AS (
  SELECT e.src, SUM(e.w) AS recip_w
  FROM edges e JOIN rev r ON e.src = r.src AND e.dst = r.dst
  GROUP BY e.src
), per_host AS (
  SELECT src, SUM(w) AS out_w, count(*) AS out_deg, MAX(w) AS top_w
  FROM edges GROUP BY src
)
SELECT CAST(p.src AS INT)                       AS host,
       CAST(p.out_w AS BIGINT)                  AS out_w,
       CAST(p.out_deg AS BIGINT)                AS out_deg,
       CAST(COALESCE(r.recip_w, 0) * 10000 // p.out_w AS BIGINT)
                                                AS reciprocal_bp,
       CAST(p.top_w * 10000 // p.out_w AS BIGINT) AS top_frac_bp
FROM per_host p LEFT JOIN recip r ON p.src = r.src
ORDER BY host
"""
