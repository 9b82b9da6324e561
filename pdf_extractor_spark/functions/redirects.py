"""HTTP redirect-chain resolution by pointer jumping.

A crawl's URL space is riddled with redirects — site moves, scheme
upgrades, canonical-URL hops, and redirect LOOPS.  Before dedup or
frontier admission, every captured URL must resolve to its final
target by following the redirect edges harvested from the crawl
itself, with a hop cap so loops terminate loudly (browsers cap around
20; we use :data:`HOP_CAP`).

A redirect map is a FUNCTIONAL graph (each node has at most one
outgoing edge), so resolution is iterated function application — the
textbook pointer-jumping case.  Following chains step-by-step is
O(chain length) sequential rounds; DOUBLING the known suffix each
round reaches the hop cap in ``log2(HOP_CAP)`` self-joins.  After
round r every node knows the endpoint of following exactly
``min(2^r, steps-to-terminal)`` edges AND the exact step count, so
the output (final node, hops walked) is identical to a sequential
walk capped at ``HOP_CAP`` — which is what the DuckDB oracle runs as
a recursive CTE.  Same doubling technique as the connected-components
resolver (``dedup.py``), but on a DIRECTED functional graph with hop
accounting rather than an undirected min-label fixpoint.

Fixture edge rule (closed-form, both engines): a doc redirects iff
``doc_id % 3 == 1``; its target is

- ``doc_id + 6``  when ``doc_id % 75 == 16``  (2-cycle forward leg)
- ``doc_id - 6``  when ``doc_id % 75 == 22``  (2-cycle back leg)
- ``doc_id + 1``  when ``(doc_id // 3) % 4 == 0``  (exit to terminal)
- ``doc_id - 3``  otherwise  (chain continues downward)

The residue-16/22 (mod 75) pairs form genuine 2-cycles, and ordinary
chains FEED INTO them (94 → 91 ⇄ 97), so the cap triggers
on real loop topology, not a planted self-loop.  Ordinary chains exit
within ≤ 5 hops.  A node is terminal when it has NO edge row — not
redirecting, or outside the snapshot (redirects that point off-corpus
resolve as terminal, which is what a crawler observes).

Scale shape (100 TB contract): every frame is (bigint, bigint, int) —
no text ever moves.  Each doubling round is one equi-join on node
ids; the round count is fixed at ``log2(HOP_CAP)`` (4 rounds for a
cap of 16), independent of data size.  Each round's result is
localCheckpoint'd: iterated self-joins double the lineage per round,
and Catalyst would otherwise replan the whole cascade for every
downstream consumer (same justification as the connected-components
rounds in dedup.py).

No reference counterpart (single-document extractor) — this is crawl
infrastructure from the task brief's web-scale discovery axis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

HOP_CAP = 8          # = 2 ** ROUNDS; loops report hops == HOP_CAP
ROUNDS = 3

_NEXT_T = (
    "CASE WHEN pmod({s}, 75) = 16 THEN {s} + 6 "
    "WHEN pmod({s}, 75) = 22 THEN {s} - 6 "
    "WHEN pmod({s} div 3, 4) = 0 THEN {s} + 1 "
    "ELSE {s} - 3 END"
)

_DUCK_NEXT_T = (
    "CASE WHEN {s} % 75 = 16 THEN {s} + 6 "
    "WHEN {s} % 75 = 22 THEN {s} - 6 "
    "WHEN ({s} // 3) % 4 = 0 THEN {s} + 1 "
    "ELSE {s} - 3 END"
)


def next_hop(s: int) -> int:
    """Python twin of the edge rule (tests / fixtures)."""
    if s % 75 == 16:
        return s + 6
    if s % 75 == 22:
        return s - 6
    if (s // 3) % 4 == 0:
        return s + 1
    return s - 3


def redirect_edges(docs: DataFrame) -> DataFrame:
    """(node, nxt) — one outgoing edge per in-snapshot redirector."""
    return (
        docs.where("pmod(doc_id, 3) = 1")
        .select(
            F.col("doc_id").alias("node"),
            F.expr(_NEXT_T.format(s="doc_id")).alias("nxt"),
        )
    )


def resolve_redirects(docs: DataFrame) -> DataFrame:
    """(doc_id, final_id, hops, status) for every document against
    the fixture edge rule — see :func:`resolve_from_edges` for the
    algorithm (which works over ANY functional edge frame and is
    property-tested on random graphs)."""
    return resolve_from_edges(docs.select("doc_id"),
                              redirect_edges(docs))


def resolve_from_edges(ids: DataFrame, edges: DataFrame) -> DataFrame:
    """(doc_id, final_id, hops, status) for every row of ``ids``
    (column ``doc_id``) against a functional edge frame ``(node,
    nxt)`` — at most one outgoing edge per node.

    ``final_id``/``hops`` are the endpoint and exact step count of a
    sequential walk capped at :data:`HOP_CAP`; ``status`` is ``'ok'``
    when the endpoint is terminal and ``'unresolved'`` when the cap
    fired mid-loop (the endpoint still has an edge)."""
    # succ(node) after round r = endpoint + distance of following
    # min(2^r, to-terminal) edges
    succ = edges.select("node", "nxt", F.lit(1).alias("dist"))
    for _ in range(ROUNDS):
        hop = succ.select(
            F.col("node").alias("j_node"),
            F.col("nxt").alias("j_nxt"),
            F.col("dist").alias("j_dist"),
        )
        succ = (
            succ.join(hop, succ.nxt == hop.j_node, "left")
            .select(
                "node",
                F.coalesce("j_nxt", "nxt").alias("nxt"),
                (F.col("dist")
                 + F.coalesce("j_dist", F.lit(0))).alias("dist"),
            )
            # lineage doubles per round and every later round replans
            # the whole cascade otherwise — same truncation the
            # connected-components rounds use (dedup.py)
            .localCheckpoint(eager=False)
        )

    resolved = (
        ids
        .join(succ, F.col("doc_id") == succ.node, "left")
        .select(
            "doc_id",
            F.coalesce("nxt", "doc_id").alias("final_id"),
            F.coalesce("dist", F.lit(0)).cast("int").alias("hops"),
        )
    )
    term = edges.select(F.col("node").alias("t_node"))
    return (
        resolved.join(term, resolved.final_id == term.t_node, "left")
        .select(
            "doc_id", "final_id", "hops",
            F.when(F.col("t_node").isNull(), F.lit("ok"))
            .otherwise(F.lit("unresolved")).alias("status"),
        )
    )


def duck_redirects_sql(source: str = "documents") -> str:
    """Recursive-CTE twin: a literal sequential walk capped at
    HOP_CAP steps — equality proves the doubling join composes paths
    exactly (endpoint AND hop count)."""
    nxt = _DUCK_NEXT_T.format(s="doc_id")
    return f"""
WITH RECURSIVE
edges AS (
  SELECT doc_id AS node, {nxt} AS nxt
  FROM {source} WHERE doc_id % 3 = 1
),
walk(src, cur, hops) AS (
  SELECT doc_id, doc_id, 0 FROM {source}
  UNION ALL
  SELECT w.src, e.nxt, w.hops + 1
  FROM walk w JOIN edges e ON w.cur = e.node
  WHERE w.hops < {HOP_CAP}
),
stopped AS (
  SELECT src AS doc_id, arg_max(cur, hops) AS final_id,
         CAST(max(hops) AS INT) AS hops
  FROM walk GROUP BY src
)
SELECT s.doc_id, s.final_id, s.hops,
       CASE WHEN e.node IS NULL THEN 'ok'
            ELSE 'unresolved' END AS status
FROM stopped s LEFT JOIN edges e ON s.final_id = e.node
"""
