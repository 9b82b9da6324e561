"""Multi-variant extraction consensus — SURVEY.md §2 J6/A9.

The reference's multi-engine mode (``multi_engine_extractor.py:163-235``)
runs three PDF libraries, scores agreement as the mean pairwise
``SequenceMatcher.ratio()`` over engine outputs (A9), picks the result
with the most content as the base (Python ``max`` — FIRST of equals
wins), and flags ``low_consensus`` when the mean similarity drops below
the 0.7 conflict threshold (J6). SURVEY §7.3 excludes the three
third-party engines themselves (nondeterministic); this module keeps
the consensus OPERATOR, which applies to any N text columns — engine
variants, re-crawl snapshots, A/B extractor versions.

Scale form: similarity = normalized Levenshtein
(``1 - dist / max(len_a, len_b)``), a native JVM expression both Spark
and DuckDB implement identically on integers — so the operator is a
pure per-row map (no shuffle, no UDF) and the catalog query
(``j6_consensus_pick``) is oracle-checkable bit-for-bit.
``SequenceMatcher.ratio`` itself (2·M / (len_a + len_b)) is kept as the
kernel twin below for reference-fidelity tests; it has no SQL analog.

At 100 TB: Levenshtein is O(len_a·len_b) per pair — quadratic in
document length. Cap the comparison with ``probe_chars`` (prefix
probe): agreement on a bounded prefix is the same signal the reference
uses whole-document, at bounded per-row cost. Pass ``probe_chars=None``
only when documents are known small.
"""

from __future__ import annotations

from difflib import SequenceMatcher
from itertools import combinations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def levenshtein_similarity(a: Column, b: Column) -> Column:
    """1 - dist/max(len) as double; both-empty pairs score 1.0."""
    dist = F.levenshtein(a, b)
    denom = F.greatest(F.length(a), F.length(b), F.lit(1))
    return F.lit(1.0) - dist.cast("double") / denom.cast("double")


def consensus_pick(
    df: DataFrame,
    engines: list[str],
    id_col: str = "doc_id",
    conflict_threshold: float = 0.7,
    probe_chars: int | None = 2000,
) -> DataFrame:
    """J6 consensus over N engine text columns.

    Returns (id_col, picked_engine, final_text, consensus_score,
    low_consensus). Pick = longest text, earliest-listed engine wins
    ties (reference ``max`` semantics). consensus_score = mean pairwise
    Levenshtein similarity (A9 analog); single-engine input scores 1.0
    with no flag, matching ``build_consensus``'s one-success branch.
    """
    if not engines:
        raise ValueError("need at least one engine column")
    if probe_chars is not None and probe_chars <= 0:
        raise ValueError("probe_chars must be positive (or None)")
    # NULL engine output = failed engine. The kernel twin excludes
    # failed engines from the pairwise mean; natively that would need
    # a per-row variable pair set, so the scale form folds NULL to ''
    # instead: an empty output scores ~0 similarity against any real
    # one (dragging the mean DOWN, flagging low consensus — never
    # silently NULL) and can only win the length pick when every
    # engine failed.
    folded = {e: F.coalesce(F.col(e), F.lit("")) for e in engines}
    cols = {
        e: (
            F.substring(folded[e], 1, probe_chars)
            if probe_chars is not None
            else folded[e]
        )
        for e in engines
    }
    pairs = list(combinations(engines, 2))
    if pairs:
        sims = [levenshtein_similarity(cols[a], cols[b]) for a, b in pairs]
        total = sims[0]
        for s in sims[1:]:
            total = total + s
        score = total / F.lit(float(len(pairs)))
    else:
        score = F.lit(1.0)

    # longest wins, first-listed wins ties (reference ``max``): picked
    # = first engine whose (NULL-folded) length reaches the maximum
    lens = {e: F.length(folded[e]) for e in engines}
    max_len = (
        F.greatest(*lens.values())
        if len(engines) > 1
        else lens[engines[0]]
    )
    picked = F.lit(engines[-1])
    final = folded[engines[-1]]
    for e in reversed(engines[:-1]):
        cond = lens[e] == max_len
        picked = F.when(cond, F.lit(e)).otherwise(picked)
        final = F.when(cond, folded[e]).otherwise(final)

    return df.select(
        id_col,
        picked.alias("picked_engine"),
        final.alias("final_text"),
        score.alias("consensus_score"),
        (score < F.lit(conflict_threshold)).alias("low_consensus")
        if len(engines) > 1
        else F.lit(False).alias("low_consensus"),
    )


def consensus_kernel(
    texts: list[str | None], conflict_threshold: float = 0.7
) -> dict:
    """Reference-fidelity twin (``multi_engine_extractor.py:171-235``):
    ``SequenceMatcher.ratio`` pairwise mean, longest-first-wins pick,
    flag taxonomy (error / warning / low_consensus). ``None`` entries
    model failed engines."""
    successful = [(i, t) for i, t in enumerate(texts) if t is not None]
    if not successful:
        return {
            "final_text": "",
            "picked": None,
            "consensus_score": 0.0,
            "flags": [{"type": "error", "message": "All engines failed"}],
        }
    if len(successful) == 1:
        idx, text = successful[0]
        return {
            "final_text": text,
            "picked": idx,
            "consensus_score": 1.0,
            "flags": [
                {"type": "warning", "message": f"Only engine {idx} succeeded"}
            ],
        }
    picked_idx, best = max(successful, key=lambda it: len(it[1]))
    sims = [
        SequenceMatcher(None, a, b).ratio()
        for (_, a), (_, b) in combinations(successful, 2)
    ]
    avg = sum(sims) / len(sims)
    flags = []
    if avg < conflict_threshold:
        flags.append(
            {
                "type": "low_consensus",
                "message": f"Low agreement between engines ({avg:.1%})",
            }
        )
    return {
        "final_text": best,
        "picked": picked_idx,
        "consensus_score": avg,
        "flags": flags,
    }
