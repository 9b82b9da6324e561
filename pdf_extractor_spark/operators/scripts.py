"""Super/subscript attachment (W3) + Unicode script maps (F4) + trimmed
mean font size (A2) — SURVEY.md §2.7/§2.5.

Reference semantics (``extractor.py:629-792``, ``superscript_detector.py``):
within a horizontal band, a word whose font size is < ``script_size_ratio``
× the page's average size AND whose horizontal gap to the previous word is
< ``script_gap_max`` is a script candidate; it classifies as superscript
when its vertical middle sits above the base word's middle, else
subscript; digits are translated through the Unicode super/subscript maps
and merged into the base word. The base word's ``x1`` is extended mid-loop
(reference mutates it the same way — SURVEY.md §7.4 trap 4 — which makes
later gap tests see the merged extent; replicated as-is).

Pure pandas/NumPy — runs inside the Arrow batch, never per-row Spark.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..config import ExtractConfig
from .layout import group_bands

# F4 — Unicode translation maps (reference extractor.py:757-792)
SUPERSCRIPT_MAP = str.maketrans("0123456789+-=()n", "⁰¹²³⁴⁵⁶⁷⁸⁹⁺⁻⁼⁽⁾ⁿ")
SUBSCRIPT_MAP = str.maketrans("0123456789+-=()", "₀₁₂₃₄₅₆₇₈₉₊₋₌₍₎")


def to_superscript(text: str) -> str:
    return text.translate(SUPERSCRIPT_MAP)


def to_subscript(text: str) -> str:
    return text.translate(SUBSCRIPT_MAP)


def trimmed_mean_size(sizes: pd.Series) -> float:
    """A2 (reference ``superscript_detector.py:161-177``): drop the top
    and bottom 10% then mean. NumPy path (pandas sort_values/iloc cost
    ~0.45 ms per page-sized Series — hot in the kernel profile); the
    mean is over the same sorted value multiset in the same order, so
    the result is bit-identical to the pandas form (both sum via
    NumPy pairwise summation)."""
    vals = sizes.to_numpy(dtype=float, copy=False)
    vals = vals[~np.isnan(vals)]
    n = len(vals)
    if n == 0:
        return 12.0
    if n >= 10:
        v = np.sort(vals)  # values only — stability irrelevant to a mean
        k = n // 10
        return float(v[k: n - k].mean())
    return float(vals.mean())


def attach_scripts(words: pd.DataFrame, cfg: ExtractConfig) -> pd.DataFrame:
    """W3 (reference ``extractor.py:691-755``): merge script-sized words
    into their base word within each horizontal band.

    Returns a new frame (WORD_COLUMNS shape) with script words consumed.
    Bands are ~10 words, so the per-band merge loop is bounded; the
    banding itself is the vectorized C3 sessionization.
    """
    if len(words) < 2:
        return words
    avg_size = trimmed_mean_size(words["size"])
    threshold = cfg.script_size_ratio * avg_size
    if not bool((words["size"] < threshold).any()):
        return words  # fast path: no candidates anywhere on the page

    banded = group_bands(words, cfg.band_tolerance)
    out_rows: list[dict] = []
    for _bid, band in banded.groupby("band_id", sort=True):
        band = band.sort_values("x0", kind="mergesort")
        rows = band.to_dict("records")
        merged: list[dict] = []
        for row in rows:
            if merged:
                base = merged[-1]
                gap = row["x0"] - base["x1"]
                is_small = row["size"] < threshold
                if is_small and 0 <= gap < cfg.script_gap_max:
                    base_mid = (base["top"] + base["bottom"]) / 2.0
                    row_mid = (row["top"] + row["bottom"]) / 2.0
                    if row_mid < base_mid:
                        base["text"] += to_superscript(str(row["text"]))
                    else:
                        base["text"] += to_subscript(str(row["text"]))
                    base["x1"] = row["x1"]  # trap 4: extend mid-loop
                    continue
            merged.append(dict(row))
        out_rows.extend(merged)
    out = pd.DataFrame(out_rows)
    return out.drop(columns=["band_id"]).reset_index(drop=True)
