"""HTML branch: DOM boilerplate stripping (SURVEY.md §2.12 H1-H6).

Baseline-mandated (no reference implementation exists); semantics follow
the published Boilerpipe (Kohlschütter et al., WSDM 2010) / jusText
family: segment the DOM into blocks at block-level tags, score each
block by text density and link density, drop boilerplate, keep main
content, serialize with ``\\n\\n``.

Implementation: Python stdlib ``html.parser`` only (zero extra deps,
deterministic). Two classification passes:

  pass 1 per block:  BAD   if link_density > θ or inside
                           nav/footer/aside/header/form context
                     GOOD  if chars ≥ short_block_chars and not BAD
                     SHORT otherwise
  pass 2 smoothing:  SHORT → GOOD iff an adjacent non-short neighbor
                     (previous else next) is GOOD; headings inherit
                     forward (kept when the following block is GOOD).

All thresholds fixed in :class:`~pdf_extractor_spark.config.ExtractConfig`
before goldens were frozen. Same invariant as the PDF branch:
byte-identical output per url.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from html.parser import HTMLParser

from ..config import ExtractConfig

_BLOCK_TAGS = {
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "td", "th",
    "blockquote", "pre", "article", "section", "header", "footer",
    "nav", "aside", "ul", "ol", "table", "tr", "main", "figure",
    "figcaption", "dd", "dt",
}
_SKIP_TAGS = {"script", "style", "noscript", "template", "head", "title"}
_BAD_CONTEXT_TAGS = {"nav", "footer", "aside", "header", "form"}
_HEADING_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6"}
_WS_RE = re.compile(r"\s+")


@dataclass
class Block:
    text: str
    chars: int
    link_chars: int
    heading: bool
    bad_context: bool

    @property
    def link_density(self) -> float:
        return self.link_chars / self.chars if self.chars else 1.0


class _BlockParser(HTMLParser):
    """H1+H2: DOM parse + block segmentation in one streaming pass."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[Block] = []
        self._buf: list[str] = []
        self._buf_link = 0
        self._anchor_depth = 0
        self._skip_depth = 0
        self._bad_depth = 0
        self._heading_depth = 0

    def _flush(self) -> None:
        raw = "".join(self._buf)
        text = _WS_RE.sub(" ", raw).strip()
        if text:
            self.blocks.append(
                Block(
                    text=text,
                    chars=len(text),
                    link_chars=min(self._buf_link, len(text)),
                    heading=self._heading_depth > 0,
                    bad_context=self._bad_depth > 0,
                )
            )
        self._buf = []
        self._buf_link = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if tag == "br":
            self._flush()
            return
        if tag in _BLOCK_TAGS:
            self._flush()
            if tag in _BAD_CONTEXT_TAGS:
                self._bad_depth += 1
            if tag in _HEADING_TAGS:
                self._heading_depth += 1
        if tag == "a":
            self._anchor_depth += 1

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag in _BLOCK_TAGS:
            self._flush()
            if tag in _BAD_CONTEXT_TAGS:
                self._bad_depth = max(0, self._bad_depth - 1)
            if tag in _HEADING_TAGS:
                self._heading_depth = max(0, self._heading_depth - 1)
        if tag == "a":
            self._anchor_depth = max(0, self._anchor_depth - 1)

    def handle_data(self, data):
        if self._skip_depth:
            return
        self._buf.append(data)
        if self._anchor_depth:
            self._buf_link += len(_WS_RE.sub(" ", data).strip())


def segment_blocks(html_bytes: bytes) -> list[Block]:
    """H1+H2: bytes → ordered content blocks."""
    text = html_bytes.decode("utf-8", errors="replace")
    parser = _BlockParser()
    parser.feed(text)
    parser.close()
    parser._flush()
    return parser.blocks


def classify_blocks(blocks: list[Block], cfg: ExtractConfig) -> list[bool]:
    """H3-H5: per-block keep/drop labels (True = content)."""
    n = len(blocks)
    # pass 1: GOOD=1 / BAD=0 / SHORT=-1
    labels = []
    for b in blocks:
        if b.bad_context or b.link_density > cfg.html_link_density_max:
            labels.append(0)
        elif b.chars >= cfg.html_short_block_chars:
            labels.append(1)
        else:
            labels.append(-1)
    # pass 2: smooth SHORT blocks by nearest decided neighbors.
    # previous decided label (scan forward), next decided (scan back)
    prev_dec = [0] * n
    last = 0
    for i in range(n):
        prev_dec[i] = last
        if labels[i] != -1:
            last = labels[i]
    next_dec = [0] * n
    last = 0
    for i in range(n - 1, -1, -1):
        next_dec[i] = last
        if labels[i] != -1:
            last = labels[i]
    out = []
    for i, b in enumerate(blocks):
        if labels[i] == 0:
            out.append(False)
        elif labels[i] == 1:
            out.append(True)
        elif b.heading:
            out.append(next_dec[i] == 1)  # heading kept if content follows
        else:
            out.append(prev_dec[i] == 1 or next_dec[i] == 1)
    return out


def extract_html(
    html_bytes: bytes, cfg: ExtractConfig
) -> tuple[str, list[tuple[int, int, str, int]], int, int]:
    """H6: full branch — returns
    (extracted_text, spans, n_bad_chars, n_pre_chars).

    Spans are (start, end, kind, page) character offsets into the
    output; kind ∈ {heading, body}; page is 0 for HTML.

    P11 (reference ``error_handler.py:509-540``): each kept block is
    encoding-scrubbed BEFORE offsets are assigned, so spans index the
    cleaned text; ``n_bad_chars`` / ``n_pre_chars`` report the
    pre-scrub damage count and kept-content size so the caller can
    grade the flag (light damage → recoverable warning; mostly-
    undecodable content → error, it was never really text).
    """
    from .encoding import count_bad_chars, fix_encoding_text

    blocks = segment_blocks(html_bytes)
    keep = classify_blocks(blocks, cfg)
    parts: list[str] = []
    spans: list[tuple[int, int, str, int]] = []
    pos = 0
    n_bad = 0
    n_pre = 0
    for b, k in zip(blocks, keep):
        if not k:
            continue
        text = b.text
        n_pre += len(text)
        if cfg.encoding_scrub_enabled:
            n_bad += count_bad_chars(text)
            text = fix_encoding_text(text)
            if not text:
                continue
        if parts:
            pos += 2  # "\n\n"
        start = pos
        parts.append(text)
        pos += len(text)
        spans.append((start, pos, "heading" if b.heading else "body", 0))
    return "\n\n".join(parts), spans, n_bad, n_pre
