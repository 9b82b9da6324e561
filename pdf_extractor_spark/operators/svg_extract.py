"""From-scratch SVG text extraction — the remaining text-bearing
web format: figures, diagrams and logos carry real content in
``<text>``/``<tspan>`` elements, positioned by coordinates rather
than document order, so extraction is a miniature layout analysis
(sort by (y, x)) rather than a tag strip.

Public format only (W3C SVG 1.1/2): XML with self-closing tags,
CDATA sections, comments, character entities and namespace
prefixes. Non-content subtrees — ``defs``, ``symbol``, ``metadata``,
``title``, ``desc``, ``style``, ``script``, ``pattern``,
``clipPath``, ``mask`` — are skipped whole (their ``<text>``
children are templates/annotations, not shown content; the fixture
plants exactly those traps). ``tspan`` inherits the parent
``text``'s coordinates unless it overrides them — the layout the
wrapper exercises on half the corpus.

Lenient like the HTML branch (unknown elements/attributes flow
through; stray ``&`` survives as itself); structurally hopeless
input (no ``<svg``) raises :class:`SvgError`.
"""

from __future__ import annotations

import re

_TOKEN_RE = re.compile(
    r"<!--.*?-->"
    r"|<!\[CDATA\[.*?\]\]>"
    r"|<[^>]+>"
    r"|[^<]+",
    re.DOTALL,
)

_NAME_RE = re.compile(r"</?\s*(?:[A-Za-z_][\w.-]*:)?([\w.-]+)")
_ATTR_RE = re.compile(
    r"([A-Za-z_][\w:.-]*)\s*=\s*(\"[^\"]*\"|'[^']*')"
)

_SKIP = frozenset((
    "defs", "symbol", "metadata", "title", "desc", "style",
    "script", "pattern", "clippath", "mask",
))

_ENTITIES = {
    "amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'",
}

_ENT_RE = re.compile(r"&(#x[0-9A-Fa-f]+|#\d+|[A-Za-z]+);")


class SvgError(ValueError):
    """Not an SVG document."""


def _decode_entities(raw: str) -> str:
    def sub(m: re.Match) -> str:
        body = m.group(1)
        if body.startswith("#x"):
            return chr(int(body[2:], 16))
        if body.startswith("#"):
            return chr(int(body[1:]))
        return _ENTITIES.get(body, m.group(0))

    return _ENT_RE.sub(sub, raw)


def _num(attrs: dict[str, str], key: str) -> float | None:
    v = attrs.get(key)
    if v is None:
        return None
    try:
        return float(v.strip().split()[0])
    except (ValueError, IndexError):
        return None


def svg_extract_text(payload: bytes | str) -> str:
    """Shown text in reading order: fragments collected from
    ``text``/``tspan`` elements outside skip subtrees, sorted by
    (y, x, input order), whitespace-normalized, space-joined."""
    doc = (
        payload.decode("utf-8", "replace")
        if isinstance(payload, (bytes, bytearray)) else payload
    )
    if "<svg" not in doc:
        raise SvgError("no <svg> root")
    skip_depth = 0
    frags: list[tuple[float, float, int, str]] = []
    # stack of (tag, x, y) for open text/tspan elements
    tstack: list[tuple[str, float, float]] = []
    order = 0
    for m in _TOKEN_RE.finditer(doc):
        tok = m.group(0)
        if tok.startswith("<!--") or tok.startswith("<![CDATA["):
            continue
        if tok.startswith("</"):
            name_m = _NAME_RE.match(tok)
            name = name_m.group(1).lower() if name_m else ""
            if name in _SKIP:
                if skip_depth:
                    skip_depth -= 1
            elif not skip_depth and name in ("text", "tspan") \
                    and tstack:
                # closes inside skipped subtrees must not pop an
                # outer element's entry (symmetric with the open
                # branch, which never pushes while skip_depth > 0)
                tstack.pop()
            continue
        if tok.startswith("<"):
            if tok.startswith("<?") or tok.startswith("<!"):
                continue
            name_m = _NAME_RE.match(tok)
            if not name_m:
                continue
            name = name_m.group(1).lower()
            selfclose = tok.rstrip().endswith("/>")
            if name in _SKIP:
                if not selfclose:
                    skip_depth += 1
                continue
            if skip_depth:
                continue
            if name in ("text", "tspan") and not selfclose:
                attrs = {
                    k.lower(): v[1:-1]
                    for k, v in _ATTR_RE.findall(tok)
                }
                px, py = (tstack[-1][1], tstack[-1][2]) \
                    if tstack else (0.0, 0.0)
                x = _num(attrs, "x")
                y = _num(attrs, "y")
                tstack.append((
                    name,
                    px if x is None else x,
                    py if y is None else y,
                ))
            continue
        # character data
        if skip_depth or not tstack:
            continue
        piece = _decode_entities(tok).strip()
        if piece:
            _t, x, y = tstack[-1]
            frags.append((y, x, order, " ".join(piece.split())))
            order += 1
    frags.sort(key=lambda f: (f[0], f[1], f[2]))
    return " ".join(f[3] for f in frags)


# ------------------------------------------------------------ writer

def build_svg(text: str, doc_id: int) -> bytes:
    """Deterministic SVG carrying ``text``'s words at a (row,
    column) grid — EMITTED OUT OF ORDER (rows reversed, each row
    rotated by doc_id % 3) so only the coordinate sort recovers the
    original sequence. Layout dialect alternates: even docs use one
    ``<text x y>`` per word; odd docs use one ``<text y>`` per row
    whose ``<tspan x>`` children inherit y. Every third doc
    entity-escapes its words character by character. Decoy text is
    planted in ``<title>``, ``<defs>``, a comment and a CDATA
    ``<style>`` block — none of it may extract."""
    words = text.split(" ")
    per_row = 6
    rows: list[list[tuple[int, str]]] = []
    for j, word in enumerate(words):
        r, k = divmod(j, per_row)
        if r >= len(rows):
            rows.append([])
        rows[r].append((k, word))

    def esc(w: str) -> str:
        if doc_id % 3 == 0:
            return "".join(f"&#{ord(ch)};" for ch in w)
        return (
            w.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;")
        )

    parts = [
        '<?xml version="1.0"?>',
        '<svg xmlns="http://www.w3.org/2000/svg" '
        'xmlns:xlink="http://www.w3.org/1999/xlink" '
        'width="400" height="4000">',
        f"<title>decoy title {doc_id}</title>",
        "<desc>decoy description</desc>",
        '<defs><text x="0" y="0">DECOY-DEFS</text>'
        '<symbol id="s"><tspan>DECOY-SYM</tspan></symbol></defs>',
        "<!-- <text x='1' y='1'>DECOY-COMMENT</text> -->",
        "<style><![CDATA[ .t { font: <text>DECOY-CSS</text> } "
        "]]></style>",
        '<rect width="400" height="4000" fill="#fff"/>',
    ]
    rot = doc_id % 3
    for r in range(len(rows) - 1, -1, -1):
        row = rows[r]
        y = 20 * (r + 1)
        emit = row[rot % len(row):] + row[:rot % len(row)]
        if doc_id % 2 == 0:
            for k, word in emit:
                parts.append(
                    f'<text x="{30 * k}" y="{y}">{esc(word)}</text>'
                )
        else:
            spans = "".join(
                f'<tspan x="{30 * k}">{esc(word)}</tspan>'
                for k, word in emit
            )
            parts.append(f'<text y="{y}">{spans}</text>')
    parts.append("</svg>")
    return "\n".join(parts).encode("utf-8")
