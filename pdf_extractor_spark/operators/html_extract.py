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

# ---------------------------------------------------------------------------
# Charset sniffing — WHATWG Encoding sniffing algorithm subset
# (https://html.spec.whatwg.org/#determining-the-character-encoding):
# BOM wins over everything; else a ``charset=`` declaration inside a
# ``<meta>`` in the first 1024 bytes; else UTF-8 with replacement.
# Label resolution follows the WHATWG Encoding registry where Python
# codec names differ: ascii/iso-8859-1/latin1 → windows-1252 (the
# superset browsers actually use), shift_jis → cp932 (windows-31j),
# gb2312 → gbk, euc-kr → cp949 (uhc), big5 → big5hkscs, tis-620 →
# cp874. A meta-declared UTF-16 is decoded as UTF-8 per spec (an
# ASCII-readable <meta> proves the page is not UTF-16).
# ---------------------------------------------------------------------------
_BOMS: tuple[tuple[bytes, str], ...] = (
    (b"\xef\xbb\xbf", "utf-8-sig"),
    (b"\xff\xfe", "utf-16"),  # LE; the utf-16 codec consumes the BOM
    (b"\xfe\xff", "utf-16"),  # BE
)
_META_CHARSET_RE = re.compile(
    rb"<meta[^>]{0,512}?charset\s*=\s*[\"']?\s*([a-zA-Z0-9._:-]+)",
    re.IGNORECASE | re.DOTALL,
)
_CHARSET_ALIASES = {
    "utf-8": "utf-8", "utf8": "utf-8", "unicode-1-1-utf-8": "utf-8",
    "ascii": "windows-1252", "us-ascii": "windows-1252",
    "iso-8859-1": "windows-1252", "iso8859-1": "windows-1252",
    "iso_8859-1": "windows-1252", "latin1": "windows-1252",
    "l1": "windows-1252", "cp1252": "windows-1252",
    "cp819": "windows-1252", "windows-1252": "windows-1252",
    "x-cp1252": "windows-1252",
    "windows-1250": "windows-1250", "windows-1251": "windows-1251",
    "windows-1253": "windows-1253", "windows-1254": "windows-1254",
    "windows-1255": "windows-1255", "windows-1256": "windows-1256",
    "windows-1257": "windows-1257", "windows-1258": "windows-1258",
    "cp1251": "windows-1251",
    "iso-8859-2": "iso-8859-2", "latin2": "iso-8859-2",
    "iso-8859-3": "iso-8859-3", "iso-8859-4": "iso-8859-4",
    "iso-8859-5": "iso-8859-5", "iso-8859-6": "iso-8859-6",
    "iso-8859-7": "iso-8859-7", "iso-8859-8": "iso-8859-8",
    "iso-8859-9": "windows-1254", "iso-8859-10": "iso-8859-10",
    "iso-8859-13": "iso-8859-13", "iso-8859-14": "iso-8859-14",
    "iso-8859-15": "iso-8859-15", "latin9": "iso-8859-15",
    "iso-8859-16": "iso-8859-16",
    "koi8-r": "koi8-r", "koi8": "koi8-r", "koi8-u": "koi8-u",
    "shift_jis": "cp932", "shift-jis": "cp932", "sjis": "cp932",
    "x-sjis": "cp932", "ms932": "cp932", "ms_kanji": "cp932",
    "windows-31j": "cp932", "csshiftjis": "cp932",
    "euc-jp": "euc-jp", "x-euc-jp": "euc-jp", "cseucpkdfmtjapanese":
        "euc-jp",
    "iso-2022-jp": "iso-2022-jp", "csiso2022jp": "iso-2022-jp",
    "gb2312": "gbk", "gb_2312": "gbk", "gb_2312-80": "gbk",
    "gbk": "gbk", "x-gbk": "gbk", "chinese": "gbk", "csgb2312": "gbk",
    "gb18030": "gb18030",
    "big5": "big5hkscs", "big5-hkscs": "big5hkscs", "x-x-big5":
        "big5hkscs", "csbig5": "big5hkscs", "cn-big5": "big5hkscs",
    "euc-kr": "cp949", "ks_c_5601-1987": "cp949", "korean": "cp949",
    "csksc56011987": "cp949", "windows-949": "cp949",
    "windows-874": "cp874", "tis-620": "cp874", "iso-8859-11":
        "cp874", "dos-874": "cp874",
    "macintosh": "mac-roman", "x-mac-roman": "mac-roman", "mac":
        "mac-roman", "csmacintosh": "mac-roman",
    "x-mac-cyrillic": "mac-cyrillic", "x-mac-ukrainian":
        "mac-cyrillic",
    "utf-16": "utf-8", "utf-16le": "utf-8", "utf-16be": "utf-8",
    # x-user-defined maps 0x80-0xFF to U+F780-F7FF; windows-1252 is
    # the deterministic stand-in (pages labeled so are byte-payload
    # carriers, not text)
    "x-user-defined": "windows-1252",
}


def sniff_charset(html_bytes: bytes) -> str:
    """Resolve the page's charset: BOM, else first-1024-bytes
    ``<meta ... charset=``, else ``utf-8``. Returns a Python codec
    name; never raises."""
    for bom, codec in _BOMS:
        if html_bytes[: len(bom)] == bom:
            return codec
    m = _META_CHARSET_RE.search(html_bytes[:1024])
    if m:
        label = m.group(1).decode("ascii", "replace").strip().lower()
        codec = _CHARSET_ALIASES.get(label)
        if codec is not None:
            return codec
    return "utf-8"


def resolve_charset_label(label: str) -> str | None:
    """WHATWG-registry resolution of a charset LABEL (e.g. from a
    transport Content-Type header) to a Python codec; None when the
    label is unknown."""
    return _CHARSET_ALIASES.get(label.strip().lower())


def resolve_codec(
    html_bytes: bytes, transport_charset: str | None = None
) -> str:
    """The codec the page decodes with, per the WHATWG priority:
    BOM, then the TRANSPORT-layer charset (an HTTP Content-Type
    header, when the caller has one), then in-document ``<meta>``,
    then UTF-8. The SINGLE source of truth — callers reporting the
    codec (audit rows) and callers decoding must agree."""
    for bom, bcodec in _BOMS:
        if html_bytes[: len(bom)] == bom:
            return bcodec
    if transport_charset:
        codec = resolve_charset_label(transport_charset)
        if codec is not None:
            return codec
    return sniff_charset(html_bytes)


def sniff_decode(
    html_bytes: bytes, transport_charset: str | None = None
) -> tuple[str, str]:
    """Decode a raw page; (text, codec) per :func:`resolve_codec`.
    Always ``errors="replace"`` — damage surfaces as U+FFFD and is
    counted/scrubbed downstream (P11), never raised."""
    codec = resolve_codec(html_bytes, transport_charset)
    try:
        return html_bytes.decode(codec, errors="replace"), codec
    except LookupError:  # codec table entry missing in this runtime
        return html_bytes.decode("utf-8", errors="replace"), "utf-8"


_BLOCK_TAGS = {
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "td", "th",
    "blockquote", "pre", "article", "section", "header", "footer",
    "nav", "aside", "ul", "ol", "table", "tr", "main", "figure",
    "figcaption", "dd", "dt",
    # legacy raw-text elements (WHATWG): block-level, content literal
    "xmp", "plaintext",
}
_SKIP_TAGS = {
    "script", "style", "noscript", "template", "head", "title",
    # form controls and non-text embeds: their text children are
    # chrome (option lists, button labels, svg <text>), never content
    "select", "option", "optgroup", "datalist", "button", "textarea",
    "svg", "canvas", "map", "audio", "video", "iframe", "object",
    # legacy raw-text fallbacks (WHATWG): shown only when embeds/
    # frames are unsupported — never in a modern consumer
    "noembed", "noframes",
    # ruby annotations: the reading (<rt>) and its fallback parens
    # (<rp>) must not interleave with the base text ("東京とうきょう")
    # — the furigana-duplication corruption a JP corpus pipeline
    # cannot afford; the <ruby> base text itself is kept
    "rt", "rp",
}
_BAD_CONTEXT_TAGS = {"nav", "footer", "aside", "header", "form"}
_HEADING_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6"}
_WS_RE = re.compile(r"\s+")
# invisible formatting codepoints with no text content: soft hyphen
# (a hyphenation HINT — &shy;-riddled words must tokenize whole),
# zero-width space, word joiner, in-body BOM/ZWNBSP, and the bidi
# control set (UAX #9 §2) — implicit marks LRM/RLM/ALM, explicit
# embeds/overrides LRE..RLO + PDF, isolates LRI..PDI: rendering-
# direction hints, never text content, and a dedup/fingerprint
# evasion channel when left in. ZWJ/ZWNJ are
# NOT stripped — they are orthographically meaningful (Indic, Farsi,
# emoji sequences).
_INVISIBLE_RE = re.compile(
    "[\u00ad\u200b\u2060\ufeff\u200e\u200f\u061c"
    "\u202a-\u202e\u2066-\u2069]"
)
# never matches — used to disable html.parser's cdata end-tag scan
# once the tokenizer enters the WHATWG PLAINTEXT state
_NEVER_RE = re.compile(r"(?!)")

# class/id boilerplate hints: real crawl pages are div-soup — the
# boilerplate signal lives in attribute tokens (<div class="navbar">),
# not semantic tags. Token list follows the published jusText /
# Readability "negative class" families; matched per [-_ ]-separated
# token so "article-nav-next" and "cookie-banner" both hit.
_BAD_HINT_RE = re.compile(
    r"(?:^|[-_ ])(nav|navbar|navigation|menu|footer|header|masthead|"
    r"sidebar|"
    r"breadcrumbs?|comments?|share|social|cookies?|banner|ads?|"
    r"advert\w*|promo|sponsored|related|widget|popup|modal|paywall|"
    r"subscribe|newsletter)(?:$|[-_ ])"
)


def _attrs_hint_bad(attrs: list[tuple[str, str | None]]) -> bool:
    for k, v in attrs:
        if k in ("class", "id", "role") and v:
            if _BAD_HINT_RE.search(v.lower()):
                return True
    return False


# Void elements (WHATWG §13.1.2): no content, no end tag — excluded
# from hide-state tracking (nothing to suppress, and an entry pushed
# for them would never pop).
_VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}
_IMPORTANT_RE = re.compile(r"\s*!\s*important\s*$")


def _style_display_visibility(
    style: str,
) -> tuple[str | None, str | None]:
    """The ``display`` / ``visibility`` values an inline ``style``
    attribute sets (lowercased, ``!important`` stripped), or None per
    property when unset. Last declaration wins, per CSS. A naive
    ``display:none`` substring test would false-positive on values
    like ``background:url("display:none.png")`` — splitting into
    declarations first keeps property names honest."""
    disp = vis = None
    for decl in style.split(";"):
        prop, sep, val = decl.partition(":")
        if not sep:
            continue
        p = prop.strip().lower()
        if p == "display":
            disp = _IMPORTANT_RE.sub("", val.strip().lower())
        elif p == "visibility":
            vis = _IMPORTANT_RE.sub("", val.strip().lower())
    return disp, vis


# Implied end tags (HTML5 tree construction, the cases that matter
# for counter hygiene): browsers auto-close these, html.parser does
# not, and real markup routinely omits the end tags. Every block
# start also closes an open <p> (p holds phrasing content only).
_ITEM_IMPLIED: dict[str, tuple[str, ...]] = {
    "li": ("li",),
    "dt": ("dd", "dt"),
    "dd": ("dd", "dt"),
    "tr": ("td", "th", "tr"),
    "td": ("td", "th"),
    "th": ("td", "th"),
}
_IMPLIED_BY_START: dict[str, tuple[str, ...]] = {
    t: _ITEM_IMPLIED.get(t, ()) + ("p",) for t in _BLOCK_TAGS
}
for _h in _HEADING_TAGS:  # a new heading closes an open heading
    _IMPLIED_BY_START[_h] = tuple(sorted(_HEADING_TAGS)) + ("p",)
# a new <option>/<optgroup> closes the previous one; </select> (or a
# block start — options hold text only) closes any still-open ones
_SKIP_IMPLIED_BY_START = {
    "option": ("option",),
    "optgroup": ("option", "optgroup"),
    # a new reading closes the previous one (real markup omits </rt>)
    "rt": ("rt", "rp"),
    "rp": ("rt", "rp"),
}
_SKIP_CLEARED_BY_END = {
    "select": ("option", "optgroup"),
    # </ruby> implies closing an open rt/rp (HTML5 implied end tags)
    "ruby": ("rt", "rp"),
}
# a block tag cannot legally appear inside these; its start proves
# the element was left unclosed — force-close rather than let the
# skip state swallow the rest of the page
_SELF_CLOSING_SKIPS = ("option", "optgroup", "select", "rt", "rp")


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

    # WHATWG raw-text semantics: inside <xmp> markup is literal text
    # ("<tags> stay raw"), and <plaintext> switches the tokenizer to
    # PLAINTEXT state — everything to EOF is literal (no end tag
    # exists). html.parser's cdata mode implements exactly this:
    # content flows to handle_data unparsed, charrefs NOT decoded
    # (also per spec for raw text). script/style keep their existing
    # skip behavior; xmp/plaintext are _BLOCK_TAGS so their literal
    # content is kept as a block; noembed/noframes are raw text AND
    # skipped (their fallback shows only when embeds/frames are
    # unsupported), with cdata mode guaranteeing a markup-lookalike
    # payload inside them can never disturb the tag structure.
    CDATA_CONTENT_ELEMENTS = (
        "script", "style", "xmp", "plaintext", "noembed", "noframes",
    )

    def set_cdata_mode(self, elem):
        super().set_cdata_mode(elem)
        if elem == "plaintext":
            # WHATWG PLAINTEXT state has NO end tag — a literal
            # '</plaintext>' in the content is text, not markup.
            # html.parser's default cdata regex would still match it
            # and re-enter normal tokenization; make nothing
            # "interesting" again so everything to EOF stays buffered
            # raw and close()'s leftover flush emits it literally.
            self.interesting = _NEVER_RE

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[Block] = []
        self.anchors: list[tuple[str, str]] = []
        # head directives: ("canonical", href) / ("refresh", content)
        self.directives: list[tuple[str, str]] = []
        # structured data: <meta property=… content=…> pairs (RDFa /
        # Open Graph) and raw <script type="application/ld+json">
        # bodies, in document order
        self.meta_props: list[tuple[str, str]] = []
        self.ldjson: list[str] = []
        # microdata (WHATWG §5.2, the third structured-data channel
        # besides Open Graph and JSON-LD): flat (key, value) rows in
        # document order — "@type" rows from itemscope/itemtype
        # declarations, property rows from itemprop elements with the
        # per-element value rules (meta→content, img→src, a→href,
        # time→datetime, else text content)
        self.microdata: list[tuple[str, str]] = []
        # open TEXT-valued itemprop: (tag, prop, buf) — flat model:
        # one at a time, the overwhelmingly dominant real-page shape
        self._md_open: tuple[str, str, list[str]] | None = None
        # image candidates: (tag, src-or-data-src, srcset, alt) from
        # <img> and <picture><source> — the (image URL, alt text)
        # harvest surface
        self.images: list[tuple[str, str, str, str]] = []
        self._ldjson_buf: list[str] | None = None
        self._a_href: str | None = None
        self._a_text: list[str] = []
        self._buf: list[str] = []
        self._buf_link = 0
        self._anchor_depth = 0
        self._skip_depth = 0
        self._skip_counts: dict[str, int] = {}
        self._bad_depth = 0
        self._heading_depth = 0
        # per-tag stacks of "this open element carried a boilerplate
        # class/id hint" — per-NAME stacks survive the interleaving
        # that real (often unclosed) markup produces better than one
        # global element stack
        self._hint_stacks: dict[str, list[bool]] = {}
        # hidden-content state (CSS-rendering suppression, the SEO-
        # stuffing / collapsed-UI channel): _disp_hidden counts open
        # elements whose subtree does not render (inline
        # display:none, or the `hidden` attribute unless inline style
        # overrides display — the [hidden] UA rule loses to inline
        # style per cascade origin). _visible models CSS
        # `visibility`, which INHERITS and is descendant-overridable
        # (visibility:hidden parent, visibility:visible child →
        # child renders), so each element that sets it records the
        # state to restore. Per-NAME stacks, same survival rationale
        # as _hint_stacks; entry None = element set nothing (pushed
        # for balance so implied/real end tags pop their own element)
        self._hide_stacks: dict[
            str, list[tuple[bool, bool | None] | None]
        ] = {}
        self._disp_hidden = 0
        self._visible = True

    def _flush(self) -> None:
        raw = _INVISIBLE_RE.sub("", "".join(self._buf))
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

    def _close_skip(self, tag: str) -> None:
        if self._skip_counts.get(tag, 0) > 0:
            self._skip_counts[tag] -= 1
            self._skip_depth = max(0, self._skip_depth - 1)

    def _push_hide(self, tag: str, attrs) -> None:
        """Record this element's rendering-suppression contribution.
        Every tracked element pushes (None when it sets nothing) so
        its end tag pops exactly itself. Skip tags are NOT tracked:
        their text is gated regardless, and their implied closes run
        through :meth:`_close_skip`, which bypasses ``handle_endtag``
        and would leak entries."""
        hid_attr = False
        disp = vis = None
        for k, v in attrs:
            if k == "hidden":
                # WHATWG boolean attribute: presence wins, value
                # ignored (hidden="false" still hides; until-found
                # does not paint either)
                hid_attr = True
            elif k == "style" and v:
                disp, vis = _style_display_visibility(v)
        hides = disp == "none" or (hid_attr and disp is None)
        prev_vis = None
        if vis is not None:
            prev_vis = self._visible
            # visibility:collapse behaves as hidden outside tables
            self._visible = vis not in ("hidden", "collapse")
        if hides:
            self._disp_hidden += 1
        self._hide_stacks.setdefault(tag, []).append(
            (hides, prev_vis) if (hides or prev_vis is not None)
            else None
        )

    def _pop_hide(self, tag: str) -> None:
        st = self._hide_stacks.get(tag)
        if not st:
            return
        entry = st.pop()
        if entry is None:
            return
        hides, prev_vis = entry
        if hides:
            self._disp_hidden = max(0, self._disp_hidden - 1)
        if prev_vis is not None:
            self._visible = prev_vis

    # WHATWG microdata value rules (§5.2.4): which attribute carries
    # an itemprop's value, per element; absent → text content
    _MD_ATTR_VALUE = {
        "meta": "content", "audio": "src", "embed": "src",
        "iframe": "src", "img": "src", "source": "src",
        "track": "src", "video": "src", "a": "href", "area": "href",
        "link": "href", "object": "data", "data": "value",
        "meter": "value", "time": "datetime",
    }

    def _handle_microdata(self, tag: str, md: dict) -> None:
        if "itemscope" in md and md.get("itemtype"):
            self._md_flush()
            self.microdata.append(("@type", md["itemtype"].strip()))
        prop = md.get("itemprop")
        if not prop:
            return
        attr = self._MD_ATTR_VALUE.get(tag)
        if attr is not None and md.get(attr) is not None:
            self._md_flush()
            self.microdata.append((prop, md[attr]))
            return
        if attr is not None and tag != "time":
            # attribute-valued element missing its value attribute:
            # the property's value is the empty string (§5.2.4)
            self._md_flush()
            self.microdata.append((prop, ""))
            return
        # text-valued property (incl. <time> without datetime): flat
        # model — one open at a time, the dominant real-page shape
        self._md_flush()
        self._md_open = (tag, prop, [])

    def _md_flush(self) -> None:
        if self._md_open is not None:
            _tag, prop, buf = self._md_open
            self.microdata.append(
                (prop, _WS_RE.sub(" ", "".join(buf)).strip())
            )
            self._md_open = None

    def handle_starttag(self, tag, attrs):
        # head directives are harvested even though <head> is a skip
        # subtree for TEXT — but a directive inside <template> is
        # inert per WHATWG (template contents are not in the document)
        if tag in ("link", "meta", "base") and not self._skip_counts.get(
            "template"
        ):
            # WHATWG tokenizer drops duplicate attributes — FIRST
            # occurrence wins (a dict comprehension would keep the
            # last and follow the wrong redirect target)
            a: dict[str, str] = {}
            for k, v in attrs:
                if v is not None:
                    a.setdefault(k, v)
            if tag == "base" and a.get("href") is not None:
                # document base URL (WHATWG: the FIRST base with an
                # href wins; later ones are ignored)
                if not any(k == "base" for k, _v in self.directives):
                    self.directives.append(("base", a["href"]))
            if tag == "link":
                rel = (a.get("rel") or "").lower().split()
                if "canonical" in rel and a.get("href"):
                    self.directives.append(("canonical", a["href"]))
                if "license" in rel and a.get("href"):
                    # rel is a TOKEN LIST (WHATWG §4.6.6.12) — a
                    # "nofollow license" value still declares one
                    self.directives.append(("license_link", a["href"]))
                if "alternate" in rel and a.get("href") \
                        and a.get("hreflang"):
                    # translation declarations: rel=alternate WITH an
                    # hreflang (a feed link is rel=alternate too, but
                    # carries type=, not hreflang); the raw code goes
                    # out — BCP 47 validity lives with the consumer
                    self.directives.append(
                        ("hreflang",
                         f"{a['hreflang']} {a['href']}")
                    )
            elif (a.get("http-equiv") or "").lower() == "refresh" \
                    and a.get("content"):
                self.directives.append(("refresh", a["content"]))
            elif (a.get("name") or "").lower() == "robots" \
                    and a.get("content") is not None:
                # page-level REP (robots meta): raw value out, token
                # semantics live with the consumer (metarobots.py)
                self.directives.append(("robots", a["content"]))
            elif (a.get("name") or "").lower() in (
                "tdm-reservation", "tdm-policy"
            ) and a.get("content") is not None:
                # W3C TDM Reservation Protocol (TDMRep): the
                # text-and-data-mining opt-out channel; raw value
                # out, semantics live with functions/aioptout.py
                self.directives.append(
                    ((a.get("name") or "").lower(), a["content"])
                )
            if tag == "meta" and a.get("content") is not None:
                # RDFa/Open Graph carries the key in `property`;
                # classic metadata (description, twitter:*) in `name`
                prop = a.get("property") or ""
                name = (a.get("name") or "").lower()
                if prop:
                    self.meta_props.append((prop, a["content"]))
                elif name == "description" or name.startswith("twitter:"):
                    self.meta_props.append((name, a["content"]))
        # microdata (WHATWG §5.2) rides the same pass: any element
        # may carry itemscope/itemprop; <template> contents are inert,
        # but HIDDEN elements are harvested — pages hide machine-
        # readable properties intentionally and validly
        if not self._skip_counts.get("template") and any(
            k in ("itemscope", "itemprop", "itemtype")
            for k, _v in attrs
        ):
            md: dict[str, str | None] = {}
            for k, v in attrs:
                md.setdefault(k, v)
            self._handle_microdata(tag, md)
        if tag == "script" and not self._skip_counts.get("template"):
            # JSON-LD island: essence match on the `type` attribute
            # (parameters stripped, case-insensitive) per WHATWG
            # script-data-block rules; cdata mode delivers the body
            # raw (charrefs undecoded) which is what JSON needs
            a2: dict[str, str] = {}
            for k, v in attrs:
                if v is not None:
                    a2.setdefault(k, v)
            essence = (a2.get("type") or "").split(";", 1)[0]
            if essence.strip().lower() == "application/ld+json":
                self._ldjson_buf = []
        if tag in _SKIP_TAGS:
            for t in _SKIP_IMPLIED_BY_START.get(tag, ()):
                self._close_skip(t)
            self._skip_counts[tag] = self._skip_counts.get(tag, 0) + 1
            self._skip_depth += 1
            return
        if tag == "br":
            self._flush()
            return
        if tag in _BLOCK_TAGS:
            # a block start implies closing unterminated items/<p>
            # (and any text-only skip elements like <option> whose
            # end tag real markup omits) BEFORE opening this element
            for t in _SELF_CLOSING_SKIPS:
                while self._skip_counts.get(t, 0):
                    self._close_skip(t)
            for t in _IMPLIED_BY_START[tag]:
                if self._hint_stacks.get(t):
                    self.handle_endtag(t)
            self._flush()
            # push AFTER the implied ends — they pop their own
            # elements' entries, not this one's
            self._push_hide(tag, attrs)
            hinted = tag not in _BAD_CONTEXT_TAGS and _attrs_hint_bad(
                attrs
            )
            if tag in _BAD_CONTEXT_TAGS or hinted:
                self._bad_depth += 1
            self._hint_stacks.setdefault(tag, []).append(hinted)
            if tag in _HEADING_TAGS:
                self._heading_depth += 1
        elif tag not in _VOID_TAGS:
            # phrasing elements (span, a, em, …) carry hidden state
            # too — real SEO stuffing hides in <span style=
            # "display:none"> as readily as in a div
            self._push_hide(tag, attrs)
        # images are harvested even inside <noscript> — lazy-loading
        # galleries put the REAL <img> fallback there, and a non-JS
        # consumer parses noscript children as content (WHATWG);
        # every other skip subtree (template, head, svg, …) stays
        # inert for images too
        img_visible = self._skip_depth == 0 or (
            self._skip_depth == self._skip_counts.get("noscript", 0)
        )
        if tag in ("img", "source") and img_visible:
            a: dict[str, str] = {}
            for k, v in attrs:
                if v is not None:
                    a.setdefault(k, v)
            # lazy-loading pages park the real URL in data-src and
            # leave src a placeholder (or absent) — prefer src unless
            # it is missing or an inline data: stub
            src = a.get("src", "")
            if (not src or src.startswith("data:")) \
                    and a.get("data-src"):
                src = a["data-src"]
            srcset = a.get("srcset", "")
            if src or srcset:
                self.images.append(
                    (tag, src, srcset, a.get("alt", ""))
                )
        if tag == "a":
            # anchors inside skip subtrees (template contents, select,
            # head, …) are as inert as their text — recording the href
            # while handle_data stays gated would emit phantom
            # empty-text links into the anchor corpus
            if self._skip_depth:
                return
            # a new anchor implies closing an unterminated one (HTML5
            # forbids nesting) — an unclosed <a> must not mark the
            # rest of the page as link text
            self._anchor_depth = min(self._anchor_depth + 1, 1)
            self._emit_anchor()
            a_rel = ""
            for k, v in attrs:
                if k == "href" and v and self._a_href is None:
                    self._a_href = v
                elif k == "rel" and v and not a_rel:
                    a_rel = v
            if self._a_href and "license" in a_rel.lower().split():
                # the classic CC badge anchor (rel token list); an
                # href-less rel=license declares nothing
                self.directives.append(("license_a", self._a_href))

    def handle_endtag(self, tag):
        if self._md_open is not None and tag == self._md_open[0]:
            self._md_flush()
        # implied-end clearing may hang off a NON-skip container's end
        # tag too (</ruby> closes an open rt/rp), so it runs first
        for t in _SKIP_CLEARED_BY_END.get(tag, ()):
            while self._skip_counts.get(t, 0):
                self._close_skip(t)
        self._pop_hide(tag)
        if tag == "script" and self._ldjson_buf is not None:
            self.ldjson.append("".join(self._ldjson_buf))
            self._ldjson_buf = None
        if tag in _SKIP_TAGS:
            self._close_skip(tag)
            return
        if tag in _BLOCK_TAGS:
            self._flush()
            stack = self._hint_stacks.get(tag)
            hinted = bool(stack) and stack.pop()
            if tag in _BAD_CONTEXT_TAGS or hinted:
                self._bad_depth = max(0, self._bad_depth - 1)
            if tag in _HEADING_TAGS:
                self._heading_depth = max(0, self._heading_depth - 1)
        if tag == "a":
            self._anchor_depth = max(0, self._anchor_depth - 1)
            self._emit_anchor()

    def _emit_anchor(self) -> None:
        """Close the pending ``<a href=…>``: record (href, collapsed
        anchor text). Anchors in boilerplate context are KEPT — the
        anchor-text corpus wants nav/footer links even though the
        text extractor strips them."""
        if self._a_href is not None:
            self.anchors.append((
                self._a_href,
                _WS_RE.sub(" ", "".join(self._a_text)).strip(),
            ))
        self._a_href = None
        self._a_text = []

    def handle_data(self, data):
        if self._ldjson_buf is not None:
            # raw JSON-LD body (script is a skip subtree for text, so
            # this never reaches the block buffer)
            self._ldjson_buf.append(data)
            return
        if self._md_open is not None:
            # text-valued itemprop: collect AND let the data flow on
            # to the block buffer — itemprop spans are normal content
            self._md_open[2].append(data)
        if self._skip_depth:
            return
        if self._disp_hidden or not self._visible:
            # CSS-suppressed content never renders — not text. The
            # element itself stays in the document: its anchors'
            # hrefs and its images are still harvested (crawl
            # frontiers follow hidden links; lazy-load carousels
            # park real <img> in display:none slides), but a hidden
            # anchor contributes no anchor TEXT — "no visible text"
            # is itself the honest harvest for a hidden link
            return
        self._buf.append(data)
        if self._anchor_depth:
            self._buf_link += len(_WS_RE.sub(" ", data).strip())
            if self._a_href is not None:
                self._a_text.append(data)

    def close(self):
        # html.parser's cdata mode buffers an unterminated raw-text
        # element's content forever waiting for its end tag. For
        # <plaintext> that is the DEFINED state (no end tag exists:
        # PLAINTEXT runs to EOF) and for <xmp> it is the truncated-
        # crawl case — either way WHATWG says the content is literal
        # text, so flush it. Unterminated <script>/<style> stay
        # dropped (their data is skip-gated regardless).
        super().close()
        leftover = self.rawdata
        cdata = getattr(self, "cdata_elem", None)
        if leftover and cdata in ("xmp", "plaintext"):
            self.rawdata = ""
            self.handle_data(leftover)
            self.handle_endtag(cdata)
        self._emit_anchor()  # unterminated <a> at EOF still counts
        self._md_flush()     # unterminated itemprop at EOF too


_TAG_START_RE = re.compile(r"<[A-Za-z/]")


def repair_unterminated_quotes(html: str) -> str:
    """Extraction-oriented recovery for tags carrying an attribute
    quote that never closes (``<p class="lead unterminated>``).

    WHATWG tokenization consumes everything up to the NEXT quote (or
    EOF) as the attribute value — a browser silently swallows the
    visible prose after the typo. A training-data extractor wants the
    opposite trade: drop the orphan quote character so the tag closes
    at its ``>`` and the prose survives (the same lenient recovery
    boilerplate-removal extractors make). Deliberate, documented
    divergence from browser behavior.

    An open quote is an ORPHAN when no closing quote exists before the
    next tag start (``<`` followed by a letter or ``/``) or EOF — a
    well-formed attribute value never spans into the next tag, so a
    "close" on the far side of one is really the NEXT broken tag's
    quote (pairing them would swallow the prose between, the exact
    browser behavior this pass exists to undo). The bound is the tag
    start itself, not a fixed window, so well-formed values of ANY
    length (srcset / inline-base64 data-URIs) stay protected, as do
    angle brackets inside quotes (``data-x='it said >hello<'`` —
    ``<'`` is not a tag start). Documented tradeoff: a raw ``<`` +
    letter INSIDE a quoted value (unescaped markup in an attribute)
    reads as an orphan; comments and doctypes (``<!``) are never
    entered."""
    if '"' not in html and "'" not in html:
        return html
    import bisect

    # one O(n) pass collects every tag-start position; each quote then
    # finds its bound in O(log m) — keeps adversarial quote-dense
    # input linear instead of quadratic
    starts = [m.start() for m in _TAG_START_RE.finditer(html)]
    drops: list[int] = []
    n = len(html)
    pos = 0
    while True:
        lt = html.find("<", pos)
        if lt == -1:
            break
        nxt = html[lt + 1 : lt + 2]
        if not (nxt.isalpha() or nxt == "/"):
            pos = lt + 1
            continue
        j = lt + 1
        while j < n:
            c = html[j]
            if c == ">" or c == "<":
                break
            if c in "\"'":
                k = bisect.bisect_right(starts, j)
                bound = starts[k] if k < len(starts) else n
                close = html.find(c, j + 1, bound)
                if close == -1:
                    drops.append(j)  # orphan quote: drop the char
                    j += 1
                else:
                    j = close + 1
                continue
            j += 1
        # a break at '<' must NOT be skipped: it starts the next tag
        # (otherwise a tag following a repaired orphan is never
        # scanned and its own orphan quote survives)
        if j < n and html[j] == "<":
            pos = j
        else:
            pos = j + 1 if j > lt else lt + 1
    if not drops:
        return html
    out = []
    last = 0
    for d in drops:
        out.append(html[last:d])
        last = d + 1
    out.append(html[last:])
    return "".join(out)


def segment_blocks(
    html_bytes: bytes, transport_charset: str | None = None
) -> list[Block]:
    """H1+H2: bytes → ordered content blocks (charset-sniffed)."""
    text, _codec = sniff_decode(html_bytes, transport_charset)
    parser = _BlockParser()
    parser.feed(repair_unterminated_quotes(text))
    parser.close()
    parser._flush()
    return parser.blocks


def harvest_images(
    html_bytes: bytes, transport_charset: str | None = None
) -> list[tuple[str, str, str, str]]:
    """(tag, src, srcset, alt) candidates from ``<img>`` and
    ``<picture><source>`` through the SAME decode + quote-repair +
    parse pipeline as extraction — the (image URL, alt text) harvest
    surface a multimodal corpus pipeline starts from.  Lazy-load
    ``data-src`` replaces a missing or ``data:``-stub src; anything
    inside ``<template>`` (or another skip subtree) is inert."""
    text, _codec = sniff_decode(html_bytes, transport_charset)
    parser = _BlockParser()
    parser.feed(repair_unterminated_quotes(text))
    parser.close()
    return parser.images


def harvest_anchors(
    html_bytes: bytes, transport_charset: str | None = None
) -> list[tuple[str, str]]:
    """(href, anchor_text) pairs through the SAME decode + quote-
    repair + parse pipeline as extraction — the outlink/anchor-corpus
    surface (boilerplate anchors included; the text extractor's
    stripping rules don't apply to link harvesting)."""
    text, _codec = sniff_decode(html_bytes, transport_charset)
    parser = _BlockParser()
    parser.feed(repair_unterminated_quotes(text))
    parser.close()
    return parser.anchors


# WHATWG meta-refresh content grammar (the shared-declarative-refresh
# steps, §4.2.5.3, simplified to the forms real pages emit): a number,
# then ';' or ',', optional whitespace, optional 'url' '=' (any case),
# the target optionally single/double-quoted.  A bare number (reload
# self) parses with url=None.
_REFRESH_RE = re.compile(
    r"^\s*(\d+(?:\.\d+)?)\s*"
    r"(?:[;,]\s*(?:url\s*=\s*)?(['\"]?)(.*?)\2\s*)?$",
    re.IGNORECASE | re.DOTALL,
)


def parse_refresh(content: str) -> tuple[int, str | None] | None:
    """meta-refresh ``content`` → (delay seconds, url or None);
    None when the value doesn't parse as a refresh directive."""
    m = _REFRESH_RE.match(content)
    if not m:
        return None
    return int(float(m.group(1))), (m.group(3) or None)


def harvest_directives(
    html_bytes: bytes, transport_charset: str | None = None
) -> list[tuple[str, str]]:
    """Head directives — ``("canonical", href)`` /
    ``("refresh", raw content)`` — through the same decode +
    quote-repair + parse pipeline as extraction.  Directives inside
    ``<template>`` are inert per WHATWG and never emitted."""
    text, _codec = sniff_decode(html_bytes, transport_charset)
    parser = _BlockParser()
    parser.feed(repair_unterminated_quotes(text))
    parser.close()
    return parser.directives


def harvest_license(
    html_bytes: bytes, transport_charset: str | None = None
) -> tuple[list[tuple[str, str]], list[str]]:
    """License declarations in ONE parse: ``(decls, ldjson)`` where
    ``decls`` is ordered ``(source, url)`` with source ``"link"``
    (``<link rel=license href>``) or ``"a"`` (the classic CC badge
    anchor, ``<a rel=license href>``), and ``ldjson`` is the raw
    JSON-LD island bodies (the schema.org ``license`` field lives
    with the consumer, :mod:`..functions.license`). ``rel`` is a
    token list per WHATWG §4.6.6.12; ``<template>`` contents are
    inert; href-less declarations declare nothing."""
    text, _codec = sniff_decode(html_bytes, transport_charset)
    parser = _BlockParser()
    parser.feed(repair_unterminated_quotes(text))
    parser.close()
    decls = [
        ("link" if k == "license_link" else "a", v)
        for k, v in parser.directives
        if k in ("license_link", "license_a")
    ]
    return decls, parser.ldjson


def harvest_structured(
    html_bytes: bytes, transport_charset: str | None = None
) -> tuple[list[tuple[str, str]], list[str], list[tuple[str, str]]]:
    """Structured-data surfaces through the same decode + quote-
    repair + parse pipeline as extraction:
    ``(meta_props, ldjson, microdata)`` where ``meta_props`` is
    ordered ``(key, content)`` pairs from ``<meta property=…>``
    (RDFa/Open Graph) plus ``name=description`` / ``name=twitter:*``,
    ``ldjson`` is the RAW bodies of
    ``<script type="application/ld+json">`` islands (JSON semantics
    live with the consumer, :mod:`..functions.structured`), and
    ``microdata`` is flat WHATWG-microdata ``(key, value)`` rows
    (itemscope/itemprop — the third channel).
    ``<template>`` contents are inert per WHATWG and never emitted;
    an unterminated script at EOF (truncated crawl) is dropped, not
    guessed at."""
    text, _codec = sniff_decode(html_bytes, transport_charset)
    parser = _BlockParser()
    parser.feed(repair_unterminated_quotes(text))
    parser.close()
    return parser.meta_props, parser.ldjson, parser.microdata


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
    html_bytes: bytes, cfg: ExtractConfig,
    transport_charset: str | None = None,
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

    blocks = segment_blocks(html_bytes, transport_charset)
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
