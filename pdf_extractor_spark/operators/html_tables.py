"""HTML table extraction: markup → structured (row, col, cell) grids.

Web tables are a first-class extraction target (the body-text
extractor deliberately treats them as layout noise; a training
pipeline wants them as DATA).  This is a dedicated streaming parse —
one pass, a stack of open tables — because real table markup is
defined by its omissions: ``</td>`` and ``</tr>`` are optional per
WHATWG (a new ``td``/``tr``/``table`` end implies them), ``thead`` /
``tbody`` / ``tfoot`` wrappers may or may not appear, ``colspan``
shifts column indices, and tables nest (the nested table is its OWN
table; its content must not leak into the parent cell's text).

Cell coordinates are (row_idx, col_idx) with col_idx advanced by the
preceding cells' colspan; ``is_header`` marks ``th`` cells.  Caption
text, inter-cell whitespace, and script/style payloads inside cells
are dropped.  An unterminated table at EOF (truncated crawl) emits
the rows parsed so far — salvage, never silence.

Table indices are assigned in OPEN order (document order of the
``<table>`` start tags), so a nested table's index is greater than
its parent's regardless of which closes first.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

from .html_extract import repair_unterminated_quotes, sniff_decode

_WS_RE = re.compile(r"\s+")


@dataclass
class TableCell:
    text: str
    is_header: bool
    colspan: int


@dataclass
class _Ctx:
    index: int
    rows: list[list[TableCell]] = field(default_factory=list)
    cur_row: list[TableCell] | None = None
    cell_buf: list[str] | None = None
    cell_header: bool = False
    cell_span: int = 1


class _TableParser(HTMLParser):
    CDATA_CONTENT_ELEMENTS = ("script", "style")

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.stack: list[_Ctx] = []
        self._next_index = 0
        self._skip_depth = 0
        # emitted rows: (table_idx, row_idx, col_idx, is_header, text)
        self.cells: list[tuple[int, int, int, bool, str]] = []

    # -- cell/row lifecycle (implied ends) ---------------------------
    def _close_cell(self) -> None:
        ctx = self.stack[-1]
        if ctx.cell_buf is None:
            return
        text = _WS_RE.sub(" ", "".join(ctx.cell_buf)).strip()
        if ctx.cur_row is None:
            ctx.cur_row = []
        ctx.cur_row.append(
            TableCell(text, ctx.cell_header, ctx.cell_span)
        )
        ctx.cell_buf = None

    def _close_row(self) -> None:
        ctx = self.stack[-1]
        self._close_cell()
        if ctx.cur_row:
            ctx.rows.append(ctx.cur_row)
        ctx.cur_row = None

    # -- parser hooks -------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in ("script", "style"):
            self._skip_depth += 1
            return
        if tag == "table":
            self.stack.append(_Ctx(index=self._next_index))
            self._next_index += 1
            return
        if not self.stack:
            return
        if tag == "tr":
            self._close_row()
            self.stack[-1].cur_row = []
        elif tag in ("td", "th"):
            ctx = self.stack[-1]
            self._close_cell()
            if ctx.cur_row is None:
                ctx.cur_row = []  # td without tr: imply the row
            span = 1
            for k, v in attrs:
                if k == "colspan" and v is not None:
                    try:
                        span = max(1, int(v))
                    except ValueError:
                        span = 1
                    break
            ctx.cell_buf = []
            ctx.cell_header = tag == "th"
            ctx.cell_span = span

    def handle_endtag(self, tag):
        if tag in ("script", "style"):
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if not self.stack:
            return
        if tag in ("td", "th"):
            self._close_cell()
        elif tag == "tr":
            self._close_row()
        elif tag == "table":
            ctx = self.stack.pop()
            # _close_row works on stack top — do it manually for the
            # popped ctx
            if ctx.cell_buf is not None:
                text = _WS_RE.sub(" ", "".join(ctx.cell_buf)).strip()
                if ctx.cur_row is None:
                    ctx.cur_row = []
                ctx.cur_row.append(
                    TableCell(text, ctx.cell_header, ctx.cell_span)
                )
            if ctx.cur_row:
                ctx.rows.append(ctx.cur_row)
            for r, row in enumerate(ctx.rows):
                col = 0
                for cell in row:
                    self.cells.append(
                        (ctx.index, r, col, cell.is_header, cell.text)
                    )
                    col += max(1, cell.colspan)

    def handle_data(self, data):
        if self._skip_depth or not self.stack:
            return
        ctx = self.stack[-1]
        if ctx.cell_buf is not None:
            ctx.cell_buf.append(data)

    def close(self):
        super().close()
        # truncated crawl: unterminated tables emit what they have,
        # innermost first (open order still identifies them)
        while self.stack:
            self.handle_endtag("table")


def extract_tables(
    html_bytes: bytes, transport_charset: str | None = None
) -> list[tuple[int, int, int, bool, str]]:
    """(table_idx, row_idx, col_idx, is_header, text) cells through
    the same decode + quote-repair pipeline as extraction."""
    text, _codec = sniff_decode(html_bytes, transport_charset)
    parser = _TableParser()
    parser.feed(repair_unterminated_quotes(text))
    parser.close()
    return parser.cells
