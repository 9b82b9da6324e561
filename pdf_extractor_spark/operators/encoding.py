"""P11: encoding-error scrub (reference ``error_handler.py:509-540``
``fix_encoding``).

The reference both FLAGS encoding damage and FIXES it; round 1 only
flagged (verdict item #4a). The transform:

1. strip U+FFFD replacement characters and NULs (``error_handler.py:
   520-527`` — '�' and '\\ufffd' are the same codepoint, listed twice
   in the reference);
2. decode literal ``\\xNN`` escape sequences that leaked into text
   (``error_handler.py:530-539``).

Step 1 is engine-portable (``regexp_replace`` in Spark and DuckDB);
step 2 needs a computed ``chr(int(hex, 16))`` and is kernel-only (it
runs inside the ``mapInPandas`` extraction stage; the catalog twin
covers step 1 natively and the unit tests cover step 2).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_HEX_ESCAPE_RE = re.compile(r"\\x([0-9a-fA-F]{2})")

# shared with the Spark/DuckDB twins (strip step only)
BAD_CHARS_PATTERN = r"[�\x00]"  # regex-level escape: no literal NUL in source
_BAD_CHARS_RE = re.compile(BAD_CHARS_PATTERN)


def count_bad_chars(text: str) -> int:
    """Pre-scrub damage count — drives the encoding error FLAG, which
    must fire on the damaged input, not the cleaned output. The
    membership fast path keeps the clean-document hot path (every doc
    in a 100 TB corpus passes through here) at two C-level scans
    instead of a regex findall allocation."""
    if "�" not in text and "\x00" not in text:
        return 0
    return len(_BAD_CHARS_RE.findall(text))


def fix_encoding_text(text: str) -> str:
    """Kernel twin: strip bad chars, then decode ``\\xNN`` escapes.
    Membership fast paths skip both regex passes on clean text."""
    if "�" in text or "\x00" in text:
        text = _BAD_CHARS_RE.sub("", text)
    if "\\x" in text:
        try:
            text = _HEX_ESCAPE_RE.sub(
                lambda m: chr(int(m.group(1), 16)), text
            )
        except Exception:
            # reference swallows decode failures (error_handler.py:538)
            pass
    return text


def fix_encoding_col(col: Column) -> Column:
    """Native Spark twin of the strip step (step 1)."""
    return F.regexp_replace(col, BAD_CHARS_PATTERN, "")


def duck_fix_encoding_expr(expr: str) -> str:
    """DuckDB twin of the strip step (U+FFFD only — DuckDB varchars
    cannot contain NUL)."""
    return (
        f"regexp_replace({expr}, '[' || chr(65533) || ']', '', 'g')"
    )
