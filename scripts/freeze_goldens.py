"""Freeze golden extraction outputs for the fixture corpus.

Run ONCE per intentional semantics change (FIXTURES.md: goldens are
frozen and then enforced with byte equality). Writes per-case:

    tests/golden/<case_id>.txt        extracted text (UTF-8, byte-exact)
    tests/golden/<case_id>.spans.json span offsets + branch + quality

Usage:  python scripts/freeze_goldens.py
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pdf_extractor_spark.fixtures.corpus import fixture_cases  # noqa: E402
from pdf_extractor_spark.operators.document import extract_document  # noqa: E402

GOLDEN_DIR = pathlib.Path(__file__).resolve().parents[1] / "tests" / "golden"


def main() -> None:
    GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
    for cid, branch, _lang, payload in fixture_cases():
        rec = extract_document(payload)
        (GOLDEN_DIR / f"{cid}.txt").write_bytes(
            rec["extracted_text"].encode("utf-8")
        )
        meta = {
            "branch": rec["branch"],
            "spans": [list(s) for s in rec["spans"]],
            "quality": rec["quality"],
            "n_pages": rec["n_pages"],
            "error_types": sorted({e["type"] for e in rec["errors"]}),
        }
        (GOLDEN_DIR / f"{cid}.spans.json").write_text(
            json.dumps(meta, ensure_ascii=False, indent=1, sort_keys=True)
        )
        print(f"froze {cid}: {len(rec['extracted_text'])} chars, "
              f"{len(rec['spans'])} spans")


if __name__ == "__main__":
    main()
