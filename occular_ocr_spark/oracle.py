"""Pure-Python golden oracle (SURVEY.md §5.1, §7.1).

A plain loop — no pandas, no Spark — over transcript rows, calling the
shared extraction core per turn.  Its output defines the contract the
distributed job must reproduce bit-for-bit: per-turn text equality under
stable ``(conv_id, turn_idx)`` ordering (BASELINE.json invariant).

This plays the role the reference's golden assertions play in
``tests/test_smoke.py:51-78`` — except the reference's neural weights are
absent from the repo (``.MISSING_LARGE_BLOBS``), so the deterministic
stand-in extractor IS the oracle.
"""

from __future__ import annotations

from typing import Dict, Iterable, List

from .extraction import core


def extract_rows(rows: Iterable[Dict], force_ocr: bool = False) -> List[Dict]:
    """Extract every turn; returns rows sorted by (conv_id, turn_idx)."""
    out: List[Dict] = []
    for row in rows:
        result = core.extract_turn(row.get("text"), force_ocr=force_ocr)
        out.append(
            {
                "conv_id": row["conv_id"],
                "turn_idx": row["turn_idx"],
                "method": result["method"],
                "blocks": result["blocks"],
                "text": result["text"],
            }
        )
    out.sort(key=lambda r: (r["conv_id"], r["turn_idx"]))
    return out


def golden_text_map(rows: Iterable[Dict], force_ocr: bool = False) -> Dict:
    """{(conv_id, turn_idx): extracted_text} — the equality target."""
    return {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in extract_rows(rows, force_ocr=force_ocr)
    }
