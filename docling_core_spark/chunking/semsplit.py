"""Recursive plain-text splitter for oversized chunks.

Plays the role of the external ``semchunk`` dependency in the reference
(hybrid_chunker.py:220-247): split text that exceeds the token budget at
the most meaningful boundary present, recursing into still-oversized
pieces and greedily re-merging adjacent pieces that fit together.

This is a from-scratch implementation of the same idea (hierarchical
delimiter descent: paragraph breaks > newlines > tabs > whitespace >
sentence punctuation > any punctuation > hard cut). It is shared by the
Spark engine and the test oracle, so chunk parity does not depend on the
external package's exact internals.
"""

from __future__ import annotations

import re
from typing import Callable, List, Tuple

_WS_RUNS = [
    re.compile(r"\n+"),
    re.compile(r"\r+"),
    re.compile(r"\t+"),
    re.compile(r"\s+"),
]
_NON_WS_SPLITTERS = [". ", "? ", "! ", "; ", ": ", ", ",
                     ".", "?", "!", ";", ":", ","]


def _pick_splitter(text: str) -> Tuple[str, bool]:
    """Return (splitter, is_whitespace). Longest run wins within each
    whitespace class; first present non-whitespace splitter otherwise."""
    for rx in _WS_RUNS:
        runs = rx.findall(text)
        if runs:
            return max(runs, key=len), True
    for s in _NON_WS_SPLITTERS:
        if s in text:
            return s, False
    return "", False  # no splitter: hard character cut


def recursive_split(text: str, max_tokens: int,
                    count_tokens: Callable[[str], int]) -> List[str]:
    """Split ``text`` into pieces each counting <= max_tokens (best
    effort; a single token longer than the budget passes through)."""
    if count_tokens(text) <= max_tokens:
        return [text] if text else []

    splitter, is_ws = _pick_splitter(text)
    if not splitter:
        # hard cut: bisect by characters
        mid = len(text) // 2
        if mid == 0:
            return [text]
        return (recursive_split(text[:mid], max_tokens, count_tokens)
                + recursive_split(text[mid:], max_tokens, count_tokens))

    if is_ws:
        raw = text.split(splitter)
        joiner = splitter
    else:
        # keep the splitter attached to the preceding piece
        raw = []
        parts = text.split(splitter)
        for i, p in enumerate(parts):
            raw.append(p + splitter if i < len(parts) - 1 else p)
        joiner = ""

    # greedy merge of adjacent pieces while the merged piece fits
    merged: List[str] = []
    cur = ""
    for piece in raw:
        if not piece:
            continue
        cand = cur + joiner + piece if cur else piece
        if count_tokens(cand) <= max_tokens:
            cur = cand
        else:
            if cur:
                merged.append(cur)
            cur = piece
    if cur:
        merged.append(cur)

    if len(merged) == 1 and merged[0] == text:
        # no progress possible with this splitter: hard character cut
        mid = len(text) // 2
        if mid == 0:
            return [text]
        return (recursive_split(text[:mid], max_tokens, count_tokens)
                + recursive_split(text[mid:], max_tokens, count_tokens))

    out: List[str] = []
    for m in merged:
        if count_tokens(m) <= max_tokens:
            out.append(m)
        else:
            out.extend(recursive_split(m, max_tokens, count_tokens))
    return out
