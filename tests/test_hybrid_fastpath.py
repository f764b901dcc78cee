"""The O(n) fast path must be bit-identical to the reference-shaped
quadratic path for whitespace-separable tokenizers."""

from __future__ import annotations

import pytest

from docling_core_spark.chunking.hybrid import hybrid_chunk
from docling_core_spark.chunking.tokenizer import RegexTokenizer
from docling_core_spark.corpus import gen_doc_spans
from docling_core_spark.model.spans import doc_from_spans


def _doc(i, mega=None):
    spans = gen_doc_spans(i, seed=42, mega_every=mega)
    return doc_from_spans(f"doc_{i}", [
        (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans])


@pytest.mark.parametrize("i", range(80))
@pytest.mark.parametrize("max_tokens,merge", [(64, True), (64, False),
                                              (16, True), (256, True)])
def test_fast_equals_slow(i, max_tokens, merge):
    doc = _doc(i)
    tok = RegexTokenizer(max_tokens)
    fast = [c.to_row() for c in hybrid_chunk(doc, tokenizer=tok,
                                             merge_peers=merge, fast=True)]
    slow = [c.to_row() for c in hybrid_chunk(doc, tokenizer=tok,
                                             merge_peers=merge, fast=False)]
    assert fast == slow


def test_fast_equals_slow_mega():
    doc = _doc(999, mega=1000)
    tok = RegexTokenizer(64)
    fast = [c.to_row() for c in hybrid_chunk(doc, tokenizer=tok, fast=True)]
    slow = [c.to_row() for c in hybrid_chunk(doc, tokenizer=tok, fast=False)]
    assert fast == slow
