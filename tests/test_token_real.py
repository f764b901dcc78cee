"""token_counts_real: the engine's real tokenizer algorithms
(chunking/wordpiece.py) must equal the INDEPENDENT oracle
reimplementation (pyoracle: trie-based WordPiece, heap-based BPE) on
the vendored assets - including inputs far outside the corpus."""

from __future__ import annotations

import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from docling_core_spark.chunking.wordpiece import (
    BytePairCounter,
    WordPieceCounter,
)
from docling_core_spark.pyoracle import (
    _load_assets,
    build_wp_trie,
    oracle_bpe_count,
    oracle_wordpiece_count,
)

ASSETS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docling_core_spark", "assets")


@pytest.fixture(scope="module")
def counters():
    wp = WordPieceCounter.from_vocab_file(
        os.path.join(ASSETS, "wordpiece_vocab.txt"))
    bpe = BytePairCounter.from_tiktoken_file(
        os.path.join(ASSETS, "bpe_ranks.tiktoken"))
    vocab, ranks = _load_assets()
    return wp, bpe, build_wp_trie(vocab), ranks


TRICKY = [
    "",
    "   ",
    "key agg row scan slow fast table value part hash",
    "customer window column order stream",  # split-piece words
    "Table SCAN Spark",  # casing
    "café naïve Über",  # accents -> NFD strip
    "中文 mixed 汉字text",  # CJK isolation
    "a,b.c:d;e(f)g<h>i&j_k",  # punctuation splits
    "x² + y¼ = Ⅲ",  # No/Nl digits (BPE pre-split)
    "nul\x00char \x07bell �repl",  # drops
    "tab\tnl\ncr\r mix",
    "a" * 101,  # over max_chars -> [UNK]
    "a" * 100,
    "zzzzqqqq unknownword",
    "don't it's we'll I've THEY'RE",  # BPE contraction branch
    "  leading trailing  ",
    "İstanbul",  # dotted capital I lowercasing
    "123 4567 12345",
]


def test_wordpiece_engine_equals_oracle(counters):
    wp, _, tries, _ = counters
    for text in TRICKY:
        assert wp.count_tokens(text) == oracle_wordpiece_count(
            text, tries), repr(text)


def test_bpe_engine_equals_oracle(counters):
    _, bpe, _, ranks = counters
    for text in TRICKY:
        assert bpe.count_tokens(text) == oracle_bpe_count(
            text, ranks), repr(text)


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=60))
def test_wordpiece_fuzz(text):
    wp = WordPieceCounter.from_vocab_file(
        os.path.join(ASSETS, "wordpiece_vocab.txt"))
    vocab, _ = _load_assets()
    assert wp.count_tokens(text) == oracle_wordpiece_count(
        text, build_wp_trie(vocab))


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=60))
def test_bpe_fuzz(text):
    bpe = BytePairCounter.from_tiktoken_file(
        os.path.join(ASSETS, "bpe_ranks.tiktoken"))
    _, ranks = _load_assets()
    assert bpe.count_tokens(text) == oracle_bpe_count(text, ranks)


def test_counts_are_not_degenerate(counters):
    """The vendored vocab must actually exercise subword splitting:
    corpus words designed as stem+continuation count 2, whole words 1,
    and nothing collapses to a single [UNK] per document."""
    wp, bpe, _, _ = counters
    assert wp.count_tokens("customer") == 1  # whole-word vocab entry
    assert wp.count_tokens("table") == 2     # tab|##le greedy split
    assert wp.count_tokens("zzzzqqqq") == 8  # char-level fallback
    assert wp.count_tokens("ξξξ") == 1       # no vocab path -> [UNK]
    assert bpe.count_tokens("table scan") < len("table scan")
