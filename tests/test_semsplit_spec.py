"""C7 semantic-splitter spec tests.

semsplit plays the role of the external ``semchunk`` package in the
reference's oversized-chunk path (hybrid_chunker.py:220-247). The
package cannot run here, so instead of comparing implementation-to-
implementation these tests pin the CONTRACT the splitter must satisfy
(the published semchunk semantics): budget compliance, losslessness
modulo split whitespace, most-meaningful-boundary preference, greedy
re-merging, oversized-singleton handling - under both the separable
fast path and the generic path, with both the regex tokenizer and a
real (non-separable) WordPiece counter.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from docling_core_spark.chunking.semsplit import recursive_split
from docling_core_spark.chunking.tokenizer import RegexTokenizer
from docling_core_spark.chunking.wordpiece import WordPieceCounter

TOK = RegexTokenizer()
WP = WordPieceCounter(
    ["[PAD]", "[UNK]", "data", "pipe", "##line", "the", "a", "b",
     "##c", ".", ",", "!", "·", "word", "##s", "split", "##ter"],
    max_tokens=8)


def _ws_free(s: str) -> str:
    return "".join(s.split())


def _check_basic(text: str, max_tokens: int, pieces, count) -> None:
    # budget respected (single chars count 1, so always achievable)
    for p in pieces:
        assert count(p) <= max_tokens, (p, count(p), max_tokens)
    # non-empty pieces, order + content preserved modulo separators
    assert all(p for p in pieces)
    assert _ws_free("".join(pieces)) == _ws_free(text)


@given(st.text(alphabet=" \n\t.,;ab cdefgh", min_size=0, max_size=400),
       st.integers(min_value=1, max_value=30))
@settings(max_examples=200, deadline=None)
def test_property_budget_and_lossless_regex(text, max_tokens):
    pieces = recursive_split(text, max_tokens, TOK.count_tokens,
                             separable=True)
    _check_basic(text, max_tokens, pieces, TOK.count_tokens)


@given(st.text(alphabet=" \n\t.,;ab cdefgh", min_size=0, max_size=400),
       st.integers(min_value=1, max_value=30))
@settings(max_examples=200, deadline=None)
def test_property_separable_paths_identical(text, max_tokens):
    """The O(n) separable fast path must output EXACTLY what the
    generic reference-shaped path outputs for a separable counter."""
    fast = recursive_split(text, max_tokens, TOK.count_tokens,
                           separable=True)
    slow = recursive_split(text, max_tokens, TOK.count_tokens,
                           separable=False)
    assert fast == slow


@given(st.text(alphabet=" \ndata pipeline words the splitter.,!",
               min_size=0, max_size=300),
       st.integers(min_value=1, max_value=20))
@settings(max_examples=150, deadline=None)
def test_property_budget_wordpiece(text, max_tokens):
    """Non-separable real tokenizer through the generic path."""
    pieces = recursive_split(text, max_tokens, WP.count_tokens,
                             separable=False)
    for p in pieces:
        assert WP.count_tokens(p) <= max_tokens
    assert all(p for p in pieces)
    assert _ws_free("".join(pieces)) == _ws_free(text)


def test_paragraph_boundary_preferred():
    a = "alpha beta gamma delta"
    b = "epsilon zeta eta theta"
    text = a + "\n\n" + b
    n = TOK.count_tokens(a)
    assert recursive_split(text, n, TOK.count_tokens) == [a, b]
    # a weaker budget splits INSIDE the halves, but never produces a
    # piece spanning the paragraph break
    for p in recursive_split(text, 2, TOK.count_tokens):
        assert "\n\n" not in p


def test_newline_beats_sentence_punctuation():
    text = "one. two. three\nfour. five. six"
    pieces = recursive_split(text, TOK.count_tokens("one. two. three"),
                             TOK.count_tokens)
    assert pieces == ["one. two. three", "four. five. six"]


def test_sentence_split_keeps_punctuation_attached():
    """Punctuation splitters fire only on whitespace-free text (the
    whitespace classes outrank them) and keep the punctuation attached
    to the preceding piece - fully lossless."""
    text = "aaaa.bbbb.cccc.dddd"
    pieces = recursive_split(text, 3, TOK.count_tokens)
    assert "".join(pieces) == text  # non-ws splitter: byte lossless
    assert all(TOK.count_tokens(p) <= 3 for p in pieces)
    assert pieces[0].endswith(".")


def test_greedy_merge_flat_level():
    """Adjacent level-1 pieces that fit together must be merged (the
    semchunk re-merge rule): no two neighbors both inside one budget."""
    text = "aa\nbb\ncc\ndd\nee\nff"
    pieces = recursive_split(text, 4, TOK.count_tokens)
    _check_basic(text, 4, pieces, TOK.count_tokens)
    for x, y in zip(pieces, pieces[1:]):
        assert TOK.count_tokens(x + "\n" + y) > 4, (x, y)


def test_oversized_single_token_hard_cut():
    word = "x" * 200  # regex counts ceil(200/4)=50
    pieces = recursive_split(word, 5, TOK.count_tokens)
    assert "".join(pieces) == word
    assert all(TOK.count_tokens(p) <= 5 for p in pieces)


def test_within_budget_passthrough():
    assert recursive_split("short text", 100, TOK.count_tokens) \
        == ["short text"]
    assert recursive_split("", 10, TOK.count_tokens) == []


def test_whitespace_runs_longest_wins():
    # the 3-newline run outranks single newlines
    text = "a\nb\n\n\nc\nd"
    pieces = recursive_split(text, TOK.count_tokens("a\nb"),
                             TOK.count_tokens)
    assert pieces[0] == "a\nb"
    assert pieces[-1] == "c\nd"
