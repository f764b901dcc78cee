"""Property-based hardening: arbitrary (even malformed) span input
must never crash the codec, serializers, or chunkers, and canonical
round trips must be stable. At 10^12 docs, 1-in-a-billion inputs are
everyday occurrences - total functions only."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from docling_core_spark.chunking.hierarchical import hierarchical_chunk
from docling_core_spark.chunking.hybrid import hybrid_chunk
from docling_core_spark.chunking.page import page_chunk
from docling_core_spark.chunking.tokenizer import RegexTokenizer
from docling_core_spark.model.otsl import encode_otsl, parse_otsl
from docling_core_spark.model.spans import doc_from_spans, spans_from_doc
from docling_core_spark.serializers.doctags import export_to_doctags
from docling_core_spark.serializers.html import export_to_html
from docling_core_spark.serializers.markdown import (
    export_to_markdown,
    export_to_text,
)
from docling_core_spark.sources.doctags import doctags_to_spans

_KINDS = st.sampled_from([
    "title", "section_header:1", "section_header:9", "section_header:x",
    "text", "paragraph", "footnote", "list_group", "inline_group",
    "end_group", "list_item", "list_item:enum", "list_item:enum:1.",
    "list_item:plain:•", "code", "formula", "picture", "table",
    "chart:bar_chart", "chart:", "key_value_region", "caption:img_0",
    "caption:", "caption:missing_ref", "page_break:2", "page_break:x",
    "furniture:page_header", "furniture:", "unknown_kind", "",
    # attached-child grammar (rich cells, of_prev brackets) - the
    # round-4 splice/append paths walk these
    "text+child", "table+child", "text+fmt=b+child",
    "list_group:of_prev", "inline_group:of_prev",
    "list_group:of_prev:furniture",
])

_TEXTS = st.one_of(
    st.text(max_size=40),
    st.sampled_from([
        "", "a _b_ c", "<fcel>x<nl>", "x < y & z", "line\nbreak",
        "<ched>h<fcel>v<nl>", "<ecel><nl>", "\\sum x", "]]][[[",
        "<key_0>k<link_1></key_0><value_1>v</value_1>",
        "<key_0>k<link_99></key_0>", "<key_0>unclosed",
        "<key_0>a<childlink_0></key_0>", "<value_7><loc_3>x</value_7>",
    ]),
)

_SPAN = st.tuples(_KINDS, _TEXTS,
                  st.sampled_from(["", "img_0", "tbl_0", "ref with space"]),
                  st.integers(min_value=-5, max_value=200))


@given(st.lists(_SPAN, max_size=30))
@settings(max_examples=200, deadline=None)
def test_codec_and_serializers_total(spans):
    doc = doc_from_spans("fuzz", spans)
    # every serializer and chunker is total on whatever tree resulted
    export_to_markdown(doc)
    export_to_text(doc)
    export_to_html(doc)
    export_to_doctags(doc)
    hierarchical_chunk(doc)
    hybrid_chunk(doc, tokenizer=RegexTokenizer(16))
    page_chunk(doc)


@given(st.lists(_SPAN, max_size=30))
@settings(max_examples=100, deadline=None)
def test_canonical_round_trip_stable(spans):
    """spans -> doc -> spans' -> doc' -> spans'' : spans' == spans''
    (the canonical form is a fixed point even for malformed input)."""
    doc = doc_from_spans("fuzz", spans)
    canon = spans_from_doc(doc)
    doc2 = doc_from_spans("fuzz", [
        (s["kind"], s["text"], s["media_ref"], s["offset"])
        for s in canon])
    assert spans_from_doc(doc2) == canon
    assert export_to_markdown(doc) == export_to_markdown(doc2)


@given(st.text(alphabet="<>fcelunxrhdsow_ab123 \n", max_size=120))
@settings(max_examples=300, deadline=None)
def test_otsl_parser_total(s):
    table = parse_otsl(s)
    assert table.num_rows >= 0 and table.num_cols >= 0
    encode_otsl(table)  # re-encoding a parsed table is total too


@given(st.text(alphabet="<>/abcdetiosl_ 123\n", max_size=200))
@settings(max_examples=300, deadline=None)
def test_doctags_parser_total(s):
    spans = doctags_to_spans(s)
    offs = [sp["offset"] for sp in spans]
    assert offs == sorted(offs)


@given(st.text(max_size=200))
@settings(max_examples=500, deadline=None)
def test_token_count_arithmetic_identity(s):
    """The run-level count must equal the piece-regex count exactly
    (it defines chunk boundaries)."""
    from docling_core_spark.chunking.tokenizer import (
        _PIECE_RE,
        RegexTokenizer,
    )

    assert RegexTokenizer(64).count_tokens(s) == len(_PIECE_RE.findall(s))


@given(st.lists(_SPAN, max_size=30))
@settings(max_examples=150, deadline=None)
def test_splice_and_append_total(spans):
    """Kind-anchored splice/append never crash on arbitrary input and
    always return densely re-offset spans the codec accepts."""
    from docling_core_spark.docops import (
        py_append_child_span,
        py_splice_spans,
    )

    new = ("text", "FUZZ", "", 0)
    for anchor in (("text", "table"), ("list_group",), ("picture",)):
        for out in (
            py_splice_spans(spans, anchor, [new]),
            py_splice_spans(spans, anchor, [new], replace=True),
            py_append_child_span(spans, anchor, new),
        ):
            assert [s[3] for s in out] == list(range(len(out)))
            doc_from_spans("fuzz", out)
    out = py_append_child_span(spans, None, new)
    assert [s[3] for s in out] == list(range(len(out)))
    assert out[-1][:3] == new[:3]
