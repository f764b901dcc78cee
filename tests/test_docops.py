"""Concatenate / range-extraction parity and invariants."""

from __future__ import annotations

import warnings

import pytest

from tests.oracle import build_doc, reference_markdown

from docling_core_spark.corpus import gen_doc_spans
from docling_core_spark.docops import (
    concatenate_documents,
    extract_spans_range,
)
from docling_core_spark.engine import chunk_documents, synth_documents
from docling_core_spark.model.spans import doc_from_spans
from docling_core_spark.serializers.markdown import export_to_markdown

warnings.filterwarnings("ignore")

N = 8


def _engine_concat_markdown(spark, n):
    docs = synth_documents(spark, n, seed=42)
    row = concatenate_documents(docs).collect()
    assert len(row) == 1
    spans = [(s["kind"], s["text"], s["media_ref"], s["offset"])
             for s in row[0]["spans"]]
    return row[0], export_to_markdown(doc_from_spans(row[0]["doc_id"],
                                                     spans))


def test_concatenate_matches_reference_two_docs(spark):
    """Engine span-level concatenation == reference tree-level
    DoclingDocument.concatenate, judged by the serialized output.

    Limited to two documents: with more, the reference's _DocIndex
    re-referencing corrupts documents containing equal-content items
    (pydantic field-based equality aliases them during caption/cell
    remapping, document.py:5694-5710 - list items vanish, duplicate
    inline formulas merge, table captions detach). The engine keeps the
    clean semantics (order-preserving merge with page renumbering),
    which coincides with the reference wherever the reference is
    uncorrupted."""
    from docling_core.types.doc.document import DoclingDocument

    ref_docs = [build_doc(f"doc_{i:012d}", gen_doc_spans(i, seed=42))[0]
                for i in range(2)]
    merged = DoclingDocument.concatenate(ref_docs)
    row, got = _engine_concat_markdown(spark, 2)
    assert got == reference_markdown(merged)
    assert row["doc_id"] == "doc_000000000000 + doc_000000000001"


def test_concatenate_matches_clean_join(spark):
    """N-doc concatenation == the per-doc serializations joined in
    order (the uncorrupted reference semantics; see note above)."""
    expected = "\n\n".join(
        reference_markdown(build_doc(f"doc_{i:012d}",
                                     gen_doc_spans(i, seed=42))[0])
        for i in range(N))
    _, got = _engine_concat_markdown(spark, N)
    assert got == expected


def test_concatenate_page_renumbering(spark):
    docs = synth_documents(spark, 4, seed=42)
    spans = concatenate_documents(docs).collect()[0]["spans"]
    pages = [int(s["kind"].split(":")[1]) for s in spans
             if s["kind"].startswith("page_break")]
    assert pages == sorted(pages)          # monotone page numbers
    offs = [s["offset"] for s in spans]
    assert offs == sorted(set(offs))       # strictly increasing offsets


def test_concatenate_grouped(spark):
    from pyspark.sql import functions as F

    docs = synth_documents(spark, 6, seed=42)
    out = concatenate_documents(
        docs, group_col=F.expr("substring(doc_id, -1, 1) % 2"))
    assert out.count() == 2
    total = sum(len(r["spans"]) for r in out.collect())
    base = sum(len(r["spans"]) for r in docs.collect())
    assert total == base + 4  # +1 boundary break per non-first doc


def test_concatenated_chunks_flow(spark):
    docs = synth_documents(spark, 4, seed=42)
    merged = concatenate_documents(docs)
    chunks = chunk_documents(merged, mode="hier")
    assert chunks.count() > 0


@pytest.mark.parametrize("start,stop", [(0, 10), (5, 25), (3, 4)])
def test_extract_range(spark, start, stop):
    docs = synth_documents(spark, 6, seed=42)
    out = extract_spans_range(docs, start, stop).collect()
    for r in out:
        offs = [s["offset"] for s in r["spans"]]
        assert offs and min(offs) >= 0 and max(offs) < stop - start
    # full-range extraction is the identity
    full = extract_spans_range(docs, 0, 10 ** 9)
    orig = {r["doc_id"]: r["spans"] for r in docs.collect()}
    for r in full.collect():
        assert r["spans"] == orig[r["doc_id"]]


def test_extract_range_chunks_flow(spark):
    docs = synth_documents(spark, 6, seed=42)
    sub = extract_spans_range(docs, 2, 20)
    assert chunk_documents(sub, mode="hier").count() > 0


def test_split_outlier_documents(spark):
    from pyspark.sql import functions as F

    from docling_core_spark.docops import split_outlier_documents

    docs = synth_documents(spark, 30, seed=42, mega_every=10)
    sizes = {r["doc_id"]: r["n"] for r in
             docs.select("doc_id", F.size("spans").alias("n")).collect()}
    thresh = 1000
    out = split_outlier_documents(docs, span_threshold=thresh)
    rows = out.collect()
    # no sub-document dominates, small docs untouched
    n_big_in = sum(1 for v in sizes.values() if v > thresh)
    assert n_big_in >= 2
    split_ids = [r["doc_id"] for r in rows if "#p" in r["doc_id"]]
    assert split_ids
    orig = {r["doc_id"]: [tuple(s) for s in r["spans"]]
            for r in docs.collect()}
    for r in rows:
        if "#p" not in r["doc_id"]:
            assert [tuple(s) for s in r["spans"]] == orig[r["doc_id"]]
        else:
            offs = [s["offset"] for s in r["spans"]]
            assert offs == sorted(offs)
    # span conservation: every original span of split docs survives
    by_doc: dict = {}
    for r in rows:
        base = r["doc_id"].split("#")[0]
        if "#p" in r["doc_id"]:
            by_doc.setdefault(base, []).extend(
                (s["offset"]) for s in r["spans"])
    for base, offsets in by_doc.items():
        assert sorted(offsets) == [s[3] for s in
                                   sorted(orig[base], key=lambda x: x[3])]
    # the pipeline consumes the split output unchanged
    assert chunk_documents(out, mode="hier",
                           salt_partitions=8).count() > 0
