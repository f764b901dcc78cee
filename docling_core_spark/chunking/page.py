"""Page-based chunking (C10).

Re-implements PageChunker.chunk (transforms/chunker/page_chunker.py:
17-59): one chunk per page, serialized with the chunking serializer
(markdown + triplet tables, no escaping) filtered to that page; whole
document as a single chunk when no pages exist. Chunk metadata carries
no headings (page_chunker.py:43).
"""

from __future__ import annotations

from typing import List

from docling_core_spark.chunking.hierarchical import Chunk
from docling_core_spark.model.doc import Doc
from docling_core_spark.serializers.markdown import (
    MarkdownParams,
    MarkdownSerializer,
)


def _chunk_params(pages=None) -> MarkdownParams:
    # ChunkingSerializerProvider config (hierarchical_chunker.py:174-192)
    return MarkdownParams(
        image_placeholder="",
        escape_underscores=False,
        escape_html=False,
        table_mode="triplet",
        pages=pages,
    )


def _page_serializer(doc: Doc, pages=None) -> MarkdownSerializer:
    # the page filter arrives as a per-call PATCH in the reference
    # (page_chunker.py:35: serialize(pages={p})), so the base params
    # carry no pages - this drives the KV-exclusion quirk (markdown
    # serializer's unpatched get_excluded_refs call)
    return MarkdownSerializer(doc, _chunk_params(pages=pages),
                              base_params=_chunk_params())


def _doc_pages(doc: Doc) -> List[int]:
    """Sorted page numbers with any provenance (mirrors dl_doc.pages,
    which the builder populates for every prov'd item incl. furniture)."""
    pages = set()
    stack = [doc.body]
    while stack:
        n = stack.pop()
        if not n.is_group:
            pages.add(n.page_no)
        stack.extend(n.children)
    return sorted(pages)


def page_chunk(doc: Doc) -> List[Chunk]:
    """One chunk per page in ascending page order; empty pages skipped."""
    chunks: List[Chunk] = []
    pages = _doc_pages(doc)
    if pages:
        for page_no in pages:
            ser = _page_serializer(doc, pages={page_no})
            res = ser.serialize()
            if not res.text:
                continue
            chunks.append(Chunk(text=res.text, headings=None,
                                items=list(res.spans)))
    else:
        res = _page_serializer(doc).serialize()
        if res.text:
            chunks.append(Chunk(text=res.text, headings=None,
                                items=list(res.spans)))
    return chunks
