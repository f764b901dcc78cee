"""Hierarchical (layout-driven) chunking.

Re-implements HierarchicalChunker.chunk
(transforms/chunker/hierarchical_chunker.py:195-261): depth-first walk
with a running heading-by-level state machine (deeper levels evicted
when a shallower heading updates), one chunk per unvisited list/inline
group or doc item, serialized with the chunking serializer (markdown +
triplet tables, no escaping).
"""

from __future__ import annotations

from typing import List, Optional

from docling_core_spark.model.doc import (
    K_BODY,
    K_SECTION_HEADER,
    K_TITLE,
    Doc,
)
from docling_core_spark.serializers.markdown import chunking_serializer

DFLT_DELIM = "\n"  # chunker/base.py:16


class Chunk:
    """DocChunk analogue: text + heading path + contributing doc items
    (kept as tree nodes so the hybrid chunker can re-serialize windows;
    ``offsets`` exposes their span offsets for output rows)."""

    __slots__ = ("text", "headings", "items")

    def __init__(self, text: str, headings: Optional[List[str]],
                 items: list) -> None:
        self.text = text
        self.headings = headings
        self.items = items

    @property
    def offsets(self) -> List[int]:
        return [n.offset for n in self.items]

    def to_row(self) -> tuple:
        return (self.text, self.headings, self.offsets)

    def __repr__(self) -> str:  # pragma: no cover
        return f"Chunk({self.text[:30]!r}, {self.headings}, {self.offsets})"


def contextualize(chunk: Chunk, delim: str = DFLT_DELIM) -> str:
    """Embed-ready string: headings + text (chunker/base.py:69-96; only
    the non-excluded meta key ``headings`` contributes)."""
    items: List[str] = []
    if chunk.headings:
        items.append(delim.join(chunk.headings))
    items.append(chunk.text)
    return delim.join(items)


def hierarchical_chunk(doc: Doc, ser=None) -> List[Chunk]:
    """One pass over the document tree; returns chunks in reading order.

    Mirrors hierarchical_chunker.py:211-261 exactly:
    * headings update state and emit nothing
    * heading eviction: levels > current removed (232-240)
    * each unvisited group/doc item serialized (visited set shared with
      the serializer so group members are consumed once)
    * empty-text and empty-doc-items chunks skipped (249-252)
    """
    if ser is None:
        ser = chunking_serializer(doc)
    heading_by_level: dict = {}
    visited: set = set()
    excluded = ser.get_excluded_refs()
    chunks: List[Chunk] = []

    for node, _lvl in doc.iterate_items(with_groups=True):
        if node.kind == K_BODY:
            continue
        if id(node) in excluded:
            continue
        if node.kind in (K_TITLE, K_SECTION_HEADER):
            level = node.level if node.kind == K_SECTION_HEADER else 0
            heading_by_level[level] = node.text
            for k in [k for k in heading_by_level if k > level]:
                heading_by_level.pop(k, None)
            continue
        if node.is_group and node.kind not in ("list_group", "inline_group"):
            continue
        if id(node) in visited:
            continue
        ser_res = ser.serialize(node=node, visited=visited)
        if not ser_res.text:
            continue
        if ser_res.spans:
            headings = [heading_by_level[k]
                        for k in sorted(heading_by_level)] or None
            chunks.append(Chunk(
                text=ser_res.text,
                headings=headings,
                items=list(ser_res.spans),
            ))
    return chunks
