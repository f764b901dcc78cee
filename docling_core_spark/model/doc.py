"""Lightweight in-memory document tree.

Re-expresses the reference's pooled, RefItem-linked ``DoclingDocument``
(docling_core/types/doc/document.py:1954) as a plain-Python tree built
per row inside a pandas UDF. There is no JSON-pointer indirection: a
node holds direct child references; identity for parity bookkeeping is
the span ``offset`` the node came from.

Reproduced behaviors (cites are reference file:line for parity review):
* depth-first traversal with content-layer filter and picture-children
  skip (document.py:4062-4149)
* caption linkage: floating items (table/picture/code) reference their
  caption text items, which are suppressed as standalone items during
  serialization (serializer/common.py:224-237, 340-343)
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Tuple

# content layers (document.py:928-938); default export layer is BODY
LAYER_BODY = "body"
LAYER_FURNITURE = "furniture"

# page geometry convention: the span schema carries no bboxes, so every
# item gets a deterministic synthetic provenance derived from its span
# offset (same formula in the test oracle's DoclingDocument builder) -
# this keeps doctags <loc_*> quantization a real, checkable computation
PAGE_W = 612.0
PAGE_H = 792.0


def node_bbox(offset: int):
    """(l, t, r, b) TOPLEFT bbox, pure function of the span offset."""
    off = max(offset, 0)
    l = float((off * 37) % 512)
    t = float((off * 53) % 704)
    return (l, t, l + 40.0 + (off % 60), t + 14.0)

# node kinds (maps to reference labels / group types)
K_BODY = "body"
K_LIST_GROUP = "list_group"
K_INLINE_GROUP = "inline_group"
K_TITLE = "title"
K_SECTION_HEADER = "section_header"
K_TEXT = "text"
K_LIST_ITEM = "list_item"
K_CODE = "code"
K_FORMULA = "formula"
K_PICTURE = "picture"
K_TABLE = "table"
K_CAPTION = "caption"
K_KEY_VALUE = "key_value_region"
K_FORM = "form"

# plain-text labels beyond text/paragraph that ride on K_TEXT nodes
TEXTUAL_LABELS = ("text", "paragraph", "footnote", "checkbox_selected",
                  "checkbox_unselected", "document_index", "reference")

GROUP_KINDS = (K_BODY, K_LIST_GROUP, K_INLINE_GROUP)
# kinds the serializer treats as floating items w/ captions
FLOATING_KINDS = (K_PICTURE, K_TABLE, K_CODE)
TEXT_KINDS = (K_TITLE, K_SECTION_HEADER, K_TEXT, K_LIST_ITEM, K_CODE,
              K_FORMULA, K_CAPTION)


class Node:
    """One document tree node (NodeItem analogue, document.py:941-950)."""

    __slots__ = (
        "kind", "label", "level", "text", "media_ref", "marker",
        "enumerated", "offset", "children", "parent", "captions",
        "page_no", "layer", "orig", "chart_class", "fmt", "hyperlink",
        "code_language", "pic_anns", "image",
    )

    def __init__(
        self,
        kind: str,
        text: str = "",
        media_ref: str = "",
        offset: int = -1,
        level: int = 1,
        marker: str = "",
        enumerated: bool = False,
        layer: str = LAYER_BODY,
        page_no: int = 1,
        label: Optional[str] = None,
        orig: str = "",
        chart_class: str = "",
        fmt: str = "",
        hyperlink: str = "",
        code_language: str = "unknown",
        pic_anns: Optional[List] = None,
        image: Optional[dict] = None,
    ) -> None:
        self.kind = kind
        self.label = label if label is not None else kind
        self.level = level
        self.text = text
        self.media_ref = media_ref
        self.marker = marker
        self.enumerated = enumerated
        self.offset = offset
        self.children: List[Node] = []
        self.parent: Optional[Node] = None
        self.captions: List[Node] = []  # caption nodes owned by this floating item
        self.page_no = page_no
        self.layer = layer
        self.orig = orig
        # charts: a picture node carrying a classification + tabular
        # chart data (OTSL in .text), cf. PictureClassificationData /
        # PictureTabularChartData annotations (document.py:5062-5161)
        self.chart_class = chart_class
        # E8 text formatting (document.py:1165-1172): flag string with
        # b=bold i=italic u=underline s=strikethrough p=superscript
        # q=subscript; hyperlink is the raw URL ("" = none)
        self.fmt = fmt
        self.hyperlink = hyperlink
        # CodeItem.code_language (document.py:1350, labels.py:203)
        self.code_language = code_language
        # picture annotations beyond classification: ordered
        # (kind, value) pairs with kind in {"desc", "smiles"} -
        # DescriptionAnnotation.text / PictureMoleculeData.smi
        # (document.py:120-139)
        self.pic_anns: List = pic_anns or []
        # ImageRef analogue (document.py:798-862): dict with mimetype
        # (str), dpi (int), size {width, height} (floats), uri (str:
        # data URI, file path, or URL); None = picture data lives in
        # the media table only (referenced by media_ref)
        self.image: Optional[dict] = image

    # --- tree helpers -------------------------------------------------
    def add_child(self, child: "Node") -> "Node":
        child.parent = self
        self.children.append(child)
        return child

    @property
    def is_group(self) -> bool:
        return self.kind in GROUP_KINDS

    def first_item_is_enumerated(self) -> bool:
        """ListGroup.first_item_is_enumerated (document.py:1060-1069)."""
        if self.children:
            c = self.children[0]
            if c.kind == K_LIST_ITEM:
                return c.enumerated
        return False

    def __repr__(self) -> str:  # pragma: no cover - debug only
        return f"Node({self.kind!r}, off={self.offset}, text={self.text[:20]!r})"


class Doc:
    """One document: a body tree plus caption back-links.

    ``iterate_items`` mirrors DoclingDocument.iterate_items semantics
    (document.py:4062-4149): pre-order DFS, groups yielded only when
    ``with_groups``, content-layer filter, children of pictures skipped
    unless they are the picture's own captions.
    """

    __slots__ = ("doc_id", "body", "caption_owner", "origin")

    def __init__(self, doc_id: str = "") -> None:
        self.doc_id = doc_id
        self.body = Node(K_BODY)
        # node -> owning floating node, for caption suppression
        self.caption_owner: dict = {}
        # DocumentOrigin analogue (document.py:709-762): dict with
        # mimetype (str), binary_hash (int, uint64 range), filename
        # (str), uri (str | None); None when the source carried none.
        # Chunk rows carry it as DocMeta.origin does
        # (hierarchical_chunker.py:85-88)
        self.origin: dict | None = None

    def iterate_items(
        self,
        root: Optional[Node] = None,
        with_groups: bool = False,
        layers: Tuple[str, ...] = (LAYER_BODY,),
        page_no: Optional[int] = None,
        traverse_pictures: bool = False,
    ) -> Iterator[Tuple[Node, int]]:
        """Pre-order DFS yielding (node, level). Iterative (no recursion
        limit risk; cf. SURVEY §4.2 hazard 2)."""
        start = root if root is not None else self.body
        # stack of (node, level, yielded_flag) entries; emulate the
        # recursive generator in document.py:4081-4149
        stack: List[Tuple[Node, int]] = [(start, 0)]
        while stack:
            node, lvl = stack.pop()
            should_yield = (
                (not node.is_group or with_groups)
                and node.layer in layers
                and (page_no is None or node.kind in GROUP_KINDS
                     or node.page_no == page_no)
            )
            if should_yield:
                yield node, lvl
            kids = node.children
            if node.kind == K_PICTURE and not traverse_pictures:
                # skip picture children except its own captions
                # (document.py:4124-4136)
                allowed = set(id(c) for c in node.captions)
                kids = [c for c in kids if id(c) in allowed]
            for c in reversed(kids):
                stack.append((c, lvl + 1))

    def captions_of_some_item(self) -> set:
        """ids of nodes that caption a floating item
        (serializer/common.py:224-237)."""
        return set(self.caption_owner.keys())
