"""Test oracle: run the actual reference library on span-encoded docs.

Builds a real ``DoclingDocument`` from a span sequence (the same codec
contract as docling_core_spark.model.spans) and runs the reference's own
chunkers/serializers on it. Parity tests then assert that this engine
produces identical chunks/exports for the same spans.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import tests.refstubs  # noqa: F401  (must precede docling_core imports)

from docling_core.types.doc.base import BoundingBox, Size
from docling_core.types.doc.document import (
    ContentLayer,
    DoclingDocument,
    ProvenanceItem,
)
from docling_core.types.doc.labels import DocItemLabel
from docling_core.types.doc.utils import parse_otsl_table_content
from docling_core.types.doc.document import TableData

from docling_core_spark.chunking.tokenizer import RegexTokenizer

import re as _re

_RICH_MARK = _re.compile(r"^<rich_(\d+)>$")

# Workaround for pydantic>=2.13 strictness: the reference calls
# add_page(metadata=None) in load_from_doctags (document.py:4977) but
# PageItem.metadata only accepts a dict.
_orig_add_page = DoclingDocument.add_page


def _add_page_fixed(self, page_no, size, image=None, metadata=None):
    return _orig_add_page(self, page_no=page_no, size=size, image=image,
                          metadata=metadata or {})


DoclingDocument.add_page = _add_page_fixed


def build_doc(doc_id: str, spans: List[dict]) -> Tuple[DoclingDocument, Dict[str, int]]:
    """spans -> DoclingDocument + (self_ref -> span offset) map."""
    doc = DoclingDocument(name=doc_id)
    ref_to_offset: Dict[str, int] = {}
    container = doc.body
    group_stack: list = []
    last_item = None  # target for ":of_prev" child groups
    page = 1
    pages_seen = set()
    floating_by_ref: dict = {}
    pending_captions: dict = {}

    from docling_core.types.doc.base import CoordOrigin

    from docling_core_spark.model.doc import PAGE_H, PAGE_W, node_bbox

    def prov(offset: int, text: str = "") -> ProvenanceItem:
        pages_seen.add(page)
        l, t, r, b = node_bbox(offset)
        return ProvenanceItem(
            page_no=page,
            bbox=BoundingBox(l=l, t=t, r=r, b=b,
                             coord_origin=CoordOrigin.TOPLEFT),
            charspan=(0, len(text)),
        )

    from docling_core.types.doc.document import Formatting, Script

    def _parse_fmt(flags: str) -> Formatting:
        return Formatting(
            bold="b" in flags, italic="i" in flags,
            underline="u" in flags, strikethrough="s" in flags,
            script=(Script.SUB if "q" in flags
                    else Script.SUPER if "p" in flags
                    else Script.BASELINE))

    rich_fixups: list = []  # (table_item, cell_index, child_index)
    for span in sorted(spans, key=lambda s: s["offset"]):
        kind = span["kind"]
        text = span.get("text") or ""
        media_ref = span.get("media_ref") or ""
        offset = span["offset"]
        # E8 codec extension: "<kind>+fmt=<flags>" + hyperlink riding in
        # media_ref for textual kinds
        formatting = None
        hyperlink = None
        as_child = kind.endswith("+child")
        if as_child:
            kind = kind[:-len("+child")]
        if "+fmt=" in kind:
            kind, flags = kind.split("+fmt=", 1)
            formatting = _parse_fmt(flags)
        # "+child": attach to the container's last non-group item
        # (rich-table cell targets)
        item_parent = container
        if as_child and container.children:
            cand = container.children[-1].resolve(doc)
            from docling_core.types.doc.document import GroupItem
            if not isinstance(cand, GroupItem):
                item_parent = cand
        if media_ref and (
                kind == "title" or kind.startswith("section_header")
                or kind.startswith("list_item")
                or kind in ("text", "paragraph", "footnote",
                            "checkbox_selected", "checkbox_unselected",
                            "document_index", "reference")):
            hyperlink = media_ref
            media_ref = ""
        item = None
        if kind.startswith("origin"):
            from docling_core.types.doc.document import DocumentOrigin

            parts = kind.split(":", 2)
            doc.origin = DocumentOrigin(
                mimetype=media_ref or "application/pdf",
                binary_hash=int(parts[1]) if len(parts) > 1 else 0,
                filename=text,
                uri=parts[2] if len(parts) > 2 else None)
            continue
        if kind == "end_group":
            if group_stack:
                group_stack.pop()
                container = group_stack[-1] if group_stack else doc.body
            continue
        elif kind.startswith("page_break"):
            try:
                page = int(kind.split(":", 1)[1])
            except (IndexError, ValueError):
                page += 1
            continue
        elif kind.split(":", 1)[0] in ("list_group", "inline_group"):
            from docling_core.types.doc.document import GroupItem

            flags = kind.split(":")[1:]
            parent = container
            if "of_prev" in flags and container.children:
                cand = container.children[-1].resolve(doc)
                if not isinstance(cand, GroupItem):
                    parent = cand
            layer = (ContentLayer.FURNITURE if "furniture" in flags
                     else ContentLayer.BODY)
            if kind.startswith("list_group"):
                item = doc.add_list_group(parent=parent,
                                          content_layer=layer)
            else:
                item = doc.add_inline_group(parent=parent,
                                            content_layer=layer)
            group_stack.append(item)
            container = item
        elif kind == "title":
            item = doc.add_title(text=text, parent=item_parent,
                                 prov=prov(offset, text),
                                 formatting=formatting, hyperlink=hyperlink)
        elif kind.startswith("section_header"):
            try:
                lvl = int(kind.split(":", 1)[1])
            except (IndexError, ValueError):
                lvl = 1
            item = doc.add_heading(text=text, level=lvl, parent=item_parent,
                                   prov=prov(offset, text),
                                   formatting=formatting,
                                   hyperlink=hyperlink)
        elif kind in ("text", "paragraph", "footnote", "checkbox_selected",
                      "checkbox_unselected", "document_index", "reference"):
            item = doc.add_text(label=DocItemLabel(kind), text=text,
                                parent=item_parent, prov=prov(offset, text),
                                formatting=formatting, hyperlink=hyperlink)
        elif kind.startswith("list_item"):
            parts = kind.split(":", 2)
            enumerated = len(parts) > 1 and parts[1] == "enum"
            marker = parts[2] if len(parts) > 2 else ""
            item = doc.add_list_item(text=text, enumerated=enumerated,
                                     marker=marker or None, parent=item_parent,
                                     prov=prov(offset, text),
                                     formatting=formatting,
                                     hyperlink=hyperlink)
        elif kind == "code" or kind.startswith("code:"):
            from docling_core.types.doc.labels import CodeLanguageLabel

            lang = kind.split(":", 1)[1] if ":" in kind else None
            item = doc.add_code(
                text=text, parent=item_parent, prov=prov(offset, text),
                code_language=CodeLanguageLabel(lang) if lang else None,
                formatting=formatting)
            if media_ref:
                floating_by_ref[media_ref] = item
        elif kind == "formula":
            item = doc.add_formula(text=text, parent=item_parent,
                                   prov=prov(offset, text))
            if media_ref:  # codec: media_ref carries "orig present" flag
                item.orig = media_ref
        elif kind == "picture":
            item = doc.add_picture(parent=item_parent, prov=prov(offset))
            from docling_core.types.doc.document import (
                DescriptionAnnotation,
                PictureMoleculeData,
            )

            from docling_core_spark.model.spans import parse_pic_anns

            for ak, av in parse_pic_anns(text):
                if ak == "desc":
                    item.annotations.append(DescriptionAnnotation(
                        text=av, provenance="synthetic"))
                elif ak == "smiles":
                    item.annotations.append(PictureMoleculeData(
                        smi=av, confidence=1.0,
                        class_name="chemistry_molecular_structure",
                        segmentation=[], provenance="synthetic"))
            if media_ref:
                floating_by_ref[media_ref] = item
        elif kind == "table":
            from docling_core.types.doc.document import (
                DescriptionAnnotation,
            )

            from docling_core_spark.model.spans import split_table_anns

            otsl_text, t_anns = split_table_anns(text)
            data = (parse_otsl_table_content(otsl_text) if otsl_text
                    else TableData(num_rows=0, num_cols=0, table_cells=[]))
            _apply_otsl_header_flags(otsl_text, data)
            item = doc.add_table(data=data, parent=item_parent, prov=prov(offset))
            for ci, cell in enumerate(item.data.table_cells):
                m = _RICH_MARK.fullmatch(cell.text or "")
                if m is not None:
                    rich_fixups.append((item, ci, int(m.group(1))))
            for _ak, av in t_anns:
                item.annotations.append(DescriptionAnnotation(
                    text=av, provenance="synthetic"))
            if media_ref:
                floating_by_ref[media_ref] = item
        elif kind.startswith("chart"):
            from docling_core.types.doc.document import (
                PictureClassificationClass,
                PictureClassificationData,
                PictureTabularChartData,
            )

            from docling_core.types.doc.document import (
                DescriptionAnnotation,
                PictureMoleculeData,
            )

            from docling_core_spark.model.spans import split_pic_anns

            cls_name = kind.split(":", 1)[1] if ":" in kind else "bar_chart"
            otsl_text, p_anns = split_pic_anns(text)
            anns: list = [PictureClassificationData(
                provenance="synthetic",
                predicted_classes=[PictureClassificationClass(
                    class_name=cls_name, confidence=1.0)])]
            if otsl_text:
                cdata = parse_otsl_table_content(otsl_text)
                _apply_otsl_header_flags(otsl_text, cdata)
                anns.append(PictureTabularChartData(chart_data=cdata,
                                                    title=cls_name))
            for ak, av in p_anns:
                if ak == "desc":
                    anns.append(DescriptionAnnotation(
                        text=av, provenance="synthetic"))
                elif ak == "smiles":
                    anns.append(PictureMoleculeData(
                        smi=av, confidence=1.0,
                        class_name="chemistry_molecular_structure",
                        segmentation=[], provenance="synthetic"))
            item = doc.add_picture(parent=item_parent, prov=prov(offset),
                                   annotations=anns)
            if media_ref:
                floating_by_ref[media_ref] = item
        elif kind == "key_value_region":
            from docling_core.types.doc.document import (
                GraphCell,
                GraphData,
                GraphLink,
            )
            from docling_core.types.doc.labels import (
                GraphCellLabel,
                GraphLinkLabel,
            )

            from docling_core_spark.model.kv import parse_kv

            kv_cells, kv_links = parse_kv(text)
            graph = GraphData(
                cells=[GraphCell(label=GraphCellLabel(c.label),
                                 cell_id=c.cell_id, text=c.text,
                                 orig=c.text, prov=None, item_ref=None)
                       for c in kv_cells],
                links=[GraphLink(label=GraphLinkLabel(ln.label),
                                 source_cell_id=ln.source,
                                 target_cell_id=ln.target)
                       for ln in kv_links])
            item = doc.add_key_values(graph=graph, prov=prov(offset))
        elif kind == "form":
            from docling_core.types.doc.document import (
                GraphCell,
                GraphData,
                GraphLink,
            )
            from docling_core.types.doc.labels import (
                GraphCellLabel,
                GraphLinkLabel,
            )

            from docling_core_spark.model.kv import parse_kv

            kv_cells, kv_links = parse_kv(text)
            graph = GraphData(
                cells=[GraphCell(label=GraphCellLabel(c.label),
                                 cell_id=c.cell_id, text=c.text,
                                 orig=c.text, prov=None, item_ref=None)
                       for c in kv_cells],
                links=[GraphLink(label=GraphLinkLabel(ln.label),
                                 source_cell_id=ln.source,
                                 target_cell_id=ln.target)
                       for ln in kv_links])
            item = doc.add_form(graph=graph, prov=prov(offset))
        elif kind.startswith("caption"):
            mref = kind.split(":", 1)[1] if ":" in kind else media_ref
            item = doc.add_text(label=DocItemLabel.CAPTION, text=text,
                                parent=item_parent, prov=prov(offset, text))
            owner = floating_by_ref.get(mref)
            if owner is not None:
                owner.captions.append(item.get_ref())
            elif mref:
                pending_captions.setdefault(mref, []).append(item)
        elif kind.startswith("furniture"):
            sub = kind.split(":", 1)[1] if ":" in kind else "page_header"
            label = (DocItemLabel.PAGE_HEADER if sub == "page_header"
                     else DocItemLabel.PAGE_FOOTER)
            item = doc.add_text(label=label, text=text, parent=item_parent,
                                prov=prov(offset, text),
                                content_layer=ContentLayer.FURNITURE)
        else:
            item = doc.add_text(label=DocItemLabel.TEXT, text=text,
                                parent=item_parent, prov=prov(offset, text))

        if item is not None:
            ref_to_offset[item.self_ref] = offset
            if kind.split(":", 1)[0] not in ("list_group",
                                             "inline_group"):
                last_item = item
            if media_ref and media_ref in pending_captions and \
                    media_ref in floating_by_ref:
                for cap in pending_captions.pop(media_ref):
                    item.captions.append(cap.get_ref())

    from docling_core.types.doc.document import RichTableCell

    for t_item, ci, k in rich_fixups:
        if k < len(t_item.children):
            old = t_item.data.table_cells[ci]
            t_item.data.table_cells[ci] = RichTableCell(
                ref=t_item.children[k],
                text="", orig="",
                start_row_offset_idx=old.start_row_offset_idx,
                end_row_offset_idx=old.end_row_offset_idx,
                start_col_offset_idx=old.start_col_offset_idx,
                end_col_offset_idx=old.end_col_offset_idx,
                row_span=old.row_span, col_span=old.col_span,
                column_header=old.column_header,
                row_header=old.row_header, row_section=old.row_section)

    for p in sorted(pages_seen):
        doc.add_page(page_no=p, size=Size(width=PAGE_W, height=PAGE_H),
                     metadata={})
    return doc, ref_to_offset


def _apply_otsl_header_flags(otsl: str, data: "TableData") -> None:
    """The reference OTSL parser drops ched/rhed/srow semantics
    (utils.py:236-252); docs loaded from JSON keep them. Our span codec
    preserves them, so re-apply the flags the encoder wrote."""
    import re

    toks = [t for t in re.findall(r"<[^>]+>", otsl)
            if t in ("<fcel>", "<ecel>", "<lcel>", "<ucel>", "<xcel>",
                     "<nl>", "<ched>", "<rhed>", "<srow>")]
    flags = [t for t in toks if t in ("<fcel>", "<ched>", "<rhed>", "<srow>")]
    # cells appear in parse order (non-ecel openers); ecel cells also in
    # table_cells, aligned with openers incl. <ecel>
    openers = [t for t in toks if t in ("<fcel>", "<ecel>", "<ched>",
                                        "<rhed>", "<srow>")]
    del flags
    for cell, opener in zip(data.table_cells, openers):
        cell.column_header = opener == "<ched>"
        cell.row_header = opener == "<rhed>"
        cell.row_section = opener == "<srow>"


class OracleTokenizer:
    """BaseTokenizer-compatible deterministic tokenizer (the pydantic
    base class is bypassed via duck typing where possible)."""

    def __new__(cls, max_tokens: int = 512):
        # construct a real BaseTokenizer subclass instance so pydantic
        # validation in HybridChunker accepts it
        from docling_core.transforms.chunker.tokenizer.base import BaseTokenizer

        class _Tok(BaseTokenizer):
            max_tokens: int = 512

            def count_tokens(self, text: str) -> int:
                return RegexTokenizer(self.max_tokens).count_tokens(text)

            def get_max_tokens(self) -> int:
                return self.max_tokens

            def get_tokenizer(self):
                return RegexTokenizer(self.max_tokens)

        return _Tok(max_tokens=max_tokens)


def reference_hierarchical_chunks(doc: DoclingDocument,
                                  ref_to_offset: Dict[str, int]
                                  ) -> List[Tuple[str, Optional[List[str]], List[int]]]:
    from docling_core.transforms.chunker.hierarchical_chunker import (
        HierarchicalChunker,
    )

    out = []
    for c in HierarchicalChunker().chunk(doc):
        out.append((
            c.text,
            list(c.meta.headings) if c.meta.headings else None,
            [ref_to_offset[it.self_ref] for it in c.meta.doc_items],
        ))
    return out


def reference_hybrid_chunks(doc: DoclingDocument,
                            ref_to_offset: Dict[str, int],
                            max_tokens: int = 64,
                            merge_peers: bool = True
                            ) -> List[Tuple[str, Optional[List[str]], List[int]]]:
    from docling_core.transforms.chunker.hybrid_chunker import HybridChunker

    chunker = HybridChunker(tokenizer=OracleTokenizer(max_tokens=max_tokens),
                            merge_peers=merge_peers)
    out = []
    for c in chunker.chunk(doc):
        out.append((
            c.text,
            list(c.meta.headings) if c.meta.headings else None,
            [ref_to_offset[it.self_ref] for it in c.meta.doc_items],
        ))
    return out


def reference_markdown(doc: DoclingDocument, **kw) -> str:
    return doc.export_to_markdown(**kw)


def reference_text(doc: DoclingDocument, **kw) -> str:
    return doc.export_to_text(**kw)


def reference_html(doc: DoclingDocument, **kw) -> str:
    return doc.export_to_html(**kw)


def reference_page_chunks(doc: DoclingDocument,
                          ref_to_offset: Dict[str, int]
                          ) -> List[Tuple[str, Optional[List[str]], List[int]]]:
    from docling_core.transforms.chunker.page_chunker import PageChunker

    out = []
    for c in PageChunker().chunk(doc):
        out.append((
            c.text,
            list(c.meta.headings) if c.meta.headings else None,
            [ref_to_offset[it.self_ref] for it in c.meta.doc_items],
        ))
    return out
