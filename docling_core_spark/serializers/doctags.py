"""DocTags export: the reference's LLM-friendly token-stream format.

Re-implements DocTagsDocSerializer (transforms/serializer/doctags.py)
over the span data model:

    <doctag><title><loc_x0><loc_y0><loc_x1><loc_y1>Text</title>
    ...<otsl><loc..>OTSL<caption>..</caption></otsl>...
    <page_break>...</doctag>

Location tokens quantize the item bbox to 0..499 of the page dims
(types/doc/tokens.py:264-295); bboxes come from the deterministic
offset->bbox convention (model/doc.py node_bbox), shared with the test
oracle so <loc_*> streams are compared exactly.
"""

from __future__ import annotations

from typing import List, Optional, Set, Tuple

from docling_core_spark.model.doc import (
    K_CAPTION,
    K_CODE,
    K_FORMULA,
    K_INLINE_GROUP,
    K_LIST_GROUP,
    K_LIST_ITEM,
    K_PICTURE,
    K_SECTION_HEADER,
    K_TABLE,
    K_TEXT,
    K_TITLE,
    LAYER_BODY,
    LAYER_FURNITURE,
    PAGE_H,
    PAGE_W,
    Doc,
    Node,
    node_bbox,
)
from docling_core_spark.model.otsl import encode_otsl, parse_otsl
from docling_core_spark.serializers.markdown import (
    DEFAULT_LABELS,
    MarkdownParams,
    MarkdownSerializer,
    SerResult,
    _ser,
)

_MAXSIZE = 2 ** 62

# DocumentToken names by node kind / label (tokens.py:153-245)
_TOKEN_BY_LABEL = {
    "title": "title", "text": "text", "paragraph": "paragraph",
    "caption": "caption", "footnote": "footnote", "formula": "formula",
    "list_item": "list_item", "page_footer": "page_footer",
    "page_header": "page_header", "picture": "picture", "table": "table",
    "document_index": "document_index", "code": "code",
    "checkbox_selected": "checkbox_selected",
    "checkbox_unselected": "checkbox_unselected", "form": "form",
    "key_value_region": "key_value_region", "reference": "reference",
    "chart": "chart",
}


def _wrap(text: str, tag: str) -> str:
    return f"<{tag}>{text}</{tag}>"


def _loc_token(val: float, rnorm: int) -> str:
    """tokens.py:264-270: round, clamp to [0, rnorm-1]."""
    v = round(rnorm * val)
    v = max(v, 0)
    v = min(v, rnorm - 1)
    return f"<loc_{v}>"


def _loc_str(bbox: Tuple[float, float, float, float],
             xsize: int, ysize: int) -> str:
    """tokens.py:272-295 (bbox already TOPLEFT in page units)."""
    x0, y0, x1, y1 = bbox
    x0n, y0n = x0 / PAGE_W, y0 / PAGE_H
    x1n, y1n = x1 / PAGE_W, y1 / PAGE_H
    return (_loc_token(min(x0n, x1n), xsize) + _loc_token(min(y0n, y1n), ysize)
            + _loc_token(max(x0n, x1n), xsize)
            + _loc_token(max(y0n, y1n), ysize))


class DocTagsParams(MarkdownParams):
    """DocTags parameters (serializer/doctags.py:57-77). Reuses the
    common fields of MarkdownParams; layers default to ALL content
    layers (CommonParams default - furniture IS exported, unlike
    markdown)."""

    __slots__ = ("xsize", "ysize", "add_location", "add_caption",
                 "add_content", "add_table_cell_location",
                 "add_table_cell_text", "minified")

    def __init__(self, labels: frozenset = DEFAULT_LABELS,
                 layers: Tuple[str, ...] = (LAYER_BODY, LAYER_FURNITURE),
                 pages: Optional[Set[int]] = None,
                 start_idx: int = 0, stop_idx: int = _MAXSIZE,
                 xsize: int = 500, ysize: int = 500,
                 add_location: bool = True, add_caption: bool = True,
                 add_content: bool = True,
                 add_table_cell_location: bool = False,
                 add_table_cell_text: bool = True,
                 add_page_break: bool = True,
                 minified: bool = False) -> None:
        super().__init__(
            labels=labels, layers=layers, pages=pages,
            start_idx=start_idx, stop_idx=stop_idx,
            # drives the shared page-break injection machinery
            page_break_placeholder="<page_break>" if add_page_break else None,
            escape_underscores=False, escape_html=False,
        )
        self.xsize = xsize
        self.ysize = ysize
        self.add_location = add_location
        self.add_caption = add_caption
        self.add_content = add_content
        self.add_table_cell_location = add_table_cell_location
        self.add_table_cell_text = add_table_cell_text
        self.minified = minified

    @property
    def delim(self) -> str:
        return "" if self.minified else "\n"


class DocTagsSerializer(MarkdownSerializer):
    """Visitor reusing the shared traversal/exclusion machinery of the
    markdown serializer with doctags emit rules."""

    def __init__(self, doc: Doc, params: Optional[DocTagsParams] = None):
        super().__init__(doc, params if params is not None else DocTagsParams())
        self._suppress_location = False

    # -- helpers -------------------------------------------------------
    def _loc(self, node: Node) -> str:
        if not self.params.add_location or self._suppress_location:
            return ""
        return _loc_str(node_bbox(node.offset), self.params.xsize,
                        self.params.ysize)

    def post_process(self, text: str, escape_html: bool = True,
                     escape_underscores: bool = True, fmt: str = "",
                     hyperlink: str = "") -> str:
        """DocTags uses the base DocSerializer hooks, which are all
        no-ops (common.py:468-506) - formatting/hyperlinks do not
        appear in the token stream."""
        return text

    # -- captions (doctags.py:526-557) ----------------------------------
    def serialize_captions(self, node: Node) -> SerResult:
        if not self.params.add_caption or "caption" not in self.params.labels:
            return _ser()
        excluded = self.get_excluded_refs()
        results: List[SerResult] = []
        caps = [c for c in node.captions if id(c) not in excluded]
        if caps:
            if self.params.add_location:
                for cap in caps:
                    results.append(_ser(text=_loc_str(
                        node_bbox(cap.offset), self.params.xsize,
                        self.params.ysize)))
            results.append(_ser(
                text=self.params.caption_delim.join(c.text for c in caps),
                source=[_ser(text=c.text, source=c) for c in caps]))
        text_res = "".join(r.text for r in results)
        if text_res:
            text_res = _wrap(text_res, "caption")
        return _ser(text=text_res, source=results)

    # -- text items (doctags.py:88-148) ----------------------------------
    def _serialize_text(self, node: Node, is_inline_scope: bool,
                        visited: Set[int]) -> SerResult:
        p = self.params
        kind = node.kind
        if kind == K_SECTION_HEADER:
            wrap_tag: Optional[str] = f"section_header_level_{node.level}"
        else:
            wrap_tag = _TOKEN_BY_LABEL.get(node.label, "text")
        parts: List[str] = []
        loc = self._loc(node)
        if loc:
            parts.append(loc)
        if p.add_content:
            text_part = node.text
            if kind == K_CODE:
                text_part = f"<_{node.code_language}_>{text_part}"
            else:
                text_part = text_part.strip()
                if kind == K_LIST_ITEM:
                    wrap_tag = None  # deferred to list handling
            if text_part:
                parts.append(text_part)
        if kind == K_CODE:  # FloatingItem caption hook
            cap = self.serialize_captions(node)
            if cap.text:
                parts.append(cap.text)
        text_res = "".join(parts)
        if wrap_tag is not None:
            text_res = _wrap(text_res, wrap_tag)
        return _ser(text=text_res, source=node)

    # -- tables (doctags.py:150-197) --------------------------------------
    def _serialize_table(self, node: Node,
                         visited: Optional[Set[int]] = None) -> SerResult:
        p = self.params
        res_parts: List[SerResult] = []
        if id(node) not in self.get_excluded_refs():
            loc = self._loc(node)
            if loc or p.add_location:
                res_parts.append(_ser(text=loc, source=node))
            table = parse_otsl(node.text)
            # rich cells: a FRESH default markdown serializer renders
            # the referenced child (RichTableCell._get_text,
            # document.py:350-358); children then suppressed from the
            # stream via the shared visited set
            rich_cells = [c for c in table.cells
                          if self._RICH_RE.fullmatch(c.text)]
            if rich_cells:
                from docling_core_spark.serializers.markdown import (
                    MarkdownSerializer,
                )
                md = MarkdownSerializer(self.doc)
                for c in rich_cells:
                    k = int(self._RICH_RE.fullmatch(c.text).group(1))
                    if k < len(node.children):
                        child = node.children[k]
                        c.text = md.serialize(node=child).text
                        if visited is not None:
                            visited.add(id(child))
                            for n, _ in self.doc.iterate_items(
                                    root=child, with_groups=True):
                                visited.add(id(n))
                    else:
                        c.text = ""
            otsl_body = encode_otsl(table,
                                    add_cell_text=p.add_table_cell_text)
            res_parts.append(_ser(text=otsl_body, source=node))
        cap = self.serialize_captions(node)
        if cap.text:
            res_parts.append(cap)
        text_res = "".join(r.text for r in res_parts)
        if text_res:
            text_res = _wrap(text_res, "otsl")
        return _ser(text=text_res, source=res_parts)

    # -- pictures (doctags.py:200-282) -------------------------------------
    _CHART_CLASSES = frozenset({
        "pie_chart", "bar_chart", "stacked_bar_chart", "line_chart",
        "flow_chart", "scatter_chart", "heatmap",
    })

    def _serialize_picture(self, node: Node) -> SerResult:
        res_parts: List[SerResult] = []
        is_chart = False
        if id(node) not in self.get_excluded_refs():
            body = self._loc(node)
            if node.chart_class:
                is_chart = node.chart_class in self._CHART_CLASSES
                body += f"<{node.chart_class}>"
            # first molecule annotation as <smiles> (doctags.py:244-250);
            # description annotations are NOT emitted in doctags
            for k, v in node.pic_anns:
                if k == "smiles":
                    body += _wrap(v, "smiles")
                    break
            if node.chart_class and node.text:
                # tabular chart data as OTSL (doctags.py:252-262)
                body += encode_otsl(parse_otsl(node.text))
            res_parts.append(_ser(text=body, source=node))
        cap = self.serialize_captions(node)
        if cap.text:
            res_parts.append(cap)
        text_res = "".join(r.text for r in res_parts)
        if text_res:
            text_res = _wrap(text_res, "chart" if is_chart else "picture")
        return _ser(text=text_res, source=res_parts)

    # -- key-value regions (doctags.py:282-342): graph cells carried in
    # the span text via the kv grammar; links of BOTH labels flatten to
    # <link_N> exactly like the reference (source_to_targets is built
    # from all graph.links regardless of label, doctags.py:312-315) ----
    def _serialize_key_value(self, node: Node) -> SerResult:
        from docling_core_spark.model.kv import parse_kv

        body = self._loc(node)
        cells, links = parse_kv(node.text)
        by_src: dict = {}
        for link in links:
            by_src.setdefault(link.source, []).append(link.target)
        for c in cells:
            cell_txt = c.text.strip()
            for target in by_src.get(c.cell_id, ()):
                cell_txt += f"<link_{target}>"
            body += _wrap(cell_txt, f"{c.label}_{c.cell_id}")
        cap = self.serialize_captions(node)
        body += cap.text
        return _ser(text=_wrap(body, "key_value_region"), source=node)

    # -- forms: the reference's DocTagsFormSerializer emits nothing
    # (doctags.py:345-360, "TODO add actual implementation") ----------
    def _serialize_form(self, node: Node) -> SerResult:
        return _ser()

    # -- lists (doctags.py:367-417) ----------------------------------------
    def _serialize_list(self, node: Node, list_level: int,
                        is_inline_scope: bool, visited: Set[int]
                        ) -> SerResult:
        p = self.params
        parts = self.get_parts(node, list_level=list_level + 1,
                               is_inline_scope=is_inline_scope,
                               visited=visited)
        delim = p.delim
        if parts:
            text_res = delim.join(
                _wrap(part.text, "list_item") for part in parts)
            text_res = f"{text_res}{delim}"
            wrap_tag = ("ordered_list" if node.first_item_is_enumerated()
                        else "unordered_list")
            text_res = _wrap(text_res, wrap_tag)
        else:
            text_res = ""
        return _ser(text=text_res, source=parts)

    # -- inline groups (doctags.py:419-494) ---------------------------------
    def _serialize_inline(self, node: Node, list_level: int,
                          visited: Set[int]) -> SerResult:
        p = self.params
        parts: List[SerResult] = []
        if p.add_location and not self._suppress_location:
            boxes = []
            items = []
            for it, _ in self.doc.iterate_items(root=node,
                                                layers=(LAYER_BODY,)):
                boxes.append(node_bbox(it.offset))
                items.append(it)
            if boxes:
                enc = (min(b[0] for b in boxes), min(b[1] for b in boxes),
                       max(b[2] for b in boxes), max(b[3] for b in boxes))
                res = SerResult(_loc_str(enc, p.xsize, p.ysize), items)
                parts.append(res)
            saved = self._suppress_location
            self._suppress_location = True
            try:
                parts.extend(self.get_parts(node, list_level=list_level,
                                            is_inline_scope=True,
                                            visited=visited))
            finally:
                self._suppress_location = saved
        else:
            parts.extend(self.get_parts(node, list_level=list_level,
                                        is_inline_scope=True,
                                        visited=visited))
        delim = p.delim
        text_res = delim.join(x.text for x in parts if x.text)
        if text_res:
            text_res = f"{text_res}{delim}"
            text_res = _wrap(text_res, "inline")
        return _ser(text=text_res, source=parts)

    # -- document (doctags.py:522-545) ---------------------------------------
    def serialize_doc(self, parts: List[SerResult]) -> SerResult:
        import re as _re

        delim = self.params.delim
        text_res = delim.join(x.text for x in parts if x.text)
        if self.params.page_break_placeholder is not None:
            text_res = _re.sub(r"#_#_DOCLING_DOC_PAGE_BREAK_(\d+)_(\d+)_#_#",
                               "<page_break>", text_res)
        return _ser(text=f"<doctag>{text_res}{delim}</doctag>", source=parts)


def export_to_doctags(doc: Doc, **kw) -> str:
    """document.py:5273-5341 equivalent."""
    return DocTagsSerializer(doc, DocTagsParams(**kw)).serialize().text
