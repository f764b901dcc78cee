"""HTML serialization of the document tree (E3).

From-scratch re-expression of the reference's HTML serializer
(transforms/serializer/html.py:84-1113 + document.py:4668-4725)
specialized to the span data model; reuses the common visitor glue from
the markdown serializer (excluded refs, caption suppression, traversal).
Cites are reference file:line of the behavior reproduced.

Scope notes:
* both output styles: single-column and split-page (html.py:925-1016);
  page images stay by reference, so split-page rows render the
  reference's own no-image fallback figure (html.py:985);
* MathML conversion is a passthrough ``<pre>`` fallback - exactly what
  the reference emits when latex2mathml raises (html.py:298-310), which
  is the deterministic behavior at scale (SURVEY §2.5 E3);
* images stay PLACEHOLDER-mode (media by reference; html.py:449-486).
"""

from __future__ import annotations

import html as _html
from typing import List, Optional, Set

from docling_core_spark.model.doc import (
    K_CODE,
    K_FORMULA,
    K_INLINE_GROUP,
    K_LIST_GROUP,
    K_LIST_ITEM,
    K_SECTION_HEADER,
    K_TITLE,
    Doc,
    Node,
)
from docling_core_spark.model.otsl import Table, parse_otsl
from docling_core_spark.serializers.markdown import (
    MarkdownParams,
    MarkdownSerializer,
    SerResult,
    _PB_RE,
    _ser,
)

# default CSS for the single-column layout - static presentation data
# carried for byte-compatibility with the reference's HTML output
# (transforms/serializer/html_styles.py:_get_css_for_single_column)
SINGLE_COLUMN_CSS = """<style>
    html {
        background-color: #f5f5f5;
        font-family: Arial, sans-serif;
        line-height: 1.6;
    }
    body {
        max-width: 800px;
        margin: 0 auto;
        padding: 2rem;
        background-color: white;
        box-shadow: 0 0 10px rgba(0,0,0,0.1);
    }
    h1, h2, h3, h4, h5, h6 {
        color: #333;
        margin-top: 1.5em;
        margin-bottom: 0.5em;
    }
    h1 {
        font-size: 2em;
        border-bottom: 1px solid #eee;
        padding-bottom: 0.3em;
    }
    table {
        border-collapse: collapse;
        margin: 1em 0;
        width: 100%;
    }
    th, td {
        border: 1px solid #ddd;
        padding: 8px;
        text-align: left;
    }
    th {
        background-color: #f2f2f2;
        font-weight: bold;
    }
    figure {
        margin: 1.5em 0;
        text-align: center;
    }
    figcaption {
        color: #666;
        font-style: italic;
        margin-top: 0.5em;
    }
    img {
        max-width: 100%;
        height: auto;
    }
    pre {
        background-color: #f6f8fa;
        border-radius: 3px;
        padding: 1em;
        overflow: auto;
    }
    code {
        font-family: monospace;
        background-color: #f6f8fa;
        padding: 0.2em 0.4em;
        border-radius: 3px;
    }
    pre code {
        background-color: transparent;
        padding: 0;
    }
    .formula {
        text-align: center;
        padding: 0.5em;
        margin: 1em 0;
        background-color: #f9f9f9;
    }
    .formula-not-decoded {
        text-align: center;
        padding: 0.5em;
        margin: 1em 0;
        background: repeating-linear-gradient(
            45deg,
            #f0f0f0,
            #f0f0f0 10px,
            #f9f9f9 10px,
            #f9f9f9 20px
        );
    }
    .page-break {
        page-break-after: always;
        border-top: 1px dashed #ccc;
        margin: 2em 0;
    }
    .key-value-region {
        background-color: #f9f9f9;
        padding: 1em;
        border-radius: 4px;
        margin: 1em 0;
    }
    .key-value-region dt {
        font-weight: bold;
    }
    .key-value-region dd {
        margin-left: 1em;
        margin-bottom: 0.5em;
    }
    .form-container {
        border: 1px solid #ddd;
        padding: 1em;
        border-radius: 4px;
        margin: 1em 0;
    }
    .form-item {
        margin-bottom: 0.5em;
    }
    .image-classification {
        font-size: 0.9em;
        color: #666;
        margin-top: 0.5em;
    }
</style>"""

# split-page layout CSS - static presentation data carried for
# byte-compatibility with the reference
# (transforms/serializer/html_styles.py:_get_css_for_split_page)
SPLIT_PAGE_CSS = """<style>
    html {
        background-color: #e1e1e1;
        font-family: Arial, sans-serif;
        line-height: 1.6;
    }
    img {
        min-width: 500px;
        max-width: 100%;
    }
    table {
        border-collapse: collapse;
        border: 0px solid #fff;
        width: 100%;
    }
    td {
        vertical-align: top;
    }
    .page {
        background-color: white;
        margin-top:15px;
        padding: 30px;
        border: 1px solid black;
        width:100%;
        max-width:1000px;
        box-shadow: 0 0 10px rgba(0,0,0,0.5);
    }
    .page figure {
        text-align: center;
    }
    .page img {
        max-width: 900px;
        min-width: auto;
    }
    .page table {
        border-collapse: collapse;
        margin: 1em 0;
        width: 100%;
    }
    .page table td {
        border: 1px solid #ddd;
        padding: 8px;
        text-align: left;
    }
    .page table th {
        border: 1px solid #ddd;
        padding: 8px;
        text-align: left;
        background-color: #f2f2f2;
        font-weight: bold;
    }
    .page table caption {
        color: #666;
        font-style: italic;
        margin-top: 0.5em;
        padding: 8px;
        margin-top: 5px;
        margin-bottom: 5px;
    }
    .page figcaption {
        color: #666;
        font-style: italic;
        margin-top: 0.5em;
        padding: 8px;
        margin-top: 5px;
        margin-bottom: 5px;
    }
    code {
        background-color: rgb(228, 228, 228);
        border: 1px solid darkgray;
        padding: 10px;
        display: inline-block;
        font-family: monospace;
        max-width:980px;
        word-wrap: normal;
        white-space: pre-wrap;
        word-wrap: break-word;
        /*overflow-wrap: break-word;*/
    }
</style>
"""



def _prepare(text: str, do_escape_html: bool = True,
             do_replace_newline: bool = True) -> str:
    """HTMLTextSerializer._prepare_content (html.py:231-239)."""
    if do_escape_html:
        text = _html.escape(text, quote=False)
    if do_replace_newline:
        text = text.replace("\n", "<br>")
    return text


def _tag(html_tag: str, text: str, attrs: Optional[dict] = None) -> str:
    """get_html_tag_with_text_direction (types/doc/utils.py:61-77);
    the dir attribute is only rewritten when the caller pre-sets it,
    which no call site does - so this is a plain tag wrap."""
    pieces = [html_tag]
    if attrs:
        pieces.append(" ".join(
            f'{_html.escape(k, quote=False)}="'
            f'{_html.escape(v, quote=False)}"' for k, v in attrs.items()))
    return f"<{' '.join(pieces)}>{text}</{html_tag}>"


class HtmlParams(MarkdownParams):
    """HTMLParams analogue (html.py:91-120); inherits the common slice/
    label/layer/page params."""

    __slots__ = ("html_head", "add_document_metadata", "prettify",
                 "show_original_list_item_marker", "output_style")

    def __init__(self, html_head: Optional[str] = None,
                 add_document_metadata: bool = True,
                 prettify: bool = True,
                 show_original_list_item_marker: bool = True,
                 output_style: str = "single_column",
                 **kw) -> None:
        super().__init__(**kw)
        self.html_head = html_head
        self.add_document_metadata = add_document_metadata
        self.prettify = prettify
        self.show_original_list_item_marker = show_original_list_item_marker
        # "single_column" | "split_page" (HTMLOutputStyle, html.py:84-88)
        self.output_style = output_style


class HtmlSerializer(MarkdownSerializer):
    """HTMLDocSerializer analogue (html.py:848-1113): inherits the
    traversal/exclusion/caption-suppression glue, overrides every
    format-specific rule."""

    def __init__(self, doc: Doc, params: Optional[HtmlParams] = None):
        super().__init__(doc, params if params is not None else HtmlParams())

    # E8 formatting hooks (html.py:866-904)
    def serialize_bold(self, text: str) -> str:
        return f"<strong>{text}</strong>"

    def serialize_italic(self, text: str) -> str:
        return f"<em>{text}</em>"

    def serialize_underline(self, text: str) -> str:
        return f"<u>{text}</u>"

    def serialize_strikethrough(self, text: str) -> str:
        return f"<del>{text}</del>"

    def serialize_subscript(self, text: str) -> str:
        return f"<sub>{text}</sub>"

    def serialize_superscript(self, text: str) -> str:
        return f"<sup>{text}</sup>"

    def serialize_hyperlink(self, text: str, hyperlink: str) -> str:
        return f'<a href="{hyperlink}">{text}</a>'

    def post_process(self, text: str, fmt: str = "", hyperlink: str = "",
                     **_kw) -> str:
        """Formatting/hyperlink hooks only (common.py:439-466 order) -
        HTML applies no markdown-style escaping here."""
        res = text
        if fmt:
            if "b" in fmt:
                res = self.serialize_bold(res)
            if "i" in fmt:
                res = self.serialize_italic(res)
            if "u" in fmt:
                res = self.serialize_underline(res)
            if "s" in fmt:
                res = self.serialize_strikethrough(res)
            if "q" in fmt:
                res = self.serialize_subscript(res)
            elif "p" in fmt:
                res = self.serialize_superscript(res)
        if hyperlink:
            res = self.serialize_hyperlink(res, hyperlink)
        return res

    # ------------------------------------------------------------------
    def serialize_captions(self, node: Node, tag: str = "figcaption"
                           ) -> SerResult:
        """html.py:1019-1062: caption divs + annotation divs joined by
        caption_delim inside one <figcaption>/<caption> element."""
        results: List[SerResult] = []
        if "caption" in self.params.labels:
            excluded = self.get_excluded_refs()
            for cap in node.captions:
                if id(cap) not in excluded:
                    results.append(_ser(
                        text=(f'<div class="caption">'
                              f"{_html.escape(cap.text)}</div>"),
                        source=cap))
        if self.params.include_annotations and \
                id(node) not in self.get_excluded_refs():
            ann = self._serialize_annotations(node)
            if ann.text:
                results.append(ann)
        text_res = self.params.caption_delim.join(r.text for r in results)
        if text_res:
            text_res = f"<{tag}>{text_res}</{tag}>"
        return _ser(text=text_res, source=results)

    def _serialize_annotations(self, node: Node) -> SerResult:
        """HTMLAnnotationSerializer (html.py:812-845): classification
        annotations render as data-annotation-kind divs; the span model
        carries them as the chart class (kind='classification')."""
        divs: List[str] = []
        if node.chart_class:
            ann_text = node.chart_class.replace("_", " ")
            divs.append(f'<div data-annotation-kind="classification">'
                        f"{_html.escape(ann_text)}</div>")
        kind_map = {"desc": "description", "smiles": "molecule_data"}
        for k, v in node.pic_anns:
            if v:
                divs.append(f'<div data-annotation-kind="{kind_map[k]}">'
                            f"{_html.escape(v)}</div>")
        return _ser(text=" ".join(divs), source=node) if divs else _ser()

    # ------------------------------------------------------------------
    def _serialize_text(self, node: Node, is_inline_scope: bool,
                        visited: Set[int]) -> SerResult:
        """HTMLTextSerializer.serialize (html.py:127-229). NB: for
        floating text items (code) the reference returns only the item
        text - captions land in the span sources but NOT in the output
        text (html.py:222-229); replicated bug-for-bug."""
        res_parts: List[SerResult] = []
        kind = node.kind
        if kind == K_TITLE:
            text = _tag("h1", _prepare(node.text))
        elif kind == K_SECTION_HEADER:
            text = _tag(f"h{min(node.level + 1, 6)}", _prepare(node.text))
        elif kind == K_FORMULA:
            text = self._process_formula(node, is_inline_scope)
        elif kind == K_CODE:
            code_text = _prepare(node.text, do_escape_html=False,
                                 do_replace_newline=False)
            text = (f"<code>{code_text}</code>" if is_inline_scope
                    else f"<pre><code>{code_text}</code></pre>")
        elif kind == K_LIST_ITEM:
            text_parts: List[str] = []
            if item_text := _prepare(node.text):
                item_text = self.post_process(item_text, fmt=node.fmt,
                                              hyperlink=node.hyperlink)
                text_parts.append(item_text)
            nested = [r.text for r in self.get_parts(
                node, is_inline_scope=is_inline_scope, visited=visited)]
            text_parts.extend(nested)
            text_inner = "\n".join(text_parts)
            if nested:
                text_inner = f"\n{text_inner}\n"
            attrs = ({"style": f"list-style-type: '{node.marker} ';"}
                     if self.params.show_original_list_item_marker
                     and node.marker else {})
            text = _tag("li", text_inner, attrs) if text_inner else ""
        elif is_inline_scope:
            text = _prepare(node.text)
        else:
            text = _tag("p", _prepare(node.text))

        # html.py:214-220: everything except the list-item branch runs
        # the formatting/hyperlink hooks over the wrapped tag text
        if kind != K_LIST_ITEM:
            text = self.post_process(text, fmt=node.fmt,
                                     hyperlink=node.hyperlink)

        if text:
            res_parts.append(_ser(text=text, source=node))
        if kind == K_CODE:
            cap_res = self.serialize_captions(node)
            if cap_res.text:
                res_parts.append(cap_res)
        return _ser(text=text, source=res_parts)

    def _process_formula(self, node: Node, is_inline_scope: bool) -> str:
        """html.py:256-322: real MathML via the from-scratch converter
        (docling_core_spark/mathml.py, byte-pinned to the reference's
        latex2mathml goldens); grammar outside the pinned subset takes
        the reference's own exception fallback (<pre>)."""
        from docling_core_spark.mathml import convert_formula

        math_formula = _prepare(node.text, do_escape_html=False,
                                do_replace_newline=False)
        if math_formula:
            display = "inline" if is_inline_scope else "block"
            mathml = convert_formula(math_formula, display)
            if mathml is not None:
                return mathml if is_inline_scope else f"<div>{mathml}</div>"
            return f"<pre>{math_formula}</pre>"
        if is_inline_scope:
            return '<span class="formula-not-decoded">Formula not decoded</span>'
        return '<div class="formula-not-decoded">Formula not decoded</div>'

    # ------------------------------------------------------------------
    def _render_table_body(self, table: Table,
                           node: Optional[Node] = None,
                           visited: Optional[Set[int]] = None) -> str:
        """HTMLTableSerializer grid walk (html.py:352-412); rich cells
        (<rich_K>) render the referenced table child serialized in html
        (html.py:381-386), shared visited suppressing re-emission."""
        body = ""
        grid = table.grid
        for i in range(table.num_rows):
            body += "<tr>"
            for j in range(table.num_cols):
                cell = grid[i][j]
                if cell.start_row != i or cell.start_col != j:
                    continue
                rich = None
                if node is not None:
                    m = self._RICH_RE.fullmatch(cell.text)
                    if m is not None:
                        k = int(m.group(1))
                        rich = (self.serialize(
                            node=node.children[k],
                            visited=visited if visited is not None
                            else set()).text
                            if k < len(node.children) else "")
                content = (rich if rich is not None
                           else _html.escape(cell.text.strip()))
                celltag = ("th" if cell.column_header or cell.row_header
                           or cell.row_section else "td")
                opening = celltag
                if cell.row_span > 1:
                    opening += f' rowspan="{cell.row_span}"'
                if cell.col_span > 1:
                    opening += f' colspan="{cell.col_span}"'
                body += f"<{opening}>{content}</{celltag}>"
            body += "</tr>"
        return f"<tbody>{body}</tbody>" if body else ""

    def _serialize_table(self, node: Node,
                         visited: Optional[Set[int]] = None) -> SerResult:
        """html.py:341-415: <table><caption?><tbody>...</table>."""
        parts: List[SerResult] = []
        cap_res = self.serialize_captions(node, tag="caption")
        if cap_res.text:
            parts.append(cap_res)
        if id(node) not in self.get_excluded_refs():
            body = self._render_table_body(parse_otsl(node.text),
                                           node=node, visited=visited)
            if body:
                parts.append(_ser(text=body, source=node))
        text_res = "".join(r.text for r in parts)
        if text_res:
            text_res = f"<table>{text_res}</table>"
        return _ser(text=text_res, source=parts)

    # ------------------------------------------------------------------
    def _serialize_picture(self, node: Node) -> SerResult:
        """html.py:418-520: figure with figcaption (captions +
        annotations), no img in PLACEHOLDER mode, chart tables appended
        as plain tables."""
        parts: List[SerResult] = []
        cap_res = self.serialize_captions(node, tag="figcaption")
        if cap_res.text:
            parts.append(cap_res)
        # PLACEHOLDER image mode: no <img> emitted (html.py:449-486)
        if self.params.enable_chart_tables and node.chart_class \
                and node.text:
            body = self._render_table_body(parse_otsl(node.text))
            if body:
                parts.append(_ser(text=f"<table>{body}</table>",
                                  source=node))
        text_res = "".join(r.text for r in parts)
        if text_res:
            text_res = f"<figure>{text_res}</figure>"
        return _ser(text=text_res, source=parts)

    # ------------------------------------------------------------------
    def _serialize_key_value(self, node: Node) -> SerResult:
        """html.py:651-686 + _HTMLGraphDataSerializer (html.py:522-649):
        to_child links build a nested <ul> tree from root cells;
        without hierarchy the to_value pairs render as a <dl>."""
        parts: List[SerResult] = []
        if id(node) not in self.get_excluded_refs():
            parts.append(_ser(text=self._render_graph(
                node.text, "key-value-region"), source=node))
        cap_res = self.serialize_captions(node)
        if cap_res.text:
            parts.append(cap_res)
        return _ser(text="\n".join(r.text for r in parts), source=parts)

    def _serialize_form(self, node: Node) -> SerResult:
        """HTMLFormSerializer (html.py:651-690): same graph rendering
        with the form-container class."""
        parts: List[SerResult] = []
        if id(node) not in self.get_excluded_refs():
            parts.append(_ser(text=self._render_graph(
                node.text, "form-container"), source=node))
        cap_res = self.serialize_captions(node)
        if cap_res.text:
            parts.append(cap_res)
        return _ser(text="\n".join(r.text for r in parts), source=parts)

    def _render_graph(self, kv_text: str, class_name: str) -> str:
        import html as _html

        from docling_core_spark.model.kv import TO_CHILD, TO_VALUE, parse_kv

        cells, links = parse_kv(kv_text)
        cell_map = {c.cell_id: c for c in cells}
        child_links: dict = {}
        value_links: dict = {}
        parents: set = set()
        for link in links:
            if link.source not in cell_map or link.target not in cell_map:
                continue
            if link.label == TO_CHILD:
                child_links.setdefault(link.source, []).append(link.target)
                parents.add(link.target)
            elif link.label == TO_VALUE:
                value_links.setdefault(link.source, []).append(link.target)

        def render_tree(cell_id: int) -> str:
            cell_text = _html.escape(cell_map[cell_id].text)
            if cell_id in value_links:
                vals = [_html.escape(cell_map[v].text)
                        for v in value_links[cell_id] if v in cell_map]
                cell_text = f"<strong>{cell_text}</strong>: {', '.join(vals)}"
            if child_links.get(cell_id):
                out = [f"<li>{cell_text}</li>", "<ul>"]
                out += [render_tree(ch) for ch in child_links[cell_id]]
                out.append("</ul>")
                return "\n".join(out)
            elif cell_id in value_links:
                return f"<li>{cell_text}</li>"
            return ""  # leaf: reference renders nothing (html.py:645-649)

        out = [f'<div class="{class_name}">']
        root_ids = [cid for cid in cell_map if cid not in parents]
        if root_ids:
            out.append(f'<ul class="{class_name}">')
            out += [render_tree(r) for r in root_ids]
            out.append("</ul>")
        else:
            out.append(f'<dl class="{class_name}">')
            for key_id, value_ids in value_links.items():
                out.append(f"<dt>{_html.escape(cell_map[key_id].text)}</dt>")
                for vid in value_ids:
                    out.append(f"<dd>{_html.escape(cell_map[vid].text)}</dd>")
            out.append("</dl>")
        out.append("</div>")
        return "\n".join(out)

    # ------------------------------------------------------------------
    def _serialize_list(self, node: Node, list_level: int,
                        is_inline_scope: bool, visited: Set[int]
                        ) -> SerResult:
        """HTMLListSerializer (html.py:725-758)."""
        parts = self.get_parts(node, list_level=list_level + 1,
                               is_inline_scope=is_inline_scope,
                               visited=visited)
        text_res = "\n".join(p.text for p in parts if p.text)
        if text_res:
            tag = "ol" if node.first_item_is_enumerated() else "ul"
            text_res = f"<{tag}>\n{text_res}\n</{tag}>"
        return _ser(text=text_res, source=parts)

    # ------------------------------------------------------------------
    def _serialize_inline(self, node: Node, list_level: int,
                          visited: Set[int]) -> SerResult:
        """HTMLInlineSerializer (html.py:760-794)."""
        parts = self.get_parts(node, list_level=list_level,
                               is_inline_scope=True, visited=visited)
        inline_html = " ".join(p.text for p in parts if p.text)
        if inline_html:
            inline_html = f"<span class='inline-group'>{inline_html}</span>"
        return _ser(text=inline_html, source=parts)

    # ------------------------------------------------------------------
    def _generate_head(self) -> str:
        """html.py:1064-1104 (single-column branch)."""
        p = self.params
        if p.html_head is not None:
            return p.html_head
        head_parts = ["<head>", '<meta charset="UTF-8"/>']
        if p.add_document_metadata:
            if self.doc.doc_id:
                head_parts.append(
                    f"<title>{_html.escape(self.doc.doc_id)}</title>")
            else:
                head_parts.append("<title>Docling Document</title>")
            head_parts.append(
                '<meta name="generator" content="Docling HTML Serializer"/>')
        head_parts.append(SPLIT_PAGE_CSS
                          if p.output_style == "split_page"
                          else SINGLE_COLUMN_CSS)
        head_parts.append("</head>")
        return "\n".join(head_parts) if p.prettify else "".join(head_parts)

    # ------------------------------------------------------------------
    def requires_page_break(self) -> bool:
        """html.py:1111-1113: split-page needs the break sentinels."""
        return self.params.output_style == "split_page"

    def _applicable_pages(self) -> Optional[List[int]]:
        """common.py:543-564: page numbers of in-filter items."""
        p = self.params
        pages: dict = {}
        ix = 0
        for node, _ in self.doc.iterate_items(with_groups=True,
                                              layers=p.layers):
            if (not node.is_group
                    and (p.pages is None or node.page_no in p.pages)
                    and p.start_idx <= ix < p.stop_idx):
                pages[node.page_no] = True
            ix += 1
        return list(pages) or None

    def serialize_doc(self, parts: List[SerResult]) -> SerResult:
        """html.py:906-1016; single-column and split-page branches. In
        split-page mode each page's content sits beside its page image
        cell; page images are by-reference only in this engine, so the
        reference's own no-image fallback figure renders (html.py:985)."""
        html_parts = ["<!DOCTYPE html>", "<html>", self._generate_head(),
                      "<body>"]
        if self.params.output_style == "split_page":
            applicable = self._applicable_pages()
            html_content = "\n".join(p.text for p in parts if p.text)
            pages: dict = {}
            prev_end = 0
            next_page: Optional[int] = None
            for m in _PB_RE.finditer(html_content):
                start = html_content.find(m.group(0))
                pages[int(m.group(1))] = html_content[prev_end:start]
                prev_end = start + len(m.group(0))
                next_page = int(m.group(2))
            if next_page is not None:
                pages[next_page] = html_content[prev_end:]
            elif applicable is not None and len(applicable) == 1:
                pages[applicable[0]] = html_content
            html_parts.append("<table>")
            html_parts.append("<tbody>")
            for page_no, page in pages.items():
                if applicable is not None and page_no not in applicable:
                    continue
                html_parts.append("<tr>")
                html_parts.append("<td>")
                html_parts.append("<figure>no page-image found</figure>")
                html_parts.append("</td>")
                html_parts.append("<td>")
                html_parts.append(f"<div class='page'>\n{page}\n</div>")
                html_parts.append("</td>")
                html_parts.append("</tr>")
            html_parts.append("</tbody>")
            html_parts.append("</table>")
        else:
            html_content = "\n".join(p.text for p in parts if p.text)
            html_parts.append(f"<div class='page'>\n{html_content}\n</div>")
        html_parts += ["</body>", "</html>"]
        return _ser(text="\n".join(html_parts), source=parts)


def export_to_html(doc: Doc, split_page_view: bool = False, **kw) -> str:
    """document.py:4668-4725 equivalent (single-column + split-page)."""
    if split_page_view:
        kw["output_style"] = "split_page"
    return HtmlSerializer(doc, HtmlParams(**kw)).serialize().text
