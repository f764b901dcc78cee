"""Main-content extraction: HTML -> span sequence.

From-scratch extraction operator (north rule: "HTML boilerplate strip,
DOM heuristics"). Three stages, all pure Python per document (run
batched inside one Arrow stage on Spark - extraction/spark.py):

1. **DOM parse** - stdlib ``html.parser`` into a lightweight element
   tree (no external dependencies).
2. **Boilerplate strip** - classic DOM heuristics, in order:
   a. drop non-content tags (script/style/nav/aside/header/footer/...)
   b. drop elements whose class/id tokens look like chrome
      (nav, menu, sidebar, ad, cookie, comments, social, ...)
   c. locate the main-content container (<main>/<article>/
      content-flavored class tokens; largest text mass wins)
   d. when no container announces itself, fall back to link-density
      pruning (jusText/Readability-style: link farms are short-anchor,
      high-density blocks) over the whole <body>.
3. **Span emission** - map the surviving semantic HTML to the engine's
   span grammar (h1 -> title, hN -> section_header:N-1, p -> text
   kinds, ul/ol -> list groups, pre/code -> code, figure -> picture/
   table/chart + captions + annotations, dl -> key-value graphs,
   <meta> provenance -> origin span).

The emission dialect is the inverse of extraction/render.py; ground
truth for the round trip is extraction/projection.py (computed without
running either). Comparable reference surface: the DocTags parser
(document.py:4727-5222) is the reference's only text-stream->document
parser and fixes the parsing conventions reused here (captions bind to
their floating item, OTSL streams rebuild through the table codec).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Dict, List, Optional, Tuple

from docling_core_spark.model.kv import KvCell, KvLink, encode_kv
from docling_core_spark.model.otsl import Cell, Table, encode_otsl
from docling_core_spark.model.spans import (
    encode_image_ref,
    encode_pic_anns,
)

_EXT_MIME = {".png": "image/png", ".jpg": "image/jpeg",
             ".jpeg": "image/jpeg", ".gif": "image/gif",
             ".webp": "image/webp"}


def mime_of_uri(uri: str) -> str:
    """Mimetype an image uri implies: data-URI header wins, then the
    file extension, else image/png (the page-dialect spec, shared with
    projection.py)."""
    if uri.startswith("data:"):
        head = uri[5:].split(",", 1)[0].split(";", 1)[0]
        return head or "image/png"
    low = uri.lower()
    for ext, mime in _EXT_MIME.items():
        if low.endswith(ext):
            return mime
    return "image/png"


def _span_attr(el: "El", name: str, cap: int = 512) -> int:
    """rowspan/colspan parsing: non-numeric -> 1, clamped to
    [1, cap] (adversarial 1e8-spans would make the grid fill
    quadratic)."""
    raw = el.attrs.get(name, "") or ""
    try:
        v = int(raw)
    except (TypeError, ValueError):
        return 1
    return max(1, min(v, cap))


def _float_attr(raw) -> float:
    """width/height attr -> float; '50%', 'auto', None -> 0.0."""
    try:
        return float(raw)
    except (TypeError, ValueError):
        return 0.0

# ----------------------------------------------------------------------
# lightweight DOM
# ----------------------------------------------------------------------

_VOID_TAGS = {"img", "br", "hr", "meta", "input", "link", "area", "base",
              "col", "embed", "source", "track", "wbr"}


_TOKEN_SPLIT_RE = re.compile(r"[^a-z0-9]+")
_NO_TOKENS: List[str] = []


class El:
    __slots__ = ("tag", "attrs", "children", "_toks")

    def __init__(self, tag: str, attrs: Dict[str, str]) -> None:
        self.tag = tag
        self.attrs = attrs
        self.children: List[object] = []  # El | str
        self._toks: Optional[List[str]] = None

    def cls_tokens(self) -> List[str]:
        # computed once per element: the boilerplate pass, main-content
        # detection and emission all re-consult it
        if self._toks is None:
            if not self.attrs:
                self._toks = _NO_TOKENS
            else:
                raw = (self.attrs.get("class", "") + " "
                       + self.attrs.get("id", "")).lower()
                self._toks = [t for t in _TOKEN_SPLIT_RE.split(raw) if t]
        return self._toks

    def text(self) -> str:
        out: List[str] = []
        stack: List[object] = [self]
        while stack:
            n = stack.pop()
            if isinstance(n, str):
                out.append(n)
            else:
                stack.extend(reversed(n.children))
        return "".join(out)


_BLOCK_TAGS = {"p", "div", "ul", "ol", "table", "figure", "pre", "dl",
               "blockquote", "section", "article", "main", "aside",
               "header", "footer", "nav", "li", "dt", "dd", "tr", "td",
               "th", "h1", "h2", "h3", "h4", "h5", "h6", "figcaption"}
# inline elements a block start implicitly closes (sloppy-HTML recovery;
# real browsers use the adoption-agency algorithm - closing is the
# extractor-grade approximation)
_IMPLICIT_CLOSE = {"p", "b", "i", "u", "s", "em", "strong", "del",
                   "strike", "sub", "sup", "a", "span", "code"}


# adversarial-nesting guard: beyond this depth new elements attach to
# the capped ancestor instead of nesting (keeps the recursive pruning/
# emission passes within Python's recursion limit on hostile pages)
_MAX_DEPTH = 200


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = El("#root", {})
        self.stack: List[El] = [self.root]

    @staticmethod
    def _attrs(attrs) -> Dict[str, str]:
        # valueless attributes (<p class>, <img src>) arrive as None
        # from HTMLParser; normalize so every consumer sees strings
        return {k: (v if v is not None else "") for k, v in attrs}

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _BLOCK_TAGS:
            # <p>one<p>two / <li>a<li>b style auto-closing; inline-group
            # spans are legitimate block containers, never auto-closed
            while (len(self.stack) > 1
                   and self.stack[-1].tag in _IMPLICIT_CLOSE
                   and not (self.stack[-1].tag == "span"
                            and "inline" in self.stack[-1].cls_tokens())):
                self.stack.pop()
            if tag in ("li", "dt", "dd") and \
                    self.stack[-1].tag in ("li", "dt", "dd"):
                self.stack.pop()
            if tag in ("td", "th") and \
                    self.stack[-1].tag in ("td", "th"):
                self.stack.pop()
            if tag == "tr":
                while self.stack[-1].tag in ("td", "th", "tr"):
                    self.stack.pop()
        el = El(tag, self._attrs(attrs))
        self.stack[-1].children.append(el)
        if tag not in _VOID_TAGS and len(self.stack) < _MAX_DEPTH:
            self.stack.append(el)

    def handle_startendtag(self, tag: str, attrs) -> None:
        self.stack[-1].children.append(El(tag, self._attrs(attrs)))

    def handle_endtag(self, tag: str) -> None:
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # stray close tag: ignore

    def handle_data(self, data: str) -> None:
        kids = self.stack[-1].children
        if kids and isinstance(kids[-1], str):
            kids[-1] += data
        else:
            kids.append(data)


def parse_html(html: str) -> El:
    p = _TreeBuilder()
    p.feed(html)
    p.close()
    return p.root


def _find_in_figure(fig: El, tag: str) -> Optional[El]:
    """First ``tag`` descendant of a figure WITHOUT descending into
    nested <figure> children (an attached child picture must not
    hijack the outer figure's identity)."""
    stack: List[object] = list(fig.children)
    while stack:
        n = stack.pop(0)
        if isinstance(n, El):
            if n.tag == tag:
                return n
            if n.tag != "figure":
                stack = n.children + stack
    return None


def _find_first(el: El, tag: str) -> Optional[El]:
    stack: List[object] = [el]
    while stack:
        n = stack.pop(0)
        if isinstance(n, El):
            if n.tag == tag:
                return n
            stack = n.children + stack
    return None


# ----------------------------------------------------------------------
# boilerplate heuristics
# ----------------------------------------------------------------------

DROP_TAGS = {
    "script", "style", "noscript", "template", "iframe", "svg", "canvas",
    "form", "button", "input", "select", "textarea", "nav", "aside",
    "header", "footer", "object", "embed", "video", "audio", "map",
    "link", "meta", "title",
}

BOILER_TOKENS = {
    "nav", "navbar", "navigation", "menu", "topmenu", "megamenu",
    "sidebar", "widget", "widgets", "related", "recommended",
    "recommendations", "ad", "ads", "advert", "advertisement",
    "advertising", "promo", "promoted", "sponsor", "sponsored", "banner",
    "cookie", "cookies", "consent", "gdpr", "comment", "comments",
    "social", "share", "sharing", "masthead", "footer", "header",
    "breadcrumb", "breadcrumbs", "crumbs", "popup", "modal", "overlay",
    "subscribe", "subscription", "newsletter", "signup", "login",
    "pagination", "pager", "toolbar", "skiplink", "disqus",
}

MAIN_TOKENS = {"content", "article", "main", "post", "entry", "story",
               "maincontent", "articlebody"}


def _is_boiler(el: El) -> bool:
    if el.tag in DROP_TAGS:
        return True
    if el.tag in ("figure", "table", "pre", "figcaption"):
        return False  # never drop content-bearing structures by class
    return any(t in BOILER_TOKENS for t in el.cls_tokens())


def prune_boilerplate(el: El) -> Tuple[int, int]:
    """In-place drop of chrome subtrees; returns (n_dropped_subtrees,
    dropped_chars)."""
    dropped = 0
    chars = 0
    kept: List[object] = []
    for c in el.children:
        if isinstance(c, str):
            kept.append(c)
            continue
        if _is_boiler(c):
            dropped += 1
            chars += len(c.text())
            continue
        d, ch = prune_boilerplate(c)
        dropped += d
        chars += ch
        kept.append(c)
    el.children = kept
    return dropped, chars


def _link_chars(el: El) -> int:
    n = 0
    stack: List[object] = [el]
    while stack:
        x = stack.pop()
        if isinstance(x, El):
            if x.tag == "a":
                n += len(x.text())
            else:
                stack.extend(x.children)
    return n


def _count_links(el: El) -> int:
    n = 0
    stack: List[object] = [el]
    while stack:
        x = stack.pop()
        if isinstance(x, El):
            if x.tag == "a":
                n += 1
            stack.extend(x.children)
    return n


def _has_content_structures(el: El) -> bool:
    stack: List[object] = [el]
    while stack:
        x = stack.pop()
        if isinstance(x, El):
            if x.tag in ("figure", "table", "pre"):
                return True
            stack.extend(x.children)
    return False


def prune_link_farms(el: El, density: float = 0.7,
                     min_links: int = 4) -> int:
    """Readability-style fallback for pages without a declared content
    container: drop blocks that are mostly short anchors."""
    dropped = 0
    kept: List[object] = []
    for c in el.children:
        if isinstance(c, El) and c.tag in ("div", "section", "ul", "ol"):
            total = len(c.text())
            links = _count_links(c)
            if (links >= min_links and total > 0
                    and _link_chars(c) / total > density
                    and not _has_content_structures(c)):
                dropped += 1
                continue
            dropped += prune_link_farms(c, density, min_links)
        kept.append(c)
    el.children = kept
    return dropped


def find_main(body: El) -> Optional[El]:
    """The content container: semantic <main>/<article> or a
    content-flavored class/id, largest text mass wins."""
    best: Optional[El] = None
    best_len = -1
    stack: List[object] = [body]
    while stack:
        n = stack.pop()
        if not isinstance(n, El):
            continue
        is_cand = n.tag in ("main", "article") or any(
            t in MAIN_TOKENS for t in n.cls_tokens())
        if is_cand:
            tl = len(n.text())
            if tl > best_len:
                best, best_len = n, tl
        stack.extend(n.children)
    return best


# ----------------------------------------------------------------------
# span emission
# ----------------------------------------------------------------------

_FMT_BY_TAG = {"b": "b", "strong": "b", "i": "i", "em": "i", "u": "u",
               "s": "s", "strike": "s", "del": "s", "sub": "q",
               "sup": "p"}

_P_CLASS_KINDS = {
    "paragraph": "paragraph", "footnote": "footnote",
    "reference": "reference", "caption": "caption",
    "checkbox-selected": "checkbox_selected",
    "checkbox-unselected": "checkbox_unselected",
}


class _Emitter:
    def __init__(self) -> None:
        self.rows: List[dict] = []

    def emit(self, kind: str, text: str = "", media_ref: str = "") -> int:
        self.rows.append({"kind": kind, "text": text,
                          "media_ref": media_ref,
                          "offset": len(self.rows)})
        return len(self.rows) - 1

    # -- inline item decomposition --------------------------------------

    def _parse_item(self, el: El) -> Tuple[str, str, str, List[El]]:
        """Item element -> (text, fmt, hyperlink, trailing attached
        els): trailing groups (ul/ol/span.inline -> :of_prev) and
        trailing block elements (p/pre/figure/dl/table -> +child)."""
        kids = list(el.children)
        groups: List[El] = []
        while kids and isinstance(kids[-1], El) \
                and (_is_group_el(kids[-1])
                     or kids[-1].tag in _CHILD_BLOCK_TAGS):
            groups.insert(0, kids.pop())
        fmt = ""
        href = ""
        cur = kids
        while (len(cur) == 1 and isinstance(cur[0], El)
               and cur[0].tag in _FMT_BY_TAG):
            fmt += _FMT_BY_TAG[cur[0].tag]
            cur = list(cur[0].children)
        if len(cur) == 1 and isinstance(cur[0], El) and cur[0].tag == "a":
            href = cur[0].attrs.get("href", "")
            cur = list(cur[0].children)
        text = "".join(c if isinstance(c, str) else c.text() for c in cur)
        return text, fmt, href, groups

    def _emit_textual(self, base_kind: str, el: El,
                      as_child: bool = False) -> None:
        text, fmt, href, attached = self._parse_item(el)
        kind = base_kind
        if fmt:
            kind += f"+fmt={fmt}"
        if as_child:
            kind += "+child"
        self.emit(kind, text, href)
        for g in attached:
            if _is_group_el(g):
                self._emit_group(g, of_prev=True)
            else:
                self._emit_block_child(g, as_child=True)

    # -- groups ----------------------------------------------------------

    def _emit_group(self, el: El, of_prev: bool = False) -> None:
        if el.tag in ("ul", "ol"):
            self.emit("list_group:of_prev" if of_prev else "list_group")
            enum = el.tag == "ol"
            for c in el.children:
                if not isinstance(c, El):
                    continue
                if c.tag == "li":
                    self._emit_textual(
                        "list_item:enum" if enum else "list_item", c)
                elif _is_group_el(c):
                    self._emit_group(c)
                else:
                    self._emit_inline_child(c)
            self.emit("end_group")
        else:  # span.inline
            self.emit("inline_group:of_prev" if of_prev
                      else "inline_group")
            for c in el.children:
                if isinstance(c, El):
                    self._emit_inline_child(c)
            self.emit("end_group")

    def _emit_inline_child(self, c: El) -> None:
        toks = c.cls_tokens()
        if c.tag == "code":
            self._emit_code(c, block=False)
        elif c.tag == "span" and "math" in toks:
            self.emit("formula", c.text())
        elif c.tag == "span" and "inline" in toks:
            self._emit_group(c)
        elif c.tag in ("ul", "ol"):
            self._emit_group(c)
        else:
            self._emit_textual("text", c)

    def _emit_code(self, code_el: El, block: bool,
                   as_child: bool = False) -> None:
        lang = ""
        for t in (code_el.attrs.get("class", "") or "").split():
            if t.startswith("language-"):
                lang = t[len("language-"):]
        base = f"code:{lang}" if lang else "code"
        # fmt chain inside the code element
        cur = list(code_el.children)
        fmt = ""
        while (len(cur) == 1 and isinstance(cur[0], El)
               and cur[0].tag in _FMT_BY_TAG):
            fmt += _FMT_BY_TAG[cur[0].tag]
            cur = list(cur[0].children)
        text = "".join(c if isinstance(c, str) else c.text() for c in cur)
        kind = base + (f"+fmt={fmt}" if fmt else "")
        if as_child:
            kind += "+child"
        self.emit(kind, text)

    # -- tables ----------------------------------------------------------

    def _table_otsl(self, tbl: El) -> str:
        """HTML grid -> OTSL; row/col spans are validated and clamped
        (non-numeric -> 1, huge adversarial values -> 512) so one
        hostile cell cannot wedge the occupancy fill."""
        return self._table_otsl_impl(tbl)

    def _table_otsl_impl(self, tbl: El) -> str:
        rows = [c for c in tbl.children
                if isinstance(c, El) and c.tag == "tr"]
        # some parsers put tr under tbody
        if not rows:
            for sec in tbl.children:
                if isinstance(sec, El) and sec.tag in ("thead", "tbody",
                                                       "tfoot"):
                    rows.extend(c for c in sec.children
                                if isinstance(c, El) and c.tag == "tr")
        occupied: Dict[Tuple[int, int], bool] = {}
        cells: List[Cell] = []
        n_cols = 0
        for i, tr in enumerate(rows):
            j = 0
            for cell_el in tr.children:
                if not (isinstance(cell_el, El)
                        and cell_el.tag in ("td", "th")):
                    continue
                while occupied.get((i, j)):
                    j += 1
                rs = _span_attr(cell_el, "rowspan")
                cs = _span_attr(cell_el, "colspan")
                toks = cell_el.cls_tokens()
                cells.append(Cell(
                    text=cell_el.text(),
                    start_row=i, end_row=i + rs,
                    start_col=j, end_col=j + cs,
                    column_header=(cell_el.tag == "th"
                                   and cell_el.attrs.get("scope") == "col"),
                    row_header=(cell_el.tag == "th"
                                and cell_el.attrs.get("scope") == "row"),
                    row_section=("section" in toks and "row" in toks),
                ))
                for ri in range(i, i + rs):
                    for ci in range(j, j + cs):
                        occupied[(ri, ci)] = True
                j += cs
            n_cols = max(n_cols, j)
        return encode_otsl(Table(cells, len(rows), n_cols))

    # -- figures ---------------------------------------------------------

    def _figure_ref(self, fig: El) -> Tuple[str, str, str]:
        """-> (float_kind, media_ref, chart_class)."""
        toks = fig.cls_tokens()
        chart_class = ""
        if "chart" in toks:
            cls_attr = fig.attrs.get("class", "")
            m = re.search(r"chart-([A-Za-z0-9_]+)", cls_attr)
            if m:
                chart_class = m.group(1)
        img = _find_in_figure(fig, "img")
        if img is not None:
            if img.attrs.get("id"):
                # ImageRef-bearing picture: the anchor id is the media
                # reference (the src is the actual image uri)
                return ("chart" if chart_class else "picture",
                        img.attrs["id"], chart_class)
            src = img.attrs.get("src", "")
            if src.startswith("data:"):
                # inline images carry no filename: no reference
                return ("chart" if chart_class else "picture", "",
                        chart_class)
            name = src.rsplit("/", 1)[-1]
            if name.endswith(".png"):
                name = name[: -len(".png")]
            return ("chart" if chart_class else "picture", name,
                    chart_class)
        tbl = _find_in_figure(fig, "table")
        if tbl is not None:
            return "table", tbl.attrs.get("id", ""), ""
        return "picture", "", ""

    @staticmethod
    def _image_ref_of(img: El) -> Optional[dict]:
        """Reconstruct the ImageRef dict an id-anchored <img> publishes
        (dialect: dpi is not page-expressible and normalizes to 72)."""
        if not img.attrs.get("id"):
            return None
        src = img.attrs.get("src", "")
        w = img.attrs.get("width")
        h = img.attrs.get("height")
        return {"mimetype": mime_of_uri(src), "dpi": 72,
                "size": {"width": _float_attr(w), "height": _float_attr(h)},
                "uri": src}

    def _emit_figure(self, fig: El, as_child: bool = False) -> None:
        float_kind, mref, chart_class = self._figure_ref(fig)
        child_suffix = "+child" if as_child else ""
        anns: List[Tuple[str, str]] = []
        float_idx: Optional[int] = None
        chart_otsl = ""
        table_otsl = ""
        image_ref: Optional[dict] = None
        for c in fig.children:
            if not isinstance(c, El):
                continue
            toks = c.cls_tokens()
            if c.tag == "figcaption":
                self.emit(f"caption:{mref}" if mref else "caption",
                          c.text())
            elif c.tag == "img":
                kind = (f"chart:{chart_class}" if chart_class
                        else "picture") + child_suffix
                image_ref = self._image_ref_of(c)
                float_idx = self.emit(kind, "", mref)
            elif c.tag == "table":
                if chart_class or "chart" in toks:
                    chart_otsl = self._table_otsl(c)
                else:
                    table_otsl = self._table_otsl(c)
                    float_idx = self.emit("table" + child_suffix, "",
                                          mref)
            elif c.tag == "p" and toks and toks[0] == "annotation":
                # class "annotation-desc" -> tokens [annotation, desc]
                anns.append((toks[1] if len(toks) > 1 else "desc",
                             c.text()))
            elif _is_group_el(c):
                self._emit_group(c, of_prev=True)
            else:
                self._emit_block_child(c, as_child=True)
        if float_idx is not None:
            row = self.rows[float_idx]
            img_tag = encode_image_ref(image_ref)
            if row["kind"].startswith("chart"):
                row["text"] = chart_otsl + encode_pic_anns(anns) + img_tag
            elif row["kind"].startswith("table"):
                row["text"] = table_otsl + encode_pic_anns(anns)
            else:
                row["text"] = encode_pic_anns(anns) + img_tag

    # -- key-value graphs ------------------------------------------------

    def _emit_kv(self, dl: El, as_child: bool = False) -> None:
        kind = ("form" if "form-region" in (dl.attrs.get("class") or "")
                else "key_value_region")
        if as_child:
            kind += "+child"
        cells: List[KvCell] = []
        links: List[KvLink] = []
        for c in dl.children:
            if not (isinstance(c, El) and c.tag in ("dt", "dd")):
                continue
            cid_raw = (c.attrs.get("id") or "")
            m = re.match(r"c(\d+)$", cid_raw)
            cid = int(m.group(1)) if m else len(cells)
            label = "key" if c.tag == "dt" else "value"
            text_parts: List[str] = []
            for k in c.children:
                if isinstance(k, str):
                    text_parts.append(k)
                    continue
                k_classes = (k.attrs.get("class") or "").split()
                if k.tag == "a" and "kv-link" in k_classes:
                    href = k.attrs.get("href", "")
                    tm = re.match(r"#c(\d+)$", href)
                    if tm:
                        lab = "to_value"
                        for t in k_classes:
                            if t.startswith("kv-") and t != "kv-link":
                                lab = t[len("kv-"):]
                        links.append(KvLink(cid, int(tm.group(1)), lab))
                else:
                    text_parts.append(k.text())
            cells.append(KvCell(label, cid, "".join(text_parts).strip()))
        self.emit(kind, encode_kv(cells, links))

    # -- block dispatch --------------------------------------------------

    def _emit_block_child(self, el: El, as_child: bool = False) -> None:
        tag = el.tag
        toks = el.cls_tokens()
        if tag == "h1":
            self._emit_textual("title", el, as_child)
        elif tag in ("h2", "h3", "h4", "h5", "h6"):
            self._emit_textual(f"section_header:{int(tag[1]) - 1}", el,
                               as_child)
        elif tag == "p":
            if "formula" in toks:
                math = _find_first(el, "span")
                kind = "formula" + ("+child" if as_child else "")
                self.emit(kind, math.text() if math is not None else
                          el.text())
            elif "inline" in toks:
                self._emit_group(el)
            elif toks and toks[0] == "annotation":
                pass  # orphan annotation outside a figure: not content
            else:
                kind = "text"
                if "checkbox" in toks:
                    kind = ("checkbox_unselected" if "unselected" in toks
                            else "checkbox_selected")
                else:
                    for t in toks:
                        if t in _P_CLASS_KINDS:
                            kind = _P_CLASS_KINDS[t]
                            break
                self._emit_textual(kind, el, as_child)
        elif tag in ("ul", "ol"):
            self._emit_group(el)
        elif tag == "pre":
            code = _find_first(el, "code")
            if code is not None:
                self._emit_code(code, block=True, as_child=as_child)
            else:
                self._emit_code(el, block=True, as_child=as_child)
        elif tag == "figure":
            self._emit_figure(el, as_child=as_child)
        elif tag == "table":
            otsl = self._table_otsl(el)
            kind = "table" + ("+child" if as_child else "")
            self.emit(kind, otsl, el.attrs.get("id", ""))
        elif tag == "dl":
            self._emit_kv(el, as_child=as_child)
        elif tag == "span":
            if "inline" in toks:
                self._emit_group(el)
            elif "math" in toks:
                self.emit("formula", el.text())
            else:
                self._emit_textual("text", el, as_child)
        elif tag == "div" and "attached" in toks:
            # item-with-block-children wrapper (render.py: block kids
            # cannot legally nest in <p>): first element is the item,
            # the rest are its attached children in order
            kids = [c for c in el.children if isinstance(c, El)]
            if kids:
                self._emit_block_child(kids[0], as_child=as_child)
                for c in kids[1:]:
                    if _is_group_el(c):
                        self._emit_group(c, of_prev=True)
                    else:
                        self._emit_block_child(c, as_child=True)
        elif tag in ("div", "section", "article", "main", "body",
                     "blockquote"):
            for c in el.children:
                if isinstance(c, El):
                    self._emit_block_child(c)
        # anything else: not content (hr, br, stray wrappers)


_CHILD_BLOCK_TAGS = ("p", "pre", "figure", "dl", "table",
                     "blockquote", "div")


def _is_group_el(el: El) -> bool:
    if el.tag in ("ul", "ol"):
        return True
    return el.tag == "span" and "inline" in el.cls_tokens()


# ----------------------------------------------------------------------
# public API
# ----------------------------------------------------------------------

def extract_spans(html: str) -> Tuple[List[dict], Dict[str, int]]:
    """HTML page -> (span rows, stats).

    stats: page_chars (all text in the raw body), content_chars (text
    carried by emitted spans), n_dropped (pruned chrome subtrees),
    main_found (1 if a content container was declared).
    """
    root = parse_html(html)
    html_el = _find_first(root, "html") or root
    head = _find_first(html_el, "head")
    body = _find_first(html_el, "body") or html_el

    page_chars = len(body.text())

    # provenance metas (read before pruning drops <meta>)
    origin_kind = origin_text = origin_mime = ""
    if head is not None:
        metas = {}
        stack: List[object] = [head]
        while stack:
            n = stack.pop()
            if isinstance(n, El):
                if n.tag == "meta" and n.attrs.get("name"):
                    metas[n.attrs["name"]] = n.attrs.get("content", "")
                stack.extend(n.children)
        if "doc-hash" in metas:
            origin_kind = f"origin:{metas['doc-hash']}"
            if metas.get("doc-uri"):
                origin_kind += f":{metas['doc-uri']}"
            origin_text = metas.get("doc-filename", "")
            origin_mime = metas.get("doc-mimetype", "")

    n_dropped, _ = prune_boilerplate(body)
    main = find_main(body)
    if main is None:
        n_dropped += prune_link_farms(body)
        main = body

    em = _Emitter()
    if origin_kind:
        em.emit(origin_kind, origin_text, origin_mime)
    for c in main.children:
        if isinstance(c, El):
            em._emit_block_child(c)

    content_chars = sum(len(str(r["text"])) for r in em.rows)
    stats = {"page_chars": page_chars, "content_chars": content_chars,
             "n_dropped": n_dropped,
             "main_found": 0 if main is body else 1}
    return em.rows, stats
