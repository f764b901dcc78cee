"""HTML projection of the span grammar.

``project_for_html(spans)`` answers: *if this document were published as
a web page and its main content extracted back, which spans survive and
in what normal form?* It is the ground truth the extraction operator is
checked against - computed straight from the span sequence, WITHOUT
running the renderer or the extractor, so the round-trip test
``extract(render(x)) == project(x)`` cross-validates two independent
code paths.

Normalization rules (each mirrors what real HTML can express; cf. the
reference's own HTML serializer surface, serializer/html.py, which
likewise has no furniture/page concept on a single page):

* ``origin:BH[:URI]``  kept verbatim (pages carry <meta> provenance).
* ``furniture:*``      dropped - page chrome (site header/footer) is
                       exactly what boilerplate stripping removes.
* ``page_break:N``     dropped - web documents are single-page.
* ``list_group:furniture`` / ``inline_group:furniture`` lose the
  furniture flag (children are kept; the layer concept has no HTML
  counterpart).
* list markers normalize: ``list_item:enum[:M]`` -> ``list_item:enum``,
  ``list_item:plain:M`` -> ``list_item`` (HTML ol/ul cannot carry
  arbitrary markers); every direct item of a group coerces to the
  group's type = the type of its first direct item (ol vs ul).
* ``code`` spans lose their media_ref; ``formula`` spans lose their
  orig marker (neither is expressible on a page).
* table/chart OTSL normalizes through ``encode_otsl(parse_otsl(.))``
  (ragged rows pad with <ecel>, exactly what a dense HTML grid yields);
  annotations re-encode canonically after the stream.
* ``key_value_region``/``form`` text re-encodes through
  ``encode_kv(parse_kv(.))`` (canonical cell/link form).
* captions relocate adjacent to their floating item: leading captions
  to immediately before it, trailing captions to immediately after it
  and its attached children (= the figcaption positions in a <figure>).
  No-op when already adjacent (the corpus case). Captions whose
  media_ref matches no floating item degrade to plain ``caption``.
* formatting flags, hyperlinks, section levels, +child attachments and
  :of_prev groups all survive (HTML expresses each natively).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from docling_core_spark.model.kv import encode_kv, parse_kv
from docling_core_spark.model.otsl import encode_otsl, parse_otsl
from docling_core_spark.model.spans import (
    encode_pic_anns,
    parse_image_ref,
    split_pic_anns,
    split_table_anns,
)

Row = Dict[str, object]  # {kind, text, media_ref, offset}

_FLOATING_PREFIXES = ("picture", "table", "chart")


def split_kind(kind: str) -> Tuple[str, str, bool]:
    """kind -> (base_kind_without_suffixes, fmt, as_child)."""
    as_child = kind.endswith("+child")
    if as_child:
        kind = kind[: -len("+child")]
    fmt = ""
    if "+fmt=" in kind:
        kind, fmt = kind.split("+fmt=", 1)
    return kind, fmt, as_child


def rejoin_kind(base: str, fmt: str, as_child: bool) -> str:
    out = base
    if fmt:
        out += f"+fmt={fmt}"
    if as_child:
        out += "+child"
    return out


def _is_floating(base: str) -> bool:
    return base.split(":", 1)[0] in _FLOATING_PREFIXES


def _norm_otsl(text: str) -> str:
    return encode_otsl(parse_otsl(text))


_EXT_MIME = {".png": "image/png", ".jpg": "image/jpeg",
             ".jpeg": "image/jpeg", ".gif": "image/gif",
             ".webp": "image/webp"}


def _mime_of_uri(uri: str) -> str:
    """The page-dialect mimetype rule (independent restatement of the
    spec extract.mime_of_uri implements)."""
    if uri.startswith("data:"):
        head = uri[5:].split(",", 1)[0].split(";", 1)[0]
        return head or "image/png"
    low = uri.lower()
    for ext, mime in _EXT_MIME.items():
        if low.endswith(ext):
            return mime
    return "image/png"


def _norm_image(image, media_ref: str) -> str:
    """ImageRefs survive the page round trip when the picture has a
    media id to anchor them; dpi is not HTML-expressible and
    normalizes to 72, mimetype re-derives from the uri, size keeps
    its pixel floats (width/height attributes)."""
    from docling_core_spark.model.spans import encode_image_ref

    if not image or not media_ref:
        return ""
    uri = str(image.get("uri", ""))
    size = image.get("size") or {}
    return encode_image_ref({
        "mimetype": _mime_of_uri(uri), "dpi": 72,
        "size": {"width": float(size.get("width") or 0.0),
                 "height": float(size.get("height") or 0.0)},
        "uri": uri})


def _figure_end(ordered: Sequence[dict], i: int) -> int:
    """Index one past the floating item at ``i`` and its attached
    subtree (+child items and :of_prev groups - the codec attaches both
    to the preceding item, model/spans.py:107-163)."""
    j = i + 1
    depth = 0
    n = len(ordered)
    while j < n:
        base, _, as_child = split_kind(ordered[j]["kind"])
        root = base.split(":", 1)[0]
        if depth == 0:
            if root in ("list_group", "inline_group") \
                    and "of_prev" in base.split(":")[1:]:
                depth += 1
            elif as_child or root == "page_break":
                pass
            else:
                break
        else:
            if root in ("list_group", "inline_group"):
                depth += 1
            elif root == "end_group":
                depth -= 1
        j += 1
    return j


def _relocate_captions(ordered: List[dict]) -> List[dict]:
    """Move caption spans adjacent to their floating item (leading ones
    immediately before, trailing ones to the figure end); unowned
    captions stay in place as plain ``caption`` spans."""
    float_pos: Dict[str, int] = {}
    for i, s in enumerate(ordered):
        base, _, _ = split_kind(s["kind"])
        if _is_floating(base) and s["media_ref"]:
            float_pos.setdefault(s["media_ref"], i)

    lead: Dict[int, List[dict]] = {}
    insert_at: Dict[int, List[dict]] = {}  # original index -> captions
    keep: List[Tuple[int, dict]] = []
    for i, s in enumerate(ordered):
        base, _, _ = split_kind(s["kind"])
        if base.startswith("caption"):
            mref = base.split(":", 1)[1] if ":" in base else s["media_ref"]
            tgt = float_pos.get(mref or "")
            if tgt is None:
                keep.append((i, {**s, "kind": "caption", "media_ref": ""}))
            elif i < tgt:
                lead.setdefault(tgt, []).append(
                    {**s, "kind": f"caption:{mref}", "media_ref": ""})
            else:
                end = _figure_end(ordered, tgt)
                insert_at.setdefault(end, []).append(
                    {**s, "kind": f"caption:{mref}", "media_ref": ""})
            continue
        keep.append((i, s))

    out: List[dict] = []
    pending = sorted(insert_at)  # ascending original indices
    p = 0
    for i, s in keep:
        # flush trailing captions whose figure ended at or before here
        # (the end index may itself be a removed caption's position)
        while p < len(pending) and pending[p] <= i:
            out.extend(insert_at[pending[p]])
            p += 1
        out.extend(lead.pop(i, ()))
        out.append(s)
    while p < len(pending):  # figure end == end of document
        out.extend(insert_at[pending[p]])
        p += 1
    return out


def project_for_html(spans: Sequence[dict]) -> List[Row]:
    """Span rows -> the HTML-surviving normal form, offsets re-assigned
    densely from 0 in the projected order."""
    ordered = _relocate_captions(sorted(spans, key=lambda s: s["offset"]))

    out: List[Row] = []

    def emit(kind: str, text: str = "", media_ref: str = "") -> None:
        out.append({"kind": kind, "text": text, "media_ref": media_ref,
                    "offset": len(out)})

    # group-type coercion: the first direct list_item fixes ol vs ul
    group_stack: List[dict] = []  # {"kind": root, "enum": None|bool}

    def norm_list_item(base: str) -> str:
        parts = base.split(":", 2)
        enumerated = len(parts) > 1 and parts[1] == "enum"
        for entry in reversed(group_stack):
            if entry["kind"] == "list_group":
                if entry["enum"] is None:
                    entry["enum"] = enumerated
                enumerated = entry["enum"]
                break
        return "list_item:enum" if enumerated else "list_item"

    for s in ordered:
        base, fmt, as_child = split_kind(s["kind"])
        root = base.split(":", 1)[0]
        if root == "origin":
            emit(base, s["text"], s["media_ref"])
        elif root in ("page_break", "furniture"):
            continue
        elif root in ("list_group", "inline_group"):
            flags = [f for f in base.split(":")[1:] if f != "furniture"]
            g_kind = root + (":" + ":".join(flags) if flags else "")
            group_stack.append({"kind": root, "enum": None})
            emit(rejoin_kind(g_kind, fmt, as_child))
        elif root == "end_group":
            if group_stack:
                group_stack.pop()
            emit("end_group")
        elif root == "table":
            # fmt has no meaning on floating kinds (the codec does not
            # carry it - model/spans.py table/picture branches); <image>
            # refs don't survive a page (the img src IS the reference)
            otsl, anns = split_table_anns(s["text"])
            emit(rejoin_kind(base, "", as_child),
                 _norm_otsl(otsl) + encode_pic_anns(anns), s["media_ref"])
        elif root == "chart":
            stripped, image = parse_image_ref(s["text"])
            otsl, anns = split_pic_anns(stripped)
            emit(rejoin_kind(base, "", as_child),
                 _norm_otsl(otsl) + encode_pic_anns(anns)
                 + _norm_image(image, s["media_ref"]), s["media_ref"])
        elif root == "picture":
            stripped, image = parse_image_ref(s["text"])
            _, anns = split_pic_anns(stripped)
            emit(rejoin_kind(base, "", as_child),
                 encode_pic_anns(anns)
                 + _norm_image(image, s["media_ref"]), s["media_ref"])
        elif root == "list_item":
            emit(rejoin_kind(norm_list_item(base), fmt, as_child),
                 s["text"], s["media_ref"])
        elif root == "code":
            emit(rejoin_kind(base, fmt, as_child), s["text"], "")
        elif root == "formula":
            # fmt is not carried on formulas (codec drops it too)
            emit(rejoin_kind(base, "", as_child), s["text"], "")
        elif base in ("key_value_region", "form"):
            cells, links = parse_kv(s["text"])
            emit(rejoin_kind(base, "", as_child),
                 encode_kv(cells, links), "")
        elif root == "section_header":
            # h2..h6 only: levels clamp to 1..5 (render.py heading tag)
            try:
                lvl = int(base.split(":", 1)[1])
            except (IndexError, ValueError):
                lvl = 1
            lvl = min(max(lvl, 1), 5)
            emit(rejoin_kind(f"section_header:{lvl}", fmt, as_child),
                 s["text"], s["media_ref"])
        else:
            emit(s["kind"], s["text"], s["media_ref"])

    for idx, r in enumerate(out):
        r["offset"] = idx
    return out
