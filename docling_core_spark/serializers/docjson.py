"""DoclingDocument-JSON export: engine doc tree -> reference-format
JSON (S2, document.py:4301-4342).

Produces a dict that validates against the reference's pydantic schema
(schema_name "DoclingDocument", version 1.6.0): typed pools + a body
tree of ``{"$ref": ...}`` pointers, synthetic provenance from the span
offsets (model/doc.py node_bbox), chart pictures carrying
classification + tabular_chart_data annotations. The parity tests load
this JSON with the live reference library and assert identical
markdown/chunk output - the interop contract in both directions
(sources/docjson.py is the load side).
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional

from docling_core_spark.model.doc import (
    PAGE_H,
    PAGE_W,
    K_CODE,
    K_FORM,
    K_FORMULA,
    K_INLINE_GROUP,
    K_KEY_VALUE,
    K_LIST_GROUP,
    K_LIST_ITEM,
    K_PICTURE,
    K_SECTION_HEADER,
    K_TABLE,
    K_TITLE,
    LAYER_FURNITURE,
    Doc,
    Node,
    node_bbox,
)
import re as _re

from docling_core_spark.model.otsl import parse_otsl

_RICH_MARK = _re.compile(r"^<rich_(\d+)>$")

VERSION = "1.6.0"


def _prov(node: Node, text: str = "") -> List[dict]:
    l, t, r, b = node_bbox(node.offset)
    return [{
        "page_no": node.page_no,
        "bbox": {"l": l, "t": t, "r": r, "b": b,
                 "coord_origin": "TOPLEFT"},
        "charspan": [0, len(text)],
    }]


def _table_data(otsl: str) -> dict:
    table = parse_otsl(otsl)
    return {
        "table_cells": [{
            "row_span": c.row_span, "col_span": c.col_span,
            "start_row_offset_idx": c.start_row,
            "end_row_offset_idx": c.end_row,
            "start_col_offset_idx": c.start_col,
            "end_col_offset_idx": c.end_col,
            "text": c.text,
            "column_header": c.column_header,
            "row_header": c.row_header,
            "row_section": c.row_section,
        } for c in table.cells],
        "num_rows": table.num_rows,
        "num_cols": table.num_cols,
    }


def export_to_docjson(doc: Doc, name: Optional[str] = None) -> dict:
    """Engine tree -> reference-format document dict."""
    pools: Dict[str, List[dict]] = {
        "groups": [], "texts": [], "pictures": [], "tables": [],
        "key_value_items": [], "form_items": [],
    }
    pages = set()

    def alloc(pool: str) -> str:
        return f"#/{pool}/{len(pools[pool])}"

    def text_item(node: Node, parent_ref: str, label: str,
                  extra: Optional[dict] = None) -> str:
        ref = alloc("texts")
        item = {
            "self_ref": ref, "parent": {"$ref": parent_ref},
            "children": [],
            "content_layer": ("furniture"
                              if node.layer == LAYER_FURNITURE else "body"),
            "label": label,
            "prov": _prov(node, node.text),
            "orig": node.text, "text": node.text,
        }
        if node.fmt:
            item["formatting"] = {
                "bold": "b" in node.fmt, "italic": "i" in node.fmt,
                "underline": "u" in node.fmt,
                "strikethrough": "s" in node.fmt,
                "script": ("sub" if "q" in node.fmt
                           else "super" if "p" in node.fmt
                           else "baseline"),
            }
        if node.hyperlink:
            item["hyperlink"] = node.hyperlink
        if extra:
            item.update(extra)
        pools["texts"].append(item)
        pages.add(node.page_no)
        return ref

    def caption_refs(node: Node, parent_ref: str) -> List[dict]:
        refs = []
        for cap in node.captions:
            refs.append({"$ref": text_item(cap, parent_ref, "caption")})
        return refs

    def walk(node: Node, parent_ref: str) -> List[dict]:
        children: List[dict] = []
        for c in node.children:
            kind = c.kind
            if kind == "caption" or c.label == "caption":
                # captions serialize with their owner; standalone
                # captions (no owner) keep their body position
                if id(c) in doc.caption_owner:
                    continue
                children.append(
                    {"$ref": text_item(c, parent_ref, "caption")})
                continue
            if kind in (K_LIST_GROUP, K_INLINE_GROUP):
                ref = alloc("groups")
                item = {
                    "self_ref": ref, "parent": {"$ref": parent_ref},
                    "children": [],
                    "content_layer": ("furniture"
                                      if c.layer == LAYER_FURNITURE
                                      else "body"),
                    "name": "group",
                    "label": ("list" if kind == K_LIST_GROUP
                              else "inline"),
                }
                pools["groups"].append(item)
                item["children"] = walk(c, ref)
                children.append({"$ref": ref})
            elif kind == K_TITLE:
                ref = text_item(c, parent_ref, "title")
                entry = pools["texts"][-1]
                if c.children:  # nested groups (walk appends to pools)
                    entry["children"] = walk(c, ref)
                children.append({"$ref": ref})
            elif kind == K_SECTION_HEADER:
                ref = text_item(c, parent_ref, "section_header",
                                {"level": c.level})
                entry = pools["texts"][-1]
                if c.children:
                    entry["children"] = walk(c, ref)
                children.append({"$ref": ref})
            elif kind == K_LIST_ITEM:
                # marker must be serialized even when empty: the model
                # default is "-", which would change rendering
                ref = text_item(c, parent_ref, "list_item", {
                    "enumerated": c.enumerated,
                    "marker": c.marker,
                })
                entry = pools["texts"][-1]
                if c.children:
                    entry["children"] = walk(c, ref)
                children.append({"$ref": ref})
            elif kind == K_CODE:
                ref = text_item(c, parent_ref, "code", {
                    "captions": [], "references": [], "footnotes": [],
                    "code_language": c.code_language or "unknown",
                })
                item = pools["texts"][-1]
                item["captions"] = caption_refs(c, parent_ref)
                children.append({"$ref": ref})
            elif kind == K_FORMULA:
                children.append({"$ref": text_item(
                    c, parent_ref, "formula",
                    {"orig": c.orig or c.text})})
            elif kind == K_PICTURE:
                ref = alloc("pictures")
                anns: List[dict] = []
                if c.chart_class:
                    anns.append({
                        "kind": "classification",
                        "provenance": "synthetic",
                        "predicted_classes": [{
                            "class_name": c.chart_class,
                            "confidence": 1.0}],
                    })
                    if c.text:
                        anns.append({
                            "kind": "tabular_chart_data",
                            "title": c.chart_class,
                            "chart_data": _table_data(c.text),
                        })
                for ak, av in c.pic_anns:
                    if ak == "desc":
                        anns.append({"kind": "description", "text": av,
                                     "provenance": "synthetic"})
                    elif ak == "smiles":
                        anns.append({
                            "kind": "molecule_data", "smi": av,
                            "confidence": 1.0,
                            "class_name": "chemistry_molecular_structure",
                            "segmentation": [], "provenance": "synthetic",
                        })
                item = {
                    "self_ref": ref, "parent": {"$ref": parent_ref},
                    "children": [], "content_layer": "body",
                    "label": "picture", "prov": _prov(c),
                    "captions": [], "references": [], "footnotes": [],
                    "annotations": anns,
                }
                if c.image:
                    # ImageRef (document.py:798-862): emitted with the
                    # reference's field order mimetype/dpi/size/uri
                    item["image"] = {
                        "mimetype": c.image.get("mimetype", "image/png"),
                        "dpi": c.image.get("dpi", 72),
                        "size": c.image.get("size",
                                            {"width": 0.0, "height": 0.0}),
                        "uri": c.image.get("uri", ""),
                    }
                pools["pictures"].append(item)
                pages.add(c.page_no)
                item["captions"] = caption_refs(c, parent_ref)
                children.append({"$ref": ref})
            elif kind == K_TABLE:
                ref = alloc("tables")
                item = {
                    "self_ref": ref, "parent": {"$ref": parent_ref},
                    "children": [], "content_layer": "body",
                    "label": "table", "prov": _prov(c),
                    "captions": [], "references": [], "footnotes": [],
                    "annotations": [
                        {"kind": "description", "text": av,
                         "provenance": "synthetic"}
                        for ak, av in c.pic_anns if ak == "desc"],
                    "data": _table_data(c.text),
                }
                pools["tables"].append(item)
                pages.add(c.page_no)
                if c.children:
                    # rich-table children + <rich_K> cell markers ->
                    # RichTableCell refs (document.py:344-358)
                    item["children"] = walk(c, ref)
                    kid_refs = [r["$ref"] for r in item["children"]]
                    for cell in item["data"]["table_cells"]:
                        m = _RICH_MARK.fullmatch(cell.get("text") or "")
                        if m and int(m.group(1)) < len(kid_refs):
                            cell["ref"] = {
                                "$ref": kid_refs[int(m.group(1))]}
                            cell["text"] = ""
                item["captions"] = caption_refs(c, parent_ref)
                children.append({"$ref": ref})
            elif kind in (K_KEY_VALUE, K_FORM):
                from docling_core_spark.model.kv import parse_kv

                cells, links = parse_kv(c.text)
                pool = ("key_value_items" if kind == K_KEY_VALUE
                        else "form_items")
                label = ("key_value_region" if kind == K_KEY_VALUE
                         else "form")
                ref = alloc(pool)
                pools[pool].append({
                    "self_ref": ref, "parent": {"$ref": parent_ref},
                    "children": [], "content_layer": "body",
                    "label": label, "prov": _prov(c),
                    "captions": [], "references": [], "footnotes": [],
                    "graph": {
                        "cells": [{"label": cl.label, "cell_id": cl.cell_id,
                                   "text": cl.text, "orig": cl.text}
                                  for cl in cells],
                        "links": [{"label": ln.label,
                                   "source_cell_id": ln.source,
                                   "target_cell_id": ln.target}
                                  for ln in links],
                    },
                })
                pages.add(c.page_no)
                children.append({"$ref": ref})
            else:  # plain text-likes incl. furniture
                children.append({"$ref": text_item(c, parent_ref,
                                                   c.label)})
        return children

    body = {
        "self_ref": "#/body", "children": [],
        "content_layer": "body", "name": "_root_",
        "label": "unspecified",
    }
    body["children"] = walk(doc.body, "#/body")

    out_head: dict = {
        "schema_name": "DoclingDocument",
        "version": VERSION,
        "name": name if name is not None else doc.doc_id,
    }
    if doc.origin is not None:
        o = doc.origin
        origin = {"mimetype": o["mimetype"],
                  "binary_hash": o["binary_hash"],
                  "filename": o["filename"]}
        if o.get("uri"):
            origin["uri"] = o["uri"]
        out_head["origin"] = origin
    return {
        **out_head,
        "furniture": {
            "self_ref": "#/furniture", "children": [],
            "content_layer": "furniture", "name": "_root_",
            "label": "unspecified",
        },
        "body": body,
        "groups": pools["groups"],
        "texts": pools["texts"],
        "pictures": pools["pictures"],
        "tables": pools["tables"],
        "key_value_items": pools["key_value_items"],
        "form_items": pools["form_items"],
        "pages": {
            str(p): {"size": {"width": PAGE_W, "height": PAGE_H},
                     "page_no": p, "metadata": {}}
            for p in sorted(pages)
        },
    }


def export_to_docjson_str(doc: Doc, name: Optional[str] = None) -> str:
    return json.dumps(export_to_docjson(doc, name=name))


def export_to_docyaml_str(doc: Doc, name: Optional[str] = None) -> str:
    """S3 YAML sink (save_as_yaml, document.py:4344-4369): the reference
    yaml.dump()s the same dict that the JSON sink writes; loadable by
    its load_from_yaml (document.py:4371-4385)."""
    import yaml

    return yaml.safe_dump(export_to_docjson(doc, name=name),
                          default_flow_style=False, allow_unicode=True)
