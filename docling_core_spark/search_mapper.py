"""JSON Schema -> search-index mapping (Elasticsearch/Lucene).

Re-implements the reference's ``JsonSchemaToSearchMapper``
(search/json_schema_to_search_mapper.py:21-408) without the external
``jsonref`` dependency: a pydantic ``model_json_schema()`` (or any
JSON Schema) becomes an index definition ``{settings, mappings}`` by

1. dropping ``x-es-suppress``-marked subtrees,
2. inlining local ``$ref``s (own pointer resolver; JSON-Reference
   semantics - the ref node is replaced wholesale),
3. merging anyOf/allOf/oneOf unions (null arms dropped),
4. cleaning types (tuple items -> first item, 'object' removed,
   (string, date-time) -> date, number -> double, string -> text),
5. collapsing arrays (the items dict merges into the parent),
6. removing schema-only keys (description, required, ...; property
   NAMES are exempt),
7. translating ``x-es-*`` flags to their bare names,
8. pruning empty values,

then merging ``settings_extra`` / ``mappings_extra``. Output is
asserted equal to the reference's committed ground truths
(test/data/json_schemas/document-ref.json, dbrecord-ref.json) in
tests/test_search_mapper.py.
"""

from __future__ import annotations

import re
from copy import deepcopy
from typing import Any, Dict, Optional, Tuple

_RM_KEYS = (
    "description", "required", "title", "additionalProperties",
    "format", "enum", "pattern", "$comment", "default", "minItems",
    "maxItems", "minimum", "maximum", "minLength", "maxLength",
    "exclusiveMinimum", "exclusiveMaximum", "$defs", "const",
)

_TYPE_FORMAT = {("string", "date-time"): "date"}
_TYPE_MAP = {"number": "double", "string": "text"}
_TYPES_TO_REMOVE = ("object",)
_ES_FLAG_RE = re.compile(r"^(?:x-es-)(.*)")
_SUPPRESS_KEY = "x-es-suppress"

DEFAULT_SETTINGS = {
    "analysis": {
        "normalizer": {
            "lowercase_asciifolding": {
                "type": "custom",
                "filter": ["lowercase", "asciifolding"],
            }
        }
    }
}


def _pointer_get(root: dict, pointer: str) -> Any:
    """Resolve a local JSON pointer '#/a/b/0'."""
    node: Any = root
    if pointer in ("#", ""):
        return node
    for part in pointer.lstrip("#/").split("/"):
        part = part.replace("~1", "/").replace("~0", "~")
        if isinstance(node, list):
            node = node[int(part)]
        else:
            node = node[part]
    return node


def inline_refs(schema: dict) -> Any:
    """Replace local $ref nodes with their targets (JSON-Reference
    semantics: sibling keys are discarded), with a cycle guard the
    reference inherits from jsonref's lazy proxies."""
    def walk(node: Any, seen: Tuple[str, ...]) -> Any:
        if isinstance(node, list):
            return [walk(v, seen) for v in node]
        if isinstance(node, dict):
            ref = node.get("$ref")
            if isinstance(ref, str) and ref.startswith("#"):
                if ref in seen:
                    return {}
                try:
                    target = _pointer_get(schema, ref)
                except (KeyError, IndexError, ValueError):
                    return {}
                return walk(target, seen + (ref,))
            return {k: walk(v, seen) for k, v in node.items()}
        return node

    return walk(schema, ())


def _suppress(doc: Any) -> Any:
    if isinstance(doc, list):
        return [_suppress(v) for v in doc]
    if isinstance(doc, dict):
        if doc.get(_SUPPRESS_KEY) is True:
            return {}
        return {k: _suppress(v) for k, v in doc.items()}
    return doc


def _merge_unions(value: Any) -> Any:
    if isinstance(value, list):
        return [_merge_unions(v) for v in value]
    if isinstance(value, dict):
        union: list = []
        merged: dict = {}
        for k, v in value.items():
            if k in ("oneOf", "allOf", "anyOf"):
                union.extend(v)
            else:
                merged[k] = v
        if not union:
            return {k: _merge_unions(v) for k, v in value.items()}
        for u in union:
            if not isinstance(u, dict):
                continue
            for k, v in u.items():
                if k == "type" and v == "null":
                    continue
                elif not isinstance(v, dict) or k not in merged:
                    merged[k] = _merge_unions(v)
                else:
                    merged[k] = _merge_unions({**merged[k], **v})
        return merged
    return value


def _clean_types(value: Any) -> Any:
    if isinstance(value, list):
        return [_clean_types(v) for v in value]
    if isinstance(value, dict):
        if isinstance(value.get("type"), str):
            t = value["type"]
            if t == "array" and isinstance(value.get("items"), list):
                value["items"] = value["items"][0] if value["items"] else {}
            if t in _TYPES_TO_REMOVE:
                value.pop("type", None)
            f = value.get("format", "")
            if (t, f) in _TYPE_FORMAT:
                value["type"] = _TYPE_FORMAT[(t, f)]
                value.pop("format", None)
            elif t in _TYPE_MAP:
                value["type"] = _TYPE_MAP[t]
        return {k: _clean_types(v) for k, v in value.items()}
    return value


def _collapse_arrays(d_: Any) -> Any:
    if isinstance(d_, list):
        return [_collapse_arrays(v) for v in d_]
    if isinstance(d_, dict):
        if d_.get("type") == "array" and "items" in d_:
            collapsed = _collapse_arrays(d_["items"])
            d_ = deepcopy(d_)
            d_.pop("items", None)
            d_.pop("type", None)
            return {**d_, **collapsed}
        return {k: _collapse_arrays(v) for k, v in d_.items()}
    return d_


def _remove_keys(d_: Any, keys: Tuple[str, ...]) -> Any:
    if isinstance(d_, list):
        return [_remove_keys(v, keys) for v in d_]
    if isinstance(d_, dict):
        result = {}
        for k, v in d_.items():
            if k == "properties" and isinstance(v, dict):
                # property NAMES are data, not schema keywords
                result[k] = {pk: _remove_keys(pv, keys)
                             for pk, pv in v.items()}
            elif k not in keys:
                result[k] = _remove_keys(v, keys)
        return result
    return d_


def _translate_keys(d_: Any) -> Any:
    if isinstance(d_, list):
        return [_translate_keys(v) for v in d_]
    if isinstance(d_, dict):
        new_dict = {k: _translate_keys(v) for k, v in d_.items()}
        for k in list(new_dict.keys()):
            bare = _ES_FLAG_RE.sub(r"\1", k)
            if bare != k:
                new_dict[bare] = new_dict.pop(k)
        return new_dict
    return d_


def _prune_empty(d_: Any) -> Any:
    def empty(x: Any) -> bool:
        return x is None or x == {} or x == [] or x == ""

    if isinstance(d_, list):
        return [v for v in (_prune_empty(v) for v in d_) if not empty(v)]
    if isinstance(d_, dict):
        return {k: v for k, v in ((k, _prune_empty(v))
                                  for k, v in d_.items()) if not empty(v)}
    return d_


class JsonSchemaToSearchMapper:
    """Drop-in analogue of the reference mapper (same constructor and
    get_index_definition surface)."""

    def __init__(self, settings_extra: Optional[dict] = None,
                 mappings_extra: Optional[dict] = None) -> None:
        self.settings = deepcopy(DEFAULT_SETTINGS)
        self.settings_extra = settings_extra
        self.mappings_extra = mappings_extra

    def get_index_definition(self, schema: dict) -> Dict[str, dict]:
        mapping = deepcopy(schema)
        mapping = _suppress(mapping)
        mapping = inline_refs(mapping)
        mapping = _merge_unions(mapping)
        mapping = _clean_types(mapping)
        mapping = _collapse_arrays(mapping)
        mapping = _remove_keys(mapping, _RM_KEYS)
        mapping = _translate_keys(mapping)
        mapping = _prune_empty(mapping)
        mapping.pop("definitions", None)
        result = {"settings": self.settings, "mappings": mapping}
        if self.mappings_extra:
            result["mappings"] = {**result["mappings"],
                                  **self.mappings_extra}
        if self.settings_extra:
            result["settings"] = {**result["settings"],
                                  **self.settings_extra}
        return result
