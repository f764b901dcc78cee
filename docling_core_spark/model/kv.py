"""Key-value graph codec: span-text grammar <-> graph cells/links.

The span schema carries a KeyValueItem's GraphData
(document.py:1824-1876) inside the span ``text``, using the reference's
own doctags cell grammar (``parse_key_value_item``,
document.py:4827-4914):

    <key_0>Name<link_1></key_0><value_1>Alice</value_1>

* cell tag = ``{label}_{id}`` with label in {key, value}
* ``<link_N>`` inside a cell's content = a to_value link to cell N
* ``<childlink_N>`` (engine extension, not emitted by doctags) = a
  to_child link - needed so DoclingDocument-JSON graphs with hierarchy
  survive a span round trip; doctags export flattens BOTH labels to
  ``<link_N>`` exactly like the reference serializer (doctags.py:312-315
  builds source_to_targets from all links regardless of label).
* links to unknown cell ids are dropped on parse (document.py:4904-4906)
* cell text is the content with loc/link tokens stripped, whitespace
  trimmed (document.py:4884-4886)
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import List, Tuple

TO_VALUE = "to_value"
TO_CHILD = "to_child"

# link-label <-> token-stem map; <link_N> stays doctags-compatible
# (GraphLinkLabel, labels.py:191-200); the other stems are engine
# extensions so every label survives a span round trip
_TOKEN_BY_LABEL = {"to_value": "link", "to_child": "childlink",
                   "to_key": "keylink", "to_parent": "parentlink",
                   "unspecified": "unspeclink"}
_LABEL_BY_TOKEN = {v: k for k, v in _TOKEN_BY_LABEL.items()}

_CELL_RE = re.compile(
    r"<(?P<label>key|value)_(?P<id>\d+)>"
    r"(?P<content>.*?)"
    r"</(?P=label)_(?P=id)>",
    re.DOTALL,
)
_ANYLINK_RE = re.compile(
    r"<(link|childlink|keylink|parentlink|unspeclink)_(\d+)>")
_LOC_RE = re.compile(r"<loc_\d+>")


@dataclass
class KvCell:
    label: str  # "key" | "value"
    cell_id: int
    text: str


@dataclass
class KvLink:
    source: int
    target: int
    label: str = TO_VALUE


def parse_kv(text: str) -> Tuple[List[KvCell], List[KvLink]]:
    """Grammar -> (cells, links); total on arbitrary input."""
    cells: List[KvCell] = []
    raw: List[KvLink] = []
    for m in _CELL_RE.finditer(text or ""):
        cell_id = int(m.group("id"))
        content = m.group("content")
        for stem, t in _ANYLINK_RE.findall(content):
            raw.append(KvLink(cell_id, int(t), _LABEL_BY_TOKEN[stem]))
        clean = _LOC_RE.sub("", content)
        clean = _ANYLINK_RE.sub("", clean).strip()
        cells.append(KvCell(m.group("label"), cell_id, clean))
    ids = {c.cell_id for c in cells}
    links = [l for l in raw if l.target in ids]
    return cells, links


def encode_kv(cells: List[KvCell], links: List[KvLink]) -> str:
    """Canonical encoding: cells in order, each cell's outgoing links
    appended in link-list order. parse(encode(parse(t))) is a fixed
    point for any t (invalid links dropped once, text canonicalized)."""
    by_src: dict = {}
    for l in links:
        by_src.setdefault(l.source, []).append(l)
    parts = []
    for c in cells:
        inner = c.text
        for l in by_src.get(c.cell_id, ()):
            tok = _TOKEN_BY_LABEL.get(l.label, "link")
            inner += f"<{tok}_{l.target}>"
        parts.append(f"<{c.label}_{c.cell_id}>{inner}</{c.label}_{c.cell_id}>")
    return "".join(parts)
