"""Debug exports (E5): indented element-tree dump.

Re-implements DoclingDocument.export_to_element_tree
(document.py:4277-4299): every node across all content layers, with
groups, one line per item - ``{ix}: {label}...`` indented by depth.
"""

from __future__ import annotations

from typing import List

from docling_core_spark.model.doc import (
    GROUP_KINDS,
    K_BODY,
    K_INLINE_GROUP,
    K_FORM,
    K_KEY_VALUE,
    K_LIST_GROUP,
    K_PICTURE,
    K_TABLE,
    LAYER_BODY,
    LAYER_FURNITURE,
    Doc,
)

_GROUP_LABEL = {K_BODY: "unspecified", K_LIST_GROUP: "list",
                K_INLINE_GROUP: "inline"}
_GROUP_NAME = {K_BODY: "_root_", K_LIST_GROUP: "group",
               K_INLINE_GROUP: "group"}
_NON_TEXT = {K_PICTURE: "picture", K_TABLE: "table",
             K_KEY_VALUE: "key_value_region", K_FORM: "form"}


def export_to_element_tree(doc: Doc) -> str:
    """One line per item: groups show label+name, text items show the
    first 100 chars, other doc items just the label."""
    lines: List[str] = []
    items = doc.iterate_items(with_groups=True,
                              layers=(LAYER_BODY, LAYER_FURNITURE),
                              traverse_pictures=True)
    for ix, (node, level) in enumerate(items):
        indent = " " * level
        if node.kind in GROUP_KINDS:
            lines.append(
                f"{indent}{ix}: {_GROUP_LABEL[node.kind]} "
                f"with name={_GROUP_NAME[node.kind]}")
        elif node.kind in _NON_TEXT:
            lines.append(f"{indent}{ix}: {_NON_TEXT[node.kind]}")
        else:
            lines.append(
                f"{indent}{ix}: {node.label}: {node.text[:100]}")
    return "\n".join(lines)


def table_dataframe(doc: Doc, table_node):
    """TB2 doc-aware dataframe export (TableItem.export_to_dataframe
    with doc, document.py:1559-1610): rich cells (<rich_K>) resolve to
    the referenced table child serialized as default markdown
    (RichTableCell._get_text, document.py:350-356)."""
    import re

    from docling_core_spark.model.otsl import dataframe_like, parse_otsl
    from docling_core_spark.serializers.markdown import MarkdownSerializer

    rich = re.compile(r"^<rich_(\d+)>$")
    table = parse_otsl(table_node.text)
    md = None
    for c in table.cells:
        m = rich.fullmatch(c.text)
        if m is not None:
            k = int(m.group(1))
            if k < len(table_node.children):
                if md is None:
                    md = MarkdownSerializer(doc)
                c.text = md.serialize(node=table_node.children[k]).text
            else:
                c.text = ""
    return dataframe_like(table)
