"""Serializers: markdown/text/doctags + table rendering."""

from docling_core_spark.serializers.markdown import (  # noqa: F401
    MarkdownParams,
    MarkdownSerializer,
    SerResult,
    chunking_serializer,
    export_to_markdown,
    export_to_text,
)
