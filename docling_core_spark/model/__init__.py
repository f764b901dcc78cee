"""Document data model: lightweight tree + span codec + OTSL tables."""

from docling_core_spark.model.doc import Doc, Node  # noqa: F401
from docling_core_spark.model.spans import doc_from_spans, spans_from_doc  # noqa: F401
