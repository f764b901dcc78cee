from docling_core_spark.streaming.pipeline import (  # noqa: F401
    stream_chunk_documents,
    stream_once,
)
