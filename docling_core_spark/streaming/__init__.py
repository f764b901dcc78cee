from docling_core_spark.streaming.pipeline import (  # noqa: F401
    run_metrics_once,
    stream_chunk_documents,
    stream_chunk_metrics,
    stream_dedup_documents,
    stream_dedup_once,
    stream_doc_rate,
    stream_doc_rate_once,
    stream_extract_cells_once,
    stream_extract_once,
    stream_extract_pages,
    stream_once,
)
