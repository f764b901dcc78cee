"""Structured Streaming ingestion: continuous corpus -> chunk stream.

The reference has no streaming surface (single-process library); this
is the engine's scale-out ingestion front end: a file stream over the
documents table feeds the SAME stateless chunking stage used in batch
(one mapInArrow, no shuffle, no state store), with exactly-once file
progress tracked by the streaming checkpoint. Late/re-delivered files
are deduplicated by the source's file log, so restarts resume where
they left off - the streaming analogue of io/checkpoint.py's bucket
protocol.

At production scale the source is an Iceberg/Kafka stream; file-stream
semantics are identical for this engine's purposes (append-only doc
batches). Chunking is stateless per document, so no watermarks are
needed; downstream stateful aggs (e.g. rolling chunk counts) would add
``withWatermark`` on an event-time column.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from docling_core_spark.engine import DOCUMENTS_SCHEMA, chunk_documents


def stream_chunk_documents(
    spark: SparkSession,
    input_dir: str,
    mode: str = "hier",
    max_tokens: int = 64,
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    """Streaming DataFrame of chunks from a parquet file stream.

    The chunking transform is the exact batch operator - stateless
    mapInArrow stages are streaming-compatible as-is."""
    reader = (spark.readStream.schema(DOCUMENTS_SCHEMA)
              .format("parquet"))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    docs = reader.load(input_dir)
    return chunk_documents(docs, mode=mode, max_tokens=max_tokens)


def stream_once(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    mode: str = "hier",
    max_tokens: int = 64,
) -> None:
    """Drain everything currently available (Trigger.AvailableNow),
    append chunk parquet to ``output_dir``, then stop. Re-invoking after
    new files land processes ONLY the new files (checkpointed file
    log) - the micro-batch resume contract."""
    chunks = stream_chunk_documents(spark, input_dir, mode=mode,
                                    max_tokens=max_tokens)
    q = (chunks.writeStream
         .format("parquet")
         .option("path", output_dir)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
