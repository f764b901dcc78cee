"""Spark-side document pipeline: synthesis, chunking, exports.

Architecture (SURVEY §7.0): the input table is one row per document
(``doc_id``, ``spans`` array). All per-document tree logic is fused into
single ``mapInPandas`` stages - Arrow crosses the JVM/Python boundary
once each way per batch, there is NO shuffle in the chunking path at
all (the data is already per-document), and Catalyst keeps projection
pruning because we select only the columns the UDF needs.

Scale design:
* generation/chunking are embarrassingly parallel over rows; cost skew
  from mega-documents is defused by ``repartition(n)`` round-robin
  before the UDF (cheap vs. the UDF cost) plus small Arrow batches.
* output explodes to one row per chunk inside the UDF (no
  posexplode shuffle afterwards).
* resumability (north rule) is snapshot-style: ``run_resumable`` writes
  per-partition parquet + a lineage table and anti-joins already-done
  doc_ids on restart (see io/checkpoint.py).
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SPAN_STRUCT = StructType([
    StructField("kind", StringType(), False),
    StructField("text", StringType(), True),
    StructField("media_ref", StringType(), True),
    StructField("offset", IntegerType(), False),
])

DOCUMENTS_SCHEMA = StructType([
    StructField("doc_id", StringType(), False),
    StructField("spans", ArrayType(SPAN_STRUCT), False),
])

CHUNKS_SCHEMA = StructType([
    StructField("doc_id", StringType(), False),
    StructField("chunk_idx", IntegerType(), False),
    StructField("text", StringType(), False),
    StructField("headings", ArrayType(StringType()), True),
    StructField("span_refs", ArrayType(IntegerType()), False),
])

EXPORTS_SCHEMA = StructType([
    StructField("doc_id", StringType(), False),
    StructField("fmt", StringType(), False),
    StructField("text", StringType(), False),
])

SPAN_STATS_SCHEMA = StructType([
    StructField("doc_id", StringType(), False),
    StructField("n_spans", IntegerType(), False),
    StructField("n_chunks", IntegerType(), False),
    StructField("n_chars", LongType(), False),
])


# ----------------------------------------------------------------------
def synth_documents(spark: SparkSession, n_docs: int, seed: int = 42,
                    mega_every: Optional[int] = None,
                    partitions: Optional[int] = None) -> DataFrame:
    """Deterministic distributed corpus: each executor generates its
    docs purely from (seed, index) - no driver materialization, no
    shuffle, linear scale-out."""
    n_parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from docling_core_spark.corpus import gen_doc_spans
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rows.append({
                    "doc_id": f"doc_{i:012d}",
                    "spans": gen_doc_spans(i, seed=seed,
                                           mega_every=mega_every),
                })
            yield pd.DataFrame(rows, columns=["doc_id", "spans"])

    return (spark.range(0, n_docs, numPartitions=n_parts)
            .mapInPandas(gen, schema=DOCUMENTS_SCHEMA))


def _rows_to_tuples(spans) -> list:
    return [(s["kind"], s["text"], s["media_ref"], int(s["offset"]))
            for s in spans]


# ----------------------------------------------------------------------
def chunk_documents(df: DataFrame, mode: str = "hybrid",
                    max_tokens: int = 64, merge_peers: bool = True
                    ) -> DataFrame:
    """documents(doc_id, spans) -> chunks(doc_id, chunk_idx, text,
    headings, span_refs).

    One fused mapInPandas stage: reconstruct tree + serialize + chunk +
    explode, per Arrow batch. Zero shuffles.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from docling_core_spark.chunking.hierarchical import hierarchical_chunk
        from docling_core_spark.chunking.hybrid import hybrid_chunk
        from docling_core_spark.chunking.tokenizer import RegexTokenizer
        from docling_core_spark.model.spans import doc_from_spans

        tok = RegexTokenizer(max_tokens)
        for pdf in batches:
            out = {"doc_id": [], "chunk_idx": [], "text": [],
                   "headings": [], "span_refs": []}
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                doc = doc_from_spans(doc_id, _rows_to_tuples(spans))
                if mode == "hybrid":
                    chunks = hybrid_chunk(doc, tokenizer=tok,
                                          merge_peers=merge_peers)
                else:
                    chunks = hierarchical_chunk(doc)
                for ci, c in enumerate(chunks):
                    out["doc_id"].append(doc_id)
                    out["chunk_idx"].append(ci)
                    out["text"].append(c.text)
                    out["headings"].append(c.headings)
                    out["span_refs"].append(c.offsets)
            yield pd.DataFrame(out)

    return df.select("doc_id", "spans").mapInPandas(run, schema=CHUNKS_SCHEMA)


# ----------------------------------------------------------------------
def export_documents(df: DataFrame, fmt: str = "md",
                     page_break_placeholder: Optional[str] = None
                     ) -> DataFrame:
    """documents -> exports(doc_id, fmt, text); fmt in {md, txt}."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from docling_core_spark.model.spans import doc_from_spans
        from docling_core_spark.serializers.markdown import (
            export_to_markdown,
            export_to_text,
        )
        kw = {}
        if page_break_placeholder is not None:
            kw["page_break_placeholder"] = page_break_placeholder
        fn = export_to_markdown if fmt == "md" else export_to_text
        for pdf in batches:
            out = {"doc_id": [], "fmt": [], "text": []}
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                doc = doc_from_spans(doc_id, _rows_to_tuples(spans))
                out["doc_id"].append(doc_id)
                out["fmt"].append(fmt)
                out["text"].append(fn(doc, **kw))
            yield pd.DataFrame(out)

    return df.select("doc_id", "spans").mapInPandas(run, schema=EXPORTS_SCHEMA)


# ----------------------------------------------------------------------
def doc_stats(df: DataFrame, mode: str = "hybrid", max_tokens: int = 64
              ) -> DataFrame:
    """Per-doc span/chunk/char counts - cheap lineage-style metrics."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from docling_core_spark.chunking.hierarchical import hierarchical_chunk
        from docling_core_spark.chunking.hybrid import hybrid_chunk
        from docling_core_spark.chunking.tokenizer import RegexTokenizer
        from docling_core_spark.model.spans import doc_from_spans
        tok = RegexTokenizer(max_tokens)
        for pdf in batches:
            out = {"doc_id": [], "n_spans": [], "n_chunks": [], "n_chars": []}
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                doc = doc_from_spans(doc_id, _rows_to_tuples(spans))
                chunks = (hybrid_chunk(doc, tokenizer=tok) if mode == "hybrid"
                          else hierarchical_chunk(doc))
                out["doc_id"].append(doc_id)
                out["n_spans"].append(len(spans))
                out["n_chunks"].append(len(chunks))
                out["n_chars"].append(sum(len(c.text) for c in chunks))
            yield pd.DataFrame(out)

    return df.select("doc_id", "spans").mapInPandas(run,
                                                    schema=SPAN_STATS_SCHEMA)
