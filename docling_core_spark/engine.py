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

# DocMeta.origin analogue (hierarchical_chunker.py:85-88 /
# DocumentOrigin document.py:709-762); binary_hash is a STRING column
# because the reference's Uint64 exceeds Spark's signed long range
ORIGIN_STRUCT = StructType([
    StructField("mimetype", StringType(), True),
    StructField("binary_hash", StringType(), True),
    StructField("filename", StringType(), True),
])

CHUNKS_SCHEMA = StructType([
    StructField("doc_id", StringType(), False),
    StructField("chunk_idx", IntegerType(), False),
    StructField("text", StringType(), False),
    StructField("headings", ArrayType(StringType()), True),
    StructField("span_refs", ArrayType(IntegerType()), False),
    StructField("origin", ORIGIN_STRUCT, True),
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
    import pyarrow as pa

    n_parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        from docling_core_spark.corpus import gen_doc_spans
        for batch in batches:
            doc_ids = []
            kinds, texts, mrefs, offs = [], [], [], []
            bounds = [0]
            for i in batch.column("id").to_pylist():
                i = int(i)
                doc_ids.append(f"doc_{i:012d}")
                for s in gen_doc_spans(i, seed=seed, mega_every=mega_every):
                    kinds.append(s["kind"])
                    texts.append(s["text"])
                    mrefs.append(s["media_ref"])
                    offs.append(s["offset"])
                bounds.append(len(kinds))
            struct = pa.StructArray.from_arrays(
                [pa.array(kinds, pa.string()),
                 pa.array(texts, pa.string()),
                 pa.array(mrefs, pa.string()),
                 pa.array(offs, pa.int32())],
                names=["kind", "text", "media_ref", "offset"])
            spans = pa.ListArray.from_arrays(pa.array(bounds, pa.int32()),
                                             struct)
            yield pa.RecordBatch.from_arrays(
                [pa.array(doc_ids, pa.string()), spans],
                names=["doc_id", "spans"])

    return (spark.range(0, n_docs, numPartitions=n_parts)
            .mapInArrow(gen, schema=DOCUMENTS_SCHEMA))


def _rows_to_tuples(spans) -> list:
    return [(s["kind"], s["text"], s["media_ref"], int(s["offset"]))
            for s in spans]


def _origin_struct(doc) -> Optional[dict]:
    """Doc.origin -> chunk-row struct dict (binary_hash stringified:
    the reference's Uint64 exceeds signed-long range)."""
    if doc.origin is None:
        return None
    return {"mimetype": doc.origin["mimetype"],
            "binary_hash": str(doc.origin["binary_hash"]),
            "filename": doc.origin["filename"]}


_ORIGIN_PA = None


def _chunk_record_batch(ids, idxs, txts, heads, refs, origins):
    """Arrow-native chunk batch build (shared by every chunk stage)."""
    import pyarrow as pa

    global _ORIGIN_PA
    if _ORIGIN_PA is None:
        _ORIGIN_PA = pa.struct([("mimetype", pa.string()),
                                ("binary_hash", pa.string()),
                                ("filename", pa.string())])
    return pa.RecordBatch.from_arrays([
        pa.array(ids, pa.string()),
        pa.array(idxs, pa.int32()),
        pa.array(txts, pa.string()),
        pa.array(heads, pa.list_(pa.string())),
        pa.array(refs, pa.list_(pa.int32())),
        pa.array(origins, _ORIGIN_PA),
    ], names=["doc_id", "chunk_idx", "text", "headings", "span_refs",
              "origin"])


# ----------------------------------------------------------------------
def _iter_span_tuples(batch):
    """RecordBatch(doc_id, spans) -> (doc_id, [(kind,text,mref,off)])
    via Arrow child arrays - avoids per-struct dict materialization."""
    doc_ids = batch.column("doc_id").to_pylist()
    spans_col = batch.column("spans")
    values = spans_col.values
    kinds = values.field("kind").to_pylist()
    texts = values.field("text").to_pylist()
    mrefs = values.field("media_ref").to_pylist()
    offs = values.field("offset").to_pylist()
    bounds = spans_col.offsets.to_pylist()
    for i, doc_id in enumerate(doc_ids):
        a, b = bounds[i], bounds[i + 1]
        yield doc_id, list(zip(kinds[a:b], texts[a:b], mrefs[a:b],
                               offs[a:b]))


def chunk_documents(df: DataFrame, mode: str = "hybrid",
                    max_tokens: int = 64, merge_peers: bool = True,
                    salt_partitions: Optional[int] = None) -> DataFrame:
    """documents(doc_id, spans) -> chunks(doc_id, chunk_idx, text,
    headings, span_refs).

    One fused mapInArrow stage: reconstruct tree + serialize + chunk +
    explode, per Arrow batch. Zero shuffles; both boundaries stay in
    Arrow (no pandas object columns - the output explode produces ~30x
    more rows than docs, so the Arrow-native array build matters)."""
    import pyarrow as pa

    def run(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        from docling_core_spark.chunking.hierarchical import hierarchical_chunk
        from docling_core_spark.chunking.hybrid import hybrid_chunk
        from docling_core_spark.chunking.page import page_chunk
        from docling_core_spark.chunking.tokenizer import RegexTokenizer
        from docling_core_spark.model.spans import doc_from_spans

        tok = RegexTokenizer(max_tokens)
        for batch in batches:
            ids, idxs, txts, heads, refs, origins = [], [], [], [], [], []
            for doc_id, tuples in _iter_span_tuples(batch):
                doc = doc_from_spans(doc_id, tuples)
                if mode == "hybrid":
                    chunks = hybrid_chunk(doc, tokenizer=tok,
                                          merge_peers=merge_peers)
                elif mode == "page":
                    chunks = page_chunk(doc)
                else:
                    chunks = hierarchical_chunk(doc)
                org = _origin_struct(doc)
                for ci, c in enumerate(chunks):
                    ids.append(doc_id)
                    idxs.append(ci)
                    txts.append(c.text)
                    heads.append(c.headings)
                    refs.append(c.offsets)
                    origins.append(org)
            yield _chunk_record_batch(ids, idxs, txts, heads, refs,
                                      origins)

    out = df.select("doc_id", "spans")
    if salt_partitions:
        # round-robin repartition: when upstream partitioning is skewed
        # (few huge files, or a groupBy that emitted mega-documents),
        # this rebalances rows across tasks; the chunker itself is
        # per-row so any partitioning is semantically identical
        out = out.repartition(salt_partitions)
    return out.mapInArrow(run, schema=CHUNKS_SCHEMA)


# ----------------------------------------------------------------------
def parse_and_chunk(df: DataFrame, to_spans, text_col: str,
                    id_col: str = "doc_id", mode: str = "hier",
                    max_tokens: int = 64,
                    merge_peers: bool = True) -> DataFrame:
    """DataFrame(doc_id, <text_col>) -> chunks: parse (via ``to_spans``,
    a str -> [span dict] function such as doctags_to_spans /
    docjson_to_spans) + reconstruct + chunk, fused into ONE mapInArrow
    stage.

    Fusion rationale: chaining ``chunk_documents(parse_x_documents(df))``
    puts two Python runners in series per task - each hop is a full
    JVM<->Python Arrow round-trip carrying the intermediate span table,
    and each runner level forks its own worker pool. Per-row sequential
    transforms belong in one UDF; only relational ops (joins, aggs) need
    plan-level composition. Measured ~2x on doctags->chunks at sf0.1."""
    import pyarrow as pa

    def run(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        from docling_core_spark.chunking.hierarchical import (
            hierarchical_chunk,
        )
        from docling_core_spark.chunking.hybrid import hybrid_chunk
        from docling_core_spark.chunking.page import page_chunk
        from docling_core_spark.chunking.tokenizer import RegexTokenizer
        from docling_core_spark.model.spans import doc_from_spans

        tok = RegexTokenizer(max_tokens)
        for batch in batches:
            doc_ids = batch.column(id_col).to_pylist()
            payloads = batch.column(text_col).to_pylist()
            ids, idxs, txts, heads, refs, origins = [], [], [], [], [], []
            for doc_id, payload in zip(doc_ids, payloads):
                tuples = [(s["kind"], s["text"], s["media_ref"],
                           s["offset"]) for s in to_spans(payload)]
                doc = doc_from_spans(str(doc_id), tuples)
                if mode == "hybrid":
                    chunks = hybrid_chunk(doc, tokenizer=tok,
                                          merge_peers=merge_peers)
                elif mode == "page":
                    chunks = page_chunk(doc)
                else:
                    chunks = hierarchical_chunk(doc)
                org = _origin_struct(doc)
                for ci, c in enumerate(chunks):
                    ids.append(str(doc_id))
                    idxs.append(ci)
                    txts.append(c.text)
                    heads.append(c.headings)
                    refs.append(c.offsets)
                    origins.append(org)
            yield _chunk_record_batch(ids, idxs, txts, heads, refs,
                                      origins)

    return df.select(id_col, text_col).mapInArrow(run, schema=CHUNKS_SCHEMA)


# ----------------------------------------------------------------------
def export_documents(df: DataFrame, fmt: str = "md",
                     page_break_placeholder: Optional[str] = None
                     ) -> DataFrame:
    """documents -> exports(doc_id, fmt, text); fmt in {md, txt, dt,
    html, json, yaml}. json/yaml are the reference's DoclingDocument
    schema - the interop sinks (S2/S3); sources/docjson.py is the
    matching source."""
    import pyarrow as pa

    def run(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        from docling_core_spark.model.spans import doc_from_spans
        from docling_core_spark.serializers.docjson import (
            export_to_docjson_str,
            export_to_docyaml_str,
        )
        from docling_core_spark.serializers.doctags import export_to_doctags
        from docling_core_spark.serializers.html import export_to_html
        from docling_core_spark.serializers.markdown import (
            export_to_markdown,
            export_to_text,
        )
        kw = {}
        if page_break_placeholder is not None and fmt not in ("dt", "html",
                                                              "html_split",
                                                              "json",
                                                              "yaml"):
            kw["page_break_placeholder"] = page_break_placeholder
        fn = {"md": export_to_markdown, "txt": export_to_text,
              "dt": export_to_doctags, "html": export_to_html,
              "html_split": lambda d, **k: export_to_html(
                  d, split_page_view=True, **k),
              "json": export_to_docjson_str,
              "yaml": export_to_docyaml_str}[fmt]
        for batch in batches:
            ids, txts = [], []
            for doc_id, tuples in _iter_span_tuples(batch):
                doc = doc_from_spans(doc_id, tuples)
                ids.append(doc_id)
                txts.append(fn(doc, **kw))
            yield pa.RecordBatch.from_arrays([
                pa.array(ids, pa.string()),
                pa.array([fmt] * len(ids), pa.string()),
                pa.array(txts, pa.string()),
            ], names=["doc_id", "fmt", "text"])

    return df.select("doc_id", "spans").mapInArrow(run, schema=EXPORTS_SCHEMA)


# ----------------------------------------------------------------------
def contextualize_chunks(chunks: DataFrame, delim: str = "\n"
                         ) -> DataFrame:
    """C4 as a DataFrame op (SURVEY §2.6): the embed-ready string is
    the heading path + chunk text joined by the delimiter
    (chunker/base.py:69-96) - pure JVM concat, no UDF."""
    ctx = F.when(
        F.col("headings").isNull() | (F.size("headings") == 0),
        F.col("text"),
    ).otherwise(
        F.concat_ws(delim, F.array_join("headings", delim), F.col("text")))
    return chunks.withColumn("contextualized", ctx)


# ----------------------------------------------------------------------
def doc_stats(df: DataFrame, mode: str = "hybrid", max_tokens: int = 64
              ) -> DataFrame:
    """Per-doc span/chunk/char counts - cheap lineage-style metrics."""
    import pyarrow as pa

    def run(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        from docling_core_spark.chunking.hierarchical import hierarchical_chunk
        from docling_core_spark.chunking.hybrid import hybrid_chunk
        from docling_core_spark.chunking.tokenizer import RegexTokenizer
        from docling_core_spark.model.spans import doc_from_spans
        tok = RegexTokenizer(max_tokens)
        for batch in batches:
            ids, nspans, nchunks, nchars = [], [], [], []
            for doc_id, tuples in _iter_span_tuples(batch):
                doc = doc_from_spans(doc_id, tuples)
                chunks = (hybrid_chunk(doc, tokenizer=tok) if mode == "hybrid"
                          else hierarchical_chunk(doc))
                ids.append(doc_id)
                nspans.append(len(tuples))
                nchunks.append(len(chunks))
                nchars.append(sum(len(c.text) for c in chunks))
            yield pa.RecordBatch.from_arrays([
                pa.array(ids, pa.string()),
                pa.array(nspans, pa.int32()),
                pa.array(nchunks, pa.int32()),
                pa.array(nchars, pa.int64()),
            ], names=["doc_id", "n_spans", "n_chunks", "n_chars"])

    return df.select("doc_id", "spans").mapInArrow(run,
                                                   schema=SPAN_STATS_SCHEMA)
