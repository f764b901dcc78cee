"""Spark surface for main-content extraction.

Architecture matches the engine's other pipelines (SURVEY §7.0): the
page table is one row per document ``(doc_id, html)``; extraction runs
as ONE fused ``mapInArrow`` stage - Arrow crosses the boundary once per
batch, the output explodes to one row per extracted span inside the
stage, and there is no shuffle anywhere in the path (a page is a
self-contained unit of work). At cluster scale the input is an Iceberg
scan; skew from mega-pages is defused the same way as the chunking path
(round-robin ``repartition`` before the UDF - the ``salt_partitions``
parameter of extract_pages).

The synthetic page table is materialized once per (sf, version) as
parquet - the production shape: extraction benchmarks measure the
scan -> extract stage only, not page synthesis.
"""

from __future__ import annotations

import os
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

# bump when the renderer's page dialect or chrome changes
PAGES_VERSION = 2


def render_pages(docs: DataFrame) -> DataFrame:
    """(doc_id, spans) -> (doc_id, html): the synthetic page source."""
    import pyarrow as pa

    schema = pa.schema([("doc_id", pa.string()), ("html", pa.string())])

    def run(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        from docling_core_spark.extraction.render import render_page_html
        for batch in batches:
            doc_ids = batch.column("doc_id").to_pylist()
            spans = batch.column("spans").to_pylist()
            htmls = [render_page_html(d, s)
                     for d, s in zip(doc_ids, spans)]
            yield pa.RecordBatch.from_arrays(
                [pa.array(doc_ids, pa.string()),
                 pa.array(htmls, pa.string())],
                schema=schema)

    return docs.select("doc_id", "spans").mapInArrow(
        run, "doc_id string, html string")


def extract_pages(pages: DataFrame, html_col: str = "html",
                  salt_partitions: int = 0) -> DataFrame:
    """(doc_id, html) -> exploded span rows
    (doc_id, ord, kind, text, media_ref): the extraction operator.

    ``salt_partitions`` round-robin-rebalances skewed inputs before the
    UDF (few huge crawl files, or mega-pages clustered in one split) -
    same defusal as engine.chunk_documents; extraction is per-row, so
    any partitioning is semantically identical."""
    import pyarrow as pa

    def run(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        from docling_core_spark.extraction.extract import extract_spans
        for batch in batches:
            doc_ids = batch.column("doc_id").to_pylist()
            htmls = batch.column(html_col).to_pylist()
            out_doc, ords, kinds, texts, mrefs = [], [], [], [], []
            for d, h in zip(doc_ids, htmls):
                rows, _ = extract_spans(h or "")
                for r in rows:
                    out_doc.append(d)
                    ords.append(r["offset"])
                    kinds.append(r["kind"])
                    texts.append(r["text"])
                    mrefs.append(r["media_ref"])
            yield pa.RecordBatch.from_arrays(
                [pa.array(out_doc, pa.string()),
                 pa.array(ords, pa.int32()),
                 pa.array(kinds, pa.string()),
                 pa.array(texts, pa.string()),
                 pa.array(mrefs, pa.string())],
                names=["doc_id", "ord", "kind", "text", "media_ref"])

    sel = pages.select("doc_id", html_col)
    if salt_partitions:
        sel = sel.repartition(salt_partitions)
    return sel.mapInArrow(
        run, "doc_id string, ord int, kind string, text string, "
             "media_ref string")


def extract_page_stats(pages: DataFrame, html_col: str = "html"
                       ) -> DataFrame:
    """(doc_id, html) -> per-page boilerplate stats."""
    import pyarrow as pa

    def run(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        from docling_core_spark.extraction.extract import extract_spans
        for batch in batches:
            doc_ids = batch.column("doc_id").to_pylist()
            htmls = batch.column(html_col).to_pylist()
            cols = {"doc_id": [], "page_chars": [], "content_chars": [],
                    "n_dropped": [], "main_found": [],
                    "content_ratio": []}
            for d, h in zip(doc_ids, htmls):
                _, st = extract_spans(h or "")
                cols["doc_id"].append(d)
                cols["page_chars"].append(st["page_chars"])
                cols["content_chars"].append(st["content_chars"])
                cols["n_dropped"].append(st["n_dropped"])
                cols["main_found"].append(st["main_found"])
                ratio = (st["content_chars"] / st["page_chars"]
                         if st["page_chars"] else 0.0)
                cols["content_ratio"].append(round(ratio, 6))
            yield pa.RecordBatch.from_arrays(
                [pa.array(cols["doc_id"], pa.string()),
                 pa.array(cols["page_chars"], pa.int64()),
                 pa.array(cols["content_chars"], pa.int64()),
                 pa.array(cols["n_dropped"], pa.int32()),
                 pa.array(cols["main_found"], pa.int32()),
                 pa.array(cols["content_ratio"], pa.float64())],
                names=["doc_id", "page_chars", "content_chars",
                       "n_dropped", "main_found", "content_ratio"])

    return pages.select("doc_id", html_col).mapInArrow(
        run, "doc_id string, page_chars long, content_chars long, "
             "n_dropped int, main_found int, content_ratio double")


# ----------------------------------------------------------------------
# materialized page table per (sf, version)
# ----------------------------------------------------------------------

def pages_path(sf_dir: str) -> str:
    from docling_core_spark.corpus import CORPUS_VERSION
    from docling_core_spark.queries import corpus_docs_for

    n_docs = corpus_docs_for(sf_dir)
    return os.path.join(
        os.environ.get("SPARK_GRAFT_TMP", "/tmp"),
        f"docling_pages_{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{n_docs}_v{CORPUS_VERSION}.{PAGES_VERSION}.parquet")


def pages_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthetic page table for this sf, materialized once."""
    from docling_core_spark.queries import corpus_df

    path = pages_path(sf_dir)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        render_pages(corpus_df(spark, sf_dir)) \
            .write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


# ----------------------------------------------------------------------
# registry queries
# ----------------------------------------------------------------------

def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract main content from every page; oracle = the HTML
    projection computed directly from the source spans (pyoracle) -
    two independent code paths must agree span-for-span."""
    return extract_pages(pages_df(spark, sf_dir))


def q_html_page_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-strip accounting per page (distributed vs
    single-process equivalence)."""
    return extract_page_stats(pages_df(spark, sf_dir))
