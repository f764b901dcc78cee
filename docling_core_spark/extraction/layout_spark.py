"""Spark surface for PDF/layout-parse extraction (extraction/layout.py).

Two production shapes:

* **print** (``render_layout``): docs table -> word-cell table, one
  fused ``mapInArrow`` stage, zero shuffle - a page is a pure function
  of its document. Materialized once per (sf, corpus version, layout
  version) as parquet, so extraction benchmarks measure the parse, not
  the synthesis.
* **parse** (``extract_layout``): cell table -> span rows. A document's
  cells must be co-located, which costs exactly ONE hash repartition on
  ``doc_id`` plus a within-partition sort; the extractor then streams
  doc-at-a-time through ``mapInArrow`` with a cross-batch carry buffer,
  so peak memory is one document's cells, never one partition's. At
  10^12 docs this plan is unchanged: the shuffle is the inherent
  minimum for a grouped parse, skew from mega-documents is bounded by
  the corpus's own page count (a document is parsed alone, not joined),
  and AQE sizes the reduce side.

``layout_stats`` fuses print+parse per document in a single stage
(no shuffle) for the boilerplate accounting - the distributed-vs-
sequential equivalence query.
"""

from __future__ import annotations

import os
from typing import Iterator, List

from pyspark.sql import DataFrame, SparkSession

# bump when the print dialect or extractor semantics change
LAYOUT_VERSION = 1

CELLS_SCHEMA = ("doc_id string, page_no int, idx int, text string, "
                "x0 double, y0 double, x1 double, y1 double, "
                "font string")
SPANS_SCHEMA = ("doc_id string, ord int, kind string, text string, "
                "media_ref string")
STATS_SCHEMA = ("doc_id string, n_pages int, n_cells int, "
                "n_chrome_cells int, n_lines int, n_blocks int, "
                "n_spans int, content_chars long")

_CELL_COLS = ("doc_id", "page_no", "idx", "text",
              "x0", "y0", "x1", "y1", "font")


def _cells_batch(cells: List[dict]):
    import pyarrow as pa

    types = {"doc_id": pa.string(), "page_no": pa.int32(),
             "idx": pa.int32(), "text": pa.string(),
             "x0": pa.float64(), "y0": pa.float64(),
             "x1": pa.float64(), "y1": pa.float64(),
             "font": pa.string()}
    return pa.RecordBatch.from_arrays(
        [pa.array([c[k] for c in cells], types[k]) for k in _CELL_COLS],
        names=list(_CELL_COLS))


def render_layout(docs: DataFrame) -> DataFrame:
    """(doc_id, spans) -> word-cell rows: the synthetic print source."""
    def run(batches: Iterator) -> Iterator:
        from docling_core_spark.extraction.layout import (
            render_layout_cells,
        )
        for batch in batches:
            doc_ids = batch.column("doc_id").to_pylist()
            spans = batch.column("spans").to_pylist()
            cells: List[dict] = []
            for d, s in zip(doc_ids, spans):
                cells.extend(render_layout_cells(d, s))
            if cells:
                yield _cells_batch(cells)

    return docs.select("doc_id", "spans").mapInArrow(run, CELLS_SCHEMA)


def extract_layout(cells: DataFrame) -> DataFrame:
    """Cell table -> extracted span rows (geometry-only parse).

    One repartition co-locates each document's cells; the sorted
    partition streams through with a carry buffer holding only the
    current document across Arrow batch boundaries."""
    import pyarrow as pa

    def run(batches: Iterator) -> Iterator:
        from docling_core_spark.extraction.layout import (
            extract_layout_tuples,
        )
        carry_doc = None
        carry: List[tuple] = []

        def flush(rows_out: List[tuple]) -> None:
            if carry_doc is None:
                return
            rows, _st = extract_layout_tuples(carry)
            for r in rows:
                rows_out.append((carry_doc, r["offset"], r["kind"],
                                 r["text"], r["media_ref"]))

        def to_batch(rows_out: List[tuple]):
            return pa.RecordBatch.from_arrays(
                [pa.array([r[0] for r in rows_out], pa.string()),
                 pa.array([r[1] for r in rows_out], pa.int32()),
                 pa.array([r[2] for r in rows_out], pa.string()),
                 pa.array([r[3] for r in rows_out], pa.string()),
                 pa.array([r[4] for r in rows_out], pa.string())],
                names=["doc_id", "ord", "kind", "text", "media_ref"])

        for batch in batches:
            doc_ids = batch.column("doc_id").to_pylist()
            # cell-tuple field order (layout.cell_tuple)
            tups = list(zip(batch.column("page_no").to_pylist(),
                            batch.column("text").to_pylist(),
                            batch.column("x0").to_pylist(),
                            batch.column("y0").to_pylist(),
                            batch.column("x1").to_pylist(),
                            batch.column("y1").to_pylist(),
                            batch.column("font").to_pylist()))
            rows_out: List[tuple] = []
            n = len(doc_ids)
            j = 0
            while j < n:
                d = doc_ids[j]
                k = j
                while k < n and doc_ids[k] == d:
                    k += 1
                if d != carry_doc:
                    flush(rows_out)
                    carry_doc, carry = d, []
                carry.extend(tups[j:k])
                j = k
            if rows_out:
                yield to_batch(rows_out)
        rows_out = []
        flush(rows_out)
        if rows_out:
            yield to_batch(rows_out)

    co = cells.repartition("doc_id").sortWithinPartitions("doc_id")
    return co.mapInArrow(run, SPANS_SCHEMA)


def layout_stats(docs: DataFrame) -> DataFrame:
    """Fused print+parse per document -> accounting rows (zero
    shuffle; every doc yields a row, even all-media docs that print
    nothing)."""
    import pyarrow as pa

    def run(batches: Iterator) -> Iterator:
        from docling_core_spark.extraction.layout import (
            extract_layout_spans,
            render_layout_cells,
        )
        keys = ("n_pages", "n_cells", "n_chrome_cells", "n_lines",
                "n_blocks", "n_spans", "content_chars")
        for batch in batches:
            doc_ids = batch.column("doc_id").to_pylist()
            spans = batch.column("spans").to_pylist()
            out = {k: [] for k in ("doc_id",) + keys}
            for d, s in zip(doc_ids, spans):
                _rows, st = extract_layout_spans(
                    render_layout_cells(d, s))
                out["doc_id"].append(d)
                for k in keys:
                    out[k].append(st[k])
            yield pa.RecordBatch.from_arrays(
                [pa.array(out["doc_id"], pa.string())]
                + [pa.array(out[k],
                            pa.int64() if k == "content_chars"
                            else pa.int32()) for k in keys],
                names=["doc_id"] + list(keys))

    return docs.select("doc_id", "spans").mapInArrow(run, STATS_SCHEMA)


# ----------------------------------------------------------------------
# materialized cell table per (sf, corpus version, layout version)
# ----------------------------------------------------------------------

def layout_cells_path(sf_dir: str) -> str:
    from docling_core_spark.corpus import CORPUS_VERSION
    from docling_core_spark.queries import corpus_docs_for

    n_docs = corpus_docs_for(sf_dir)
    return os.path.join(
        os.environ.get("SPARK_GRAFT_TMP", "/tmp"),
        f"docling_layout_cells_"
        f"{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{n_docs}_v{CORPUS_VERSION}.{LAYOUT_VERSION}.parquet")


def layout_cells_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    from docling_core_spark.queries import corpus_df

    path = layout_cells_path(sf_dir)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        render_layout(corpus_df(spark, sf_dir)) \
            .write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


# ----------------------------------------------------------------------
# registry queries
# ----------------------------------------------------------------------

def q_layout_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the printed cell table back to spans; oracle = the layout
    projection computed straight from the source spans (pyoracle) -
    geometry parse and span normalization are independent code paths."""
    return extract_layout(layout_cells_df(spark, sf_dir))


def q_layout_page_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Print+parse accounting per document (distributed vs
    single-process equivalence)."""
    from docling_core_spark.queries import corpus_df

    return layout_stats(corpus_df(spark, sf_dir))
