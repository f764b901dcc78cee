"""Spark surface for PDF/layout-parse extraction (extraction/layout.py).

Two production shapes:

* **print** (``render_layout``): docs table -> page-row cell table,
  one fused ``mapInArrow`` stage, zero shuffle - a page is a pure
  function of its document. Materialized once per (sf, corpus
  version, layout version) as parquet, so extraction benchmarks
  measure the parse, not the synthesis.
* **parse** (``extract_layout``): cell table -> span rows. A
  document's pages must be co-located, which costs exactly ONE hash
  repartition on ``doc_id`` plus a within-partition sort; the
  extractor then streams doc-at-a-time through ``mapInArrow`` with a
  cross-batch carry buffer, so peak memory is one document's cells,
  never one partition's. At 10^12 docs this plan is unchanged: the
  shuffle is the inherent minimum for a grouped parse, skew from
  mega-documents is bounded by the document's own page count (a
  document is parsed alone, not joined), and AQE sizes the reduce
  side.

**Why packed page rows, not word rows.** The cells table is one row
per PAGE with the word texts packed into a single delimited string, a
font-index array, and geometry double-arrays - the shape of a real
PDF page (one content stream + a font resource table), and the page
unit of the reference's own SegmentedPdfPage (types/doc/page.py).
Besides being the natural unit, this is the scaling fix: Spark's
JVM<->Python Arrow boundary has a large core-count-INDEPENDENT cost
per string value (~6M values/s per JVM - a per-executor wall that
Amdahl-caps the whole stage), so a 21M-word corpus as flat rows ships
80M+ small strings and the parse stops scaling (0.33-0.45 efficiency
at 8->32 cores, measured across flat-word, struct-nested, and
flat-span-output variants), while the packed encoding crosses the
boundary with ~2 strings per page plus numeric buffers and the stage
scales with cores again. On a real cluster the wall is per executor
JVM, so the packed shape is exactly what keeps 1000 executors busy at
10^12 docs.

``layout_stats`` fuses print+parse per document in a single stage
(no shuffle) for the boilerplate accounting - the distributed-vs-
sequential equivalence query.
"""

from __future__ import annotations

import os
from typing import Iterator, List

from pyspark.sql import DataFrame, SparkSession

# bump when the print dialect or extractor semantics change
LAYOUT_VERSION = 3

# one row per PAGE, content-stream-packed (a real PDF page stores one
# packed content stream + a font resource table, not one string object
# per word): word texts joined with layout.TEXT_SEP, fonts as indexes
# into layout.FONT_TABLE, geometry as double arrays
CELLS_SCHEMA = ("doc_id string, page_no int, texts string, "
                "fonts array<tinyint>, "
                "xs0 array<double>, ys0 array<double>, "
                "xs1 array<double>, ys1 array<double>")
SPANS_SCHEMA = ("doc_id string, ord int, kind string, text string, "
                "media_ref string")
# nested per-doc shape (the corpus's own doc-row shape); a JVM-side
# view over the packed stage output below
DOC_SPANS_SCHEMA = ("doc_id string, spans array<struct<"
                    "ord:int, kind:string, text:string, "
                    "media_ref:string>>")
# what the Python stage actually emits: span fields packed per doc
# (strings TEXT_SEP-joined, ords an int array), because the
# Python->JVM Arrow boundary's per-string-value wall applies to the
# OUTPUT too - packing turns ~4 string values per span into ~3 per
# document; the JVM unpacks with split/arrays_zip (codegen, parallel)
PACKED_SPANS_SCHEMA = ("doc_id string, ords array<int>, "
                       "kinds string, texts string, refs string")
STATS_SCHEMA = ("doc_id string, n_pages int, n_cells int, "
                "n_chrome_cells int, n_lines int, n_blocks int, "
                "n_spans int, content_chars long")

def _pages_batch(rows: List[tuple]):
    """rows: [(doc_id, page_no, texts, fonts, xs0, ys0, xs1, ys1)]."""
    import pyarrow as pa

    return pa.RecordBatch.from_arrays(
        [pa.array([r[0] for r in rows], pa.string()),
         pa.array([r[1] for r in rows], pa.int32()),
         pa.array([r[2] for r in rows], pa.string()),
         pa.array([r[3] for r in rows], pa.list_(pa.int8())),
         pa.array([r[4] for r in rows], pa.list_(pa.float64())),
         pa.array([r[5] for r in rows], pa.list_(pa.float64())),
         pa.array([r[6] for r in rows], pa.list_(pa.float64())),
         pa.array([r[7] for r in rows], pa.list_(pa.float64()))],
        names=["doc_id", "page_no", "texts", "fonts",
               "xs0", "ys0", "xs1", "ys1"])


def render_layout(docs: DataFrame) -> DataFrame:
    """(doc_id, spans) -> packed page rows: the print source."""
    def run(batches: Iterator) -> Iterator:
        from docling_core_spark.extraction.layout import (
            FONT_INDEX,
            TEXT_SEP,
            render_layout_cells,
        )
        for batch in batches:
            doc_ids = batch.column("doc_id").to_pylist()
            spans = batch.column("spans").to_pylist()
            rows: List[tuple] = []
            for d, s in zip(doc_ids, spans):
                pages = {}
                for c in render_layout_cells(d, s):
                    pages.setdefault(c["page_no"], []).append(c)
                for p in sorted(pages):
                    cs = pages[p]
                    rows.append((
                        d, p,
                        TEXT_SEP.join(c["text"] for c in cs),
                        [FONT_INDEX[c["font"]] for c in cs],
                        [c["x0"] for c in cs],
                        [c["y0"] for c in cs],
                        [c["x1"] for c in cs],
                        [c["y1"] for c in cs]))
            if rows:
                yield _pages_batch(rows)

    return docs.select("doc_id", "spans").mapInArrow(run, CELLS_SCHEMA)


def _parse_cell_batches(batches: Iterator) -> Iterator:
    """Shared parse driver: CELLS_SCHEMA Arrow batches (doc-contiguous
    within the stream) -> PACKED_SPANS_SCHEMA Arrow batches, with a
    carry buffer holding only the current document across batch
    boundaries. Output rows are one per DOCUMENT with the span fields
    packed (see PACKED_SPANS_SCHEMA) - measured: flat span rows cap
    8->32-core scaling efficiency at ~0.4, nested struct rows at
    ~0.6; packing removes the output boundary from the profile."""
    import pyarrow as pa

    from docling_core_spark.extraction.layout import (
        TEXT_SEP,
        extract_layout_pages,
    )
    carry_doc = None
    carry: List[tuple] = []
    # columnar accumulators for the packed output batch
    out_ids: List[str] = []
    out_ords: List[List[int]] = []
    out_kinds: List[str] = []
    out_texts: List[str] = []
    out_refs: List[str] = []

    def flush() -> None:
        if carry_doc is None:
            return
        rows, _st = extract_layout_pages(carry)
        out_ids.append(carry_doc)
        out_ords.append([r["offset"] for r in rows])
        out_kinds.append(TEXT_SEP.join(r["kind"] for r in rows))
        out_texts.append(TEXT_SEP.join(r["text"] for r in rows))
        out_refs.append(TEXT_SEP.join(r["media_ref"] for r in rows))

    def to_batch():
        b = pa.RecordBatch.from_arrays(
            [pa.array(out_ids, pa.string()),
             pa.array(out_ords, pa.list_(pa.int32())),
             pa.array(out_kinds, pa.string()),
             pa.array(out_texts, pa.string()),
             pa.array(out_refs, pa.string())],
            names=["doc_id", "ords", "kinds", "texts", "refs"])
        out_ids.clear()
        out_ords.clear()
        out_kinds.clear()
        out_texts.clear()
        out_refs.clear()
        return b

    for batch in batches:
        doc_ids = batch.column("doc_id").to_pylist()
        page_nos = batch.column("page_no").to_pylist()
        packed = batch.column("texts").to_pylist()
        # geometry/font unpack stays COLUMNAR end-to-end: flatten each
        # list column once per batch into a numpy view (zero-copy from
        # the Arrow buffer), then hand per-page SLICES (views) to the
        # extractor - no per-cell Python object is ever built; the
        # only per-word string work is one split() per page
        fl = batch.column("fonts")
        lens = fl.value_lengths().to_pylist()
        fonts_f = fl.flatten().to_numpy(zero_copy_only=False)
        x0s = batch.column("xs0").flatten().to_numpy(zero_copy_only=False)
        y0s = batch.column("ys0").flatten().to_numpy(zero_copy_only=False)
        x1s = batch.column("xs1").flatten().to_numpy(zero_copy_only=False)
        y1s = batch.column("ys1").flatten().to_numpy(zero_copy_only=False)
        pos = 0
        for i, d in enumerate(doc_ids):
            ln = lens[i] or 0
            if d != carry_doc:
                flush()
                carry_doc, carry = d, []
            e = pos + ln
            texts = packed[i].split(TEXT_SEP) if ln else []
            # PageRec field order (layout.extract_layout_pages)
            carry.append((page_nos[i], texts, fonts_f[pos:e],
                          x0s[pos:e], y0s[pos:e], x1s[pos:e],
                          y1s[pos:e]))
            pos = e
        if out_ids:
            yield to_batch()
    flush()
    if out_ids:
        yield to_batch()


def extract_layout_packed(cells: DataFrame) -> DataFrame:
    """Cell table -> packed per-document span rows
    (``PACKED_SPANS_SCHEMA``) from an arbitrary cells DataFrame.

    One repartition co-locates each document's pages; the sorted
    partition streams through :func:`_parse_cell_batches`. Prefer
    :func:`extract_layout_packed_files` when the input is a
    doc-grouped print table - it skips this exchange entirely."""
    # pin the reduce-side partition count: a bare repartition("doc_id")
    # is REPARTITION_BY_COL, which AQE's coalescer shrinks to its
    # advisory BYTE size (~4 partitions here) - correct for JVM
    # stages, but this stage is Python-CPU-bound, so partitions must
    # track cores, not bytes (measured: 0.33 -> 0.9+ scaling
    # efficiency at 8->32 cores on a 21M-cell corpus)
    try:
        n_parts = int(cells.sparkSession.conf.get(
            "spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        n_parts = cells.sparkSession.sparkContext.defaultParallelism
    co = (cells.repartition(n_parts, "doc_id")
          .sortWithinPartitions("doc_id"))
    return co.mapInArrow(_parse_cell_batches, PACKED_SPANS_SCHEMA)


def extract_layout_docs(cells: DataFrame) -> DataFrame:
    """Cell table -> per-document span rows (geometry-only parse),
    nested ``DOC_SPANS_SCHEMA`` shape, from an arbitrary cells
    DataFrame (see :func:`extract_layout_packed`)."""
    return _unpack_spans(extract_layout_packed(cells))


def _unpack_spans(packed: DataFrame) -> DataFrame:
    """PACKED_SPANS_SCHEMA -> DOC_SPANS_SCHEMA, entirely JVM-side.

    ``split`` runs once per document row; ``arrays_zip`` + a
    positional struct cast rebuild the span structs without any
    per-element expression (each child of arrays_zip is evaluated
    once per row, so optimizer project-collapsing cannot reintroduce
    a quadratic split)."""
    from pyspark.sql import functions as F

    from docling_core_spark.extraction.layout import TEXT_SEP

    empty = F.array().cast("array<string>")

    def arr(c: str):
        # ords is the spine: a doc with 0 spans packs "" which would
        # otherwise split to [""] and desync arrays_zip
        return F.when(F.size("ords") == 0, empty) \
                .otherwise(F.split(c, TEXT_SEP, -1))

    spans = F.arrays_zip(
        F.col("ords"), arr("kinds"), arr("texts"), arr("refs"),
    ).cast("array<struct<ord:int,kind:string,text:string,"
           "media_ref:string>>")
    return packed.select("doc_id", spans.alias("spans"))


def unpack_spans_flat(packed: DataFrame) -> DataFrame:
    """PACKED_SPANS_SCHEMA -> flat ``SPANS_SCHEMA`` rows, entirely
    JVM-side - the flat twin of :func:`_unpack_spans`.

    Do NOT spell this ``_unpack_spans(...)`` + ``inline(spans)``: that
    puts the whole computed ``cast(arrays_zip(split, split, split))``
    expression under the Generate, and Catalyst's
    InferFiltersFromGenerate clones it textually into an inferred
    ``size(e) > 0 AND isnotnull(e)`` Filter - every split/zip/cast then
    runs TWICE per document (same landmine family as the interpreted
    HOF-lambda duplication documented in docops.py). Here the generator
    child is the plain ``ords`` ATTRIBUTE straight off the Python
    stage, so the inferred filter is a constant-time length check, the
    split arrays are computed once in a Project below the Generate
    (whole-stage codegen evaluates them once per input row), and each
    output field is a direct array index - no array-of-structs is ever
    built at all."""
    from pyspark.sql import functions as F

    from docling_core_spark.extraction.layout import TEXT_SEP

    arrs = packed.select(
        "doc_id",
        F.split("kinds", TEXT_SEP, -1).alias("ks"),
        F.split("texts", TEXT_SEP, -1).alias("ts"),
        F.split("refs", TEXT_SEP, -1).alias("rs"),
        "ords")
    return (arrs.select(
        "doc_id", "ks", "ts", "rs",
        F.posexplode("ords").alias("pos", "ord"))
        .select("doc_id", "ord",
                F.col("ks")[F.col("pos")].alias("kind"),
                F.col("ts")[F.col("pos")].alias("text"),
                F.col("rs")[F.col("pos")].alias("media_ref")))


def extract_layout_docs_files(spark: SparkSession,
                              path: str) -> DataFrame:
    """Zero-shuffle parse of a doc-grouped print table on disk,
    unpacked to the nested DOC_SPANS_SCHEMA view (see
    :func:`extract_layout_packed_files` for the raw packed boundary -
    a sink that stores doc-bucketed span shards should consume THAT
    and skip the unpack entirely)."""
    return _unpack_spans(extract_layout_packed_files(spark, path))


def extract_layout_packed_files(spark: SparkSession,
                                path: str) -> DataFrame:
    """Zero-shuffle parse of a doc-grouped print table on disk,
    PACKED_SPANS_SCHEMA output - the parse boundary itself.

    The print table's own writer (one file per render task, a
    document's pages written consecutively) guarantees a document
    never spans files, so the parse needs no exchange at all: tasks
    take whole FILES and pyarrow-read them directly, which also
    skips the JVM row->Arrow feed (measured ~1.5s core-count-
    independent per-JVM cost on a 21M-cell corpus - the difference
    between 0.5-0.66 and >=0.8 scaling efficiency at 8->32 cores).
    This is the partitioning-reuse plan at 10^12 docs: extraction
    output is written doc-bucketed, so the parse stage reads
    co-located buckets instead of re-shuffling 100 TB."""
    files = sorted(
        os.path.join(path, f) for f in os.listdir(path)
        if f.endswith(".parquet"))
    sizes_by_file = {f: os.path.getsize(f) for f in files}
    n_slots = _n_slots(spark, files, sizes_by_file)
    bin_rows = _lpt_bins(files, sizes_by_file, n_slots)
    base, get_bin = _bin_dispatch(spark, bin_rows)

    def run(id_batches: Iterator) -> Iterator:
        import pyarrow.parquet as pq

        def cell_batches() -> Iterator:
            for b in id_batches:
                for i in b.column("id").to_pylist():
                    for p in get_bin(i)[1]:
                        f = pq.ParquetFile(p)
                        yield from f.iter_batches(batch_size=2048)

        yield from _parse_cell_batches(cell_batches())

    return base.mapInArrow(run, PACKED_SPANS_SCHEMA)


def _n_slots(spark: SparkSession, files: List[str],
             sizes_by_file: dict) -> int:
    """Bin count: one LPT bin per task slot, refined up to 4 bins per
    slot ONLY when each bin still holds >= _MIN_BIN_BYTES. Parse time
    only loosely tracks file bytes, so finer bins + dynamic assignment
    absorb stragglers (measured 11.0s -> 6.4s at 32 cores in a noisy
    window) - but each extra task pays the ~35ms Python-exchange setup
    (measured: a trivial mapInArrow costs ~35ms/task at local[8] on
    top of a ~0.1s JVM job floor), so fine bins only help when a bin's
    parse dwarfs that tax. At the measured ~4MB/s-per-core parse rate
    a 16MB bin runs ~4s (tax <1%), while the old 2MB floor ran ~0.5s
    bins (tax ~7% - an interleaved A/B at local[8] on a 119MB corpus
    measured 8 bins at med 4.4s vs 32 bins at med 4.9s, the whole gap
    being task setup). Production-scale inputs (TB, 100MB+ files)
    always clear the 16MB floor and get the full fine-grained dynamic
    balance; small corpora degrade to one balanced static LPT bin per
    slot, where the synchronized best-of-rounds methodology (and on a
    real cluster, speculative execution) covers the rare straggler."""
    _MIN_BIN_BYTES = 16 << 20
    par = max(1, spark.sparkContext.defaultParallelism)
    total_bytes = sum(sizes_by_file.values())
    n_slots = max(par, min(par * 4, total_bytes // _MIN_BIN_BYTES))
    return min(n_slots, len(files)) or 1


def _lpt_bins(files: List[str], sizes_by_file: dict,
              n_slots: int) -> List[tuple]:
    """LPT-balance ``files`` into ``n_slots`` byte-balanced bins:
    ``[(rank, [file, ...]), ...]`` heaviest bin first.

    Balance by BYTES, not file count: a count-based round-robin leaves
    a 1.6x straggler tail across 32 tasks (measured). Greedy LPT over
    file sizes is O(F log S) on the driver - fine even at 10^6 files.
    Bins are handed to the scheduler heaviest-first (classic LPT queue)
    so the longest work starts first and the tail stays short.
    """
    import heapq

    sizes = sorted(((sizes_by_file[f], f) for f in files),
                   reverse=True)
    heap = [(0, i) for i in range(n_slots)]
    heapq.heapify(heap)
    bins: List[List[str]] = [[] for _ in range(n_slots)]
    loads = [0] * n_slots
    for sz, f in sizes:
        load, i = heapq.heappop(heap)
        bins[i].append(f)
        loads[i] = load + sz
        heapq.heappush(heap, (load + sz, i))
    order = sorted(range(n_slots), key=lambda i: -loads[i])
    return [(rank, bins[i]) for rank, i in enumerate(order)]


# ship the bin table via broadcast instead of the task closure above
# this many files (~1MB of paths): the closure is serialized into
# EVERY task, a broadcast crosses once per executor
_BC_FILES_THRESHOLD = 10_000


def _bin_dispatch(spark: SparkSession, bin_rows: List[tuple]):
    """One-task-per-bin dispatch with ZERO exchange: a JVM ``Range``
    scan of exactly ``len(bin_rows)`` splits (Range slices [0, n) into
    n contiguous pieces, so partition i holds exactly id i - placement
    is a contract, not a sampling outcome), with the bin table riding
    in the closure (or a broadcast when large). Returns ``(base_df,
    get_bin)`` where ``get_bin(id) -> (slot, [file, ...])``.

    The previous plan (one row per file + repartitionByRange on slot)
    paid a sampling JOB plus a range-exchange on every run; an RDD
    ``parallelize`` of the bins costs a separate Python-runner pass
    just to evaluate the scan. Both measured SLOWER than this shape
    (interleaved A/B at local[8], 119MB/64-file corpus: exchange plan
    med 5.6s, parallelize med 5.3s, Range dispatch med 4.9s at equal
    bin count) - and a trivial 32-task mapInArrow floor drops from
    ~1.55s (exchange) to ~1.1s (Range, 32 python tasks) to ~0.45s
    (8 python tasks): the per-task Python-exchange setup (~35ms) and
    the exchange are the whole overhead. Bin count handles the rest
    (see ``_MIN_BIN_BYTES``)."""
    n = len(bin_rows)
    if sum(len(b) for _, b in bin_rows) > _BC_FILES_THRESHOLD:
        bc = spark.sparkContext.broadcast(bin_rows)

        def get_bin(i: int):
            return bc.value[i]
    else:
        def get_bin(i: int):
            return bin_rows[i]

    return spark.range(0, n, 1, n), get_bin


SHARD_LINEAGE_SCHEMA = ("slot int, shard_path string, n_files int, "
                        "n_docs int, n_spans long, "
                        "doc_id_min string, doc_id_max string, "
                        "wall_s double")


def _write_slot_shards(rows, out_dir: str) -> Iterator:
    """Parse and sink one packed shard PER SLOT present in ``rows``
    (``(slot, path)`` pairs), yielding one lineage RecordBatch each.

    Placement is exact by construction (one bin per ``parallelize``
    slice, :func:`_bins_to_df`), but grouping by slot here stays as a
    contract-independent guard: a partition that somehow held two bins
    can never fuse them into one mislabeled shard — which would make a
    later ``resume=True`` re-run the "missing" slot and duplicate its
    docs.
    """
    import time as _time
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    if not rows:
        return
    by_slot: dict = {}
    for s, p in rows:
        by_slot.setdefault(s, []).append(p)
    for slot in sorted(by_slot):
        bin_files = by_slot[slot]
        t0 = _time.perf_counter()

        def cell_batches() -> Iterator:
            for p in bin_files:
                f = pq.ParquetFile(p)
                yield from f.iter_batches(batch_size=2048)

        out_batches = list(_parse_cell_batches(cell_batches()))
        shard = os.path.join(out_dir, f"shard-{slot:05d}.parquet")
        tmp = os.path.join(out_dir,
                           f"_tmp-{slot:05d}-{uuid.uuid4().hex}")
        if out_batches:
            import pyarrow.compute as pc

            tbl = pa.Table.from_batches(out_batches)
            pq.write_table(tbl, tmp)
            os.rename(tmp, shard)  # the commit point
            n_docs = tbl.num_rows
            n_spans = int(pc.sum(
                pc.list_value_length(tbl.column("ords"))).as_py() or 0)
            mm = pc.min_max(tbl.column("doc_id"))
            dmin = mm["min"].as_py()
            dmax = mm["max"].as_py()
        else:
            shard, n_docs, n_spans, dmin, dmax = None, 0, 0, None, None
        wall = _time.perf_counter() - t0
        yield pa.RecordBatch.from_arrays(
            [pa.array([slot], pa.int32()),
             pa.array([shard], pa.string()),
             pa.array([len(bin_files)], pa.int32()),
             pa.array([n_docs], pa.int32()),
             pa.array([n_spans], pa.int64()),
             pa.array([dmin], pa.string()),
             pa.array([dmax], pa.string()),
             pa.array([round(wall, 3)], pa.float64())],
            names=["slot", "shard_path", "n_files", "n_docs",
                   "n_spans", "doc_id_min", "doc_id_max", "wall_s"])


def extract_layout_shards(spark: SparkSession, path: str,
                          out_dir: str,
                          resume: bool = False) -> DataFrame:
    """Parse a doc-grouped print table and SINK the packed spans to
    doc-bucketed parquet shards, writing from the Python workers
    themselves; only per-task lineage/metrics rows cross the
    Python->JVM boundary.

    This is the production sink plan at 10^12 docs: the packed span
    payload never crosses the Arrow IPC socket into the JVM at all -
    each task pyarrow-reads its LPT bin of print files, parses, and
    pyarrow-writes ONE packed shard (write-then-rename, so a killed
    task leaves only a ``_tmp`` orphan and rewriting is idempotent -
    the same commit discipline as io/checkpoint.py, whose Iceberg
    analogue is a snapshot commit). The returned lineage DataFrame is
    the north-rule metrics table: (slot, shard_path, n_files, n_docs,
    n_spans, doc_id_min/max, wall_s) per task. Measured motivation:
    the count-only packed boundary still ships every span byte into
    the JVM; under memory-bandwidth contention that crossing is the
    one cost the equivalent no-Spark pool does not pay.

    ``resume=True`` skips every slot whose committed shard already
    exists (the bin->slot assignment is deterministic for a given
    input listing: LPT over sorted file sizes), so a preempted run
    re-executes only the missing slots — the north rule's
    checkpoint-resume contract at the sink. The returned lineage
    covers only the slots written THIS run; full accounting is the
    shards themselves (or persist the lineage rows per run, as
    io/checkpoint.py does for the chunking tier).

    Reference has no equivalent (single-process, reference
    docling_core/transforms/ serializes in-memory); the shard shape is
    what :func:`extract_layout_packed_files` consumes back, so
    downstream stages read co-located buckets instead of re-shuffling.
    """
    files = sorted(
        os.path.join(path, f) for f in os.listdir(path)
        if f.endswith(".parquet"))
    sizes_by_file = {f: os.path.getsize(f) for f in files}
    n_slots = _n_slots(spark, files, sizes_by_file)
    os.makedirs(out_dir, exist_ok=True)

    bin_rows = _lpt_bins(files, sizes_by_file, n_slots)
    if resume:
        done = {
            rank for rank in range(n_slots)
            if os.path.exists(
                os.path.join(out_dir, f"shard-{rank:05d}.parquet"))}
        bin_rows = [(rank, b) for rank, b in bin_rows
                    if rank not in done]
        if not bin_rows:
            return spark.createDataFrame([], SHARD_LINEAGE_SCHEMA)
    base, get_bin = _bin_dispatch(spark, bin_rows)

    def run(id_batches: Iterator) -> Iterator:
        rows = [(s, p) for b in id_batches
                for i in b.column("id").to_pylist()
                for s, bin_files in [get_bin(i)]
                for p in bin_files]
        yield from _write_slot_shards(rows, out_dir)

    return base.mapInArrow(run, SHARD_LINEAGE_SCHEMA)


def extract_layout(cells: DataFrame) -> DataFrame:
    """Cell table -> flat extracted span rows (``SPANS_SCHEMA``).

    The flat view of :func:`extract_layout_docs`: the unpack runs
    JVM-side (:func:`unpack_spans_flat` - posexplode on the packed
    attribute, never inline over a computed array-of-structs), so the
    expensive Python->JVM crossing stays in the packed doc-row
    shape."""
    return unpack_spans_flat(extract_layout_packed(cells))


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


def layout_cells_ensure(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the print table if needed; returns its path."""
    from docling_core_spark.queries import corpus_df

    path = layout_cells_path(sf_dir)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        render_layout(corpus_df(spark, sf_dir)) \
            .write.mode("overwrite").parquet(path)
    return path


def layout_cells_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(layout_cells_ensure(spark, sf_dir))


# ----------------------------------------------------------------------
# registry queries
# ----------------------------------------------------------------------

def q_layout_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the printed cell table back to spans; oracle = the layout
    projection computed straight from the source spans (pyoracle) -
    geometry parse and span normalization are independent code paths.
    Uses the zero-shuffle file-granular plan (the print table is
    doc-grouped by construction)."""
    path = layout_cells_ensure(spark, sf_dir)
    return unpack_spans_flat(extract_layout_packed_files(spark, path))


def q_layout_page_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Print+parse accounting per document (distributed vs
    single-process equivalence)."""
    from docling_core_spark.queries import corpus_df

    return layout_stats(corpus_df(spark, sf_dir))
