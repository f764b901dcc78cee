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


def stream_chunk_metrics(
    spark: SparkSession,
    input_dir: str,
    mode: str = "hier",
    max_tokens: int = 64,
    window_duration: str = "10 seconds",
    watermark_delay: str = "30 seconds",
) -> DataFrame:
    """Stateful streaming rollup: chunk/doc counts per event-time
    window, with a watermark bounding state.

    Event time is the ingestion timestamp (the file-stream analogue of
    a Kafka record timestamp); the watermark lets Spark finalize and
    evict windows older than ``watermark_delay``, so state stays O(open
    windows) no matter how long the stream runs - the monitoring
    counterpart of the per-bucket lineage rows in io/checkpoint.py.
    Late files (re-delivered beyond the delay) are dropped from the
    rollup but never from the chunk output, which is stateless."""
    from pyspark.sql import functions as F

    chunks = stream_chunk_documents(spark, input_dir, mode=mode,
                                    max_tokens=max_tokens)
    stamped = chunks.withColumn("ingest_ts", F.current_timestamp())
    return (stamped
            .withWatermark("ingest_ts", watermark_delay)
            .groupBy(F.window("ingest_ts", window_duration).alias("win"))
            .agg(F.count(F.lit(1)).alias("n_chunks"),
                 F.approx_count_distinct("doc_id").alias("n_docs_approx"))
            .select(F.col("win.start").alias("window_start"),
                    F.col("win.end").alias("window_end"),
                    "n_chunks", "n_docs_approx"))


def run_metrics_once(
    spark: SparkSession,
    input_dir: str,
    table_name: str = "chunk_metrics",
    mode: str = "hier",
    max_tokens: int = 64,
    window_duration: str = "10 seconds",
    watermark_delay: str = "30 seconds",
) -> DataFrame:
    """Drain available files through the windowed rollup into an
    in-memory table (complete mode - open windows included) and return
    it. Production would writeStream the update stream to a metrics
    sink instead; this is the inspectable one-shot form."""
    metrics = stream_chunk_metrics(
        spark, input_dir, mode=mode, max_tokens=max_tokens,
        window_duration=window_duration, watermark_delay=watermark_delay)
    q = (metrics.writeStream
         .format("memory")
         .queryName(table_name)
         .outputMode("complete")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.table(table_name)


# ----------------------------------------------------------------------
# streaming main-content extraction (the north rule's ingestion front
# end: crawled pages land continuously; extraction is stateless per
# page, so the batch operator is streaming-compatible as-is)
# ----------------------------------------------------------------------

PAGES_STREAM_SCHEMA = "doc_id string, html string"


def stream_extract_pages(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    """Streaming DataFrame of extracted span rows from a parquet
    page-file stream ((doc_id, html) rows)."""
    from pyspark.sql.types import StringType, StructField, StructType

    from docling_core_spark.extraction.spark import extract_pages

    schema = StructType([StructField("doc_id", StringType(), False),
                         StructField("html", StringType(), False)])
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    return extract_pages(reader.load(input_dir))


def stream_extract_once(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain currently-available page files through extraction
    (Trigger.AvailableNow), append span parquet, stop. Re-invocation
    processes only newly-landed pages (checkpointed file log)."""
    spans = stream_extract_pages(spark, input_dir)
    q = (spans.writeStream
         .format("parquet")
         .option("path", output_dir)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def stream_extract_cells_once(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: Optional[int] = None,
) -> None:
    """Streaming PDF/layout-parse: drain currently-available packed
    cell files (layout_spark.CELLS_SCHEMA parquet), parse each
    micro-batch, stop. Re-invocation processes only new files.

    Unlike the HTML tier (one page row = one complete document,
    row-stateless, so the batch operator streams as-is), the layout
    parse is a GROUPED operator - a document's pages must be
    co-located and sorted, which Structured Streaming only allows
    with batch semantics inside ``foreachBatch``. Correctness rests
    on the print writer's invariant that a document never spans
    files: the file source assigns whole files to micro-batches, so
    every micro-batch holds complete documents.

    Exactly-once: the sink writes each micro-batch to
    ``output_dir/batch=<batchId>`` with overwrite, so a batch retried
    after a crash replaces its own partial output instead of
    appending duplicates (the foreachBatch idempotence pattern; the
    parquet-sink file log used by the stateless tiers is unavailable
    here). Read the result back with ``spark.read.parquet(output_dir)``
    - ``batch`` surfaces as a partition column."""
    import os

    from pyspark.sql import functions as F

    from docling_core_spark.extraction.layout_spark import (
        CELLS_SCHEMA,
        extract_layout,
    )

    reader = spark.readStream.schema(CELLS_SCHEMA).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    cells = reader.load(input_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (extract_layout(batch_df)
         .write.mode("overwrite")
         .parquet(os.path.join(output_dir, f"batch={batch_id}")))

    q = (cells.writeStream
         .foreachBatch(sink)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


# ----------------------------------------------------------------------
# streaming exact dedup: the training-data tier's stateful operator
# (first occurrence of each content fingerprint wins, across
# micro-batches and across restarts)
# ----------------------------------------------------------------------

DEDUP_OUT_SCHEMA = "fp string, doc_id string"
DEDUP_STATE_SCHEMA = "seen boolean, first_doc_id string"


def _dedup_state_fn(key, pdfs, state):
    """applyInPandasWithState body: one key = one content fingerprint.

    Emits exactly one (fp, doc_id) survivor row the FIRST time the
    fingerprint is ever seen (min doc_id inside that batch breaks
    intra-batch ties deterministically); later batches and re-delivered
    duplicates emit nothing. State is just the seen flag + survivor id,
    persisted in the streaming checkpoint, so a restarted query never
    re-admits a duplicate it already passed."""
    import pandas as pd

    doc_ids = []
    for pdf in pdfs:
        doc_ids.extend(pdf["doc_id"].tolist())
    seen = state.exists and state.get[0]
    if seen or not doc_ids:
        return  # duplicate (or empty group): emit nothing
    winner = min(doc_ids)
    state.update((True, winner))
    yield pd.DataFrame({"fp": [key[0]], "doc_id": [winner]})


def _dedup_state_fn_ttl(ttl_ms: int):
    """TTL variant of the dedup state body (sliding admission window):
    each sighting re-arms the processing-time timeout; a fingerprint
    unseen for ``ttl_ms`` has its state reclaimed on the next trigger,
    so a later re-occurrence is admitted again. This is the state-size
    control for unbounded streams - state holds only fingerprints seen
    within the window, not forever."""

    def fn(key, pdfs, state):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        doc_ids = []
        for pdf in pdfs:
            doc_ids.extend(pdf["doc_id"].tolist())
        seen = state.exists and state.get[0]
        if seen or not doc_ids:
            if state.exists:
                # Spark clears the timeout on every invocation that
                # has data; re-arm it or the state never expires
                state.setTimeoutDuration(ttl_ms)
            return
        winner = min(doc_ids)
        state.update((True, winner))
        state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame({"fp": [key[0]], "doc_id": [winner]})

    return fn


def stream_dedup_documents(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: Optional[int] = None,
    ttl_ms: Optional[int] = None,
) -> DataFrame:
    """Streaming exact dedup over the documents stream.

    The key is a JVM-side content fingerprint (md5 over the
    offset-ordered span texts - the same content identity
    textops.q_doc_fingerprints exposes in batch); only (fp, doc_id)
    enters the stateful operator, so the shuffle and the state store
    carry fingerprints, never span payloads. Survivors are joined back
    to payloads downstream (or used as an admission list).

    Scale shape: state is one boolean+string per DISTINCT fingerprint,
    partitioned by fp hash across executors - the streaming analogue
    of the batch hash-groupBy exact dedup. Production knobs, both
    TESTED (tests/test_streaming.py): the RocksDB state-store provider
    (spark.sql.streaming.stateStore.providerClass) keeps 10^9+ keys
    off-heap with checkpointed snapshots; ``ttl_ms`` turns the
    admission list into a sliding window via ProcessingTimeTimeout so
    state size tracks the window, not the stream's lifetime."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    reader = (spark.readStream.schema(DOCUMENTS_SCHEMA)
              .format("parquet"))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    docs = reader.load(input_dir)
    keyed = docs.select(
        F.md5(F.expr(
            "array_join(transform(array_sort(spans, (a, b) -> "
            "a.offset - b.offset), s -> s.text), '\\u001f')"
        )).alias("fp"),
        "doc_id")
    fn = (_dedup_state_fn if ttl_ms is None
          else _dedup_state_fn_ttl(ttl_ms))
    timeout = (GroupStateTimeout.NoTimeout if ttl_ms is None
               else GroupStateTimeout.ProcessingTimeTimeout)
    return (keyed.groupBy("fp")
            .applyInPandasWithState(
                fn,
                outputStructType=DEDUP_OUT_SCHEMA,
                stateStructType=DEDUP_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=timeout))


def stream_dedup_once(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: Optional[int] = None,
    ttl_ms: Optional[int] = None,
) -> None:
    """Drain available files through the stateful dedup into a parquet
    sink. Re-running with the same checkpoint resumes: already-seen
    fingerprints stay deduplicated across runs (state lives in the
    checkpoint), and the parquet sink's file log keeps output
    exactly-once."""
    survivors = stream_dedup_documents(
        spark, input_dir, max_files_per_trigger=max_files_per_trigger,
        ttl_ms=ttl_ms)
    q = (survivors.writeStream
         .format("parquet")
         .option("path", output_dir)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    if ttl_ms is None:
        q.awaitTermination()
    else:
        # with ProcessingTimeTimeout the microbatch engine keeps
        # scheduling no-data batches while timers are pending, so an
        # availableNow query never self-terminates (observed: the
        # batch counter spins; processAllAvailable blocks the same
        # way). Poll until the available data is drained and no
        # trigger is mid-flight, then stop. Pending timers fire in a
        # later run's batch - exactly the expiry semantics a periodic
        # drain pipeline wants.
        #
        # A timer-only zero-input batch can complete BEFORE the data
        # batch under load, so "first zero-input batch" alone is not
        # proof the data drained - only accept it after some batch
        # actually consumed rows; when the drain genuinely has no new
        # files, fall back to a sustained-idle check + deadline.
        import time as _time

        t0 = _time.monotonic()
        saw_data = False
        idle_polls = 0
        while q.isActive:
            prog = q.recentProgress
            if any(p["numInputRows"] > 0 for p in prog):
                saw_data = True
            lp = q.lastProgress
            s = q.status
            engine_idle = (bool(prog) and not s["isDataAvailable"]
                           and not s["isTriggerActive"])
            if saw_data and ((lp is not None
                              and lp["numInputRows"] == 0)
                             or engine_idle):
                break
            idle_polls = idle_polls + 1 if engine_idle else 0
            if idle_polls >= 25 or _time.monotonic() - t0 > 90.0:
                break
            _time.sleep(0.2)
        q.stop()
        q.awaitTermination()


# ----------------------------------------------------------------------
# Event-time windowed rate with late-data drop (the watermark contract)
# ----------------------------------------------------------------------

def stream_doc_rate(
    spark: SparkSession,
    input_dir: str,
    window_duration: str = "10 seconds",
    watermark_delay: str = "5 seconds",
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    """Docs-per-window over a DATA-CARRIED event time - the late-data
    contract stream_chunk_metrics (processing-time stamps) cannot
    exercise: here the watermark is driven by the events themselves,
    so in append mode a window only emits once the stream's event time
    passes window_end + delay, and events arriving LATER than the
    delay are dropped from their (already finalized) window instead of
    mutating emitted results. State stays O(open windows).

    Source schema: (doc_id long, event_ts timestamp) - the ingestion
    log of a crawl pipeline (Kafka record time at production scale;
    the parquet file stream has identical semantics for append-only
    batches)."""
    from pyspark.sql import functions as F

    reader = (spark.readStream
              .schema("doc_id long, event_ts timestamp")
              .format("parquet"))
    if max_files_per_trigger is not None:
        # per-trigger cap so one drain run processes multiple
        # microbatches (each batch advances the watermark the next
        # batch is judged against)
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    return (reader.load(input_dir)
            .withWatermark("event_ts", watermark_delay)
            .groupBy(F.window("event_ts", window_duration).alias("win"))
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .select(F.col("win.start").alias("window_start"),
                    F.col("win.end").alias("window_end"), "n_docs"))


def stream_doc_rate_once(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window_duration: str = "10 seconds",
    watermark_delay: str = "5 seconds",
    max_files_per_trigger: Optional[int] = None,
) -> None:
    """Drain available files through the event-time rollup into a
    parquet sink (append mode: only FINALIZED windows are written,
    exactly once). Re-running with the same checkpoint resumes the
    watermark, so lateness is judged across runs, not per run - drop
    a file of old events into ``input_dir`` after the watermark has
    advanced and they never appear in the sink."""
    rate = stream_doc_rate(spark, input_dir,
                           window_duration=window_duration,
                           watermark_delay=watermark_delay,
                           max_files_per_trigger=max_files_per_trigger)
    q = (rate.writeStream
         .format("parquet")
         .option("path", output_dir)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


# ----------------------------------------------------------------------
# Hygiene-gated streaming ingest (the streaming twin of the batch
# incremental_ingest / clean_corpus admission path)
# ----------------------------------------------------------------------

TEXT_DOCS_SCHEMA = "doc_id long, text string, source string"

INGEST_OUT_SCHEMA = ("fp string, doc_id string, pred_lang string, "
                     "n_words long, n_pii long")
INGEST_STATE_SCHEMA = "seen boolean, first_doc_id string"


def _ingest_state_fn(key, pdfs, state):
    """First-fingerprint-wins across batches AND restarts, carrying
    the admitted doc's hygiene columns (statistic-sized - never
    text)."""
    import pandas as pd

    rows = pd.concat(list(pdfs), ignore_index=True)
    if state.exists:
        return iter(())
    best = rows.sort_values("doc_id").iloc[0]
    state.update((True, str(best["doc_id"])))
    out = pd.DataFrame({
        "fp": [key[0]],
        "doc_id": [str(best["doc_id"])],
        "pred_lang": [best["pred_lang"]],
        "n_words": [int(best["n_words"])],
        "n_pii": [int(best["n_pii"])],
    })
    return iter((out,))


def stream_ingest_documents(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    """Streaming corpus admission: hygiene gate -> stateful exact
    dedup, over a (doc_id, text, source) document stream.

    The hygiene stage is textops.hygiene_over - the SAME scrub ->
    language-ID -> quality-gate projection the batch pipeline and
    jobs/build_training_corpus.py run (stateless, so it streams
    unchanged); documents failing the gate never reach the stateful
    operator. Dedup keys on md5(clean_text) (the batch pipeline's
    content identity); only (fp, doc_id, statistic columns) enter
    the state shuffle, never text. Output is the ADMISSION LIST with
    per-doc hygiene metadata - downstream joins it to payloads at
    consumption, the same contract as stream_dedup_documents.

    Scale shape: state is one row per distinct content hash; the
    hygiene projection is whole-stage codegen per micro-batch with
    zero extra shuffle."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    from docling_core_spark.textops import hygiene_over

    reader = (spark.readStream.schema(TEXT_DOCS_SCHEMA)
              .format("parquet"))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    docs = reader.load(input_dir)
    hyg = (hygiene_over(docs)
           .filter(F.col("keep"))
           .select(F.md5("clean_text").alias("fp"), "doc_id",
                   "pred_lang", "n_words", "n_pii"))
    return (hyg.groupBy("fp")
            .applyInPandasWithState(
                _ingest_state_fn,
                outputStructType=INGEST_OUT_SCHEMA,
                stateStructType=INGEST_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def stream_ingest_once(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: Optional[int] = None,
) -> None:
    """Drain available files through the hygiene-gated ingest into a
    parquet sink; re-running with the same checkpoint resumes (state
    carries admitted fingerprints across restarts, the sink's file
    log keeps output exactly-once)."""
    admitted = stream_ingest_documents(
        spark, input_dir, max_files_per_trigger=max_files_per_trigger)
    q = (admitted.writeStream
         .format("parquet")
         .option("path", output_dir)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
