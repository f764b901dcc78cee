#!/usr/bin/env python
"""spark-submit entry point: hygiene-gated streaming corpus admission.

    python package.py
    spark-submit --master local[8] \
        --py-files dist/docling_core_spark.zip \
        jobs/stream_ingest.py \
        --input /path/to/incoming_docs --output /path/to/admitted \
        --checkpoint /path/to/ckpt [--max-files-per-trigger 8]

Each invocation drains all currently-available files (availableNow)
through the batch hygiene projection + stateful first-wins content
dedup (docling_core_spark/streaming/pipeline.py) and appends the
admission list (fp, doc_id, pred_lang, n_words, n_pii) to the
parquet sink. Re-running with the same checkpoint RESUMES: admitted
fingerprints live in the state store, the sink's file log keeps
output exactly-once - cron this for periodic incremental ingest. On
a cluster, set spark.sql.streaming.stateStore.providerClass to the
RocksDB provider for 10^9+ keys (exercised in
tests/test_streaming.py).
"""

from __future__ import annotations

import argparse


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True,
                   help="parquet dir of incoming documents"
                        " (doc_id, text, source)")
    p.add_argument("--output", required=True,
                   help="admission-list parquet sink")
    p.add_argument("--checkpoint", required=True,
                   help="streaming checkpoint dir (state + file log)")
    p.add_argument("--max-files-per-trigger", type=int, default=None)
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from docling_core_spark.streaming import stream_ingest_once

    spark = SparkSession.builder.appName(
        "docling-stream-ingest").getOrCreate()
    stream_ingest_once(spark, args.input, args.output, args.checkpoint,
                       max_files_per_trigger=args.max_files_per_trigger)
    n = spark.read.parquet(args.output).count()
    print(f"DONE admitted={n}")
    spark.stop()


if __name__ == "__main__":
    main()
