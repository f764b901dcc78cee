#!/usr/bin/env python
"""spark-submit entry point: resumably extract main content from a
page table (the north-rule extraction tier as an operational job).

    python package.py
    spark-submit --master local[8] \
        --py-files dist/docling_core_spark.zip \
        jobs/extract_pages.py \
        --input /path/to/pages_parquet --output /path/to/out \
        [--n-buckets 64]

Input: parquet of ``(doc_id string, html string)`` rows. Output:
``<output>/chunks`` span rows (doc_id, ord, kind, text, media_ref)
plus ``<output>/lineage`` per-partition rows. The run is the same
resumable hash-bucket commit as jobs/chunk_corpus.py: re-submitting
after a kill continues from the last committed bucket, and the same
command runs at N or 4N executors on a real master.
"""

from __future__ import annotations

import argparse


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True,
                   help="parquet dir of pages(doc_id, html)")
    p.add_argument("--output", required=True)
    p.add_argument("--n-buckets", type=int, default=8)
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from docling_core_spark.extraction.spark import extract_pages
    from docling_core_spark.io.checkpoint import read_lineage, run_resumable

    spark = SparkSession.builder.appName(
        "docling-extract-pages").getOrCreate()
    pages = spark.read.parquet(args.input)
    out = run_resumable(pages, args.output,
                        lambda df: extract_pages(df),
                        n_buckets=args.n_buckets)
    n_spans = out.count()
    lineage = read_lineage(spark, args.output)
    n_lineage = lineage.count() if lineage is not None else 0
    print(f"DONE spans={n_spans} lineage_rows={n_lineage}")
    spark.stop()


if __name__ == "__main__":
    main()
