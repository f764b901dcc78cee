#!/usr/bin/env python
"""spark-submit entry point: build the materialized IVF ANN index.

    python package.py
    spark-submit --master local[8] \
        --py-files dist/docling_core_spark.zip \
        jobs/build_ann_index.py \
        --input /path/to/embeddings_parquet --output /path/to/index

Writes <output>/centroids.parquet (the model) and
<output>/assignments/cell=N/ (partitioned by cell, so serving reads
only probed cells - see docling_core_spark/annindex.py). Same
operational shape as the other jobs: the zip ships the engine, the
build runs at N or 4N executors unchanged.
"""

from __future__ import annotations

import argparse


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True,
                   help="parquet dir/file of embeddings(vec_id, embedding)")
    p.add_argument("--output", required=True, help="index output dir")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from docling_core_spark.annindex import build_ivf_index

    spark = SparkSession.builder.appName(
        "docling-build-ann-index").getOrCreate()
    emb = spark.read.parquet(args.input)
    stats = build_ivf_index(emb, args.output)
    print(f"DONE cells={stats['n_cells']} vectors={stats['n_vectors']}")
    spark.stop()


if __name__ == "__main__":
    main()
