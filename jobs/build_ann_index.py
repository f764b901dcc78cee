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
    p.add_argument("--append", action="store_true",
                   help="treat --input as an incremental batch: assign "
                        "to the existing centroids and append into the "
                        "cell partitions; retrain only if the batch's "
                        "distortion drifts past --drift-threshold")
    p.add_argument("--drift-threshold", type=float, default=1.5,
                   help="batch-vs-training mean quantized-L2 ratio "
                        "above which --append retrains the quantizer")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from docling_core_spark.annindex import (append_ivf_index,
                                             build_ivf_index)

    spark = SparkSession.builder.appName(
        "docling-build-ann-index").getOrCreate()
    emb = spark.read.parquet(args.input)
    if args.append:
        stats = append_ivf_index(emb, args.output,
                                 drift_threshold=args.drift_threshold)
        print(f"DONE appended={stats['n_appended']} "
              f"drift={stats['drift']:.3f} refit={stats['refit']} "
              f"vectors={stats['n_vectors']}")
    else:
        stats = build_ivf_index(emb, args.output)
        print(f"DONE cells={stats['n_cells']} "
              f"vectors={stats['n_vectors']}")
    spark.stop()


if __name__ == "__main__":
    main()
