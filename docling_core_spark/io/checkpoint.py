"""Resumable runs with per-partition lineage (north-rule requirement).

Production target is Iceberg: every bucket commit is an Iceberg
snapshot and resume = anti-join of processed doc_ids from snapshot
metadata. This sandbox has no Iceberg runtime, so the same protocol is
emulated on plain parquet with an explicit commit log:

* the input corpus is split into ``n_buckets`` deterministic hash
  buckets of ``doc_id`` (``pmod(xxhash64(doc_id), n_buckets)``) - the
  unit of exactly-once commit;
* each bucket's output is written to ``out_dir/chunks/bucket=B``
  (overwrite - rewriting a half-written bucket is idempotent), THEN a
  lineage slice is appended under ``out_dir/lineage`` recording, per
  Spark partition of that bucket: ``(bucket, partition_id, min/max
  doc_id, n_docs, n_chunks, wall_s, committed_at)``;
* resume reads the lineage table and skips every bucket that has
  lineage rows - a crash between output write and lineage append just
  rewrites that one bucket, so the output never double-counts.

At 100 TB the bucket count is sized so one bucket is a few executors'
worth of work (e.g. 4096 buckets over 10^12 docs); the driver loop is
then a cheap scheduler and each failed/preempted slice costs at most
1/4096 of the run to redo. Skew inside a bucket is already defused by
round-robin repartition before the chunking UDF (engine.py).

Reference has no equivalent (single-process, no checkpointing) - this
implements the scale contract from BASELINE.json north_rule.
"""

from __future__ import annotations

import os
import time
from typing import Callable, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_COLS = ["bucket", "partition_id", "doc_id_min", "doc_id_max",
                "n_docs", "n_chunks", "wall_s", "committed_at"]


def _bucket_col(n_buckets: int):
    return F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_buckets))


def completed_buckets(spark: SparkSession, out_dir: str) -> List[int]:
    lineage_dir = os.path.join(out_dir, "lineage")
    if not os.path.exists(lineage_dir):
        return []
    try:
        rows = (spark.read.parquet(lineage_dir)
                .select("bucket").distinct().collect())
    except Exception:
        return []
    return sorted(int(r["bucket"]) for r in rows)


def read_lineage(spark: SparkSession, out_dir: str) -> Optional[DataFrame]:
    lineage_dir = os.path.join(out_dir, "lineage")
    if not os.path.exists(lineage_dir):
        return None
    return spark.read.parquet(lineage_dir)


def read_output(spark: SparkSession, out_dir: str) -> DataFrame:
    """Only committed buckets count - uncommitted dirs are ignored,
    mirroring Iceberg's snapshot isolation."""
    done = completed_buckets(spark, out_dir)
    paths = [os.path.join(out_dir, "chunks", f"bucket={b}") for b in done]
    paths = [p for p in paths if os.path.exists(p)]
    if not paths:
        raise FileNotFoundError(f"no committed buckets under {out_dir}")
    return spark.read.parquet(*paths)


def run_resumable(
    docs: DataFrame,
    out_dir: str,
    stage: Callable[[DataFrame], DataFrame],
    n_buckets: int = 8,
    max_buckets_this_run: Optional[int] = None,
) -> DataFrame:
    """Run ``stage`` (documents df -> per-doc output df with a doc_id
    column) over all not-yet-committed buckets; return the full
    committed output.

    ``max_buckets_this_run`` exists for tests (simulated preemption):
    process at most that many buckets then stop - a subsequent call
    resumes exactly where this one left off.
    """
    spark = docs.sparkSession
    done = set(completed_buckets(spark, out_dir))
    todo = [b for b in range(n_buckets) if b not in done]
    if max_buckets_this_run is not None:
        todo = todo[:max_buckets_this_run]

    for b in todo:
        t0 = time.time()
        sub = docs.filter(_bucket_col(n_buckets) == b)
        out = stage(sub).withColumn("partition_id", F.spark_partition_id())
        chunk_dir = os.path.join(out_dir, "chunks", f"bucket={b}")
        out.write.mode("overwrite").parquet(chunk_dir)
        wall = time.time() - t0
        # lineage from the committed files (cheap: one bucket's worth)
        written = spark.read.parquet(chunk_dir)
        lineage = (written.groupBy("partition_id").agg(
            F.min("doc_id").alias("doc_id_min"),
            F.max("doc_id").alias("doc_id_max"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_chunks"),
        ).withColumn("bucket", F.lit(b))
         .withColumn("wall_s", F.lit(round(wall, 3)))
         .withColumn("committed_at", F.current_timestamp())
         .select(*LINEAGE_COLS))
        if lineage.isEmpty():
            # an empty bucket still needs a commit record, else resume
            # would reprocess it forever (and a max_buckets_this_run
            # loop would stall on it); schema must match the aggregate
            # path exactly or mixed appends corrupt the lineage table
            lineage = (spark.createDataFrame(
                [(b, -1, None, None, 0, 0, round(wall, 3))],
                "bucket int, partition_id int, doc_id_min string, "
                "doc_id_max string, n_docs bigint, n_chunks bigint, "
                "wall_s double")
                .withColumn("committed_at", F.current_timestamp())
                .select(*LINEAGE_COLS))
        # the commit point: bucket becomes visible only once this lands
        lineage.coalesce(1).write.mode("append").parquet(
            os.path.join(out_dir, "lineage"))

    return read_output(spark, out_dir)
