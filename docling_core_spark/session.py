"""SparkSession helpers with scale-appropriate defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "docling-core-spark",
              master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Session with AQE + Arrow tuned for the document pipeline.

    Scale notes (100 TB / 1000-executor target):
    * AQE on: runtime coalescing + skew-join splitting handle the long
      tail of shuffle-partition sizes without manual tuning.
    * Arrow batches capped so one batch of span-heavy documents cannot
      blow past Python-worker memory (SURVEY §4.2 hazard 3); a mega-doc
      is still one record, so the cap is the per-batch amplifier.
    * shuffle partitions default to cores locally; on a real cluster set
      spark.sql.shuffle.partitions ~ 2-3x total cores (or leave AQE's
      coalescing to trim a higher initial value).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    my_master = master or f"local[{cpus}]"
    sp = shuffle_partitions if shuffle_partitions is not None else cpus
    return (
        SparkSession.builder
        .appName(app_name)
        .master(my_master)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
