"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline (hybrid token-aware
chunking of the deterministic synthetic interleaved-span corpus) and
returns the chunk DataFrame. ``queries()`` exposes every implemented
operator (SURVEY.md §2; 57 entries as of round 2) and
``oracle_sql()`` gives a DuckDB oracle for EVERY one of them:
ANSI-SQL for the relational/training-data queries, and for the
non-SQL-expressible document-engine queries a ``SELECT`` over
expected rows materialized by the single-process pure-Python path
(pyoracle.py) - a distributed-vs-sequential equivalence check whose
pure-Python side is itself parity-locked to the live reference
library by the pytest suites (tests/test_chunk_parity.py and
friends: span-sequence equality, byte-equal exports, recording-shim
visualizer parity).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: hybrid chunking over the synthetic span corpus sized
    for sf0.001 (driver smoke-checks rows>0 and a stable schema)."""
    from docling_core_spark.engine import chunk_documents, synth_documents

    docs = synth_documents(spark, n_docs=50, seed=42)
    return chunk_documents(docs, mode="hybrid", max_tokens=64)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from docling_core_spark.queries import registry

    return registry()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each SQL-expressible query."""
    from docling_core_spark.queries import oracles

    return oracles()
