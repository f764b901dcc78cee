"""Materialized IVF index: build-once/serve-many equals the
in-session trained query, and serving is partition-pruned to the
probed cells."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.01")


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet") \
        .select("vec_id", "embedding")


def test_index_serve_equals_in_session_query(spark, tmp_path):
    from docling_core_spark.annindex import build_ivf_index, ivf_query_topk
    from docling_core_spark.textops import q_ann_ivf_kmeans_topk

    out = str(tmp_path / "ivf")
    stats = build_ivf_index(_emb(spark), out)
    assert stats["n_cells"] >= 2
    assert stats["n_vectors"] == _emb(spark).count()

    qvec = [float(x) for x in _emb(spark)
            .filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    served = [(r["vec_id"], r["cell"], r["cos_sim"])
              for r in ivf_query_topk(spark, out, qvec,
                                      exclude_vec_id=0).collect()]
    want = [(r["vec_id"], r["cell"], r["cos_sim"])
            for r in q_ann_ivf_kmeans_topk(spark, SF_DIR).collect()]
    assert served == want


def test_serving_scan_is_partition_pruned(spark, tmp_path):
    from docling_core_spark.annindex import (
        _probe_cells,
        build_ivf_index,
        ivf_query_topk,
        load_centroids,
    )

    out = str(tmp_path / "ivf")
    build_ivf_index(_emb(spark), out)
    qvec = [float(x) for x in _emb(spark)
            .filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    df = ivf_query_topk(spark, out, qvec, exclude_vec_id=0)
    probes = _probe_cells(load_centroids(spark, out), qvec, 3)
    # the cell filter reaches the scan as a PARTITION filter (pruned
    # at listing time, before any I/O), not a post-scan Filter
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m, plan
    assert "cell" in m.group(1) and "IN" in m.group(1), m.group(1)
    # and unprobed cells exist on disk (there is something to prune)
    all_cells = {d for d in os.listdir(os.path.join(out, "assignments"))
                 if d.startswith("cell=")}
    assert len(all_cells) > len(probes)
    # scanned row count == membership of the probed cells only
    scanned = (spark.read.parquet(os.path.join(out, "assignments"))
               .filter(F.col("cell").isin([int(c) for c in probes]))
               .count())
    full = spark.read.parquet(os.path.join(out, "assignments")).count()
    assert scanned < full


def test_build_job_spark_submit_shape(tmp_path):
    """The job parses args and refuses nothing else (cheap smoke; the
    full spark-submit path is covered by the other job tests)."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "jobs", "build_ann_index.py"), "--help"],
        capture_output=True, text=True, timeout=60)
    assert r.returncode == 0
    assert "--input" in r.stdout and "--output" in r.stdout
