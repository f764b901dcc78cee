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
    assert "--append" in r.stdout and "--drift-threshold" in r.stdout


def _same_model_rebuild(spark, src_index, union_emb, out):
    """Assignment-only rebuild with the SOURCE index's centroids: the
    oracle for what an appended index must serve."""
    import shutil

    from docling_core_spark.annindex import _assign
    from docling_core_spark.textops import _QINT

    os.makedirs(out, exist_ok=True)
    shutil.copytree(os.path.join(src_index, "centroids.parquet"),
                    os.path.join(out, "centroids.parquet"))
    cent = spark.read.parquet(os.path.join(out, "centroids.parquet"))
    q = union_emb.select(
        "vec_id", "embedding",
        F.expr(_QINT.format(c="embedding")).alias("qa"))
    (_assign(q, cent).select("cell", "vec_id", "embedding")
     .write.mode("overwrite").partitionBy("cell")
     .parquet(os.path.join(out, "assignments")))


def test_append_serving_parity_vs_same_model_rebuild(spark, tmp_path):
    """VERDICT r4 item 8: an in-distribution batch appends without a
    refit, and the aged index serves EVERY probe row-for-row like a
    same-model assignment rebuild over the union (the unchanged-cells
    parity, which with a fixed model is all cells)."""
    from docling_core_spark.annindex import (
        append_ivf_index,
        build_ivf_index,
        ivf_query_topk,
        load_centroids,
    )

    base = _emb(spark).filter(F.col("vec_id") % 5 != 0)
    batch = _emb(spark).filter(F.col("vec_id") % 5 == 0)
    idx = str(tmp_path / "idx")
    build_ivf_index(base, idx)
    cent_before = load_centroids(spark, idx)

    stats = append_ivf_index(batch, idx, drift_threshold=1.5)
    assert stats["refit"] is False
    assert stats["n_appended"] == batch.count()
    assert stats["n_vectors"] == _emb(spark).count()
    assert load_centroids(spark, idx) == cent_before  # model untouched

    oracle = str(tmp_path / "oracle")
    _same_model_rebuild(spark, idx, _emb(spark), oracle)
    for qid in (0, 7, 123):
        qvec = [float(x) for x in _emb(spark)
                .filter(F.col("vec_id") == qid)
                .collect()[0]["embedding"]]
        got = [(r["vec_id"], r["cell"], r["cos_sim"]) for r in
               ivf_query_topk(spark, idx, qvec,
                              exclude_vec_id=qid).collect()]
        want = [(r["vec_id"], r["cell"], r["cos_sim"]) for r in
                ivf_query_topk(spark, oracle, qvec,
                               exclude_vec_id=qid).collect()]
        assert got == want and len(got) == 10, qid


def test_append_backfills_missing_meta(spark, tmp_path):
    """An index built before the append path existed has no
    _meta.json; append must backfill the distortion baseline from the
    stored assignments (one scan against each vector's own centroid)
    instead of crashing (review finding)."""
    from docling_core_spark.annindex import (
        _read_meta,
        append_ivf_index,
        build_ivf_index,
    )

    base = _emb(spark).filter(F.col("vec_id") % 5 != 0)
    idx = str(tmp_path / "idx")
    build_ivf_index(base, idx)
    built_meta = _read_meta(idx)
    os.remove(os.path.join(idx, "_meta.json"))  # pre-append-era index

    batch = _emb(spark).filter(F.col("vec_id") % 5 == 0)
    stats = append_ivf_index(batch, idx, drift_threshold=1.5)
    assert stats["refit"] is False
    # the backfilled baseline equals the build-time one (same rows,
    # same centroids, same arithmetic)
    meta = _read_meta(idx)
    assert abs(meta["mean_d2"] - built_meta["mean_d2"]) < 1e-9 * max(
        1.0, built_meta["mean_d2"])
    assert meta["n_vectors"] == _emb(spark).count()


def test_append_drift_trips_refit(spark, tmp_path):
    """A distribution-shifted batch (scaled + offset embeddings)
    inflates the distortion ratio past the threshold and retrains
    over old + new; the rebuilt index serves the full union."""
    from docling_core_spark.annindex import (
        _read_meta,
        append_ivf_index,
        build_ivf_index,
        ivf_query_topk,
        load_centroids,
    )

    base = _emb(spark).filter(F.col("vec_id") < 400)
    idx = str(tmp_path / "idx")
    build_ivf_index(base, idx)
    cent_before = load_centroids(spark, idx)

    shifted = (_emb(spark).filter(F.col("vec_id") >= 400)
               .select((F.col("vec_id") + 10000).alias("vec_id"),
                       F.expr("transform(embedding, "
                              "x -> x * 5.0D + 3.0D)")
                       .alias("embedding")))
    stats = append_ivf_index(shifted, idx, drift_threshold=1.5)
    assert stats["refit"] is True and stats["drift"] > 1.5
    assert stats["n_vectors"] == 400 + shifted.count()
    assert load_centroids(spark, idx) != cent_before  # retrained
    assert _read_meta(idx)["n_vectors"] == stats["n_vectors"]
    # staging dir swapped away cleanly
    assert not os.path.exists(os.path.join(idx, "_rebuild"))
    # serving still answers from the retrained index
    qvec = [float(x) for x in _emb(spark)
            .filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    assert len(ivf_query_topk(spark, idx, qvec).collect()) == 10


def test_append_job_spark_submit_end_to_end(spark, tmp_path):
    """The operational append path through spark-submit: build, age
    with a batch, then serving parity vs the same-model rebuild."""
    import shutil
    import subprocess
    import sys

    SPARK_SUBMIT = shutil.which("spark-submit")
    if SPARK_SUBMIT is None:
        import pytest

        pytest.skip("no spark-submit in PATH")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    import package

    package.build()

    from docling_core_spark.annindex import ivf_query_topk

    base_pq = str(tmp_path / "base_pq")
    batch_pq = str(tmp_path / "batch_pq")
    _emb(spark).filter(F.col("vec_id") % 5 != 0) \
        .write.parquet(base_pq)
    _emb(spark).filter(F.col("vec_id") % 5 == 0) \
        .write.parquet(batch_pq)
    idx = str(tmp_path / "idx")
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    common = [SPARK_SUBMIT, "--master", "local[4]",
              "--conf", "spark.sql.shuffle.partitions=8",
              "--py-files", os.path.join(root, "dist",
                                         "docling_core_spark.zip"),
              os.path.join(root, "jobs", "build_ann_index.py")]
    r = subprocess.run(common + ["--input", base_pq, "--output", idx],
                       capture_output=True, text=True, timeout=300,
                       env=env, cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    r2 = subprocess.run(common + ["--input", batch_pq, "--output", idx,
                                  "--append"],
                        capture_output=True, text=True, timeout=300,
                        env=env, cwd=str(tmp_path))
    assert r2.returncode == 0, r2.stderr[-2000:]
    done = [ln for ln in r2.stdout.splitlines()
            if ln.startswith("DONE")][-1]
    assert "refit=False" in done and "appended=100" in done

    oracle = str(tmp_path / "oracle")
    _same_model_rebuild(spark, idx, _emb(spark), oracle)
    qvec = [float(x) for x in _emb(spark)
            .filter(F.col("vec_id") == 42).collect()[0]["embedding"]]
    got = [(r["vec_id"], r["cell"], r["cos_sim"]) for r in
           ivf_query_topk(spark, idx, qvec, exclude_vec_id=42)
           .collect()]
    want = [(r["vec_id"], r["cell"], r["cos_sim"]) for r in
            ivf_query_topk(spark, oracle, qvec, exclude_vec_id=42)
            .collect()]
    assert got == want
