"""Materialized IVF index: build once, serve many (the operational
half of the ANN tier).

The registry query q_ann_ivf_kmeans_topk (textops.py) trains and
serves in one session with memoized centroids. A production corpus
instead BUILDS the index as tables and serves every later query from
them (reference analogue: a vector store built from chunk embeddings;
the engine's chunks feed one):

    <out>/centroids.parquet      cid, qb          (the MODEL, k x dims)
    <out>/assignments/cell=N/    vec_id, embedding

``assignments`` is written partitionBy(cell), so a query's serving
scan reads ONLY its probed cells' directories - Spark partition
pruning makes the IVF promise (touch n_probes/k of the data) physical
on disk. At 10^12 vectors the cell count is sized so one cell is a
few files; probes then cost O(k/n_cells) of the corpus regardless of
cluster size.

Training reuses textops.ivf_kmeans_fit (deterministic k-means||
seeding + exact integer Lloyd rounds, the driver-oracle-checked
trainer); probe selection runs driver-side over the model with the
same quantized-L2 + (d2, cid) tie-break arithmetic, so serving from
the materialized index returns EXACTLY the rows the in-session query
returns (pinned by tests/test_annindex.py).
"""

from __future__ import annotations

import os
from typing import List, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from docling_core_spark.textops import (
    _DOT_SPARK,
    _NORM_SPARK,
    _QINT,
    N_KMEANS_ITERS,
    N_PROBES,
    _r4,
    ivf_kmeans_fit,
)


def _assign(q: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, embedding, qa) x broadcast centroids -> (vec_id, cell,
    embedding, d2) - the shared quantized-L2 + (d2, cid) min_by
    assignment of trainer, serving, and append."""
    d = q.crossJoin(F.broadcast(cent)).withColumn(
        "d2", F.expr("aggregate(zip_with(qa, qb, (x, y) -> "
                     "(x - y) * (x - y)), 0L, (a, v) -> a + v)"))
    return (d.groupBy("vec_id").agg(
        F.expr("min_by(cid, struct(d2, cid))").alias("cell"),
        F.expr("any_value(embedding)").alias("embedding"),
        F.min("d2").alias("d2")))


def _meta_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_meta.json")


def _read_meta(out_dir: str) -> dict:
    import json

    with open(_meta_path(out_dir), "r", encoding="utf-8") as f:
        return json.load(f)


def _write_meta(out_dir: str, meta: dict) -> None:
    import json

    with open(_meta_path(out_dir), "w", encoding="utf-8") as f:
        json.dump(meta, f)


def _ensure_meta(spark: SparkSession, out_dir: str) -> dict:
    """Load the index metadata, backfilling it for indexes built
    before the append path existed: one scan of the stored
    assignments computing each vector's quantized-L2 distortion
    against ITS OWN cell's centroid (no re-assignment) recovers the
    baseline the drift statistic needs."""
    if os.path.exists(_meta_path(out_dir)):
        return _read_meta(out_dir)
    cent = spark.read.parquet(
        os.path.join(out_dir, "centroids.parquet"))
    asg = spark.read.parquet(os.path.join(out_dir, "assignments"))
    j = (asg.select(F.col("cell").cast("long").alias("cell"),
                    F.expr(_QINT.format(c="embedding")).alias("qa"))
         .join(F.broadcast(cent), F.col("cell") == F.col("cid"))
         .withColumn("d2", F.expr(
             "aggregate(zip_with(qa, qb, (x, y) -> "
             "(x - y) * (x - y)), 0L, (a, v) -> a + v)")))
    stats = j.agg(F.count(F.lit(1)).alias("n"),
                  F.avg("d2").alias("mean_d2")).collect()[0]
    meta = {"n_cells": cent.count(),
            "n_vectors": int(stats["n"]),
            "mean_d2": float(stats["mean_d2"] or 0.0)}
    _write_meta(out_dir, meta)
    return meta


def build_ivf_index(emb: DataFrame, out_dir: str,
                    n_iters: int = N_KMEANS_ITERS) -> dict:
    """Train the quantizer on ``emb(vec_id, embedding)`` and write the
    index tables plus ``_meta.json`` (vector count and the training
    distortion baseline the append path's drift statistic compares
    against). Returns {"n_cells": ..., "n_vectors": ...}.

    One crossJoin against the broadcast model + map-side min_by
    assignment; the partitioned write is the only corpus-sized I/O."""
    spark = emb.sparkSession
    q = emb.select("vec_id", "embedding",
                   F.expr(_QINT.format(c="embedding")).alias("qa"))
    cent_rows = ivf_kmeans_fit(q, n_iters=n_iters)
    cent = spark.createDataFrame(cent_rows, "cid long, qb array<long>")
    cent.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "centroids.parquet"))
    assigned = _assign(q, cent)
    (assigned.select("cell", "vec_id", "embedding")
     .write.mode("overwrite").partitionBy("cell")
     .parquet(os.path.join(out_dir, "assignments")))
    stats = assigned.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("d2").alias("mean_d2")).collect()[0]
    meta = {"n_cells": len(cent_rows),
            "n_vectors": int(stats["n"]),
            "mean_d2": float(stats["mean_d2"] or 0.0)}
    _write_meta(out_dir, meta)
    return {"n_cells": len(cent_rows), "n_vectors": int(stats["n"])}


def append_ivf_index(emb_new: DataFrame, out_dir: str,
                     drift_threshold: float = 1.5) -> dict:
    """Incrementally age the index with a new batch (VERDICT r4 item
    8, the incremental_ingest analogue for the vector tier): assign
    the batch to the EXISTING centroids (model broadcast, batch-sized
    work - the full corpus is never touched) and append the new rows
    into their cell partitions, so serving equals a same-model
    assignment rebuild over the union row-for-row (pinned in
    tests/test_annindex.py).

    Re-fit only when the drift statistic trips: the batch's mean
    quantized-L2 distortion vs the index's training baseline
    (``_meta.json``). A same-distribution batch lands near 1.0; a
    shifted distribution (new domain, new embedding model) inflates
    it, and once it exceeds ``drift_threshold`` the centroids no
    longer describe the data, so the index retrains over old + new
    vectors (written to a staging dir first - the union scan reads
    the live assignments, so the rebuild never overwrites its own
    input - then swapped in).

    Returns {"refit": bool, "drift": ratio, "n_appended": ...,
    "n_vectors": total}."""
    import shutil

    spark = emb_new.sparkSession
    meta = _ensure_meta(spark, out_dir)
    cent = spark.read.parquet(
        os.path.join(out_dir, "centroids.parquet"))
    q = emb_new.select("vec_id", "embedding",
                       F.expr(_QINT.format(c="embedding")).alias("qa"))
    assigned = _assign(q, cent)
    stats = assigned.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("d2").alias("mean_d2")).collect()[0]
    n_new = int(stats["n"])
    batch_d2 = float(stats["mean_d2"] or 0.0)
    base_d2 = float(meta.get("mean_d2") or 0.0)
    drift = (batch_d2 / base_d2) if base_d2 > 0 else 1.0

    if drift > drift_threshold:
        # centroids stale: retrain over old + new via a staging dir
        old = (spark.read.parquet(os.path.join(out_dir, "assignments"))
               .select("vec_id", "embedding"))
        union = old.unionByName(emb_new.select("vec_id", "embedding"))
        staging = os.path.join(out_dir, "_rebuild")
        if os.path.exists(staging):
            shutil.rmtree(staging)
        built = build_ivf_index(union, staging)
        for part in ("centroids.parquet", "assignments",
                     "_meta.json"):
            dst = os.path.join(out_dir, part)
            if os.path.isdir(dst):
                shutil.rmtree(dst)
            elif os.path.exists(dst):
                os.remove(dst)
            os.replace(os.path.join(staging, part), dst)
        shutil.rmtree(staging, ignore_errors=True)
        return {"refit": True, "drift": drift, "n_appended": n_new,
                "n_vectors": built["n_vectors"]}

    (assigned.select("cell", "vec_id", "embedding")
     .write.mode("append").partitionBy("cell")
     .parquet(os.path.join(out_dir, "assignments")))
    meta["n_vectors"] = int(meta.get("n_vectors", 0)) + n_new
    _write_meta(out_dir, meta)
    return {"refit": False, "drift": drift, "n_appended": n_new,
            "n_vectors": meta["n_vectors"]}


def load_centroids(spark: SparkSession, out_dir: str
                   ) -> List[Tuple[int, List[int]]]:
    rows = spark.read.parquet(
        os.path.join(out_dir, "centroids.parquet")).collect()
    return sorted((int(r["cid"]), list(r["qb"])) for r in rows)


def _probe_cells(cent: List[Tuple[int, List[int]]],
                 qvec: Sequence[float], n_probes: int) -> List[int]:
    """Driver-side probe selection over the MODEL - the identical
    quantized-L2 + (d2, cid) tie-break the trainer/query use."""
    qa = [int(round(float(x) * 1000)) for x in qvec]
    scored = sorted(
        (sum((a - b) * (a - b) for a, b in zip(qa, qb)), cid)
        for cid, qb in cent)
    return [cid for _, cid in scored[:n_probes]]


def ivf_query_topk(spark: SparkSession, out_dir: str,
                   qvec: Sequence[float], k: int = 10,
                   n_probes: int = N_PROBES,
                   exclude_vec_id: int = None) -> DataFrame:
    """Serve one ANN query from the materialized index: driver-side
    probe selection (model-sized), partition-pruned scan of the
    probed cells only, exact-cosine re-rank of the candidates."""
    cent = load_centroids(spark, out_dir)
    probes = _probe_cells(cent, qvec, n_probes)
    scan = spark.read.parquet(os.path.join(out_dir, "assignments"))
    cand = scan.filter(F.col("cell").isin([int(c) for c in probes]))
    if exclude_vec_id is not None:
        cand = cand.filter(F.col("vec_id") != exclude_vec_id)
    qlit = F.array(*[F.lit(float(x)) for x in qvec])
    cand = cand.withColumn("eb", qlit)
    cos = (F.expr(_DOT_SPARK.replace("ea", "embedding"))
           / (F.expr(_NORM_SPARK.format(c="embedding"))
              * F.expr(_NORM_SPARK.format(c="eb"))))
    return (cand.select("vec_id",
                        F.col("cell").cast("long").alias("cell"),
                        _r4(cos).alias("cos_sim"))
            .orderBy(F.desc("cos_sim"), "vec_id")
            .limit(k))
