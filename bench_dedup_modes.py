#!/usr/bin/env python
"""A/B the two dedup_retain_over formulations at the assembly sizing
(VERDICT r4 item 5): window (full-row shuffle on content_md5) vs keys
(key-only aggregation + survivor semi-join, payload unshuffled).

Protocol matches bench_scaling_pipeline.py (pinned cpusets, the same
replicated sf0.1 corpus with a planted ~2% exact-dup slice, best of 3
after a warm pass), and each run records the ACTUAL shuffle-write
bytes from the Spark status REST API, so the payload-bytes delta
between the modes is measured, not estimated. The consumer aggregates
sum(length(clean_text)) over the survivors, so the payload column can
never be pruned out of the plan under test.

The dedup input is the MATERIALIZED stage-1 hygiene table (written
once per corpus), exactly what jobs/build_training_corpus.py feeds
dedup_retain_over - the keys mode scans its input twice, so running
it over an inline computed hygiene projection would charge it the
hygiene chain twice and measure composition, not the exchange (the
first take of this A/B did exactly that: keys read 2x slower with no
byte saving; kept in BENCH/BASELINE.md as methodology).

Usage: python bench_dedup_modes.py [n_copies]   (default 256 = 1.28M
docs at sf0.1)
"""

from __future__ import annotations

import json
import subprocess
import sys

RUNNER = r"""
import json, os, sys, time, urllib.request
n_copies, cpus, mode, wide = (int(sys.argv[1]), int(sys.argv[2]),
                              sys.argv[3], int(sys.argv[4]))
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
spark = (SparkSession.builder.appName(f"dedup-{mode}-{cpus}")
         .master(f"local[{cpus}]")
         .config("spark.sql.shuffle.partitions", str(cpus))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.driver.memory", "8g")
         .config("spark.ui.enabled", "true")   # status REST = bytes
         .config("spark.ui.port", "0")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from docling_core_spark.textops import dedup_retain_over, hygiene_over
path = f"/tmp/docling_pipe_corpus_{n_copies}.parquet"
if not os.path.exists(os.path.join(path, "_SUCCESS")):
    base = spark.read.parquet(
        "/root/testdata/sf0.1/documents.parquet") \
        .select("doc_id", "text", "source")
    rep = (base.crossJoin(
        spark.range(n_copies).select(F.col("id").alias("k")))
        .select(
            (F.col("doc_id") + F.col("k") * 10000000).alias("doc_id"),
            F.when(F.col("doc_id") % 43 == 0, F.col("text"))
            .otherwise(F.concat(F.col("text"), F.lit(" rep"),
                                F.col("k").cast("string")))
            .alias("text"), "source"))
    rep.repartition(256).write.mode("overwrite").parquet(path)
stage1 = f"/tmp/docling_dedup_stage1_{n_copies}_w{wide}.parquet"
if not os.path.exists(os.path.join(stage1, "_SUCCESS")):
    # wide > 1: controlled payload-width experiment - same row count
    # and dup structure, clean_text repeated, so the exchange regime
    # shifts toward network/bandwidth-bound (the cluster shape)
    (hygiene_over(spark.read.parquet(path))
     .filter(F.col("keep")).drop("keep")
     .withColumn("clean_text",
                 F.expr(f"repeat(clean_text, {wide})"))
     .withColumn("content_md5", F.md5("clean_text"))
     .repartition(256).write.mode("overwrite").parquet(stage1))
clean = spark.read.parquet(stage1)
n_docs = clean.count()

def one_pass():
    ded = dedup_retain_over(clean, mode=mode)
    # survivors' payload must be CONSUMED or pruning fakes the A/B
    return ded.agg(F.count(F.lit(1)),
                   F.sum(F.length("clean_text"))).collect()[0]

def shuffle_bytes():
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    data = json.load(urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/stages"))
    return sum(s.get("shuffleWriteBytes", 0) for s in data)

one_pass()  # warm pool + page cache
b0 = shuffle_bytes()
best, rows = None, None
for _ in range(3):
    t0 = time.perf_counter()
    rows = one_pass()
    dt = time.perf_counter() - t0
    best = dt if best is None or dt < best else best
# bytes for exactly the 3 measured passes / 3 = one pass's exchanges
per_pass = (shuffle_bytes() - b0) / 3
print(json.dumps({
    "mode": mode, "cpus": cpus, "wide": wide, "n_docs": n_docs,
    "survivors": int(rows[0]), "secs": round(best, 3),
    "docs_per_sec": round(n_docs / best, 1),
    "shuffle_mb_per_pass": round(per_pass / 1e6, 1)}))
spark.stop()
"""


def run_one(n_copies: int, cpus: int, mode: str, wide: int) -> dict:
    sys.path.insert(0, "/root/repo")
    from bench_scaling_layout import _pin

    out = subprocess.run(
        _pin(cpus) + [sys.executable, "-c", RUNNER, str(n_copies),
                      str(cpus), mode, str(wide)],
        capture_output=True, text=True, check=True)
    line = [ln for ln in out.stdout.splitlines()
            if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    wide = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sys.path.insert(0, "/root/repo")
    from bench_scaling_layout import cpu_capacity_ratio

    cap = cpu_capacity_ratio()
    print(json.dumps({"box_cpu_capacity_8to32": round(cap, 3)}))
    results = {}
    for mode in ("window", "keys"):
        for cpus in (8, 32):
            r = run_one(n_copies, cpus, mode, wide)
            results[(mode, cpus)] = r
            print(json.dumps(r))
    w32, k32 = results[("window", 32)], results[("keys", 32)]
    eff = (results[("keys", 32)]["docs_per_sec"]
           / (4 * results[("keys", 8)]["docs_per_sec"]))
    print(json.dumps({
        "keys_vs_window_speedup_32c": round(
            k32["docs_per_sec"] / w32["docs_per_sec"], 3),
        "shuffle_mb_window_32c": w32["shuffle_mb_per_pass"],
        "shuffle_mb_keys_32c": k32["shuffle_mb_per_pass"],
        "payload_bytes_ratio": round(
            k32["shuffle_mb_per_pass"]
            / max(w32["shuffle_mb_per_pass"], 0.1), 4),
        "keys_8to32_efficiency": round(eff, 3),
        "box_cpu_capacity_8to32": round(cap, 3)}))


if __name__ == "__main__":
    main()
