#!/usr/bin/env python
"""Scaling-efficiency evidence for the EXTRACTION stage (north rule:
"HTML boilerplate strip ... at two cluster sizes with throughput
scaling efficiency >= 0.8").

Same proxy methodology as bench_scaling.py (one box, local[N] vs
local[4N]; 8 vs 32 is the honest pairing - see that file's header):
the measured job is parquet page scan -> fused mapInArrow extraction
(DOM parse + boilerplate strip + span emission), which has zero
shuffle and no cross-partition dependency, so cluster scale-out is
governed purely by input splits.

Usage: python bench_scaling_extract.py [n_docs]  (default 40000)
"""

from __future__ import annotations

import json
import subprocess
import sys

RUNNER = r"""
import json, sys, time, os
n_docs, cpus = int(sys.argv[1]), int(sys.argv[2])
sys.path.insert(0, "/root/repo")
from docling_core_spark.session import get_spark
spark = get_spark(app_name=f"xscal-{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
from docling_core_spark.corpus import CORPUS_VERSION
from docling_core_spark.engine import synth_documents
from docling_core_spark.extraction.spark import (PAGES_VERSION,
                                                 extract_pages,
                                                 render_pages)
path = (f"/tmp/docling_scaling_pages_{n_docs}"
        f"_v{CORPUS_VERSION}.{PAGES_VERSION}.parquet")
if not os.path.exists(os.path.join(path, "_SUCCESS")):
    docs = synth_documents(spark, n_docs, seed=42, partitions=256)
    render_pages(docs).write.mode("overwrite").parquet(path)
pages = spark.read.parquet(path)
extract_pages(pages).count()  # full warm pass (worker pool + JIT)
best = None
for _ in range(3):
    t0 = time.perf_counter()
    n = extract_pages(pages).count()
    dt = time.perf_counter() - t0
    best = dt if best is None or dt < best else best
print(json.dumps({"cpus": cpus, "n_docs": n_docs, "secs": round(best, 3),
                  "spans": n,
                  "docs_per_sec": round(n_docs / best, 2)}))
spark.stop()
"""


# Executor-shard runner (the pairing the north rule names: N vs 4N
# EXECUTORS at fixed executor size): extract only an LPT byte-balanced
# shard of the page files in its own local[N] JVM, barriered per round
# so the parent aggregates total_docs / max shard wall. Extraction is
# one fused zero-shuffle stage over whole input splits, so n_shards
# concurrent JVMs ARE the n_shards-executor run (driver replicated per
# shard, which only penalizes the proxy).
SHARD_RUNNER = r"""
import heapq, json, os, shutil, sys, tempfile, time
path, cpus, shard_id, n_shards, go = (sys.argv[1], int(sys.argv[2]),
                                      int(sys.argv[3]), int(sys.argv[4]),
                                      sys.argv[5])
sys.path.insert(0, "/root/repo")
from docling_core_spark.session import get_spark
from docling_core_spark.extraction.spark import extract_pages
spark = get_spark(app_name=f"xshard-{shard_id}", master=f"local[{cpus}]",
                  shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
files = sorted(os.path.join(path, f) for f in os.listdir(path)
               if f.endswith(".parquet"))
sizes = sorted(((os.path.getsize(f), f) for f in files), reverse=True)
heap = [(0, i) for i in range(n_shards)]
heapq.heapify(heap)
shards = [[] for _ in range(n_shards)]
for sz, f in sizes:
    load, i = heapq.heappop(heap)
    shards[i].append(f)
    heapq.heappush(heap, (load + sz, i))
tmp = tempfile.mkdtemp(prefix=f"xshard{shard_id}_")
for f in shards[shard_id]:
    os.symlink(f, os.path.join(tmp, os.path.basename(f)))
pages = spark.read.parquet(tmp)
n_docs_shard = pages.count()
extract_pages(pages).count()  # warm
print("WARMED", flush=True)
for r in range(3):
    while not os.path.exists(f"{go}.{r}"):
        time.sleep(0.02)
    t0 = time.perf_counter()
    n = extract_pages(pages).count()
    dt = time.perf_counter() - t0
    print(json.dumps({"shard": shard_id, "round": r, "cpus": cpus,
                      "secs": round(dt, 3), "spans": n,
                      "docs": n_docs_shard}), flush=True)
shutil.rmtree(tmp)
spark.stop()
"""


def _pages_path(n_docs: int) -> str:
    sys.path.insert(0, "/root/repo")
    from docling_core_spark.corpus import CORPUS_VERSION
    from docling_core_spark.extraction.spark import PAGES_VERSION

    return (f"/tmp/docling_scaling_pages_{n_docs}"
            f"_v{CORPUS_VERSION}.{PAGES_VERSION}.parquet")


def run(n_docs: int, cpus: int) -> dict:
    from bench_scaling_layout import _pin

    out = subprocess.run(
        _pin(cpus) + [sys.executable, "-c", RUNNER, str(n_docs),
                      str(cpus)],
        capture_output=True, text=True, check=True)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 40000
    results = {}
    for cpus in (2, 8, 32):
        results[cpus] = run(n_docs, cpus)
        print(json.dumps(results[cpus]))
    for lo, hi in ((8, 32), (2, 8)):
        eff = results[hi]["docs_per_sec"] / (4 * results[lo]["docs_per_sec"])
        print(f"extract scaling {lo} -> {hi} cores: "
              f"{results[lo]['docs_per_sec']} -> "
              f"{results[hi]['docs_per_sec']} pages/s, "
              f"efficiency {eff:.2f}")
    # N vs 4N executors at fixed executor size (local[8] each)
    import bench_scaling_layout as bsl

    hi4 = bsl.run_shards(_pages_path(n_docs), 4, 8, runner=SHARD_RUNNER)
    print(json.dumps({k: hi4[k] for k in
                      ("n_shards", "cpus", "docs_per_sec", "best_round")}))
    xeff = hi4["docs_per_sec"] / (4 * results[8]["docs_per_sec"])
    print(f"extract scaling 1 -> 4 executors (local[8] each): "
          f"{results[8]['docs_per_sec']} -> {hi4['docs_per_sec']} "
          f"pages/s, efficiency {xeff:.2f}")
    print(json.dumps({"metric": "extract_scaling_efficiency_4x",
                      "pairs": {"2->8": round(
                          results[8]["docs_per_sec"]
                          / (4 * results[2]["docs_per_sec"]), 3),
                          "8->32": round(
                              results[32]["docs_per_sec"]
                              / (4 * results[8]["docs_per_sec"]), 3),
                          "1x8->4x8": round(xeff, 3)},
                      "n_docs": n_docs}))


if __name__ == "__main__":
    main()
