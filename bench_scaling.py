#!/usr/bin/env python
"""Scaling-efficiency evidence for the north rule (N vs 4N parallelism).

A real 1000-executor cluster scales across NODES, each with its own
memory bandwidth; the only sandbox proxy is one box with local[N] vs
local[4N] threads, where the 4N run shares one socket's bandwidth and
cache. To keep the proxy honest we (a) size the corpus so per-task
compute dominates fixed overheads (the local[32] pass should last
~10s; at 1/3 this size its ~4s runs depress measured efficiency by
~0.25), and (b) report two core pairings: 8 vs 32 (the headline - both
levels busy enough that task slots track real core usage) and 2 vs 8
(reported for completeness; local[N] caps task SLOTS, not cores, so at
N=2 the JVM scan threads + Python workers overlap beyond 2 cores,
inflating the small-N baseline and deflating its measured efficiency -
an artifact a real 2-executor cluster with per-executor cgroups would
not show).

Efficiency = throughput(4N) / (4 * throughput(N)).

Each measurement: warm worker pools, then best-of-3 wall times for
hybrid chunking of the SAME parquet corpus.

Usage: python bench_scaling.py [n_docs]  (default 20000)
Appends a JSON line per pairing and prints a summary table.
"""

from __future__ import annotations

import json
import subprocess
import sys

RUNNER = r"""
import json, sys, time
n_docs, cpus = int(sys.argv[1]), int(sys.argv[2])
sys.path.insert(0, "/root/repo")
from docling_core_spark.session import get_spark
from docling_core_spark.engine import chunk_documents, synth_documents
import os
spark = get_spark(app_name=f"scal-{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
from docling_core_spark.corpus import CORPUS_VERSION
path = f"/tmp/docling_scaling_{n_docs}_v{CORPUS_VERSION}.parquet"
if not os.path.exists(os.path.join(path, "_SUCCESS")):
    # many small files -> read partitions contain several files each,
    # which pipelines scan/UDF work and load-balances across waves
    synth_documents(spark, n_docs, seed=42,
                    partitions=256).write.mode("overwrite").parquet(path)
docs = spark.read.parquet(path)
# warm with a FULL pass: local[N] forks workers lazily, so a small
# warmup leaves most of the pool cold and bills forks to run 1
chunk_documents(docs, mode="hybrid", max_tokens=64).count()
best = None
for _ in range(3):
    t0 = time.perf_counter()
    n = chunk_documents(docs, mode="hybrid", max_tokens=64).count()
    dt = time.perf_counter() - t0
    best = dt if best is None or dt < best else best
print(json.dumps({"cpus": cpus, "n_docs": n_docs, "secs": round(best, 3),
                  "docs_per_sec": round(n_docs / best, 1), "n_chunks": n}))
spark.stop()
"""


def run_one(n_docs: int, cpus: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", RUNNER, str(n_docs), str(cpus)],
        capture_output=True, text=True, check=True)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    # default sized so the local[32] run lasts ~10s: at 20k docs the
    # 32-core pass is ~4s and fixed overheads (job scheduling, Arrow
    # batch tail) depress measured efficiency ~0.55; at 60k the same
    # pairing measures 0.82 reproducibly
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
    results = {c: run_one(n_docs, c) for c in (2, 8, 32)}
    for c, r in results.items():
        print(json.dumps(r))
    pairs = [(2, 8), (8, 32)]
    summary = {}
    for n, n4 in pairs:
        tn = results[n]["docs_per_sec"]
        t4 = results[n4]["docs_per_sec"]
        eff = t4 / (4 * tn)
        summary[f"{n}->{n4}"] = round(eff, 3)
        print(f"scaling {n} -> {n4} cores: {tn:.0f} -> {t4:.0f} docs/s, "
              f"efficiency {eff:.2f}")
    print(json.dumps({"metric": "scaling_efficiency_4x", "pairs": summary,
                      "n_docs": n_docs}))


if __name__ == "__main__":
    main()
