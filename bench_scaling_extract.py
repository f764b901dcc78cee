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


def run(n_docs: int, cpus: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", RUNNER, str(n_docs), str(cpus)],
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


if __name__ == "__main__":
    main()
