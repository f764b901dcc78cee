"""The operational launch path: spark-submit --py-files with the built
zip, run from a directory where the package is NOT importable - proving
the archive alone ships the engine to executors (the cluster story).
Also exercises resume: a second submit over the same output is a no-op
that still reports the committed totals.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import zipfile

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _find_spark_submit():
    """PATH first; else the launcher bundled with the installed
    pyspark (pip installs ship one under $SPARK_HOME/bin even when the
    caller's PATH was scrubbed)."""
    found = shutil.which("spark-submit")
    if found:
        return found
    try:
        from pyspark.find_spark_home import _find_spark_home
        cand = os.path.join(_find_spark_home(), "bin", "spark-submit")
        if os.access(cand, os.X_OK):
            return cand
    except Exception:
        pass
    return None


SPARK_SUBMIT = _find_spark_submit()


def _submit(args, cwd):
    env = {k: v for k, v in os.environ.items()}
    # the job must come from --py-files, not from the repo on sys.path
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    return subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--py-files", os.path.join(ROOT, "dist", "docling_core_spark.zip"),
         os.path.join(ROOT, "jobs", "chunk_corpus.py"), *args],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=300)


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="no spark-submit in PATH")
def test_spark_submit_py_files(tmp_path):
    sys.path.insert(0, ROOT)
    import package
    from docling_core_spark.queries import ensure_corpus_local

    zip_path = package.build()
    with zipfile.ZipFile(zip_path) as z:
        names = z.namelist()
    assert "docling_core_spark/engine.py" in names

    corpus = ensure_corpus_local("/root/testdata/sf0.001")  # 50 docs
    out_dir = str(tmp_path / "out")

    r = _submit(["--input", corpus, "--output", out_dir,
                 "--mode", "hier", "--n-buckets", "4"], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    done_line = [ln for ln in r.stdout.splitlines()
                 if ln.startswith("DONE")][-1]
    n_chunks = int(done_line.split("chunks=")[1].split()[0])
    assert n_chunks > 0
    assert int(done_line.split("lineage_rows=")[1].split()[0]) > 0

    # resume over committed output: no recompute, same totals
    r2 = _submit(["--input", corpus, "--output", out_dir,
                  "--mode", "hier", "--n-buckets", "4"], cwd=str(tmp_path))
    assert r2.returncode == 0, r2.stderr[-2000:]
    done2 = [ln for ln in r2.stdout.splitlines()
             if ln.startswith("DONE")][-1]
    assert f"chunks={n_chunks}" in done2

    # the submitted job's chunks == in-process chunk_documents
    from docling_core_spark.engine import chunk_documents
    from docling_core_spark.session import get_spark
    spark = get_spark(app_name="submit-check", master="local[4]",
                      shuffle_partitions=8)
    got = {(r.doc_id, r.chunk_idx): r.text for r in spark.read.parquet(
        os.path.join(out_dir, "chunks")).collect()}
    exp = {(r.doc_id, r.chunk_idx): r.text for r in chunk_documents(
        spark.read.parquet(corpus), mode="hier").collect()}
    assert got == exp


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="no spark-submit in PATH")
def test_spark_submit_extraction_job(tmp_path):
    """The extraction tier as an operational spark-submit job:
    --py-files zip, resumable buckets, lineage, projection parity."""
    sys.path.insert(0, ROOT)
    import package

    package.build()
    # land a small page table
    from docling_core_spark.engine import synth_documents
    from docling_core_spark.extraction.spark import render_pages
    from docling_core_spark.session import get_spark

    spark = get_spark(app_name="submit-x", master="local[4]",
                      shuffle_partitions=8)
    pages_dir = str(tmp_path / "pages")
    render_pages(synth_documents(spark, 20, seed=42)) \
        .write.mode("overwrite").parquet(pages_dir)

    out_dir = str(tmp_path / "xout")
    env = dict(os.environ)
    r = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--py-files", os.path.join(ROOT, "dist",
                                    "docling_core_spark.zip"),
         os.path.join(ROOT, "jobs", "extract_pages.py"),
         "--input", pages_dir, "--output", out_dir,
         "--n-buckets", "4"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    done = [ln for ln in r.stdout.splitlines()
            if ln.startswith("DONE")][-1]
    n_spans = int(done.split("spans=")[1].split()[0])
    assert int(done.split("lineage_rows=")[1].split()[0]) > 0

    # parity with the independent projection oracle
    from docling_core_spark.corpus import gen_doc_spans
    from docling_core_spark.extraction.projection import project_for_html

    want = sum(len(project_for_html(gen_doc_spans(i, seed=42)))
               for i in range(20))
    assert n_spans == want


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="no spark-submit in PATH")
def test_spark_submit_layout_job(tmp_path):
    """The PDF/layout-parse tier through the same operational job
    (--format cells): py-files zip, doc_id-bucketed resume, lineage,
    projection parity."""
    sys.path.insert(0, ROOT)
    import package

    package.build()
    from docling_core_spark.engine import synth_documents
    from docling_core_spark.extraction.layout_spark import render_layout
    from docling_core_spark.session import get_spark

    spark = get_spark(app_name="submit-l", master="local[4]",
                      shuffle_partitions=8)
    cells_dir = str(tmp_path / "cells")
    render_layout(synth_documents(spark, 20, seed=42)) \
        .write.mode("overwrite").parquet(cells_dir)

    out_dir = str(tmp_path / "lout")
    r = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--py-files", os.path.join(ROOT, "dist",
                                    "docling_core_spark.zip"),
         os.path.join(ROOT, "jobs", "extract_pages.py"),
         "--input", cells_dir, "--output", out_dir,
         "--format", "cells", "--n-buckets", "4"],
        cwd=str(tmp_path), env=dict(os.environ), capture_output=True,
        text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    done = [ln for ln in r.stdout.splitlines()
            if ln.startswith("DONE")][-1]
    n_spans = int(done.split("spans=")[1].split()[0])
    assert int(done.split("lineage_rows=")[1].split()[0]) > 0

    from docling_core_spark.corpus import gen_doc_spans
    from docling_core_spark.extraction.layout import project_for_layout

    want = sum(len(project_for_layout(gen_doc_spans(i, seed=42)))
               for i in range(20))
    assert n_spans == want


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="no spark-submit in PATH")
def test_spark_submit_training_corpus_job(tmp_path):
    """The end-to-end training-corpus assembly job: hygiene buckets ->
    global dedup + decontamination -> sequence packing, each stage
    committed; a second submit is a resume no-op with the same totals,
    and the stage outputs equal the in-process df-level surfaces."""
    sys.path.insert(0, ROOT)
    import package

    package.build()
    from pyspark.sql import functions as F

    from docling_core_spark.session import get_spark

    spark = get_spark(app_name="submit-t", master="local[4]",
                      shuffle_partitions=8)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # plant exact duplicates (dedup must drop them) and carve a
    # benchmark slice out of the corpus (decontamination must drop
    # the overlapping originals)
    dup = (docs.filter(F.col("doc_id") % 7 == 3)
           .withColumn("doc_id", F.col("doc_id") + 100000))
    in_dir = str(tmp_path / "docs")
    docs.unionByName(dup).write.mode("overwrite").parquet(in_dir)
    bench_dir = str(tmp_path / "bench")
    docs.filter(F.col("doc_id") % 11 == 5).select("doc_id", "text") \
        .write.mode("overwrite").parquet(bench_dir)

    out_dir = str(tmp_path / "tout")

    def submit():
        env = dict(os.environ)
        env["PYSPARK_PYTHON"] = sys.executable
        return subprocess.run(
            [SPARK_SUBMIT, "--master", "local[4]",
             "--conf", "spark.sql.shuffle.partitions=8",
             "--py-files", os.path.join(ROOT, "dist",
                                        "docling_core_spark.zip"),
             os.path.join(ROOT, "jobs", "build_training_corpus.py"),
             "--input", in_dir, "--output", out_dir,
             "--bench", bench_dir, "--seq-len", "64",
             "--n-buckets", "4"],
            cwd=str(tmp_path), env=env, capture_output=True,
            text=True, timeout=300)

    r = submit()
    assert r.returncode == 0, r.stderr[-2000:]
    done = [ln for ln in r.stdout.splitlines()
            if ln.startswith("DONE")][-1]

    def field(line, key):
        return int(line.split(f"{key}=")[1].split()[0])

    n_raw, n_hyg = field(done, "raw"), field(done, "hygiene")
    n_ret, n_seq = field(done, "retained"), field(done, "sequences")
    assert n_raw == docs.count() + dup.count()
    assert n_raw >= n_hyg > n_ret > 0
    assert n_seq > 0

    # planted duplicates all dropped; benchmark docs decontaminated
    from docling_core_spark.textops import (decontaminate_over,
                                            dedup_retain_over,
                                            hygiene_over)
    retained = spark.read.parquet(os.path.join(out_dir, "stage2"))
    assert retained.filter(F.col("doc_id") >= 100000).count() == 0
    want = decontaminate_over(
        dedup_retain_over(
            hygiene_over(spark.read.parquet(in_dir))
            .filter(F.col("keep")).drop("keep")),
        spark.read.parquet(bench_dir))
    assert ({r.doc_id for r in retained.select("doc_id").collect()}
            == {r.doc_id for r in want.select("doc_id").collect()})
    # the benchmark's own source docs fell to the shingle overlap
    bench_ids = {r.doc_id for r in
                 spark.read.parquet(bench_dir).select("doc_id").collect()}
    hyg_kept = {r.doc_id for r in
                hygiene_over(spark.read.parquet(in_dir))
                .filter(F.col("keep")).select("doc_id").collect()}
    assert not (bench_ids & hyg_kept
                & {r.doc_id for r in retained.select("doc_id").collect()})

    # resume: second submit recomputes nothing, reports same totals
    r2 = submit()
    assert r2.returncode == 0, r2.stderr[-2000:]
    done2 = [ln for ln in r2.stdout.splitlines()
             if ln.startswith("DONE")][-1]
    for key in ("hygiene", "retained", "sequences", "tokens"):
        assert field(done2, key) == field(done, key)

    # --dedup-mode keys over the same input retains the same docs
    # (stage-1 output is materialized, the keys-mode precondition)
    out_keys = str(tmp_path / "tout_keys")
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    rk = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--py-files", os.path.join(ROOT, "dist",
                                    "docling_core_spark.zip"),
         os.path.join(ROOT, "jobs", "build_training_corpus.py"),
         "--input", in_dir, "--output", out_keys,
         "--bench", bench_dir, "--seq-len", "64",
         "--n-buckets", "4", "--dedup-mode", "keys"],
        cwd=str(tmp_path), env=env, capture_output=True,
        text=True, timeout=300)
    assert rk.returncode == 0, rk.stderr[-2000:]
    keys_retained = spark.read.parquet(os.path.join(out_keys, "stage2"))
    assert ({r.doc_id for r in keys_retained.select("doc_id").collect()}
            == {r.doc_id for r in retained.select("doc_id").collect()})


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="no spark-submit in PATH")
def test_spark_submit_stream_ingest_job(tmp_path):
    """The streaming admission path as an operational job: drain,
    then a second submit with new files resumes from the checkpoint
    (duplicates stay out, the new doc admits)."""
    sys.path.insert(0, ROOT)
    import package

    package.build()
    from pyspark.sql import functions as F  # noqa: F401

    from docling_core_spark.session import get_spark

    spark = get_spark(app_name="submit-si", master="local[4]",
                      shuffle_partitions=8)
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    good = ("the analysis of the data pipeline is a document "
            "with plenty of english stopword mass")
    spark.createDataFrame(
        [(1, good, "srcA"), (9, good, "srcA"), (2, "tiny", "srcA")],
        "doc_id long, text string, source string") \
        .coalesce(1).write.mode("append").parquet(in_dir)

    def submit():
        env = dict(os.environ)
        env["PYSPARK_PYTHON"] = sys.executable
        return subprocess.run(
            [SPARK_SUBMIT, "--master", "local[4]",
             "--conf", "spark.sql.shuffle.partitions=8",
             "--py-files", os.path.join(ROOT, "dist",
                                        "docling_core_spark.zip"),
             os.path.join(ROOT, "jobs", "stream_ingest.py"),
             "--input", in_dir, "--output", out_dir,
             "--checkpoint", ckpt],
            cwd=str(tmp_path), env=env, capture_output=True,
            text=True, timeout=300)

    r = submit()
    assert r.returncode == 0, r.stderr[-2000:]
    assert "DONE admitted=1" in r.stdout

    spark.createDataFrame(
        [(5, good, "srcB"),
         (8, "a completely different document about the spark engine "
             "and the table of data", "srcC")],
        "doc_id long, text string, source string") \
        .coalesce(1).write.mode("append").parquet(in_dir)
    r2 = submit()
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "DONE admitted=2" in r2.stdout
    got = {row["doc_id"] for row in spark.read.parquet(out_dir).collect()}
    assert got == {"1", "8"}


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="no spark-submit in PATH")
def test_spark_submit_training_corpus_selection_flags(tmp_path):
    """The assembly job's selection flags: --exact-substr cuts the
    later occurrence of a planted cross-doc passage (clean_text loses
    it; the first-occurrence doc keeps it), and --dsir-top-frac keeps
    approximately that fraction of the scored docs with the DSIR
    weight column landing in stage2."""
    sys.path.insert(0, ROOT)
    import package

    package.build()
    from pyspark.sql import functions as F

    from docling_core_spark.session import get_spark

    spark = get_spark(app_name="submit-sel", master="local[4]",
                      shuffle_partitions=8)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # a 16-word passage (one full window) of corpus-novel words with
    # enough English stopwords to pass the hygiene language gate
    passage = ("the quokka zorqual wimbrel of saxifrage and tanager "
               "in bryology the ocelot of quasar and nebula")
    planted = spark.createDataFrame(
        [(200001, passage + " alpha strange words follow the path of dawn"),
         (200002, passage + " omega different words follow the road of dusk")],
        "doc_id long, text string") \
        .withColumn("lang", F.lit("en")) \
        .withColumn("source", F.lit("planted")) \
        .withColumn("n_chars", F.length("text"))
    in_dir = str(tmp_path / "docs")
    docs.unionByName(planted).write.mode("overwrite").parquet(in_dir)
    bench_dir = str(tmp_path / "bench")
    docs.filter(F.col("doc_id") % 11 == 5).select("doc_id", "text") \
        .write.mode("overwrite").parquet(bench_dir)

    out_dir = str(tmp_path / "tout")
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    r = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--py-files", os.path.join(ROOT, "dist",
                                    "docling_core_spark.zip"),
         os.path.join(ROOT, "jobs", "build_training_corpus.py"),
         "--input", in_dir, "--output", out_dir,
         "--bench", bench_dir, "--seq-len", "64", "--n-buckets", "4",
         "--exact-substr", "--dsir-top-frac", "0.9"],
        cwd=str(tmp_path), env=env, capture_output=True,
        text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    done = [ln for ln in r.stdout.splitlines()
            if ln.startswith("DONE")][-1]
    n_ret = int(done.split("retained=")[1].split()[0])

    retained = spark.read.parquet(os.path.join(out_dir, "stage2"))
    assert "avg_log_weight" in retained.columns
    rows = {r_.doc_id: r_ for r_ in
            retained.filter(F.col("doc_id") >= 200000).collect()}
    # doc 200001 is the globally-first occurrence: passage kept
    assert "quokka" in rows[200001]["clean_text"]
    assert rows[200001]["n_cut_words"] == 0
    # doc 200002's copy of the passage window was cut
    assert "quokka" not in rows[200002]["clean_text"]
    assert rows[200002]["n_cut_words"] == 16
    assert "omega" in rows[200002]["clean_text"]
    # lineage-hash invariant (ADVICE r4): after the --exact-substr
    # rewrite, content_md5 must hash the text it sits next to, not
    # stage1's pre-rewrite text
    assert retained.filter(
        F.md5("clean_text") != F.col("content_md5")).count() == 0

    # DSIR kept ~90% of the scored (post-substr) docs
    from docling_core_spark.textops import (decontaminate_over,
                                            dedup_retain_over,
                                            exact_substr_rewrite_over,
                                            hygiene_over)
    scored = (exact_substr_rewrite_over(
                  decontaminate_over(
                      dedup_retain_over(
                          hygiene_over(spark.read.parquet(in_dir))
                          .filter(F.col("keep")).drop("keep")),
                      spark.read.parquet(bench_dir)),
                  text_col="clean_text")
              .filter(F.col("n_cut_words") < F.col("n_words")))
    n_scored = scored.count()
    assert abs(n_ret - 0.9 * n_scored) <= max(3, 0.03 * n_scored)
