"""General file-ingestion front door: sources -> stream rows -> spans.

Source-resolution semantics mirror the reference's
``docling_core/utils/file.py``:

* ``resolve_remote_filename`` (reference utils/file.py:23-50): a
  remote file's name comes from the ``Content-Disposition`` response
  header's ``filename`` directive first, else the URL path's basename,
  else a caller-supplied fallback. Re-implemented here as the same
  pure function so it is testable without a network.
* ``resolve_source_to_stream`` (reference utils/file.py:53-120): a
  source may be an http(s) URL (fetched to a named binary stream) or a
  local path (read to a named binary stream); anything else is a
  ``ValueError``. This module generalizes the local-path arm to
  DIRECTORIES (expanded recursively) because a Spark front door
  ingests trees, not single files.

The Spark mapping is deliberately NOT a per-file driver loop:

* local files and directory trees go through Spark's distributed
  ``binaryFile`` source (directories with ``recursiveFileLookup``, so
  listing of a huge tree is the data source's job, not the driver's);
  name + format classification run JVM-side on the ``path`` column;
* http(s) URLs are fetched ON THE EXECUTORS (one fetch per URL row,
  Arrow-batched), with the reference's filename resolution applied to
  the response headers. The fetch needs the optional ``requests``
  dependency at the worker - absent (as in this sandbox) it raises
  ``NotImplementedError`` per the stub contract; everything around it
  (schema, batching, name resolution) is real and tested;
* parsing stream rows to spans is one ``mapInArrow`` stage emitting
  the PACKED per-doc shape (``PACKED_SPANS_SCHEMA``) - the same
  Python->JVM boundary discipline as extraction/layout_spark.py: ~3
  string values per document cross the Arrow socket, never one value
  per span - and the flat span view unpacks JVM-side via
  ``unpack_spans_flat``.

jobs/ingest_files.py composes this with io/checkpoint.run_resumable
(doc_id-hash buckets, per-partition lineage, resume-no-op) to make the
tree-to-spans pipeline restartable, and q_ingest_files in queries.py
is the driver-oracle row over a deterministic planted tree.
"""

from __future__ import annotations

import os
import posixpath
from typing import Dict, Iterator, List, Optional, Sequence, Tuple
from urllib.parse import urlsplit

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# stream-row schema shared by the local and remote arms
STREAM_SCHEMA = ("doc_id string, name string, fmt string, "
                 "n_bytes long, content binary")

# suffix -> format tier (the engine's parse dispatch); anything else
# is an opaque binary stream (media tier: plumbing real, decode
# stubbed - see mediaops.py)
FORMAT_BY_SUFFIX = {
    "html": "html", "htm": "html", "xhtml": "html",
    "dt": "doctags", "doctags": "doctags",
    "json": "docjson", "yaml": "docjson", "yml": "docjson",
    "txt": "text", "md": "text",
}


def resolve_remote_filename(url: str,
                            response_headers: Optional[Dict[str, str]]
                            = None,
                            fallback_filename: str = "file") -> str:
    """Filename for a fetched URL - parity with the reference's
    resolve_remote_filename (utils/file.py:23-50): the
    Content-Disposition ``filename`` directive wins (quotes stripped,
    ``*filename`` not handled, empty value ignored), else the URL
    path's basename, else the fallback."""
    headers = {k.lower(): v for k, v in (response_headers or {}).items()}
    fname = None
    if cont_disp := headers.get("content-disposition"):
        for par in cont_disp.strip().split(";"):
            if (split := par.split("=")) and split[0].strip() == "filename":
                # the reference stops at the FIRST filename directive
                # even when its value is empty (utils/file.py:40-45:
                # break after the match, empty -> None -> URL name)
                fname = "=".join(split[1:]).strip().strip("'\"") or None
                break
    if fname is not None:
        return fname
    path = urlsplit(url).path or ""
    return posixpath.basename(path.rstrip("/")) or fallback_filename


def classify_format(name: str) -> str:
    """Suffix -> format tier (pure twin of the JVM-side expression)."""
    suffix = name.rsplit(".", 1)[-1].lower() if "." in name else ""
    return FORMAT_BY_SUFFIX.get(suffix, "binary")


def split_sources(sources: Sequence[str]
                  ) -> Tuple[List[str], List[str]]:
    """Partition sources into (local paths, urls) with the reference's
    acceptance rule (utils/file.py:53-120): http(s) URLs are remote,
    existing paths are local, anything else raises ValueError.

    Spark's file sources silently skip '_'/'.'-prefixed names (the
    hidden-file convention _SUCCESS relies on). For files INSIDE an
    ingested tree that is the expected Spark semantics (documented on
    ingest_streams), but an EXPLICITLY passed hidden file would be
    silently dropped - data loss with no signal - so that case raises
    here with the reason."""
    local: List[str] = []
    urls: List[str] = []
    for s in sources:
        s = str(s)
        scheme = urlsplit(s).scheme
        if scheme in ("http", "https"):
            urls.append(s)
        elif os.path.exists(s):
            base = os.path.basename(os.path.abspath(s))
            if os.path.isfile(s) and base[:1] in ("_", "."):
                raise ValueError(
                    f"explicit file {s!r} has a hidden-prefixed name "
                    f"('_'/'.'): Spark's file source would silently "
                    f"skip it; rename it or ingest its directory")
            local.append(s)
        else:
            raise ValueError(f"unexpected source (not a URL or an "
                             f"existing path): {s!r}")
    return local, urls


def _fmt_expr(name_col: str):
    """JVM-side suffix classifier matching classify_format. A literal
    map lookup, NOT a WHEN chain: Catalyst substitutes the suffix
    expression into every WHEN branch textually (plan_audit caught
    the split() evaluated 10x per row), while map.getItem evaluates
    its key exactly once."""
    suffix = F.when(F.col(name_col).contains("."),
                    F.lower(F.element_at(
                        F.split(name_col, r"\."), -1))).otherwise("")
    mapping = F.create_map(
        *[F.lit(x) for kv in FORMAT_BY_SUFFIX.items() for x in kv])
    return F.coalesce(mapping.getItem(suffix), F.lit("binary"))


def _local_streams(spark: SparkSession, paths: List[str]) -> DataFrame:
    """Distributed read of files and directory trees: the binaryFile
    source lists and reads on executors (recursive lookup for trees),
    the driver never touches content."""
    df = (spark.read.format("binaryFile")
          .option("recursiveFileLookup", "true")
          .load(paths))
    name = F.element_at(F.split("path", "/"), -1)
    return df.select(
        F.col("path").alias("doc_id"),
        name.alias("name"),
        _fmt_expr("name").alias("fmt"),
        F.col("length").cast("long").alias("n_bytes"),
        F.col("content"))


_GOOGLE_DOC_RE = None


def rewrite_google_url(url: str) -> str:
    """Google Docs/Drive viewer URLs -> direct export URLs, parity
    with the reference's rewrite table (utils/file.py:80-104): file ->
    drive uc?export=download, document -> export?format=docx,
    spreadsheets -> xlsx, presentation -> pptx. Non-Google URLs pass
    through unchanged. Pure (testable without a network)."""
    global _GOOGLE_DOC_RE
    if _GOOGLE_DOC_RE is None:
        import re
        _GOOGLE_DOC_RE = re.compile(
            r"google\.com\/(file|document|spreadsheets|presentation)"
            r"\/d\/([\w-]+)")
    m = _GOOGLE_DOC_RE.search(url)
    if not m:
        return url
    doc_type, doc_id = m.group(1), m.group(2)
    if doc_type == "file":
        return ("https://drive.google.com/uc?export=download"
                f"&id={doc_id}")
    fmt = {"document": "docx", "spreadsheets": "xlsx",
           "presentation": "pptx"}[doc_type]
    return (f"https://docs.google.com/{doc_type}/d/{doc_id}"
            f"/export?format={fmt}")


def _fetch_url(url: str) -> Tuple[str, bytes]:
    """One remote fetch -> (resolved name, content bytes), with the
    reference's fetch semantics (utils/file.py:69-112): Google viewer
    URLs rewritten to export endpoints, a default user-agent header.
    Requires the optional ``requests`` dependency on the worker;
    absent, this raises NotImplementedError (stub contract: the
    container has no network stack - the surrounding plumbing is real
    and tested via resolve_remote_filename / rewrite_google_url)."""
    try:
        import requests
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "remote ingestion needs the optional 'requests' "
            "dependency on executors") from exc
    fetch_url = rewrite_google_url(url)
    res = requests.get(fetch_url, stream=True,
                       headers={"user-agent": "docling-core-spark"})
    res.raise_for_status()
    name = resolve_remote_filename(fetch_url, dict(res.headers))
    return name, res.content


def _remote_streams(spark: SparkSession, urls: List[str]) -> DataFrame:
    """URL rows -> stream rows, fetched executor-side (one partition
    per ~32 URLs so a slow origin doesn't serialize the fetch)."""
    import pyarrow as pa

    n_parts = max(1, min(len(urls), 32))
    base = spark.createDataFrame([(u,) for u in urls], "doc_id string") \
        .repartition(n_parts, "doc_id")

    def run(batches: Iterator) -> Iterator:
        for batch in batches:
            out = []
            for url in batch.column("doc_id").to_pylist():
                name, content = _fetch_url(url)
                out.append((url, name, classify_format(name),
                            len(content), content))
            yield pa.RecordBatch.from_arrays(
                [pa.array([r[0] for r in out], pa.string()),
                 pa.array([r[1] for r in out], pa.string()),
                 pa.array([r[2] for r in out], pa.string()),
                 pa.array([r[3] for r in out], pa.int64()),
                 pa.array([r[4] for r in out], pa.binary())],
                names=["doc_id", "name", "fmt", "n_bytes", "content"])

    return base.mapInArrow(run, STREAM_SCHEMA)


def ingest_streams(spark: SparkSession,
                   sources: Sequence[str]) -> DataFrame:
    """Sources (files / directory trees / URLs) -> one stream-row
    DataFrame (STREAM_SCHEMA). ``doc_id`` is the resolved path or URL
    - stable across runs, so checkpoint-resume buckets stay aligned."""
    local, urls = split_sources(sources)
    parts = []
    if local:
        parts.append(_local_streams(spark, local))
    if urls:
        parts.append(_remote_streams(spark, urls))
    if not parts:
        raise ValueError("no sources given")
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df


def spans_from_stream(name: str, fmt: str, data: bytes) -> List[dict]:
    """One stream -> span dicts (kind/text/media_ref) - the pure
    per-document parse dispatch each executor runs. Binary streams
    yield a single media span pointing at the stream itself (decode
    is the documented media stub; the plumbing is the contract)."""
    if fmt == "binary":
        return [{"kind": "media", "text": "",
                 "media_ref": f"stream://{name}"}]
    text = data.decode("utf-8", errors="replace")
    if fmt == "html":
        from docling_core_spark.extraction.extract import extract_spans
        spans, _stats = extract_spans(text)
        return spans
    if fmt == "doctags":
        from docling_core_spark.sources.doctags import doctags_to_spans
        return doctags_to_spans(text)
    if fmt == "docjson":
        from docling_core_spark.sources.docjson import docjson_to_spans
        return docjson_to_spans(text)
    # plain text: one text span per non-empty line block (the minimal
    # faithful spanization - paragraphs split on blank lines)
    parts = [p.strip() for p in text.split("\n\n")]
    return [{"kind": "text", "text": p, "media_ref": ""}
            for p in parts if p]


def ensure_demo_tree(sf_dir: str) -> str:
    """Materialize the deterministic planted file tree the driver row
    q_ingest_files ingests: the first 40 documents of ``sf_dir``'s
    documents table written as real files under a two-subdir tree
    (even doc_ids as minimal HTML pages, odd as .txt) in the system
    temp dir, once per sf. Spark-free (pyarrow read), idempotent via
    a marker file; the marker's underscore prefix keeps Spark's
    hidden-file filter from ingesting it."""
    import tempfile

    import pyarrow.parquet as pq

    base = os.path.join(
        tempfile.gettempdir(),
        f"docling_ingest_{os.path.basename(os.path.abspath(sf_dir))}_v1")
    marker = os.path.join(base, "_READY")
    if os.path.exists(marker):
        return base
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    rows = sorted(zip(t.column("doc_id").to_pylist(),
                      t.column("text").to_pylist()))[:40]
    for sub in ("even", "odd"):
        os.makedirs(os.path.join(base, sub), exist_ok=True)
    for doc_id, text in rows:
        if int(doc_id) % 2 == 0:
            path = os.path.join(base, "even", f"doc_{doc_id}.html")
            data = f"<html><body><p>{text}</p></body></html>"
        else:
            path = os.path.join(base, "odd", f"doc_{doc_id}.txt")
            data = text
        with open(path, "w", encoding="utf-8", newline="") as f:
            f.write(data)
    with open(marker, "w", encoding="utf-8") as f:
        f.write("ok")
    return base


def ingest_spans(streams: DataFrame) -> DataFrame:
    """Stream rows -> flat span rows (doc_id, ord, kind, text,
    media_ref). The Python stage emits the PACKED per-doc shape and
    the unpack runs JVM-side (layout_spark.unpack_spans_flat), so the
    Arrow boundary carries ~3 string values per document."""
    import pyarrow as pa

    from docling_core_spark.extraction.layout import TEXT_SEP
    from docling_core_spark.extraction.layout_spark import (
        PACKED_SPANS_SCHEMA,
        unpack_spans_flat,
    )

    def run(batches: Iterator) -> Iterator:
        def clean(s: str) -> str:
            # arbitrary ingested files may contain the packing
            # separator (U+001F) in their text; passing it through
            # would silently shift every later span's boundary at
            # unpack. Strip it - it is a non-printing control char
            # with no content meaning.
            return s.replace(TEXT_SEP, "") if TEXT_SEP in s else s

        for batch in batches:
            doc_ids = batch.column("doc_id").to_pylist()
            names = batch.column("name").to_pylist()
            fmts = batch.column("fmt").to_pylist()
            contents = batch.column("content").to_pylist()
            rows = []
            for d, nm, fmt, data in zip(doc_ids, names, fmts, contents):
                spans = spans_from_stream(nm, fmt, data or b"")
                rows.append((
                    d,
                    list(range(len(spans))),
                    TEXT_SEP.join(clean(s["kind"]) for s in spans),
                    TEXT_SEP.join(clean(s.get("text", ""))
                                  for s in spans),
                    TEXT_SEP.join(clean(s.get("media_ref", ""))
                                  for s in spans)))
            yield pa.RecordBatch.from_arrays(
                [pa.array([r[0] for r in rows], pa.string()),
                 pa.array([r[1] for r in rows], pa.list_(pa.int32())),
                 pa.array([r[2] for r in rows], pa.string()),
                 pa.array([r[3] for r in rows], pa.string()),
                 pa.array([r[4] for r in rows], pa.string())],
                names=["doc_id", "ords", "kinds", "texts", "refs"])

    packed = streams.select("doc_id", "name", "fmt", "content") \
        .mapInArrow(run, PACKED_SPANS_SCHEMA)
    return unpack_spans_flat(packed)
