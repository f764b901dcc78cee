#!/usr/bin/env python
"""Audit every registry query's optimized plan for TEXTUALLY
DUPLICATED expensive expressions.

Catalyst duplicates expression trees instead of let-binding them, so
one logical computation can silently run 2-N times per row. Three
repo-documented variants:

  * InferFiltersFromGenerate clones the whole generator child into an
    inferred ``size(e) > 0 AND isnotnull(e)`` Filter
    (extraction/layout_spark.unpack_spans_flat docstring);
  * PushDownPredicate re-substitutes an aliased expression through the
    Project it was bound in (textops._shingle_rows_of docstring);
  * interpreted higher-order-function lambdas re-evaluate referenced
    array expressions per element (docops._sql_let docstring).

This sweep catches the first two classes mechanically: for each query
in the registry it renders the optimized plan, extracts every call to
an expensive function (regexps, hashes, splits, HOFs, arrays_zip),
normalizes expression ids (``#123`` -> ``#``), and reports any exact
call text appearing more than once. Run:

    PYTHONPATH=/root/repo python tools/plan_audit.py [sf_dir] [name ...]

Exit code 1 if any NEW duplication (not in ALLOWED) is found, so it
can gate in CI/pytest. Findings are judgement calls, not always bugs:
a cheap expression duplicated across a Filter + Project costs little -
the report orders by (cost class, count) so the expensive ones surface
first.
"""
from __future__ import annotations

import os
import re
import sys
from collections import Counter

# function heads whose re-evaluation is expensive per row. Order =
# report priority.
EXPENSIVE = (
    "regexp_extract_all(", "regexp_replace(", "regexp_extract(",
    "aggregate(", "transform(", "filter(", "zip_with(",
    "arrays_zip(", "split(", "sentences(",
    "sha2(", "md5(", "xxhash64(", "crc32(",
    "from_json(", "to_json(", "array_sort(", "sort_array(",
)

# known-acceptable duplications: (query, normalized head) pairs.
# Each entry documents WHY it is allowed.
ALLOWED: dict = {
    # chunks/export queries pay a doc-level split twice when a filter
    # on the split result is pushed below the project that binds it -
    # both evaluations are per-DOC (not per-span) and the alternative
    # (a barrier) costs a shuffle. Revisit if a per-span case appears.

    # lm_perplexity scans the corpus twice BY DESIGN: once into the
    # persisted (doc,w1,w2,n_occ) table that trains and scores the
    # LM, once for the vocabulary-size aggregate (V counts doc-final
    # words the bigram table cannot see). Each copy runs once per its
    # own branch, never per row of the other.
    ("lm_perplexity", "(lower(text#), [a-z0-9]+, 0)"):
        "two-scan train+vocab design",

    # exact_substr_dedup scans the corpus twice BY DESIGN (the
    # count-then-join passage-removal plan): once into the exploded
    # (doc_id, idx, wh) marking pass, once for the rebuild
    # projection. Each word-split runs once per its own scan's rows;
    # collapsing to one scan would carry the full ws array through
    # the wh exchange - shuffling text payloads the marking pass
    # deliberately never shuffles.
    ("exact_substr_dedup", "(lower(text#), [a-z0-9]+, 0)"):
        "two-scan mark+rebuild design",

    # dsir_weights scans the corpus twice BY DESIGN (the DSIR paper's
    # fit-then-score shape): scan 1 fits the persisted bucket table,
    # scan 2 scores raw docs against the broadcast ratio table. Each
    # word-split / feature-build / feature-hash runs once per its own
    # scan's rows (the cached fit lineage prints under two consumers
    # but runs once; the in-scan isnotnull re-substitution was killed
    # with a _gen_bind barrier).
    ("dsir_weights", "(lower(text#), [a-z0-9]+, 0)"):
        "two-scan fit+score design",
    ("dsir_weights", "(cast(w# as binary))"):
        "one md5 feature hash per scan",
    ("dsir_weights",
     "(sequence(1, (size(ws#, false) - 1), None, Some(Etc/UTC)), "
     "lambdafunction(concat(element_at(ws#, lambda i#, None, true), "
     " , element_at(ws#, (lambda i# + 1), None, true)), lambda i#, "
     "false))"):
        "one bigram build per scan",

    # pack_sequences scans the corpus twice BY DESIGN (the two-phase
    # distributed cumsum): once for the statistic-sized bucket totals,
    # once for the per-doc rows. Each scan computes the whitespace
    # token count once per its own rows; caching the token table to
    # save the second cheap parquet scan would pin corpus-sized state
    # in executor memory.
    ("pack_sequences", "(trim(text#, None), \\s+, -1)"):
        "two-phase cumsum scans",

    # incremental_ingest fingerprints two DISJOINT corpus slices
    # (batch rows and existing rows); each md5 runs once per its own
    # scan's rows. The audit counts textual occurrences across the
    # whole tree, not per-row re-evaluation.
    ("incremental_ingest", "(cast(text# as binary))"):
        "one md5 per disjoint scan branch",

    # mix_sources scans the corpus twice BY DESIGN (the same
    # statistic-then-filter decomposition as pack_sequences): once
    # aggregating per-source token totals, once for the per-doc keep
    # filter against the broadcast totals. Each split runs once per
    # its own scan's rows.
    ("mix_sources", "(trim(text#, None), \\s+, -1)"):
        "statistic scan + filter scan",

    # semantic_dedup quantizes the originals branch and the planted-
    # copies branch of one UNION separately; each transform runs once
    # per its own branch's rows (disjoint inputs, not re-evaluation).
    ("semantic_dedup",
     "(emb#, lambdafunction(cast(round((lambda x# * 1000.0), 0) as "
     "bigint), lambda x#, false))"):
        "one quantize per disjoint union branch",

    # dedup_retain_modes certifies TWO dedup plans over one frame by
    # joining three legs (window branch, keys-survivors branch, keys-
    # probe branch); after the r5 _gen_bind the md5 runs once per
    # leg's own scan rows - the minimum for a three-legged
    # certification (was x5 with per-mode md5 columns).
    ("dedup_retain_modes", "(cast(clean_text# as binary))"):
        "one md5 per certification leg",
}

# Assessed-not-allowed (left visible in the report on purpose): the
# docops splice/redact folds show the base-kind regexp x5-x12 - those
# are CASE branches inside ONE fold lambda, so per span only the
# branches on its path evaluate (<=3). Measured (r4 session 9,
# sf0.1 = 374k spans): the whole redact fold runs 0.60s warm and
# binding the regexp once per span saves ~0.04s total - not worth
# restructuring parity-locked folds. Revisit only if span payloads
# grow 100x relative to doc count.


def _balanced(s: str, start: int) -> str:
    """The full call text starting at ``start`` (head through its
    closing paren), cut off at 400 chars to keep keys stable."""
    depth = 0
    for i in range(start, min(len(s), start + 4000)):
        c = s[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return s[start:i + 1][:400]
    return s[start:start + 400]


def _norm(expr: str) -> str:
    return re.sub(r"#\d+L?", "#", expr)


def _dedupe_cached(plan: str) -> str:
    """Keep ONE copy of each distinct InMemoryRelation subtree.

    A persisted DataFrame referenced from N places prints its full
    cached lineage N times in the optimized plan, but the lineage runs
    once (into the cache) - counting those copies as duplicated work is
    a false positive. The cached block is the InMemoryRelation line
    plus every following line indented deeper than it. The block key
    strips the tree-drawing prefix (spaces, ``:``, ``+-``, ``|``) of
    every line: the same cached subtree prints at a different depth
    under each consumer, so raw text never matches."""
    out, seen, i = [], set(), 0
    lines = plan.splitlines()

    def depth(ln):
        # tree-glyph prefix length (spaces AND ':  +- |' drawing
        # chars): a plain lstrip() sees ':' as content, so an IMR
        # nested under joins would end its own block immediately and
        # leave the cached lineage to be double-counted
        return len(re.match(r"^[\s:+\-|]*", ln).group(0))

    def key(blk):
        return _norm("\n".join(
            re.sub(r"^[\s:+\-|]*", "", ln) for ln in blk))

    while i < len(lines):
        line = lines[i]
        if "InMemoryRelation" not in line:
            out.append(line)
            i += 1
            continue
        d = depth(line)
        j = i + 1
        while j < len(lines) and depth(lines[j]) > d:
            j += 1
        block = key(lines[i:j])
        if block not in seen:
            seen.add(block)
            out.extend(lines[i:j])
        i = j
    return "\n".join(out)


def audit_plan(plan: str):
    """-> [(head, normalized_call, count)] for calls seen >1 time."""
    plan = _dedupe_cached(plan)
    calls: Counter = Counter()
    for head in EXPENSIVE:
        for m in re.finditer(re.escape(head), plan):
            # skip ids like `regexp_extract_all(...)` inside an
            # already-captured OUTER duplicate: counting every
            # occurrence independently is exactly what we want -
            # nested dupes surface through their outermost call.
            calls[(head, _norm(_balanced(plan, m.start() + len(head) - 1)))] += 1
    return [(h, c, n) for (h, c), n in calls.items() if n > 1]


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.showConsoleProgress", "false")
             .appName("plan-audit").getOrCreate())
    qs = entry.queries()
    bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().optimizedPlan().toString()
        except Exception as exc:  # pragma: no cover - report and move on
            print(f"{name:28s} PLAN-ERROR {type(exc).__name__}: {exc}")
            bad += 1
            continue
        dupes = [d for d in audit_plan(plan)
                 if (name, d[1]) not in ALLOWED]
        if not dupes:
            print(f"{name:28s} clean")
            continue
        dupes.sort(key=lambda d: (EXPENSIVE.index(d[0]), -d[2]))
        bad += 1
        print(f"{name:28s} {len(dupes)} duplicated expression(s):")
        for head, callt, n in dupes[:6]:
            print(f"    x{n}  {callt[:160]}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
