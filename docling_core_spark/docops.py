"""Document-level DataFrame operators: concatenate (M9), range
extraction (M7).

Both are pure Spark column transforms over the ``spans`` array - no
Python UDF, no per-doc object graph. This is the SURVEY §2.3 mapping:
the reference's in-place tree mutations become span-array arithmetic.

* ``concatenate_documents`` re-expresses DoclingDocument.concatenate
  (document.py:5752-5761 + _DocIndex.index 5621-5750): pool re-indexing
  becomes an offset shift by the running span count (window prefix sum),
  and the reference's page renumbering (``page_delta = max_page_so_far -
  min(doc.pages) + 1``, document.py:5643) becomes a rewrite of
  ``page_break:P`` kinds plus one synthetic break at each document
  boundary.
* ``extract_spans_range`` re-expresses extract_items_range
  (document.py:3764-3874) on span offsets: slice + re-offset. The span
  codec is tolerant of group-boundary cuts (orphan ``end_group`` pops an
  empty stack; unclosed groups close at document end), mirroring the
  reference's re-rooting of partial subtrees.

Scale notes: concatenation shuffles once on the grouping key (inherent
- the output row IS the group); the window runs inside each group
partition. Range extraction is a pure projection (no shuffle at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# max page touched by a document: page_break:P spans carry the explicit
# target page; a document with no breaks is a single page 1
_MAX_PAGE = (
    "aggregate(spans, CAST(1 AS LONG), (acc, s) -> "
    "IF(s.kind LIKE 'page_break:%', "
    "greatest(acc, CAST(split(s.kind, ':')[1] AS LONG)), acc))")

_SHIFTED = (
    "transform(spans, s -> named_struct("
    "'kind', CASE WHEN s.kind LIKE 'page_break:%' THEN "
    "concat('page_break:', CAST(CAST(split(s.kind, ':')[1] AS LONG) "
    "+ base_page AS STRING)) ELSE s.kind END, "
    "'text', s.text, 'media_ref', s.media_ref, "
    "'offset', CAST(s.offset + base_off + IF(seq > 1, 1, 0) AS INT)))")

_WITH_BOUNDARY_BREAK = (
    "CASE WHEN seq > 1 THEN concat(array(named_struct("
    "'kind', concat('page_break:', CAST(base_page + 1 AS STRING)), "
    "'text', '', 'media_ref', '', "
    "'offset', CAST(base_off AS INT))), shifted) ELSE shifted END")


def concatenate_documents(docs: DataFrame, group_col=None,
                          ) -> DataFrame:
    """documents(doc_id, spans) -> concatenated documents, one row per
    group (default: the whole input -> a single document). Order inside
    a group is doc_id order, like the reference's input sequence."""
    grp = group_col if group_col is not None else F.lit("all")
    d = (docs.withColumn("grp", grp)
         .withColumn("n", F.size("spans"))
         .withColumn("maxp", F.expr(_MAX_PAGE)))
    w = Window.partitionBy("grp").orderBy("doc_id")
    before = w.rowsBetween(Window.unboundedPreceding, -1)
    d = (d.withColumn("seq", F.row_number().over(w))
         .withColumn("base_off", F.coalesce(
             F.sum(F.col("n") + 1).over(before), F.lit(0)))
         .withColumn("base_page", F.coalesce(
             F.sum("maxp").over(before), F.lit(0)))
         .withColumn("shifted", F.expr(_SHIFTED))
         .withColumn("spans2", F.expr(_WITH_BOUNDARY_BREAK)))
    return (d.groupBy("grp")
            .agg(
                F.concat_ws(" + ", F.array_sort(
                    F.collect_list(F.struct("seq", "doc_id"))).getField(
                        "doc_id")).alias("doc_id"),
                F.flatten(F.array_sort(F.collect_list(
                    F.struct("seq", "spans2"))).getField("spans2"))
                .alias("spans"))
            .select("doc_id", "spans"))


def split_outlier_documents(docs: DataFrame, span_threshold: int = 2000
                            ) -> DataFrame:
    """Mega-document defusal (SURVEY §4.2 hazard 3): documents above
    ``span_threshold`` spans are split at page boundaries into
    ``doc_id#pK`` sub-documents (PageChunker-style semantics for the
    outliers - heading context does not cross the cut, documented
    divergence); everything else passes through untouched.

    One mega-doc is one Arrow record AND one sequential chunking task -
    at 10^12-doc scale the straggler tail is set by the largest doc, so
    outliers pay one small shuffle (their spans only) to become
    parallelizable. The split point is the page break, so every
    sub-document stays a valid span sequence."""
    from pyspark.sql import Window

    big = docs.filter(F.size("spans") > span_threshold)
    small = docs.filter(F.size("spans") <= span_threshold)

    s = big.select("doc_id", F.explode("spans").alias("s"))
    w = (Window.partitionBy("doc_id").orderBy(F.col("s.offset"))
         .rowsBetween(Window.unboundedPreceding, 0))
    parts = (s.withColumn(
        "part",
        F.sum(F.when(F.col("s.kind").startswith("page_break"), 1)
              .otherwise(0)).over(w)))
    split = (parts.groupBy("doc_id", "part")
             .agg(F.array_sort(F.collect_list(F.struct(
                 F.col("s.offset").alias("o"), F.col("s").alias("s"))))
                 .getField("s").alias("spans"))
             .select(
                 F.concat_ws("#", "doc_id",
                             F.concat(F.lit("p"), F.col("part")))
                 .alias("doc_id"),
                 "spans"))
    return small.unionByName(split)


def extract_spans_range(docs: DataFrame, start: int, stop: int
                        ) -> DataFrame:
    """Sub-document extraction by span-offset range [start, stop):
    filter + re-offset, purely columnar."""
    # the emptiness guard runs BEFORE the projection, as exists() on
    # the raw spans ATTRIBUTE: filtering on the transformed alias
    # would be pushed back through the projection and duplicate the
    # whole filter+transform per raw row (tools/plan_audit.py class);
    # exists() short-circuits and builds no array
    guard = F.expr(
        f"exists(spans, s -> s.offset >= {start} AND s.offset < {stop})")
    return docs.filter(guard).select(
        "doc_id",
        F.expr(
            "transform(filter(spans, s -> s.offset >= {0} AND "
            "s.offset < {1}), s -> named_struct('kind', s.kind, "
            "'text', s.text, 'media_ref', s.media_ref, "
            "'offset', CAST(s.offset - {0} AS INT)))".format(start, stop))
        .alias("spans"),
    )


def redact_spans(docs: DataFrame, kinds,
                 drop_orphan_captions: bool = False) -> DataFrame:
    """delete_items (M5) as a span-level transform: remove every span
    whose base kind is in ``kinds`` and the whole bracketed range when
    a group kind is redacted (children die with the parent, reference
    _delete_items document.py:2230-2304). The recursive ref-rewrite
    collapses to nothing in the span codec: offsets are re-assigned
    densely, which IS the reference's per-pool index-delta lookup
    re-expressed.

    ``drop_orphan_captions=False`` (default) matches the reference
    exactly: delete_items leaves a deleted floating item's caption in
    the tree (captions are body-parented) and the serializer renders
    it standalone - parity-locked in tests/test_redact.py. True is
    the stricter redaction a dedup/PII pass wants: captions die with
    the media they describe.

    Rich-cell children die with their table: ``+child``-suffixed spans
    and ``list_group:of_prev`` groups attach to the immediately
    preceding codec item (model/spans.py), so the fold carries a
    prev-item-deleted flag and cascades - exactly the reference's
    child recursion plus its rich-cell orphan cleanup.

    Purely columnar: one aggregate() fold per row, zero shuffle, no
    Python. The orphaned-media list is computed in the fold's INIT
    expression (evaluated once per row - inlining it into the lambda
    would re-evaluate per element)."""
    karr = "array(" + ", ".join(f"'{k}'" for k in sorted(kinds)) + ")"
    # base kind: leading [a-z_]+ run (strips :L / :MREF / +fmt / +child)
    base = "regexp_extract(s.kind, '^[a-z_]+', 0)"
    if drop_orphan_captions:
        rm = (f"transform(filter(spans, s -> array_contains({karr}, "
              "regexp_extract(s.kind, '^[a-z_]+', 0)) "
              "AND s.media_ref <> ''), s -> s.media_ref)")
        cap_clause = (" OR (s.kind LIKE 'caption:%' AND "
                      "array_contains(acc.rm, substring(s.kind, 9)))")
    else:
        rm = "slice(transform(spans, s -> s.media_ref), 1, 0)"
        cap_clause = ""
    # attached-to-previous-item spans: rich-cell '+child' marks and
    # of_prev brackets in BOTH base kinds, with or without the
    # ':furniture' flag (model/spans.py:386 emits
    # f"{base}:of_prev{flag}") - the same predicate _subtree_end uses
    deleted = (f"(array_contains({karr}, {base}){cap_clause} "
               "OR (acc.pd AND (s.kind LIKE '%+child' "
               "OR s.kind LIKE 'list_group:of_prev%' "
               "OR s.kind LIKE 'inline_group:of_prev%')))")
    opener = f"{base} IN ('list_group', 'inline_group')"

    def st(d: str, pd: str, kept: str) -> str:
        return (f"named_struct('d', {d}, 'pd', {pd}, "
                f"'kept', {kept}, 'rm', acc.rm)")

    fold = (
        "aggregate(spans, "
        "named_struct('d', 0, 'pd', false, "
        f"'kept', slice(spans, 1, 0), 'rm', {rm}), "
        "(acc, s) -> CASE "
        # inside a deleted bracket range: count depth, drop everything
        # EXCEPT page breaks (the reference's delete_items never
        # deletes pages - document.py:2230-2304 touches items only,
        # so content after the range keeps its page on rebuild); when
        # the range closes, the preceding item IS deleted
        f"WHEN acc.d > 0 AND s.kind = 'end_group' "
        f"THEN {st('acc.d - 1', 'acc.d = 1', 'acc.kept')} "
        f"WHEN acc.d > 0 AND {opener} "
        f"THEN {st('acc.d + 1', 'acc.pd', 'acc.kept')} "
        f"WHEN acc.d > 0 AND s.kind LIKE 'page_break:%' "
        f"THEN {st('acc.d', 'acc.pd', 'array_append(acc.kept, s)')} "
        f"WHEN acc.d > 0 THEN {st('acc.d', 'acc.pd', 'acc.kept')} "
        # top level: delete (entering a range for group kinds)
        f"WHEN {deleted} AND {opener} "
        f"THEN {st('1', 'acc.pd', 'acc.kept')} "
        f"WHEN {deleted} THEN {st('0', 'true', 'acc.kept')} "
        # kept page break: page structure, not an item - it does NOT
        # become the preceding item, so the deleted-parent flag
        # carries across it (the emitter marks '+child' on the first
        # non-page-break span, model/spans.py:390-396)
        f"WHEN s.kind LIKE 'page_break:%' "
        f"THEN {st('acc.d', 'acc.pd', 'array_append(acc.kept, s)')} "
        # kept span: it becomes the new preceding item
        f"ELSE {st('acc.d', 'false', 'array_append(acc.kept, s)')} "
        "END, "
        "acc -> transform(acc.kept, (x, i) -> named_struct("
        "'kind', x.kind, 'text', x.text, 'media_ref', x.media_ref, "
        "'offset', CAST(i AS INT))))")
    return docs.withColumn("spans", F.expr(fold))


# ----------------------------------------------------------------------
# M4 / M6 / M8: positional mutation as span splices
# ----------------------------------------------------------------------

# driver-query contract (queries.q_splice_* and pyoracle._rows_splice_*
# import these so both sides splice identically)
SPLICE_SENTINEL_SPANS = (
    ("section_header:2", "Spliced appendix", "", 0),
    ("text", "spliced sentinel body", "", 0),
)
SPLICE_REPLACE_KINDS = ("table", "code")
SPLICE_GRAFT_KINDS = ("text", "paragraph", "title")
# driver-query anchors for the M7 deletion half (delete_range): cut
# from the first body text through (exclusive) the first table/code
# subtree; docs lacking either anchor, or where the table precedes
# the text, pass through via skip_unresolvable (390/110 over the
# 500-doc corpus - both paths exercised).
DELETE_RANGE_START = ("text", "paragraph")
DELETE_RANGE_END = ("table", "code")
# driver-query contract for append_child: the parent priority hits a
# group in docs that have one (group branch: last child inside the
# group) and a leaf everywhere else (+child attach branch), so one
# corpus pass exercises both insert shapes.
APPEND_CHILD_KINDS = ("list_group", "section_header", "text")
APPEND_CHILD_SPAN = ("text", "Appended child note", "", 0)

def _base_kind_py(kind: str) -> str:
    import re

    m = re.match(r"[a-z_]+", kind or "")
    return m.group() if m else (kind or "")


def _subtree_end(kinds, i: int) -> int:
    """Exclusive end of the pre-order subtree anchored at span i: a
    group opener extends to its matching end_group; a leaf extends
    through its attached rich-cell children (``+child`` spans /
    ``list_group:of_prev`` brackets, model/spans.py).

    Page breaks are page structure, not items: the emitter marks
    '+child' on the first NON-page-break span (model/spans.py:390-396),
    so a page_break may legally sit between a leaf and its attached
    child - the scan skips over it. A trailing page_break that turns
    out to precede the NEXT sibling (or document end) is NOT part of
    the subtree (it is that sibling's page transition)."""
    n = len(kinds)
    j = i + 1
    if (_base_kind_py(kinds[i]) in ("list_group", "inline_group")
            and kinds[i] != "end_group"):
        depth = 1
        while j < n and depth:
            b = _base_kind_py(kinds[j])
            if b in ("list_group", "inline_group"):
                depth += 1
            elif kinds[j] == "end_group":
                depth -= 1
            j += 1
    # attached children belong to the subtree either way
    tent = None  # first page_break of a possibly-trailing run
    while j < n:
        if kinds[j].startswith("page_break:"):
            if tent is None:
                tent = j
            j += 1
        elif kinds[j].endswith("+child"):
            tent = None
            j += 1
        elif (":of_prev" in kinds[j]
              and _base_kind_py(kinds[j]) in ("list_group",
                                              "inline_group")):
            # an of_prev bracket (list OR inline) hangs off the
            # previous leaf - its whole group rides the subtree
            tent = None
            depth = 1
            j += 1
            while j < n and depth:
                b = _base_kind_py(kinds[j])
                if b in ("list_group", "inline_group"):
                    depth += 1
                elif kinds[j] == "end_group":
                    depth -= 1
                j += 1
        else:
            break
    return tent if tent is not None else j


def _is_attached_kind(k: str) -> bool:
    return (k.endswith("+child")
            or (":of_prev" in k and _base_kind_py(k) in
                ("list_group", "inline_group")))


def _anchor_index(spans, anchor, allow_attached: bool = False):
    """Resolve an anchor to a span index. ``anchor`` is either an
    explicit span offset (int) or a priority tuple of base kinds - the
    first standalone item span (no ``+child`` cell content, no
    ``:of_prev`` bracket, not origin/end_group) whose base kind matches
    wins. Returns None when nothing matches (doc passes through).

    ``allow_attached``: offset anchors may resolve to attached child
    spans (rich cells, of_prev brackets) - the caller then splices IN
    THE OWNING LEAF'S CHILD LIST (the reference's sibling semantics
    for such items). ``end_group`` is never an anchor (it is a
    bracket, not an item)."""
    if isinstance(anchor, int):
        idx = next((i for i, s in enumerate(spans)
                    if s[3] == anchor), None)
        if idx is None:
            raise ValueError(f"anchor offset {anchor} not found")
        k = spans[idx][0]
        if k == "end_group":
            raise ValueError(
                f"anchor {anchor} is an end_group bracket, not an item")
        if _is_attached_kind(k) and not allow_attached:
            # attached children (rich cells, of_prev brackets) are not
            # standalone siblings: an insert after one splices in the
            # owning leaf's child list - only supported where the new
            # content is flat leaf spans (insert_spans_after), not for
            # whole-body grafts. Anchor on the owning leaf instead.
            raise ValueError(
                f"anchor {anchor} is an attached child span ({k}); "
                "anchor on its owning leaf instead")
        return idx
    for want in anchor:
        for i, s in enumerate(spans):
            k = s[0]
            if (k.endswith("+child") or k == "end_group"
                    or ":of_prev" in k or k.startswith("origin")):
                continue
            if _base_kind_py(k) == want:
                return i
    return None


def graft_body(spans) -> list:
    """Body spans of a document being grafted into another (M8,
    document.py:3876-3894): only body children transfer - the
    doc-level ``origin:`` span stays with its own document."""
    return [s for s in spans if not s[0].startswith("origin")]


def py_splice_spans(spans, anchor, new_spans, replace: bool = False,
                    allow_child_anchor: bool = True):
    """Pure per-doc splice over (kind, text, media_ref, offset) tuples
    sorted by offset. ``anchor``: span offset or base-kind priority
    tuple (see _anchor_index).

    * replace=False -> M4 insert_item_after_sibling semantics
      (document.py:3104-3758): the new spans land AFTER the anchor's
      whole pre-order subtree, exactly where a sibling insert appears
      in iterate_items order.
    * replace=True -> M6 replace_item (document.py:2054-2057 =
      insert-after + delete-old): the anchor subtree is substituted;
      captions of a replaced floating item stay (they are
      body-parented), matching the reference's delete cascade.

    Offsets are re-assigned densely (the per-pool index rewrite).
    Page breaks inside a replaced subtree survive the cut (the
    reference's delete cascade never deletes pages, so following
    content keeps its page on rebuild).

    Attached-child offset anchors (rich cells, of_prev brackets) are
    supported when ``allow_child_anchor``: the new spans land in the
    OWNING LEAF's child list right after the anchor (reference
    insert_item_after_sibling on such an item), carrying the
    ``+child`` marker - requires flat leaf ``new_spans`` (no group
    brackets). NOTE the reference's own replace_item on a rich cell
    or of_prev bracket corrupts its tree (validate_tree fails after
    insert-then-delete); the engine performs the substitution the
    reference intends (tests/test_splice.py documents the
    divergence)."""
    spans = sorted(spans, key=lambda s: s[3])
    kinds = [s[0] for s in spans]
    idx = _anchor_index(spans, anchor,
                        allow_attached=allow_child_anchor)
    if idx is None:
        return [(k, t, m, i) for i, (k, t, m, _) in enumerate(spans)]
    k_a = kinds[idx]
    if allow_child_anchor and _is_attached_kind(k_a):
        if any(_base_kind_py(ns[0]) in ("list_group", "inline_group")
               or ns[0] == "end_group" for ns in new_spans):
            raise ValueError(
                "child-anchor splice supports flat leaf spans only")
        if ":of_prev" in k_a:
            end = _matching_end_group(kinds, idx) + 1
        else:
            end = idx + 1
        new_marked = [(ns[0] + "+child", ns[1], ns[2], 0)
                      for ns in new_spans]
    else:
        end = _subtree_end(kinds, idx)
        new_marked = [tuple(s[:3]) + (0,) for s in new_spans]
    if replace:
        head = spans[:idx] + [s for s in spans[idx:end]
                              if s[0].startswith("page_break:")]
    else:
        head = spans[:end]
    out = head + new_marked + spans[end:]
    return [(k, t, m, i) for i, (k, t, m, _) in enumerate(out)]


def _matching_end_group(kinds, i: int) -> int:
    """Index of the ``end_group`` closing the opener at span i; the
    sequence length when the group never closes (the codec tolerates
    unclosed groups - they close at document end, model/spans.py)."""
    n = len(kinds)
    depth = 1
    j = i + 1
    while j < n and depth:
        b = _base_kind_py(kinds[j])
        if b in ("list_group", "inline_group"):
            depth += 1
        elif kinds[j] == "end_group":
            depth -= 1
        j += 1
    return n if depth else j - 1


def py_append_child_span(spans, parent_anchor, new_span):
    """append_child_item (reference document.py:2007-2031) as a span
    insert: the new leaf item becomes the LAST child of the parent.

    * ``parent_anchor is None`` -> the body (the reference default):
      the span appends at document end as a plain sibling.
    * group parent (``list_group``/``inline_group`` opener) -> the
      span inserts just before the group's matching ``end_group``
      (last child inside the group).
    * leaf parent -> the span inserts at the leaf's subtree end (after
      any existing attached children) carrying the ``+child`` marker,
      so rebuild re-attaches it as the leaf's child (model/spans.py
      ``as_child``).

    The reference refuses a child that itself has children
    (document.py:2011-2012); this op inserts exactly one span, so the
    constraint holds by construction. Offsets re-assigned densely."""
    spans = sorted(spans, key=lambda s: s[3])
    k, t, m = new_span[0], new_span[1], new_span[2]
    if parent_anchor is None:
        out = spans + [(k, t, m, 0)]
        return [(kk, tt, mm, i) for i, (kk, tt, mm, _) in enumerate(out)]
    kinds = [s[0] for s in spans]
    idx = _anchor_index(spans, parent_anchor)
    if idx is None:
        return [(kk, tt, mm, i)
                for i, (kk, tt, mm, _) in enumerate(spans)]
    if _base_kind_py(kinds[idx]) in ("list_group", "inline_group"):
        pos = _matching_end_group(kinds, idx)
        ins = (k, t, m, 0)
    else:
        pos = _subtree_end(kinds, idx)
        ins = (k + "+child", t, m, 0)
    out = spans[:pos] + [ins] + spans[pos:]
    return [(kk, tt, mm, i) for i, (kk, tt, mm, _) in enumerate(out)]


def py_delete_spans_range(spans, start, end,
                          start_inclusive: bool = True,
                          end_inclusive: bool = True):
    """M7's deletion half: delete_items_range (document.py:3764-3812)
    as a span drop. ``start``/``end`` anchor sibling subtrees; the cut
    runs from the start subtree's first span to the end subtree's
    exclusive end, honouring the inclusivity flags the same way the
    reference slices its children list. Offsets re-assigned densely."""
    spans = sorted(spans, key=lambda s: s[3])
    kinds = [s[0] for s in spans]
    i0 = _anchor_index(spans, start)
    i1 = _anchor_index(spans, end)
    if i0 is None or i1 is None:
        raise ValueError("range anchor not found")
    if i0 > i1:
        raise ValueError("start anchor must not come after end anchor")
    cut0 = i0 if start_inclusive else _subtree_end(kinds, i0)
    cut1 = _subtree_end(kinds, i1) if end_inclusive else i1
    if cut1 < cut0:
        cut1 = cut0  # empty range after exclusivity trims
    # page structure survives item deletion (reference keeps pages)
    pbs = [s for s in spans[cut0:cut1] if s[0].startswith("page_break:")]
    out = spans[:cut0] + pbs + spans[cut1:]
    return [(k, t, m, i) for i, (k, t, m, _) in enumerate(out)]


# ----------------------------------------------------------------------
# Columnar splice: the same subtree walk as py_splice_spans, but as
# pure SQL folds - O(n) per document, zero Python, zero shuffle (r3
# verdict item 1: _splice_arrow's per-doc dict loop eliminated).
#
# Three expressions per doc, all JVM-side:
#   1. an anchor fold recording the first standalone index per
#      candidate base kind (priority resolved in the finish lambda),
#   2. a state-machine fold walking the anchor's pre-order subtree
#      (group depth, attached +child / of_prev brackets, page-break
#      skipping with a tentative end - mirrors _subtree_end),
#   3. slice/concat/transform building the output (no per-element
#      accumulation, so no quadratic array_append).
# CollapseProject-safety: each fold is bound to its own column and
# referenced multiple times downstream, which keeps Catalyst from
# inlining one fold's expression INTO another fold's lambda (where it
# would re-evaluate per element - see the textops.py hashing note).
# tests/test_splice.py asserts linear behaviour on a 100k-span doc.
# ----------------------------------------------------------------------

_SORTED = ("array_sort(spans, (l, r) -> CASE "
           "WHEN l.offset < r.offset THEN -1 "
           "WHEN l.offset > r.offset THEN 1 ELSE 0 END)")
_S_BASE = "regexp_extract(s.kind, '^[a-z_]+', 0)"
_S_OPENER = f"{_S_BASE} IN ('list_group', 'inline_group')"
_S_OF_PREV = ("(s.kind LIKE 'list_group:of_prev%' "
              "OR s.kind LIKE 'inline_group:of_prev%')")
_S_ATTACHED = f"(s.kind LIKE '%+child' OR s.kind = 'end_group' OR {_S_OF_PREV})"
_S_STANDALONE = ("NOT (s.kind LIKE '%+child' OR s.kind = 'end_group' "
                 "OR s.kind LIKE '%:of_prev%' "
                 "OR s.kind LIKE 'origin%')")


def _sql_str(v: str) -> str:
    return "'" + str(v).replace("\\", "\\\\").replace("'", "\\'") + "'"


def _sql_anchor_idx(anchor, col: str = "sp",
                    allow_attached: bool = False) -> str:
    """Index of the anchor span in ``col`` (-1 when a kind-priority
    anchor matches nothing), mirroring _anchor_index: offset anchors
    must exist and (unless ``allow_attached``) not be attached-child
    spans (raise_error, like the ValueError on the Python path); kind
    anchors take the FIRST standalone span of the highest-priority
    matching base kind."""
    if isinstance(anchor, int):
        find = (f"aggregate({col}, named_struct('i', 0, 'a', -1), "
                "(acc, s) -> named_struct('i', acc.i + 1, 'a', "
                f"IF(acc.a < 0 AND s.offset = {int(anchor)}, "
                "acc.i, acc.a)), acc -> acc.a)")
        if allow_attached:
            refuse = "x.kind = 'end_group'"
            msg = f"anchor {anchor} is an end_group bracket, not an item"
        else:
            refuse = _S_ATTACHED.replace("s.kind", "x.kind")
            msg = (f"anchor {anchor} is an attached child span; "
                   "anchor on its owning leaf instead")
        return (f"CASE WHEN ({find}) < 0 THEN "
                f"raise_error({_sql_str(f'anchor offset {anchor} not found')}) "
                f"WHEN exists(slice({col}, ({find}) + 1, 1), "
                f"x -> {refuse}) THEN "
                f"raise_error({_sql_str(msg)}) "
                f"ELSE ({find}) END")
    kinds = list(anchor)
    fields = ", ".join(f"'a{j}', -1" for j in range(len(kinds)))
    upd = ", ".join(
        f"'a{j}', IF(acc.a{j} < 0 AND {_S_STANDALONE} "
        f"AND {_S_BASE} = {_sql_str(k)}, acc.i, acc.a{j})"
        for j, k in enumerate(kinds))
    pick = " ".join(f"WHEN acc.a{j} >= 0 THEN acc.a{j}"
                    for j in range(len(kinds)))
    return (f"aggregate({col}, named_struct('i', 0, {fields}), "
            f"(acc, s) -> named_struct('i', acc.i + 1, {upd}), "
            f"acc -> CASE {pick} ELSE -1 END)")


def _sql_subtree_end(aidx: str, col: str = "sp") -> str:
    """Exclusive subtree end for the anchor at index ``aidx`` - the
    SQL twin of _subtree_end. State: i = position, m = mode
    (0 before anchor / 1 inside group depth walk / 2 attached-children
    scan / 3 done), d = group depth, e = resolved end, t = tentative
    end at a possibly-trailing page-break run."""
    def st(m="acc.m", d="acc.d", e="acc.e", t="acc.t"):
        return (f"named_struct('i', acc.i + 1, 'm', {m}, 'd', {d}, "
                f"'e', {e}, 't', {t})")

    return (
        f"aggregate({col}, "
        "named_struct('i', 0, 'm', 0, 'd', 0, 'e', -1, 't', -1), "
        "(acc, s) -> CASE "
        f"WHEN {aidx} < 0 OR acc.m = 3 OR acc.i < {aidx} THEN {st()} "
        f"WHEN acc.i = {aidx} THEN IF({_S_OPENER}, "
        f"{st(m='1', d='1')}, {st(m='2')}) "
        "WHEN acc.m = 1 THEN CASE "
        f"WHEN s.kind = 'end_group' THEN IF(acc.d = 1, "
        f"{st(m='2', d='0', t='-1')}, {st(d='acc.d - 1')}) "
        f"WHEN {_S_OPENER} THEN {st(d='acc.d + 1')} "
        f"ELSE {st()} END "
        # mode 2: attached-children scan past the anchor leaf/bracket
        f"WHEN s.kind LIKE '%+child' THEN {st(t='-1')} "
        f"WHEN {_S_OF_PREV} THEN {st(m='1', d='1', t='-1')} "
        f"WHEN s.kind LIKE 'page_break:%' THEN "
        f"{st(t='IF(acc.t < 0, acc.i, acc.t)')} "
        f"ELSE {st(m='3', e='IF(acc.t >= 0, acc.t, acc.i)')} "
        "END, "
        f"acc -> IF({aidx} < 0, -1, CASE WHEN acc.e >= 0 THEN acc.e "
        "WHEN acc.t >= 0 THEN acc.t ELSE acc.i END))")


def _sql_match_end_group(aidx: str, col: str = "sp") -> str:
    """Index of the ``end_group`` matching the opener at ``aidx``; the
    array size when the group never closes - the SQL twin of
    _matching_end_group. State: i = position, d = group depth
    (0 before the anchor), g = resolved end_group index."""
    return (
        f"aggregate({col}, "
        "named_struct('i', 0, 'd', 0, 'g', -1), "
        "(acc, s) -> CASE "
        f"WHEN acc.g >= 0 OR acc.i < {aidx} THEN "
        "named_struct('i', acc.i + 1, 'd', acc.d, 'g', acc.g) "
        f"WHEN acc.i = {aidx} THEN "
        "named_struct('i', acc.i + 1, 'd', 1, 'g', -1) "
        "WHEN s.kind = 'end_group' THEN named_struct('i', acc.i + 1, "
        "'d', acc.d - 1, 'g', IF(acc.d = 1, acc.i, -1)) "
        f"WHEN {_S_OPENER} THEN "
        "named_struct('i', acc.i + 1, 'd', acc.d + 1, 'g', -1) "
        "ELSE named_struct('i', acc.i + 1, 'd', acc.d, 'g', acc.g) "
        "END, "
        "acc -> IF(acc.g >= 0, acc.g, acc.i))")


def _sql_new_spans(new_spans, col: str = "sp_") -> str:
    if not new_spans:
        # an empty typed array: slice of the (let-bound) input - with
        # replace=True this makes the splice a pure subtree delete
        return f"slice({col}, 1, 0)"
    items = ", ".join(
        f"named_struct('kind', {_sql_str(k)}, 'text', {_sql_str(t)}, "
        f"'media_ref', {_sql_str(m)}, 'offset', 0)"
        for k, t, m, *_ in new_spans)
    return f"array({items})"


_REOFFSET = ("transform({0}, (x, i) -> named_struct("
             "'kind', x.kind, 'text', x.text, "
             "'media_ref', x.media_ref, 'offset', CAST(i AS INT)))")


def _sql_let(name: str, expr: str, body: str) -> str:
    """Let-binding as a single-element ``transform``: ``expr`` is
    evaluated exactly ONCE per row and ``body`` references it as the
    lambda variable ``name``. This survives ANY optimizer inlining:
    when Catalyst collapses the whole splice into one expression
    (e.g. as a Generate/explode input), plain column references get
    textually duplicated and each duplicate re-runs its O(n) fold -
    measured 0.3s -> 12.7s on the exploded splice at sf0.01. Lambda
    variables cannot be duplicated that way."""
    return f"element_at(transform(array({expr}), {name} -> {body}), 1)"


def _splice_expr(anchor, new_arr: str, replace: bool,
                 new_arr_child: str = None) -> str:
    """The full splice as ONE expression over ``spans`` with let-bound
    sorted array / anchor index / subtree end (see _sql_let).

    ``new_arr_child``: the +child-marked twin of ``new_arr``. When
    given, attached-child offset anchors are supported - the splice
    runs in the owning leaf's child list (anchor's own extent: the
    bracket group for an of_prev opener, the single span for a rich
    cell) and inserts the marked twin. When None (grafts), attached
    anchors keep the loud refusal."""
    allow = new_arr_child is not None
    ins = f"IF(at_, {new_arr_child}, {new_arr})" if allow else new_arr
    if replace:
        # page structure survives the cut (reference keeps pages)
        body = ("concat(slice(sp_, 1, ai_), "
                "filter(slice(sp_, ai_ + 1, ae_ - ai_), "
                "x -> x.kind LIKE 'page_break:%'), "
                f"{ins}, "
                "slice(sp_, ae_ + 1, size(sp_) - ae_))")
    else:
        body = (f"concat(slice(sp_, 1, ae_), {ins}, "
                "slice(sp_, ae_ + 1, size(sp_) - ae_))")
    out = _REOFFSET.format(f"IF(ai_ < 0, sp_, {body})")
    if not allow:
        return _sql_let(
            "sp_", _SORTED,
            _sql_let("ai_", _sql_anchor_idx(anchor, col="sp_"),
                     _sql_let("ae_", _sql_subtree_end("ai_", col="sp_"),
                              out)))
    att = _S_ATTACHED.replace("s.kind", "element_at(sp_, ai_ + 1).kind")
    attached = f"IF(ai_ < 0, false, {att})"
    # anchor extent: of_prev opener -> through its matching end_group;
    # rich cell -> the one span; standalone -> full pre-order subtree
    end = ("CASE WHEN NOT at_ THEN "
           f"{_sql_subtree_end('ai_', col='sp_')} "
           "WHEN regexp_extract(element_at(sp_, ai_ + 1).kind, "
           "'^[a-z_]+', 0) IN ('list_group', 'inline_group') THEN "
           f"{_sql_match_end_group('ai_', col='sp_')} + 1 "
           "ELSE ai_ + 1 END")
    return _sql_let(
        "sp_", _SORTED,
        _sql_let("ai_",
                 _sql_anchor_idx(anchor, col="sp_",
                                 allow_attached=True),
                 _sql_let("at_", attached,
                          _sql_let("ae_", end, out))))


def _splice_select(docs: DataFrame, anchor, new_arr: str,
                   replace: bool,
                   new_arr_child: str = None) -> DataFrame:
    return docs.select(
        "doc_id",
        F.expr(_splice_expr(anchor, new_arr, replace,
                            new_arr_child=new_arr_child))
        .alias("spans"))


def insert_spans_after(docs: DataFrame, anchor,
                       new_spans, replace: bool = False) -> DataFrame:
    """M4/M6 as a Spark op: same ``new_spans`` literal spliced into
    every document after (or replacing) the subtree at the anchor
    (offset or base-kind priority tuple). Pure SQL folds, zero
    shuffle, zero Python; semantics identical to py_splice_spans
    (tests/test_splice.py asserts equality over the corpus and both
    exhaustive anchor sweeps).

    Offset anchors may resolve to attached child spans (rich cells,
    of_prev brackets) when ``new_spans`` are flat leaves: the splice
    then runs in the owning leaf's child list with the new spans
    ``+child``-marked (reference sibling semantics for such items)."""
    flat = not any(
        _base_kind_py(ns[0]) in ("list_group", "inline_group")
        or ns[0] == "end_group" for ns in new_spans)
    marked = ([(ns[0] + "+child",) + tuple(ns[1:]) for ns in new_spans]
              if flat else None)
    return _splice_select(
        docs.select("doc_id", "spans"), anchor,
        _sql_new_spans(new_spans), replace,
        new_arr_child=_sql_new_spans(marked) if flat else None)


def _append_child_expr(anchor, new_span) -> str:
    """append_child_item as ONE expression over ``spans`` (see
    py_append_child_span for the semantics; let-bound folds per
    _sql_let so each O(n) walk runs exactly once per row)."""
    k, t, m = new_span[0], new_span[1], new_span[2]

    def new_one(kind_expr: str) -> str:
        return (f"array(named_struct('kind', {kind_expr}, "
                f"'text', {_sql_str(t)}, 'media_ref', {_sql_str(m)}, "
                "'offset', 0))")

    if anchor is None:
        return _sql_let(
            "sp_", _SORTED,
            _REOFFSET.format(f"concat(sp_, {new_one(_sql_str(k))})"))
    kind_expr = f"IF(op_, {_sql_str(k)}, {_sql_str(k + '+child')})"
    body = (f"concat(slice(sp_, 1, pos_), {new_one(kind_expr)}, "
            "slice(sp_, pos_ + 1, size(sp_) - pos_))")
    out = _REOFFSET.format(f"IF(ai_ < 0, sp_, {body})")
    opener = ("IF(ai_ < 0, false, regexp_extract("
              "element_at(sp_, ai_ + 1).kind, '^[a-z_]+', 0) "
              "IN ('list_group', 'inline_group'))")
    pos = (f"IF(op_, {_sql_match_end_group('ai_', col='sp_')}, "
           f"{_sql_subtree_end('ai_', col='sp_')})")
    return _sql_let(
        "sp_", _SORTED,
        _sql_let("ai_", _sql_anchor_idx(anchor, col="sp_"),
                 _sql_let("op_", opener,
                          _sql_let("pos_", pos, out))))


def append_child_spans(docs: DataFrame, parent_anchor,
                       new_span) -> DataFrame:
    """append_child_item (reference document.py:2007-2031) as a Spark
    op: the same single-leaf child appended to the resolved parent in
    every document - the body (``parent_anchor is None``), a group
    (insert before its matching ``end_group``), or a leaf (``+child``
    attach at the leaf's subtree end - furniture leaves included, the
    emitter walks their children since round 4). Pure SQL folds, zero
    shuffle, zero Python; semantics identical to py_append_child_span
    (tests/test_append_child.py asserts equality over the corpus and
    the exhaustive parent sweep vs the LIVE reference)."""
    return docs.select(
        "doc_id",
        F.expr(_append_child_expr(parent_anchor, new_span))
        .alias("spans"))


def delete_spans_range(docs: DataFrame, start, end,
                       start_inclusive: bool = True,
                       end_inclusive: bool = True,
                       skip_unresolvable: bool = False) -> DataFrame:
    """M7's deletion half (delete_items_range, document.py:3764-3812)
    as pure SQL folds: resolve both anchors, walk both subtrees, cut
    [cut0, cut1) keeping page breaks. Zero shuffle, zero Python.

    ``skip_unresolvable=True`` drops documents where an anchor does
    not resolve (or the anchors are out of order) instead of raising -
    the corpus-pipeline mode (the reference API, like the default,
    raises on bad anchors)."""
    d = docs.select("doc_id", "spans")

    def lets(body: str) -> str:
        """sp_/i0_/i1_ let-bound (each fold once per row, _sql_let)."""
        return _sql_let(
            "sp_", _SORTED,
            _sql_let("i0_", _sql_anchor_idx(start, col="sp_"),
                     _sql_let("i1_", _sql_anchor_idx(end, col="sp_"),
                              body)))

    if skip_unresolvable:
        d = d.filter(F.expr(lets("i0_ >= 0 AND i1_ >= 0 AND i0_ <= i1_")))
    cut = ("IF(c1r_ < c0_, c0_, c1r_)")
    body = _sql_let(
        "e0_", _sql_subtree_end("i0_", col="sp_"),
        _sql_let(
            "e1_", _sql_subtree_end("i1_", col="sp_"),
            _sql_let(
                "c0_",
                f"IF({str(bool(start_inclusive)).lower()}, i0_, e0_)",
                _sql_let(
                    "c1_",
                    _sql_let(
                        "c1r_",
                        f"IF({str(bool(end_inclusive)).lower()}, e1_, i1_)",
                        cut),
                    _REOFFSET.format(
                        "concat(slice(sp_, 1, c0_), "
                        "filter(slice(sp_, c0_ + 1, c1_ - c0_), "
                        "x -> x.kind LIKE 'page_break:%'), "
                        "slice(sp_, c1_ + 1, size(sp_) - c1_))")))))
    if not skip_unresolvable:
        # the raise branches stay OUT of skip mode: Catalyst may
        # reorder a collapsed Project around the skip Filter, and a
        # raise_error evaluated on a row the Filter would drop aborts
        # the job (observed at sf0.01); post-filter they are
        # unreachable anyway
        body = (
            "CASE WHEN i0_ < 0 OR i1_ < 0 THEN "
            "raise_error('range anchor not found') "
            "WHEN i0_ > i1_ THEN raise_error("
            "'start anchor must not come after end anchor') "
            f"ELSE {body} END")
    return d.select("doc_id", F.expr(lets(body)).alias("spans"))


def graft_documents(docs_a: DataFrame, docs_b: DataFrame,
                    anchor, broadcast_b: bool = False) -> DataFrame:
    """M8 insert_document (document.py:3876-3894): splice document B's
    body content into document A after the anchor subtree, joined on
    doc_id. B's doc-level ``origin:`` span is dropped (the reference
    keeps the target's origin; only body children transfer). One
    equi-join shuffle + pure SQL folds; page renumbering for the
    append case rides concatenate (M9).

    Scale: the equi-join shuffles FULL span payloads of both sides.
    When B is a small template/boilerplate table (the common grafting
    shape: one appendix grafted into every corpus doc), pass
    ``broadcast_b=True`` so A's spans never move - the graft becomes a
    map-side BroadcastHashJoin over the corpus scan. With comparable
    sides leave it False and let AQE pick the strategy."""
    b = docs_b.select(F.col("doc_id"),
                      F.col("spans").alias("spans_b"))
    if broadcast_b:
        b = F.broadcast(b)
    joined = docs_a.select("doc_id", "spans").join(b, "doc_id")
    new_arr = ("filter(array_sort(spans_b, (l, r) -> CASE "
               "WHEN l.offset < r.offset THEN -1 "
               "WHEN l.offset > r.offset THEN 1 ELSE 0 END), "
               "x -> x.kind NOT LIKE 'origin%')")
    return _splice_select(joined, anchor, new_arr, replace=False)
