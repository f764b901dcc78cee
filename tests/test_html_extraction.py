"""Main-content extraction: round-trip parity + heuristic robustness.

Parity contract: ``extract_spans(render_page_html(spans)) ==
project_for_html(spans)`` - the left side goes through a full HTML
page (content + boilerplate chrome) and a from-scratch DOM
parser/stripper; the right side normalizes the spans directly. The two
code paths share no extraction logic, so agreement validates both.
"""

from __future__ import annotations

import pytest

from docling_core_spark.corpus import gen_doc_spans
from docling_core_spark.extraction.extract import extract_spans, parse_html
from docling_core_spark.extraction.projection import project_for_html
from docling_core_spark.extraction.render import render_page_html


def _triples(rows):
    return [(r["kind"], r["text"], r["media_ref"]) for r in rows]


def _roundtrip(doc_index: int, seed: int = 42):
    spans = gen_doc_spans(doc_index, seed=seed)
    doc_id = f"doc_{doc_index:012d}"
    html = render_page_html(doc_id, spans)
    got, stats = extract_spans(html)
    want = project_for_html(spans)
    return got, want, stats, html


@pytest.mark.parametrize("doc_index", list(range(0, 300)))
def test_roundtrip_parity(doc_index):
    got, want, _, _ = _roundtrip(doc_index)
    assert _triples(got) == _triples(want)
    assert [r["offset"] for r in got] == list(range(len(got)))


@pytest.mark.parametrize("seed", [7, 99, 12345])
def test_roundtrip_parity_other_seeds(seed):
    for doc_index in range(60):
        got, want, _, _ = _roundtrip(doc_index, seed=seed)
        assert _triples(got) == _triples(want), (seed, doc_index)


def test_extracted_doc_chunks_cleanly():
    """Extracted spans feed the existing chunk pipeline: rebuilding the
    doc and hybrid-chunking it must equal chunking the projection."""
    from docling_core_spark.chunking.hybrid import hybrid_chunk
    from docling_core_spark.model.spans import doc_from_spans

    for doc_index in (0, 3, 17, 42):
        got, want, _, _ = _roundtrip(doc_index)
        to_t = lambda rows: [(r["kind"], r["text"], r["media_ref"],
                              r["offset"]) for r in rows]
        d_got = doc_from_spans("d", to_t(got))
        d_want = doc_from_spans("d", to_t(want))
        c_got = [(c.text, c.headings)
                 for c in hybrid_chunk(d_got, max_tokens=64)]
        c_want = [(c.text, c.headings)
                  for c in hybrid_chunk(d_want, max_tokens=64)]
        assert c_got == c_want
        assert c_got  # non-degenerate


def test_stats_sane():
    for doc_index in (0, 5, 11):
        _, _, stats, _ = _roundtrip(doc_index)
        assert stats["main_found"] == 1
        assert 0 < stats["content_chars"] < stats["page_chars"]
        assert stats["n_dropped"] >= 4  # header, nav, footer, script, ...


def test_boilerplate_fully_stripped():
    """No chrome vocabulary may leak into extracted text (the chrome
    word list is disjoint from the corpus word list)."""
    got, _, _, _ = _roundtrip(2)
    text = " ".join(str(r["text"]) for r in got).lower()
    for w in ("cookie", "newsletter", "sitemap", "advertise"):
        assert w not in text


# ----------------------------------------------------------------------
# heuristic robustness on hand-built pages (no declared main container)
# ----------------------------------------------------------------------

def test_no_main_linkfarm_fallback():
    html = (
        "<html><body>"
        '<div class="x1"><ul>'
        + "".join(f'<li><a href="/p{i}">link {i}</a></li>'
                  for i in range(8))
        + "</ul></div>"
        "<div><h1>Real Title</h1><p>A real paragraph with enough "
        "substance to matter.</p></div>"
        "</body></html>")
    rows, stats = extract_spans(html)
    kinds = [r["kind"] for r in rows]
    assert kinds == ["title", "text"]
    assert stats["main_found"] == 0
    assert stats["n_dropped"] >= 1


def test_content_list_with_links_survives_fallback():
    """A genuine list whose items carry some links must NOT be treated
    as a link farm (long anchors, low density)."""
    html = (
        "<html><body><div>"
        "<p>Intro paragraph text for context and length.</p>"
        "<ul>"
        '<li><a href="/a">a genuinely long linked list item with many '
        "words</a></li>"
        "<li>an unlinked item with plenty of running text in it</li>"
        "<li>another unlinked item with plenty of running text</li>"
        "</ul></div></body></html>")
    rows, _ = extract_spans(html)
    kinds = [r["kind"] for r in rows]
    assert "list_group" in kinds
    assert sum(k.startswith("list_item") for k in kinds) == 3


def test_boiler_class_inside_content_dropped():
    html = (
        "<html><body><main>"
        "<p>keep me</p>"
        '<div class="ad-unit"><p>buy things</p></div>'
        '<div id="comments-42"><p>first!</p></div>'
        "<p>also keep</p>"
        "</main></body></html>")
    rows, _ = extract_spans(html)
    assert [r["text"] for r in rows] == ["keep me", "also keep"]


def test_figure_with_chartish_class_not_dropped():
    html = (
        "<html><body><main>"
        '<figure class="fig-chart chart-bar_chart">'
        '<img src="media/c1.png" alt="">'
        '<table class="chart-data"><tr><td>1</td><td>2</td></tr></table>'
        "</figure></main></body></html>")
    rows, _ = extract_spans(html)
    assert rows[0]["kind"] == "chart:bar_chart"
    assert rows[0]["media_ref"] == "c1"
    assert "<fcel>1<fcel>2<nl>" == rows[0]["text"]


def test_malformed_html_total():
    """Unclosed/mis-nested tags must not crash or loop."""
    html = ("<html><body><main><p>one<p>two<b>bold"
            "<ul><li>item<li>item2</main>")
    rows, _ = extract_spans(html)
    texts = [r["text"] for r in rows]
    assert "one" in texts
    assert any("item" in t for t in texts)


def test_empty_and_chrome_only_pages():
    assert extract_spans("")[0] == []
    html = ("<html><body><nav><a href='/'>home</a></nav>"
            "<footer>c</footer></body></html>")
    rows, stats = extract_spans(html)
    assert rows == []
    assert stats["content_chars"] == 0


def test_semantic_alias_tags():
    """strong/em/del aliases map to the same fmt flags as b/i/s."""
    html = ("<html><body><main>"
            "<p><strong><em>both</em></strong></p>"
            "<p><del>gone</del></p>"
            "</main></body></html>")
    rows, _ = extract_spans(html)
    assert rows[0]["kind"] == "text+fmt=bi"
    assert rows[1]["kind"] == "text+fmt=s"


def test_parse_html_tree_shape():
    root = parse_html("<html><body><div id='a'><p>x</p></div></body></html>")
    body = root.children[0].children[0]
    assert body.tag == "body"
    assert body.children[0].attrs["id"] == "a"


def test_origin_meta_roundtrip():
    spans = gen_doc_spans(4, seed=42)
    html = render_page_html("doc_4", spans)
    rows, _ = extract_spans(html)
    origin = [r for r in rows if str(r["kind"]).startswith("origin:")]
    assert len(origin) == 1
    assert str(origin[0]["text"]).endswith(".pdf")
    assert origin[0]["media_ref"] == "application/pdf"
    assert origin[0]["offset"] == 0


# ----------------------------------------------------------------------
# Spark-side equivalence (distributed == single-process == projection)
# ----------------------------------------------------------------------

def test_spark_extract_matches_projection(spark):
    import pandas as pd

    from docling_core_spark.engine import synth_documents
    from docling_core_spark.extraction.spark import (
        extract_pages,
        render_pages,
    )

    docs = synth_documents(spark, 40, seed=42)
    got = (extract_pages(render_pages(docs))
           .toPandas()
           .sort_values(["doc_id", "ord"])
           .reset_index(drop=True))
    exp_rows = []
    for i in range(40):
        for r in project_for_html(gen_doc_spans(i, seed=42)):
            exp_rows.append({"doc_id": f"doc_{i:012d}",
                             "ord": r["offset"], "kind": r["kind"],
                             "text": r["text"],
                             "media_ref": r["media_ref"]})
    want = (pd.DataFrame(exp_rows)
            .sort_values(["doc_id", "ord"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype({"ord": "int64"}), want.astype({"ord": "int64"}))


def test_hostile_nesting_depth_is_total():
    """50k-deep nesting must not blow the recursion limit anywhere in
    parse -> prune -> emit."""
    deep = ("<html><body><main>" + "<div>" * 50_000
            + "<p>needle</p>" + "</div>" * 50_000
            + "<p>after</p></main></body></html>")
    rows, stats = extract_spans(deep)
    texts = [r["text"] for r in rows]
    assert "after" in texts  # content outside the capped chain survives
    assert stats["page_chars"] >= len("needleafter")


def test_hostile_many_siblings_total():
    html = ("<html><body><main>"
            + "".join(f"<p>p{i}</p>" for i in range(20_000))
            + "</main></body></html>")
    rows, _ = extract_spans(html)
    assert len(rows) == 20_000
    assert rows[0]["text"] == "p0" and rows[-1]["text"] == "p19999"


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5, 1000, 31337])
def test_roundtrip_parity_seed_sweep(seed):
    """Wider fuzz: 25 docs per seed across arbitrary generator seeds."""
    for doc_index in range(25):
        got, want, _, _ = _roundtrip(doc_index, seed=seed)
        assert _triples(got) == _triples(want), (seed, doc_index)


def test_origin_uri_roundtrip():
    """origin:BH:URI spans carry the uri through the page meta tags."""
    spans = [
        {"kind": "origin:123456789:https://ex.org/src.pdf",
         "text": "src.pdf", "media_ref": "application/pdf", "offset": 0},
        {"kind": "title", "text": "A Title", "media_ref": "",
         "offset": 1},
        {"kind": "text", "text": "body text here", "media_ref": "",
         "offset": 2},
    ]
    html = render_page_html("d", spans)
    rows, _ = extract_spans(html)
    assert rows[0]["kind"] == "origin:123456789:https://ex.org/src.pdf"
    assert rows[0]["text"] == "src.pdf"
    assert _triples(rows) == _triples(project_for_html(spans))


def test_image_refs_survive_page_roundtrip():
    """ImageRef-bearing pictures (S9) publish their real uri + pixel
    size on the page and come back normalized (dpi -> 72, mimetype
    from the uri): the extraction tier composes with re-homing."""
    from docling_core_spark.mediaops import _payload_for
    from docling_core_spark.model.spans import parse_image_ref
    from docling_core_spark.rehome import attach_file_images, embed_spans

    for doc_index in (3, 7, 42):
        spans = attach_file_images(gen_doc_spans(doc_index, seed=42))
        refs = {s["media_ref"] for s in spans
                if s["kind"].split(":", 1)[0] in ("picture", "chart")
                and s["media_ref"]}
        if not refs:
            continue
        for variant in ("file", "data"):
            use = spans if variant == "file" else embed_spans(
                spans, {m: _payload_for(m) for m in refs})
            html = render_page_html(f"doc_{doc_index}", use)
            got, _ = extract_spans(html)
            want = project_for_html(use)
            assert _triples(got) == _triples(want), (doc_index, variant)
            imgs = [parse_image_ref(str(r["text"]))[1] for r in got
                    if str(r["kind"]).split(":", 1)[0]
                    in ("picture", "chart")]
            assert imgs and all(i is not None for i in imgs)
            assert all(i["dpi"] == 72 for i in imgs)
            if variant == "data":
                assert all(str(i["uri"]).startswith("data:image/png")
                           for i in imgs)


def test_extract_then_rehome_reference_payloads():
    """Full tier composition: attach -> embed -> publish page ->
    extract -> reference-pass writes the ORIGINAL media bytes."""
    import hashlib

    from docling_core_spark.mediaops import _payload_for
    from docling_core_spark.rehome import (
        attach_file_images,
        embed_spans,
        reference_spans,
    )

    spans = attach_file_images(gen_doc_spans(3, seed=42))
    refs = {s["media_ref"] for s in spans
            if s["kind"].split(":", 1)[0] in ("picture", "chart")
            and s["media_ref"]}
    payloads = {m: _payload_for(m) for m in refs}
    embedded = embed_spans(spans, payloads)
    html = render_page_html("doc_3", embedded)
    extracted, _ = extract_spans(html)
    _, files = reference_spans(extracted, "artifacts")
    assert sorted(p for _, p in files) == sorted(payloads.values())
    for path, payload in files:
        assert hashlib.sha256(payload).hexdigest() in path


# ----------------------------------------------------------------------
# code-review regressions (round 2): adversarial attrs/spans, nested
# figures, attached block children, heading-level clamp
# ----------------------------------------------------------------------

def test_valueless_attributes_total():
    html = ('<html><body><main><p class>x</p>'
            '<figure class="fig-picture"><img src></figure>'
            '</main></body></html>')
    rows, _ = extract_spans(html)
    assert rows[0] == {"kind": "text", "text": "x", "media_ref": "",
                      "offset": 0}


def test_hostile_rowspan_bounded():
    import time

    t0 = time.perf_counter()
    rows, _ = extract_spans(
        '<html><body><main><table><tr>'
        '<td rowspan="99999999" colspan="99999999">x</td>'
        '</tr></table></main></body></html>')
    assert time.perf_counter() - t0 < 5.0
    assert rows and rows[0]["kind"] == "table"
    rows2, _ = extract_spans(
        '<html><body><main><table><tr><td rowspan="x">a</td>'
        '<td>b</td></tr></table></main></body></html>')
    assert rows2[0]["text"] == "<fcel>a<fcel>b<nl>"


def test_percent_width_image_total():
    rows, _ = extract_spans(
        '<html><body><main><figure class="fig-picture">'
        '<img id="m1" src="a.png" width="50%"></figure>'
        "</main></body></html>")
    assert rows[0]["media_ref"] == "m1"
    assert '"width":0.0' in rows[0]["text"]


def _rt(spans):
    got = [(r["kind"], r["text"], r["media_ref"])
           for r in extract_spans(render_page_html("d", spans))[0]]
    want = [(r["kind"], r["text"], r["media_ref"])
            for r in project_for_html(spans)]
    return got, want


def test_nested_child_picture_keeps_table_identity():
    spans = [
        {"kind": "table", "text": "<fcel>a<nl>", "media_ref": "t1",
         "offset": 0},
        {"kind": "picture+child", "text": "", "media_ref": "m1",
         "offset": 1},
        {"kind": "caption:t1", "text": "cap", "media_ref": "",
         "offset": 2},
    ]
    got, want = _rt(spans)
    assert got == want
    assert got[0][2] == "t1" and got[1][0] == "picture+child"


def test_text_item_with_block_children_roundtrip():
    spans = [
        {"kind": "text", "text": "hello", "media_ref": "", "offset": 0},
        {"kind": "list_group:of_prev", "text": "", "media_ref": "",
         "offset": 1},
        {"kind": "list_item", "text": "a", "media_ref": "", "offset": 2},
        {"kind": "end_group", "text": "", "media_ref": "", "offset": 3},
    ]
    got, want = _rt(spans)
    assert got == want and got[1][0] == "list_group:of_prev"


def test_heading_with_nongroup_child_roundtrip():
    spans = [
        {"kind": "section_header:2", "text": "head", "media_ref": "",
         "offset": 0},
        {"kind": "text+child", "text": "kid", "media_ref": "",
         "offset": 1},
    ]
    got, want = _rt(spans)
    assert got == want and got[1][0] == "text+child"


def test_section_level_clamped_to_h6():
    spans = [{"kind": "section_header:7", "text": "deep",
              "media_ref": "", "offset": 0}]
    got, want = _rt(spans)
    assert got == want == [("section_header:5", "deep", "")]


def test_empty_media_ref_picture_stays_unreferenced():
    spans = [{"kind": "picture", "text": "", "media_ref": "",
              "offset": 0}]
    got, want = _rt(spans)
    assert got == want == [("picture", "", "")]
