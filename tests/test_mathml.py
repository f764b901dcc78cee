"""MathML conversion (E3 formula path) pinned three ways:

1. BYTE-equality of the converter output against the reference's
   committed goldens, which were generated with the REAL latex2mathml
   package (test/data/docling_document/export/formula_mathml.html,
   test/data/doc/constructed_doc*.html) - the ground truth a stock
   reference install produces.
2. Engine export_to_html == LIVE reference export_to_html with the
   reference's serializer driven through the same converter
   (tests/refstubs.py wiring) across the corpus.
3. Fallback behavior: unsupported grammar -> <pre>, the reference's
   exception branch, on both sides.
"""

from __future__ import annotations

import re
import warnings

import tests.refstubs  # noqa: F401
from tests.oracle import build_doc, reference_html

from docling_core_spark.corpus import gen_doc_spans
from docling_core_spark.mathml import convert_formula
from docling_core_spark.model.spans import doc_from_spans
from docling_core_spark.serializers.html import export_to_html

warnings.filterwarnings("ignore")

REF = "/root/reference"


def test_frac_matches_committed_golden_file():
    """The whole-document HTML export must equal the golden the real
    latex2mathml produced (reference test_docling_doc.py:1189)."""
    with open(f"{REF}/test/data/docling_document/export/"
              "formula_mathml.html", encoding="utf8") as fh:
        gt = fh.read().rstrip()
    doc = doc_from_spans("Dummy", [("formula", r"\frac{1}{x}", "", 0)])
    got = export_to_html(doc, html_head="")
    assert got == gt


def test_emc2_matches_constructed_doc_golden_fragments():
    """constructed_doc.html carries the real-latex2mathml inline AND
    block renderings of E=mc^2; the converter must emit those bytes."""
    with open(f"{REF}/test/data/doc/constructed_doc.html",
              encoding="utf8") as fh:
        gt = fh.read()
    frags = re.findall(r"<math .*?</math>", gt)
    assert convert_formula("E=mc^2", "inline") in frags
    assert convert_formula("E=mc^2", "block") in frags


def test_corpus_html_parity_with_live_reference():
    """Engine HTML export == live reference export (reference driven
    through the shared converter) on every corpus doc with formulas."""
    checked = 0
    for i in range(24):
        spans = gen_doc_spans(i, seed=42)
        if not any(s["kind"].startswith("formula") for s in spans):
            continue
        checked += 1
        doc, _ = build_doc("d", spans)
        exp = reference_html(doc)
        got = export_to_html(doc_from_spans(
            "d", [(s["kind"], s["text"], s["media_ref"], s["offset"])
                  for s in spans]))
        assert got == exp, f"doc {i}"
    assert checked >= 5


def test_unsupported_grammar_falls_back_to_pre():
    spans = [{"kind": "formula", "text": r"\oint_C f(z)\,dz",
              "media_ref": "", "offset": 0}]
    doc, _ = build_doc("d", spans)
    exp = reference_html(doc)
    got = export_to_html(doc_from_spans(
        "d", [(r["kind"], r["text"], r["media_ref"], r["offset"])
              for r in spans]))
    assert got == exp
    assert r"<pre>\oint_C f(z)\,dz</pre>" in got


def test_converter_subset_table():
    assert convert_formula("x_i", "inline") == (
        '<math xmlns="http://www.w3.org/1998/Math/MathML" '
        'display="inline"><mrow><msub><mi>x</mi><mi>i</mi></msub>'
        '</mrow><annotation encoding="TeX">x_i</annotation></math>')
    # movable limits: \sum_a^b -> munderover
    s = convert_formula(r"\sum_a^b x", "block")
    assert "<munderover><mo>&#x02211;</mo><mi>a</mi><mi>b</mi>" in s
    # greek + operator references are 5-hex-digit
    s = convert_formula(r"\alpha+1", "inline")
    assert "<mi>&#x003B1;</mi><mo>&#x0002B;</mo><mn>1</mn>" in s
    # unsupported -> None
    assert convert_formula("f(x)", "inline") is None
    assert convert_formula(r"\unknowncmd x", "inline") is None
    assert convert_formula("", "inline") is None
