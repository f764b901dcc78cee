"""token_counts_real: the engine's real tokenizer algorithms
(chunking/wordpiece.py) must equal the INDEPENDENT oracle
reimplementation (pyoracle: trie-based WordPiece, heap-based BPE) on
the vendored assets - including inputs far outside the corpus."""

from __future__ import annotations

import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from docling_core_spark.chunking.wordpiece import (
    BytePairCounter,
    WordPieceCounter,
)
from docling_core_spark.pyoracle import (
    _load_assets,
    build_wp_trie,
    oracle_bpe_count,
    oracle_wordpiece_count,
)

ASSETS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docling_core_spark", "assets")


@pytest.fixture(scope="module")
def counters():
    wp = WordPieceCounter.from_vocab_file(
        os.path.join(ASSETS, "wordpiece_vocab.txt"))
    bpe = BytePairCounter.from_tiktoken_file(
        os.path.join(ASSETS, "bpe_ranks.tiktoken"))
    vocab, ranks = _load_assets()
    return wp, bpe, build_wp_trie(vocab), ranks


TRICKY = [
    "",
    "   ",
    "key agg row scan slow fast table value part hash",
    "customer window column order stream",  # split-piece words
    "Table SCAN Spark",  # casing
    "café naïve Über",  # accents -> NFD strip
    "中文 mixed 汉字text",  # CJK isolation
    "a,b.c:d;e(f)g<h>i&j_k",  # punctuation splits
    "x² + y¼ = Ⅲ",  # No/Nl digits (BPE pre-split)
    "nul\x00char \x07bell �repl",  # drops
    "tab\tnl\ncr\r mix",
    "a" * 101,  # over max_chars -> [UNK]
    "a" * 100,
    "zzzzqqqq unknownword",
    "don't it's we'll I've THEY'RE",  # BPE contraction branch
    "  leading trailing  ",
    "İstanbul",  # dotted capital I lowercasing
    "123 4567 12345",
]


def test_wordpiece_engine_equals_oracle(counters):
    wp, _, tries, _ = counters
    for text in TRICKY:
        assert wp.count_tokens(text) == oracle_wordpiece_count(
            text, tries), repr(text)


def test_bpe_engine_equals_oracle(counters):
    _, bpe, _, ranks = counters
    for text in TRICKY:
        assert bpe.count_tokens(text) == oracle_bpe_count(
            text, ranks), repr(text)


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=60))
def test_wordpiece_fuzz(text):
    wp = WordPieceCounter.from_vocab_file(
        os.path.join(ASSETS, "wordpiece_vocab.txt"))
    vocab, _ = _load_assets()
    assert wp.count_tokens(text) == oracle_wordpiece_count(
        text, build_wp_trie(vocab))


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=60))
def test_bpe_fuzz(text):
    bpe = BytePairCounter.from_tiktoken_file(
        os.path.join(ASSETS, "bpe_ranks.tiktoken"))
    _, ranks = _load_assets()
    assert bpe.count_tokens(text) == oracle_bpe_count(text, ranks)


def test_counts_are_not_degenerate(counters):
    """The vendored vocab must actually exercise subword splitting:
    corpus words designed as stem+continuation count 2, whole words 1,
    and nothing collapses to a single [UNK] per document."""
    wp, bpe, _, _ = counters
    assert wp.count_tokens("customer") == 1  # whole-word vocab entry
    assert wp.count_tokens("table") == 2     # tab|##le greedy split
    assert wp.count_tokens("zzzzqqqq") == 8  # char-level fallback
    assert wp.count_tokens("ξξξ") == 1       # no vocab path -> [UNK]
    assert bpe.count_tokens("table scan") < len("table scan")


# ----------------------------------------------------------------------
# asset-path contract (r3 verdict item 3): token_counts_real must work
# with ANY published-format assets loaded BY PATH, not just the
# vendored corpus-derived fixtures - including shipping them to
# executors via sc.addFile (the spark-submit --files mechanism).
# ----------------------------------------------------------------------

def _write_external_assets(tmp_path):
    """A small but non-trivial vocab/ranks pair in the PUBLISHED
    formats: bert vocab.txt (one token per line, id = line number)
    and .tiktoken (base64 token + rank per line)."""
    import base64

    singles = [chr(c) for c in range(ord("a"), ord("z") + 1)]
    vocab = (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
             + singles + ["##" + c for c in singles]
             + ["the", "of", "and", "table", "scan", "spark",
                "customer", "window", "column", "order", "stream"]
             + ["##s", "##ing", "##le", "##er", "##an"]
             + [str(d) for d in range(10)] + [",", ".", ":", ";"])
    vp = tmp_path / "ext_vocab.txt"
    vp.write_text("\n".join(vocab) + "\n", encoding="utf-8")

    ranks = {bytes([b]): b for b in range(256)}
    nxt = 256
    for merge in (b"th", b"he", b"the", b"an", b"and", b"ta", b"ab",
                  b"le", b"tab", b"table", b" t", b" a", b"er",
                  b"in", b"ing", b"sc", b"can", b"scan"):
        ranks[merge] = nxt
        nxt += 1
    rp = tmp_path / "ext_ranks.tiktoken"
    rp.write_bytes(b"".join(
        base64.b64encode(t) + b" " + str(r).encode() + b"\n"
        for t, r in ranks.items()))
    return str(vp), str(rp), vocab, ranks


def test_external_assets_by_path(tmp_path):
    """Counters built from external published-format files must equal
    the independent oracle run on the same files."""
    vp, rp, vocab, ranks = _write_external_assets(tmp_path)
    wp = WordPieceCounter.from_vocab_file(vp)
    bpe = BytePairCounter.from_tiktoken_file(rp)
    tries = build_wp_trie(vocab)
    for text in TRICKY + ["the table scan and the stream"]:
        assert wp.count_tokens(text) == oracle_wordpiece_count(
            text, tries), repr(text)
        assert bpe.count_tokens(text) == oracle_bpe_count(
            text, ranks), repr(text)


def test_token_counts_real_external_assets_end_to_end(
        spark, tmp_path, monkeypatch):
    """q_token_counts_real with overridden assets, exercising BOTH
    worker-side resolution branches: the wp vocab by direct path, the
    bpe ranks through SparkFiles (sc.addFile ship + a driver path that
    does not exist on the 'executor'). Counts must equal the
    independent oracle computed with the same external assets."""
    import pyarrow.parquet as pq

    from docling_core_spark.queries import q_token_counts_real

    vp, rp, vocab, ranks = _write_external_assets(tmp_path)
    spark.sparkContext.addFile(rp)
    monkeypatch.setenv("DOCLING_SPARK_WP_VOCAB", vp)
    monkeypatch.setenv("DOCLING_SPARK_BPE_RANKS",
                       "/nonexistent_on_executor/ext_ranks.tiktoken")

    sf = "/root/testdata/sf0.001"
    got = {r["doc_id"]: (r["wp_tokens"], r["bpe_tokens"])
           for r in q_token_counts_real(spark, sf).collect()}

    tries = build_wp_trie(vocab)
    t = pq.read_table(os.path.join(sf, "documents.parquet"),
                      columns=["doc_id", "text"])
    want = {int(i): (oracle_wordpiece_count(x, tries),
                     oracle_bpe_count(x, ranks))
            for i, x in zip(t.column("doc_id").to_pylist(),
                            t.column("text").to_pylist())}
    assert got == want
    # and the overridden counts differ from the vendored-asset run
    monkeypatch.delenv("DOCLING_SPARK_WP_VOCAB")
    monkeypatch.delenv("DOCLING_SPARK_BPE_RANKS")
    vend = {r["doc_id"]: (r["wp_tokens"], r["bpe_tokens"])
            for r in q_token_counts_real(spark, sf).collect()}
    assert vend != got
