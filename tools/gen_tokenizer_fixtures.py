#!/usr/bin/env python
"""Generate the vendored tokenizer assets in docling_core_spark/assets/.

The container has no network and no published vocab.txt/.tiktoken file
on disk, so the real-algorithm driver query (token_counts_real) ships
DETERMINISTIC, corpus-derived assets instead:

* ``wordpiece_vocab.txt`` - BERT-format vocab (one token per line,
  index = id). Built so greedy longest-match-first WordPiece is
  genuinely exercised: every second frequent corpus word is present
  whole, the others only as a 3-char stem + ``##`` continuation, and
  single characters (+ ``##`` variants) provide the char-level
  fallback exactly like the published bert-base-uncased layout.
* ``bpe_ranks.tiktoken`` - tiktoken-format ranks file (base64 token +
  rank per line) TRAINED here with the textbook BPE procedure
  (iterate: count adjacent pairs over the pre-split corpus, merge the
  most frequent, deterministic tie-break) over the sf0.01 documents
  text, 384 merges on top of the 256 byte alphabet.

Regeneration is idempotent given the same testdata; assets are
committed so every sf / driver run uses the identical frozen files.

Usage: python tools/gen_tokenizer_fixtures.py [sf_dir]
"""

from __future__ import annotations

import base64
import collections
import os
import string
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

ASSETS = os.path.join(ROOT, "docling_core_spark", "assets")
N_MERGES = 384
N_TOP_WORDS = 80


def corpus_texts(sf_dir: str) -> list:
    import duckdb

    return [r[0] for r in duckdb.sql(
        "SELECT text FROM read_parquet("
        f"'{sf_dir}/documents.parquet') ORDER BY doc_id").fetchall()]


def build_wordpiece_vocab(texts: list) -> list:
    freq = collections.Counter()
    for t in texts:
        freq.update(t.split())
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    # char-level fallback: ascii letters/digits + ## continuations
    chars = list(string.ascii_lowercase) + list(string.digits)
    vocab += chars + ["##" + c for c in chars]
    vocab += list("!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~")
    top = [w for w, _ in sorted(freq.items(),
                                key=lambda kv: (-kv[1], kv[0]))]
    for rank, w in enumerate(top[:N_TOP_WORDS]):
        if len(w) <= 3 or rank % 2 == 0:
            piece_set = [w]
        else:
            # stem + continuation only: forces a 2-piece greedy split
            piece_set = [w[:3], "##" + w[3:]]
        for p in piece_set:
            if p not in vocab:
                vocab.append(p)
    return vocab


def train_bpe_ranks(texts: list) -> dict:
    """Textbook byte-level BPE training over the engine's pre-split
    pieces; returns token-bytes -> rank (0..255 byte alphabet first,
    merges after, like every published tiktoken file)."""
    from docling_core_spark.chunking.wordpiece import _bpe_split_re

    pat = _bpe_split_re()
    words = collections.Counter()
    for t in texts:
        for m in pat.finditer(t):
            words[m.group().encode("utf-8")] += 1
    # each word as a tuple of single-byte parts
    seqs = {w: [w[i:i + 1] for i in range(len(w))]
            for w in words}
    ranks = {bytes([b]): b for b in range(256)}
    next_rank = 256
    for _ in range(N_MERGES):
        pair_counts = collections.Counter()
        for w, parts in seqs.items():
            c = words[w]
            for i in range(len(parts) - 1):
                pair_counts[(parts[i], parts[i + 1])] += c
        if not pair_counts:
            break
        # deterministic: max count, then lexicographically smallest
        best = min(pair_counts.items(),
                   key=lambda kv: (-kv[1], kv[0]))[0]
        merged = best[0] + best[1]
        # two merge paths can produce identical bytes (e.g. 'aaa'+'a'
        # and 'aa'+'aa'); reuse the existing rank, still collapse the
        # pair in the working sequences, and keep training
        if merged not in ranks:
            ranks[merged] = next_rank
            next_rank += 1
        for w, parts in seqs.items():
            i = 0
            while i < len(parts) - 1:
                if parts[i] == best[0] and parts[i + 1] == best[1]:
                    parts[i:i + 2] = [merged]
                else:
                    i += 1
    return ranks


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    texts = corpus_texts(sf_dir)
    os.makedirs(ASSETS, exist_ok=True)

    vocab = build_wordpiece_vocab(texts)
    with open(os.path.join(ASSETS, "wordpiece_vocab.txt"), "w",
              encoding="utf-8") as fh:
        fh.write("\n".join(vocab) + "\n")
    print(f"wordpiece_vocab.txt: {len(vocab)} tokens")

    ranks = train_bpe_ranks(texts)
    lines = [f"{base64.b64encode(tok).decode()} {rank}"
             for tok, rank in sorted(ranks.items(), key=lambda kv: kv[1])]
    with open(os.path.join(ASSETS, "bpe_ranks.tiktoken"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"bpe_ranks.tiktoken: {len(ranks)} ranks")


if __name__ == "__main__":
    main()
