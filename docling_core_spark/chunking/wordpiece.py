"""Real tokenizer algorithms for token-aware chunking (C5).

The reference counts tokens with HuggingFace fast tokenizers
(tokenizer/huggingface.py:51-53, ``len(tokenizer.tokenize(text))``) or
tiktoken (tokenizer/openai.py:24-26). Neither package nor any model
asset is available in this environment, so this module implements the
two underlying ALGORITHMS from scratch:

* :class:`WordPieceCounter` - BERT-style tokenization: basic-tokenizer
  pre-splitting (control-char cleanup, optional lowercase + NFD accent
  stripping, CJK isolation, punctuation splitting) followed by greedy
  longest-match-first WordPiece with ``##`` continuations. Loaded with
  the published bert-base-uncased ``vocab.txt`` (ship via --py-files /
  --archives), its counts are exactly what
  ``AutoTokenizer.from_pretrained("sentence-transformers/all-MiniLM-
  L6-v2").tokenize(text)`` yields - the tokenizer of the reference's
  own hybrid-chunker tests (test_hybrid_chunker.py).
* :class:`BytePairCounter` - byte-level BPE in the tiktoken style:
  regex pre-splitting, then lowest-rank-first pair merging over UTF-8
  bytes. Loaded with a published ``.tiktoken`` ranks file it reproduces
  ``len(tiktoken.encoding_for_model("gpt-4o").encode(text))``.
* :class:`RecordedCounter` - replays offline-captured per-text counts
  (for pinning goldens whose tokenizer assets cannot ship).

The algorithms are pinned by hand-computed fixtures in
tests/test_wordpiece.py; both classes satisfy the chunking tokenizer
interface (count_tokens/get_max_tokens) and are NOT whitespace-
separable, so the hybrid chunker takes its reference-shaped exact
path with them (chunking/hybrid.py).
"""

from __future__ import annotations

import re
import unicodedata
from typing import Dict, Iterable, List, Optional, Tuple

# ----------------------------------------------------------------------
# BERT basic tokenizer
# ----------------------------------------------------------------------


def _is_punctuation(ch: str) -> bool:
    cp = ord(ch)
    # ASCII ranges BERT treats as punctuation even when unicode says
    # otherwise ($, +, <, =, >, ^, `, |, ~)
    if (33 <= cp <= 47 or 58 <= cp <= 64 or 91 <= cp <= 96
            or 123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


def _is_cjk(cp: int) -> bool:
    return (0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF
            or 0x20000 <= cp <= 0x2A6DF or 0x2A700 <= cp <= 0x2B73F
            or 0x2B740 <= cp <= 0x2B81F or 0x2B820 <= cp <= 0x2CEAF
            or 0xF900 <= cp <= 0xFAFF or 0x2F800 <= cp <= 0x2FA1F)


def _is_control(ch: str) -> bool:
    # the HF fast tokenizer's BertNormalizer strips the whole
    # category-C group (Rust char::is_other: Cc/Cf/Co/Cn/Cs), not just
    # Cc/Cf like the slow Python BasicTokenizer - parity target is the
    # fast tokenizer (module docstring)
    if ch in ("\t", "\n", "\r"):
        return False
    return unicodedata.category(ch).startswith("C")


# count_tokens fast path: the per-char clean/CJK/space walk of
# basic_tokenize re-expressed as three compiled-regex passes (C speed),
# plus a raw-token -> piece-count memo that also absorbs the NFD
# normalization and punctuation split on repeats. tokenize() keeps the
# literal per-char reference walk; test_wordpiece pins fast == slow.
_CTRL_RE_C: Optional["re.Pattern[str]"] = None
# anything outside printable ASCII + tab/LF/CR needs the full clean
# path (C0/C1 controls, DEL, and every non-ASCII char incl. CJK)
_NON_PLAIN_RE = re.compile(r"[^\x20-\x7E\t\n\r]")
_CJK_RE = re.compile(
    "([一-鿿㐀-䶿"
    "\U00020000-\U0002a6df\U0002a700-\U0002b73f"
    "\U0002b740-\U0002b81f\U0002b820-\U0002ceaf"
    "豈-﫿\U0002f800-\U0002fa1f])")


def _ctrl_re() -> "re.Pattern[str]":
    """Matches exactly what basic_tokenize's clean loop drops: NUL,
    U+FFFD, and category C minus {tab, LF, CR} (built once per
    process by full-codepoint scan, same policy as _nlno_class)."""
    global _CTRL_RE_C
    if _CTRL_RE_C is None:
        import sys

        keep = {0x09, 0x0A, 0x0D}
        cps = [c for c in range(sys.maxunicode + 1)
               if c not in keep
               and (c == 0 or c == 0xFFFD
                    or unicodedata.category(chr(c)).startswith("C"))]
        parts: List[str] = []
        i = 0
        while i < len(cps):
            j = i
            while j + 1 < len(cps) and cps[j + 1] == cps[j] + 1:
                j += 1
            a, b = cps[i], cps[j]
            parts.append(f"\\U{a:08X}"
                         + (f"-\\U{b:08X}" if b > a else ""))
            i = j + 1
        _CTRL_RE_C = re.compile("[" + "".join(parts) + "]")
    return _CTRL_RE_C


# the only chars that are BOTH category C (deleted by the clean loop,
# checked first) and Unicode isspace (a split boundary if left in):
# VT FF FS GS RS US NEL. Stripping them up front makes split-then-
# clean-per-token equal to the reference's clean-then-split: every
# other deleted char is not a split boundary, and every other boundary
# char is not deleted.
_WS_CTRL_RE = re.compile("[\x0b\x0c\x1c-\x1f\x85]")


def _token_pieces(tok: str, vocab: Dict[str, int], unk: str,
                  lowercase: bool) -> int:
    """Piece count of one raw whitespace token (clean -> CJK-space ->
    lower/NFD -> punct split -> WordPiece). Pure function of the
    token; memoized by count_tokens. The giant category-C class costs
    ~85ns/char, so it runs only on tokens that are not printable
    ASCII - i.e. only on cache-missed non-plain tokens."""
    if _NON_PLAIN_RE.search(tok) is None:
        return _lower_punct_pieces(tok, vocab, unk, lowercase)
    return sum(
        _lower_punct_pieces(sub, vocab, unk, lowercase)
        for sub in _CJK_RE.sub(r" \g<0> ",
                               _ctrl_re().sub("", tok)).split())


def _lower_punct_pieces(token: str, vocab: Dict[str, int], unk: str,
                        lowercase: bool) -> int:
    """Piece count of one whitespace token: (lower + strip accents) ->
    punctuation split -> greedy WordPiece. Pure function of the token;
    memoized by the caller."""
    if lowercase:
        token = token.lower()
        token = "".join(c for c in unicodedata.normalize("NFD", token)
                        if unicodedata.category(c) != "Mn")
    n = 0
    cur: List[str] = []
    for ch in token:
        if _is_punctuation(ch):
            if cur:
                n += len(wordpiece_split("".join(cur), vocab, unk))
                cur = []
            n += len(wordpiece_split(ch, vocab, unk))
        else:
            cur.append(ch)
    if cur:
        n += len(wordpiece_split("".join(cur), vocab, unk))
    return n


def basic_tokenize(text: str, lowercase: bool = True) -> List[str]:
    """BERT BasicTokenizer: clean -> CJK-space -> whitespace split ->
    (lower + strip accents) -> punctuation split."""
    cleaned: List[str] = []
    for ch in text:
        cp = ord(ch)
        if cp == 0 or cp == 0xFFFD or _is_control(ch):
            continue
        if _is_cjk(cp):
            cleaned.append(f" {ch} ")
        elif ch.isspace():
            cleaned.append(" ")
        else:
            cleaned.append(ch)
    out: List[str] = []
    for token in "".join(cleaned).split():
        if lowercase:
            token = token.lower()
            token = "".join(c for c in unicodedata.normalize("NFD", token)
                            if unicodedata.category(c) != "Mn")
        # split on punctuation, keeping each punct char as its own token
        cur: List[str] = []
        for ch in token:
            if _is_punctuation(ch):
                if cur:
                    out.append("".join(cur))
                    cur = []
                out.append(ch)
            else:
                cur.append(ch)
        if cur:
            out.append("".join(cur))
    return out


def wordpiece_split(word: str, vocab: Dict[str, int], unk: str = "[UNK]",
                    max_chars: int = 100) -> List[str]:
    """Greedy longest-match-first WordPiece of one word."""
    if len(word) > max_chars:
        return [unk]
    pieces: List[str] = []
    start = 0
    n = len(word)
    while start < n:
        end = n
        cur = None
        while start < end:
            sub = word[start:end]
            if start > 0:
                sub = "##" + sub
            if sub in vocab:
                cur = sub
                break
            end -= 1
        if cur is None:
            return [unk]
        pieces.append(cur)
        start = end
    return pieces


class WordPieceCounter:
    """BERT/MiniLM-compatible WordPiece token counter.

    ``vocab`` is the published vocab.txt line list (index = id). The
    count equals ``len(tokenizer.tokenize(text))`` of the HF fast
    tokenizer for the same vocab/casing - the quantity the reference's
    HuggingFaceTokenizer feeds the hybrid chunker
    (tokenizer/huggingface.py:51-53)."""

    whitespace_separable = False  # '##' merges cross word boundaries? No -
    # but punctuation/number splits make count(a+' '+b) != count(a)+count(b)
    # in general only via [UNK] collapse; keep the exact slow path.

    def __init__(self, vocab: Iterable[str], lowercase: bool = True,
                 max_tokens: int = 512, unk: str = "[UNK]") -> None:
        self.vocab = {w: i for i, w in enumerate(vocab)}
        self.lowercase = lowercase
        self.max_tokens = max_tokens
        self.unk = unk
        # word -> piece count memo: wordpiece_split is a pure function
        # of the word, and corpus word frequency is Zipfian, so the
        # distinct-word working set is tiny next to the token stream.
        # Capped + wholesale-cleared to bound worker memory on
        # adversarial (all-unique-words) input.
        self._wc: Dict[str, int] = {}

    _WC_CAP = 1 << 20

    @classmethod
    def from_vocab_file(cls, path: str, **kw) -> "WordPieceCounter":
        with open(path, encoding="utf-8") as fh:
            return cls([line.rstrip("\n") for line in fh], **kw)

    def tokenize(self, text: str) -> List[str]:
        out: List[str] = []
        for word in basic_tokenize(text, self.lowercase):
            out.extend(wordpiece_split(word, self.vocab, self.unk))
        return out

    def count_tokens(self, text: str) -> int:
        wc = self._wc
        if len(wc) > self._WC_CAP:
            wc.clear()
        if _WS_CTRL_RE.search(text) is not None:
            text = _WS_CTRL_RE.sub("", text)
        n = 0
        for tok in text.split():
            c = wc.get(tok)
            if c is None:
                c = _token_pieces(tok, self.vocab, self.unk,
                                  self.lowercase)
                wc[tok] = c
            n += c
        return n

    def get_max_tokens(self) -> int:
        return self.max_tokens


# ----------------------------------------------------------------------
# byte-level BPE (tiktoken style)
# ----------------------------------------------------------------------

# GPT-4-family pre-tokenization pattern (cl100k_base, published in the
# tiktoken source). Python re lacks \p{L}/\p{N}; the translation:
#
# * \w = L* + Nd + Nl + No + '_', so [^\w\r\n]|_ is exactly
#   [^\r\n\p{L}\p{N}] and [^\s\w]|_ is [^\s\p{L}\p{N}];
# * \d = Nd only, so \p{N} needs the Nl/No codepoints added explicitly
#   (fractions like U+00BC, superscripts, Roman numerals) and \p{L}
#   ([^\W\d_]) needs them REMOVED - else 'x²' pre-splits as one
#   letter run where tiktoken splits ['x', '²'];
# * the optional one-char prefix before a letter run includes the
#   leading space, which is what glues " world"-style tokens together.
_NLNO_CLASS: Optional[str] = None
_BPE_SPLIT_RE_C: Optional["re.Pattern[str]"] = None


def _nlno_class() -> str:
    """Character-class body matching categories Nl + No (built once:
    a full codepoint scan is ~0.5 s, paid per worker process at first
    BytePairCounter use, never per batch)."""
    global _NLNO_CLASS
    if _NLNO_CLASS is None:
        import sys

        cps = [c for c in range(sys.maxunicode + 1)
               if unicodedata.category(chr(c)) in ("Nl", "No")]
        parts: List[str] = []
        i = 0
        while i < len(cps):
            j = i
            while j + 1 < len(cps) and cps[j + 1] == cps[j] + 1:
                j += 1
            a, b = cps[i], cps[j]
            parts.append(f"\\U{a:08X}"
                         + (f"-\\U{b:08X}" if b > a else ""))
            i = j + 1
        _NLNO_CLASS = "".join(parts)
    return _NLNO_CLASS


def _bpe_split_re() -> "re.Pattern[str]":
    global _BPE_SPLIT_RE_C
    if _BPE_SPLIT_RE_C is None:
        nlno = _nlno_class()
        _BPE_SPLIT_RE_C = re.compile(
            r"(?i:'(?:[sdmt]|ll|ve|re))"
            r"|(?:[^\w\r\n]|_)?" + rf"[^\W\d_{nlno}]+"
            rf"|[\d{nlno}]{{1,3}}"
            r"| ?(?:[^\s\w]|_)+[\r\n]*"
            r"|\s*[\r\n]+"
            r"|\s+(?!\S)"
            r"|\s+",
            re.UNICODE)
    return _BPE_SPLIT_RE_C


def bpe_merge_count(piece: bytes, ranks: Dict[bytes, int]) -> int:
    """Number of tokens one pre-split piece becomes under
    lowest-rank-first pair merging (the tiktoken core loop)."""
    if piece in ranks:
        return 1
    parts: List[bytes] = [piece[i:i + 1] for i in range(len(piece))]
    while len(parts) > 1:
        best_rank: Optional[int] = None
        best_i = -1
        for i in range(len(parts) - 1):
            r = ranks.get(parts[i] + parts[i + 1])
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        parts[best_i:best_i + 2] = [parts[best_i] + parts[best_i + 1]]
    return len(parts)


class BytePairCounter:
    """tiktoken-compatible byte-level BPE counter.

    ``ranks`` maps token bytes -> merge rank, the contents of a
    published ``.tiktoken`` file (base64 token + rank per line)."""

    whitespace_separable = False

    def __init__(self, ranks: Dict[bytes, int],
                 max_tokens: int = 128 * 1024) -> None:
        self.ranks = ranks
        self.max_tokens = max_tokens
        # pre-token -> merge count memo (bpe_merge_count is a pure
        # function of the piece); same cap/clear policy as
        # WordPieceCounter._wc.
        self._pc: Dict[str, int] = {}

    _PC_CAP = 1 << 20

    @classmethod
    def from_tiktoken_file(cls, path: str, **kw) -> "BytePairCounter":
        import base64

        ranks: Dict[bytes, int] = {}
        with open(path, "rb") as fh:
            for line in fh:
                if not line.strip():
                    continue
                tok, rank = line.split()
                ranks[base64.b64decode(tok)] = int(rank)
        return cls(ranks, **kw)

    def count_tokens(self, text: str) -> int:
        pc = self._pc
        if len(pc) > self._PC_CAP:
            pc.clear()
        n = 0
        for m in _bpe_split_re().finditer(text):
            g = m.group()
            c = pc.get(g)
            if c is None:
                c = bpe_merge_count(g.encode("utf-8"), self.ranks)
                pc[g] = c
            n += c
        return n

    def get_max_tokens(self) -> int:
        return self.max_tokens


# ----------------------------------------------------------------------
# recorded counts
# ----------------------------------------------------------------------

class RecordedCounter:
    """Replays offline-captured ``count_tokens`` values: for golden
    replays whose tokenizer assets cannot ship with the job. Unknown
    texts fall back to a provided counter (or raise)."""

    whitespace_separable = False

    def __init__(self, counts: Dict[str, int], max_tokens: int,
                 fallback=None) -> None:
        self.counts = dict(counts)
        self.max_tokens = max_tokens
        self.fallback = fallback

    def count_tokens(self, text: str) -> int:
        if text in self.counts:
            return self.counts[text]
        if self.fallback is not None:
            return self.fallback.count_tokens(text)
        raise KeyError(f"no recorded count for {text[:60]!r}...")

    def get_max_tokens(self) -> int:
        return self.max_tokens
