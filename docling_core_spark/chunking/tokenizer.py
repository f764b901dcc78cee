"""Deterministic tokenizers for token-aware chunking.

The reference delegates token counting to HuggingFace fast tokenizers or
tiktoken (transforms/chunker/tokenizer/{huggingface,openai}.py). Those
require model downloads, so this engine ships a self-contained,
deterministic "BPE-ish" regex tokenizer (per the task brief's
token-counting spec) that both the Spark engine and the oracle use:
words are split into <=4-char alphanumeric pieces, every other
non-space character is one token - a crude subword approximation that
is fully reproducible on any executor with zero model assets.

HF/tiktoken counting can be swapped in by passing any object with
``count_tokens(text) -> int`` and ``get_max_tokens() -> int``; the
chunking algorithms only use this interface
(tokenizer/base.py:9-25).
"""

from __future__ import annotations

import re

_PIECE_RE = re.compile(r"[A-Za-z0-9]{1,4}|[^\sA-Za-z0-9]")


class RegexTokenizer:
    """Deterministic subword-approximating tokenizer.

    ``whitespace_separable`` declares the exact identity
    ``count(a + WS + b) == count(a) + count(b)`` for any whitespace WS:
    no token piece of this grammar can span whitespace. The hybrid
    chunker exploits it to replace the reference's quadratic
    re-serialize/re-count window loop (hybrid_chunker.py:189-296,
    SURVEY §4.2 hazard 1) with cached per-item counts - bit-identical
    results, O(n) instead of O(n^2). Tokenizers without this property
    (real BPE) leave the flag False and get the exact reference-shaped
    slow path.
    """

    __slots__ = ("max_tokens",)

    whitespace_separable = True

    def __init__(self, max_tokens: int = 512) -> None:
        self.max_tokens = max_tokens

    def count_tokens(self, text: str) -> int:
        # token counting is the chunking hot path; the single
        # piece-level findall measures ~2x faster than a run-level
        # decomposition (one regex pass beats three, despite the extra
        # substring allocations)
        return len(_PIECE_RE.findall(text))

    def get_max_tokens(self) -> int:
        return self.max_tokens


class HuggingFaceTokenizer:
    """HF fast-tokenizer adapter (tokenizer/huggingface.py:30-53).

    Gated behind an import-try: ``transformers`` is not in this
    container, so construction raises NotImplementedError here; on a
    cluster with the wheel + model assets shipped via --py-files /
    --archives it becomes a drop-in ``count_tokens`` provider. Load
    once per executor (module-level cache) - never per batch
    (SURVEY §4.2 hazard 4)."""

    whitespace_separable = False  # real BPE merges across words
    _cache: dict = {}

    def __init__(self, model_name: str = "sentence-transformers/all-MiniLM-L6-v2",
                 max_tokens: int | None = None) -> None:
        try:
            from transformers import AutoTokenizer  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "transformers is not installed in this environment; "
                "ship it to executors (--py-files/--archives) or use "
                "RegexTokenizer") from exc
        if model_name not in self._cache:
            self._cache[model_name] = AutoTokenizer.from_pretrained(
                model_name)
        self._tok = self._cache[model_name]
        self.max_tokens = (max_tokens if max_tokens is not None
                           else getattr(self._tok, "model_max_length", 512))

    def count_tokens(self, text: str) -> int:
        return len(self._tok.tokenize(text))

    def get_max_tokens(self) -> int:
        return self.max_tokens


class TiktokenTokenizer:
    """tiktoken adapter (tokenizer/openai.py:24-26); same gating."""

    whitespace_separable = False
    _cache: dict = {}

    def __init__(self, encoding: str = "o200k_base",
                 max_tokens: int = 128 * 1024) -> None:
        try:
            import tiktoken  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "tiktoken is not installed in this environment") from exc
        if encoding not in self._cache:
            self._cache[encoding] = tiktoken.get_encoding(encoding)
        self._enc = self._cache[encoding]
        self.max_tokens = max_tokens

    def count_tokens(self, text: str) -> int:
        return len(self._enc.encode(text))

    def get_max_tokens(self) -> int:
        return self.max_tokens
