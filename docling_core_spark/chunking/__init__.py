"""Chunkers: hierarchical (layout) + hybrid (token-aware) + page."""

from docling_core_spark.chunking.hierarchical import (  # noqa: F401
    Chunk,
    contextualize,
    hierarchical_chunk,
)
from docling_core_spark.chunking.hybrid import hybrid_chunk  # noqa: F401
from docling_core_spark.chunking.tokenizer import RegexTokenizer  # noqa: F401
from docling_core_spark.chunking.wordpiece import (  # noqa: F401
    BytePairCounter,
    RecordedCounter,
    WordPieceCounter,
)
