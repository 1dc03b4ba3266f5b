from bigdatalab_spark.functions.text import (
    char_shingles,
    normalize_text,
    token_count,
    tokenize,
    word_shingles,
)

__all__ = [
    "char_shingles",
    "normalize_text",
    "token_count",
    "tokenize",
    "word_shingles",
]
