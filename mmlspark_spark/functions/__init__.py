from mmlspark_spark.functions.text_quality import (
    avg_token_length,
    quality_columns,
    stopword_ratio,
    token_count,
    tokens,
    word_shingles,
)
from mmlspark_spark.functions.vector import (
    cosine_similarity,
    get_value_at,
    slice_vector,
    to_vector,
    vector_zip,
)

__all__ = [
    "avg_token_length", "quality_columns", "stopword_ratio", "token_count",
    "tokens", "word_shingles",
    "cosine_similarity", "get_value_at", "slice_vector", "to_vector", "vector_zip",
]
