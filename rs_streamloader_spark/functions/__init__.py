from rs_streamloader_spark.functions.text_functions import (
    bpe_ish_tokens,
    marker_word_count,
    n_tokens,
    quality_score,
)
from rs_streamloader_spark.functions.vector import cosine_expr, dot_expr, norm_expr

__all__ = [
    "bpe_ish_tokens",
    "cosine_expr",
    "dot_expr",
    "marker_word_count",
    "n_tokens",
    "norm_expr",
    "quality_score",
]
