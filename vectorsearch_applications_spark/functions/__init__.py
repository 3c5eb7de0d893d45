from .text import tokenize, token_count, stable_hash64, TOKEN_PATTERN
from .vectors import dot, cosine_similarity, cosine_distance, l2_normalize

__all__ = [
    "tokenize",
    "token_count",
    "stable_hash64",
    "TOKEN_PATTERN",
    "dot",
    "cosine_similarity",
    "cosine_distance",
    "l2_normalize",
]
