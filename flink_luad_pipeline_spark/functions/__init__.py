from .text import (  # noqa: F401
    lang_scores,
    normalize_text,
    quality_features,
    text_fingerprint,
    tokenize,
    word_shingles,
)
from .vectors import cosine_similarity, dot, l2_norm  # noqa: F401
