from .keys import upload_id_col, ISO_TS_FORMAT  # noqa: F401
from .json_codec import decode_queue_message, encode_queue_message  # noqa: F401
from .text import (  # noqa: F401
    normalize_text_col,
    token_count_col,
    tokens_col,
    content_hash_col,
    quality_score_cols,
    lang_id_col,
    rolling_fingerprint_col,
)
from .vectors import cosine_similarity_col, dot_col, l2_norm_col  # noqa: F401
