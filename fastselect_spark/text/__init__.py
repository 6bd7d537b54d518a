from fastselect_spark.text.analysis import (  # noqa: F401
    add_language_id,
    add_quality_score,
    add_token_count,
    add_fingerprint,
    add_stopword_ratio,
)
from fastselect_spark.text.repetition import (  # noqa: F401
    add_repetition_stats,
    repetition_filter,
)
from fastselect_spark.text.tfidf import top_tfidf_terms  # noqa: F401
from fastselect_spark.text.vocab import (  # noqa: F401
    token_counts,
    top_terms_per_group,
    vocab_topk,
)
from fastselect_spark.text.pii import detect_pii, redact_pii  # noqa: F401
from fastselect_spark.text.bm25 import bm25_topk  # noqa: F401
from fastselect_spark.text.clean import clean_text, clean_text_kernel  # noqa: F401
from fastselect_spark.text.hashing import hashed_term_vectors  # noqa: F401
