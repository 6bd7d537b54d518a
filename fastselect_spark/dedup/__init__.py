from fastselect_spark.dedup.exact import (  # noqa: F401
    conversation_fingerprints,
    dedup_exact,
    dedup_turns_within_conversation,
    duplicate_conversations,
    exact_duplicate_groups,
)
from fastselect_spark.dedup.minhash import (  # noqa: F401
    add_minhash_signature,
    minhash_near_duplicates,
)
from fastselect_spark.dedup.simhash import add_simhash, simhash_near_duplicates  # noqa: F401
from fastselect_spark.dedup.ngram import (  # noqa: F401
    ngram_containment_pairs,
    ngram_jaccard_pairs,
    prefix_filter_jaccard_pairs,
)
from fastselect_spark.dedup.spans import (  # noqa: F401
    explode_spans,
    remove_duplicate_spans,
)
from fastselect_spark.dedup.embedding import embedding_near_duplicates  # noqa: F401
from fastselect_spark.dedup.semdedup import (  # noqa: F401
    semantic_dedup,
    semantic_dedup_keep,
)
from fastselect_spark.dedup.components import (  # noqa: F401
    connected_components,
    connected_components_star,
    duplicate_clusters,
)
