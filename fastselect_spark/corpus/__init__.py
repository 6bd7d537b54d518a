from fastselect_spark.corpus.sampling import (
    cap_per_source,
    deterministic_sample,
    sample_by_source,
)

__all__ = [
    "cap_per_source",
    "deterministic_sample",
    "sample_by_source",
]
