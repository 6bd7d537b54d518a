from fastselect_spark.corpus.classifier import (
    quality_scores,
    train_quality_classifier,
    train_quality_classifier_numpy,
)
from fastselect_spark.corpus.decontaminate import (
    bloom_contamination_hits,
    novelty_scores,
    contamination_hits,
    decontaminate,
)
from fastselect_spark.corpus.dsir import (
    dsir_logweights,
    dsir_select_top,
    hashed_ngram_distribution,
)
from fastselect_spark.corpus.calibration import calibration_report
from fastselect_spark.corpus.filtering import quality_filter
from fastselect_spark.corpus.lm import lm_perplexity, perplexity_tertiles
from fastselect_spark.corpus.packing import pack_sequences, truncate_to_token_budget
from fastselect_spark.corpus.pairs import contrastive_pairs, sft_pairs
from fastselect_spark.corpus.profile import profile_drift, table_profile
from fastselect_spark.corpus.sketches import (
    countmin_lookup,
    countmin_merge,
    countmin_sketch,
    hll_distinct,
    hll_distinct_sql,
    hll_estimate_from_registers,
    hll_merge,
    hll_register_rows,
)
from fastselect_spark.corpus.sampling import (
    cap_per_source,
    deterministic_sample,
    rebalance_classes,
    sample_by_source,
    sample_token_budget,
    source_mixture_report,
    train_val_test_split,
    weighted_sample,
)

__all__ = [
    "calibration_report",
    "cap_per_source",
    "countmin_lookup",
    "countmin_merge",
    "countmin_sketch",
    "hll_distinct",
    "hll_distinct_sql",
    "hll_estimate_from_registers",
    "hll_merge",
    "hll_register_rows",
    "contrastive_pairs",
    "bloom_contamination_hits",
    "contamination_hits",
    "decontaminate",
    "deterministic_sample",
    "dsir_logweights",
    "dsir_select_top",
    "hashed_ngram_distribution",
    "pack_sequences",
    "quality_filter",
    "rebalance_classes",
    "profile_drift",
    "quality_scores",
    "table_profile",
    "sample_by_source",
    "sample_token_budget",
    "source_mixture_report",
    "train_quality_classifier",
    "train_quality_classifier_numpy",
    "train_val_test_split",
    "weighted_sample",
]
