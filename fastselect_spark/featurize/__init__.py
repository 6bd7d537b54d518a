from fastselect_spark.featurize.windows import (  # noqa: F401
    add_backfill,
    add_lag_lead,
    add_role_runs,
    add_rolling_token_stats,
    add_sessions,
    add_stable_order,
    add_turn_gap,
    featurize_transcripts,
)
from fastselect_spark.featurize.asof import asof_join  # noqa: F401
