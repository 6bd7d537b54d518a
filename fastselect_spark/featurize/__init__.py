from fastselect_spark.featurize.windows import (  # noqa: F401
    add_backfill,
    add_lag_lead,
    add_multi_horizon_stats,
    add_role_runs,
    add_rolling_token_stats,
    add_sessions,
    add_stable_order,
    add_turn_gap,
    featurize_transcripts,
)
from fastselect_spark.featurize.asof import (  # noqa: F401
    asof_join,
    asof_join_tolerance,
)
from fastselect_spark.featurize.encoding import (  # noqa: F401
    count_encode_expanding,
    frequency_encode,
    hash_encode,
    kfold_target_encode,
    target_encode_expanding,
    woe_iv_encode,
)
from fastselect_spark.featurize.drift import (  # noqa: F401
    ks_statistics,
    psi_scores,
)
from fastselect_spark.featurize.splits import (  # noqa: F401
    group_kfold,
    purged_walkforward_folds,
    walkforward_boundaries,
)
from fastselect_spark.featurize.resample import resample_grid  # noqa: F401
from fastselect_spark.featurize.convagg import (  # noqa: F401
    conversation_features,
    conversation_integrity,
    session_features,
    conversation_leadlag,
    conversation_trends,
    theilsen_trends,
    role_transition_matrix,
    tool_cooccurrence_pmi,
)
from fastselect_spark.featurize.scd2 import (  # noqa: F401
    scd2_intervals,
    scd2_lookup,
)
from fastselect_spark.featurize.decay import (  # noqa: F401
    time_decayed_lastk,
    turn_decayed_sum,
)
