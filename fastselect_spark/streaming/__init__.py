from fastselect_spark.streaming.sessions import (  # noqa: F401
    read_transcripts_stream,
    streaming_session_stats,
    streaming_token_rates,
)
from fastselect_spark.streaming.dedup import (  # noqa: F401
    streaming_dedup,
    streaming_dedup_within_watermark,
)
from fastselect_spark.streaming.stateful import (  # noqa: F401
    stateful_conversation_progress,
)
from fastselect_spark.streaming.minhash import (  # noqa: F401
    streaming_minhash_candidates,
)
from fastselect_spark.streaming.consolidate import (  # noqa: F401
    ClusterConsolidator,
)
from fastselect_spark.streaming.asof import (  # noqa: F401
    streaming_asof_enrich,
)
from fastselect_spark.streaming.drift import (  # noqa: F401
    category_drift_report,
    reference_category_mix,
    streaming_category_mix,
    streaming_psi,
    streaming_window_quantiles,
)
from fastselect_spark.streaming.trends import (  # noqa: F401
    streaming_conversation_trends,
)
from fastselect_spark.streaming.sketches import (  # noqa: F401
    hll_estimate_from_window_registers,
    streaming_countmin_registers,
    streaming_hll_registers,
)
