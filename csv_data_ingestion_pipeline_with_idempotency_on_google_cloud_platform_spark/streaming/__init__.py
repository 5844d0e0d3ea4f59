from .ingest_stream import start_ingest_stream  # noqa: F401
from .event_stream import (  # noqa: F401
    dedup_events_within_watermark,
    interval_join_attribution,
    sessionized_event_counts,
    streaming_cohort_updates,
    streaming_event_transitions,
    streaming_funnel_progress,
    streaming_rolling_user_stats,
    streaming_rollup_updates,
    streaming_sessionize,
    windowed_event_counts,
    windowed_reach,
)
from .stateful_dedup import streaming_exact_dedup  # noqa: F401
from .neardup_stream import start_neardup_stream  # noqa: F401
from .text_index_stream import start_text_index_stream  # noqa: F401
from .scd2_stream import streaming_scd2  # noqa: F401
from .anomaly_stream import (  # noqa: F401
    streaming_cusum_monitor,
    train_targets,
)
from .sketch_stream import (  # noqa: F401
    streaming_countmin,
    streaming_kmv_distinct,
)
from .engagement_stream import (  # noqa: F401
    engagement_rollup_from_ledger,
    streaming_user_days,
)
from .forecast_stream import (  # noqa: F401
    streaming_changepoint_monitor,
    streaming_holt_monitor,
)
from .sprt_stream import (  # noqa: F401
    streaming_sprt_monitor,
)
from .guardrail_stream import (  # noqa: F401
    binned_w1,
    srm_from_ledger,
    streaming_binned_w1_monitor,
    streaming_unit_deltas,
    train_value_bins,
)
