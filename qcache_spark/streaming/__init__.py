from .admission import (
    AdmissionScopeMismatch,
    admit_foreach_batch,
    reset_progress,
    streaming_admit,
)
from .dedupe import (
    content_fingerprint,
    dedup_stream_by_content,
    dedup_within_watermark,
)
from .drift_monitor import drift_monitor, reference_histogram
from .joins import enrich_with_dimension, interval_join
from .kafka import (
    KAFKA_WIRE_SCHEMA,
    kafka_reader_options,
    parse_kafka_events,
    read_kafka_stream,
)
from .stateful import user_profiles_batch, user_profiles_stateful
from .windows import (
    ohlc_bars,
    read_event_stream,
    run_to_memory_sink,
    run_to_parquet_sink,
    sessionize,
    sliding_rates,
    tumbling_counts,
)

__all__ = [
    "AdmissionScopeMismatch",
    "admit_foreach_batch",
    "reset_progress",
    "streaming_admit",
    "content_fingerprint",
    "dedup_stream_by_content",
    "dedup_within_watermark",
    "drift_monitor",
    "reference_histogram",
    "enrich_with_dimension",
    "interval_join",
    "KAFKA_WIRE_SCHEMA",
    "kafka_reader_options",
    "parse_kafka_events",
    "read_kafka_stream",
    "user_profiles_batch",
    "user_profiles_stateful",
    "ohlc_bars",
    "read_event_stream",
    "run_to_memory_sink",
    "run_to_parquet_sink",
    "sessionize",
    "sliding_rates",
    "tumbling_counts",
]
