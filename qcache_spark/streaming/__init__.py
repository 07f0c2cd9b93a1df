from .stateful import user_profiles_batch, user_profiles_stateful
from .windows import (
    read_event_stream,
    run_to_memory_sink,
    sessionize,
    sliding_rates,
    tumbling_counts,
)

__all__ = [
    "user_profiles_batch",
    "user_profiles_stateful",
    "read_event_stream",
    "run_to_memory_sink",
    "sessionize",
    "sliding_rates",
    "tumbling_counts",
]
