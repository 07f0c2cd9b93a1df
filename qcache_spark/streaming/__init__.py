from .windows import (
    read_event_stream,
    run_to_memory_sink,
    sessionize,
    sliding_rates,
    tumbling_counts,
)

__all__ = [
    "read_event_stream",
    "run_to_memory_sink",
    "sessionize",
    "sliding_rates",
    "tumbling_counts",
]
