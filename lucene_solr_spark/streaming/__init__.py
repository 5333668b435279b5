from .incremental import (  # noqa: F401
    TopicCursor,
    stream_build,
    windowed_event_counts,
)
