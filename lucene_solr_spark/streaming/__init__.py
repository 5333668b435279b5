from .incremental import (  # noqa: F401
    TopicCursor,
    stream_build,
    windowed_event_counts,
)
from .sessions import (  # noqa: F401
    sessionize_batch,
    sessionize_stream,
)
