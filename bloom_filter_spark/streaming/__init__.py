from .stream_build import streaming_sketch_build, streaming_delta_build, windowed_event_counts  # noqa: F401
from .stateful import running_source_sketches  # noqa: F401
