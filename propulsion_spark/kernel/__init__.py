from propulsion_spark.kernel.spans import (  # noqa: F401
    Event,
    coalesce_spans,
    drop_before,
    merge,
    next_gap,
    slice_span,
    strip_unfolds,
)
from propulsion_spark.kernel.state import StreamState  # noqa: F401
