from propulsion_spark.functions.filters import StreamFilter  # noqa: F401
from propulsion_spark.functions.codec import (  # noqa: F401
    parse_rendered_spans,
    render_spans,
)
