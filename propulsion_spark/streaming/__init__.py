from propulsion_spark.streaming.checkpoints import CheckpointStore  # noqa: F401
from propulsion_spark.streaming.deltalite import (  # noqa: F401
    DeltaliteCheckpointStore,
    DeltaliteLog,
    DeltalitePositionsTable,
    DeltaliteTable,
    register_deltalite,
)
from propulsion_spark.streaming.positions import PositionsTable  # noqa: F401
from propulsion_spark.streaming.source_cap import (  # noqa: F401
    CapPerSourceStream,
    SourceCountRegistry,
    cap_per_source_monotone,
)
from propulsion_spark.streaming.sinks import (  # noqa: F401
    BatchedSink,
    DeclarativeSink,
    HandlerResult,
    OutcomeKind,
    ParallelSink,
    StreamsSink,
)
