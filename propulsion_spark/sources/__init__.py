from propulsion_spark.sources.feed import (  # noqa: F401
    Batch,
    FeedSource,
    PeriodicSource,
    SinglePassFeedSource,
    TailingFeedSource,
)
from propulsion_spark.sources.json_source import JsonSource  # noqa: F401
from propulsion_spark.sources.kafka_fake import (  # noqa: F401
    FileTopic,
    FileTopicConsumer,
    register_fake_kafka,
)
from propulsion_spark.sources.memory import MemorySource  # noqa: F401
from propulsion_spark.sources.parquet_feed import (  # noqa: F401
    ChangeFeedSource,
    changefeed_stream,
)
