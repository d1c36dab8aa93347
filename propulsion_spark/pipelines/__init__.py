from propulsion_spark.pipelines.ann_index import AnnIndex  # noqa: F401
from propulsion_spark.pipelines.curation import CurationPipeline  # noqa: F401
from propulsion_spark.pipelines.hybrid import hybrid_search_many  # noqa: F401
from propulsion_spark.pipelines.lexical_index import LexicalIndex  # noqa: F401
from propulsion_spark.pipelines.media_dedup import MediaDedupStream  # noqa: F401
from propulsion_spark.pipelines.semantic_dedup import SemDedupStream  # noqa: F401
