from propulsion_spark.pipelines.curation import CurationPipeline  # noqa: F401
