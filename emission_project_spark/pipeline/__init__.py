from emission_project_spark.pipeline.emission import EmissionPipeline  # noqa: F401
