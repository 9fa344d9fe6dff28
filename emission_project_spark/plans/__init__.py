from emission_project_spark.plans.registry import QUERIES, ORACLES, register  # noqa: F401
