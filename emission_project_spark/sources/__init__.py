from emission_project_spark.sources.csv_feed import read_feed, archive_consumed  # noqa: F401
from emission_project_spark.sources.warehouse import Warehouse  # noqa: F401
