from emission_project_spark.operators.joins import anti_join, join_nullsafe  # noqa: F401
from emission_project_spark.operators.dedup import dedup_subset, union_distinct  # noqa: F401
from emission_project_spark.operators.keys import add_surrogate_key, date_id_expr  # noqa: F401
from emission_project_spark.operators.incremental import incremental_insert, upsert  # noqa: F401
