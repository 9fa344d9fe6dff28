from emission_project_spark.functions.datetime import date_dim, date_parts  # noqa: F401
from emission_project_spark.functions.vectors import cosine_similarity, dot, l2_norm  # noqa: F401
