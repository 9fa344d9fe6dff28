"""emission_project_spark — a PySpark-native analytics engine.

A from-scratch Spark (DataFrame/SQL/Catalyst) re-expression of the
capabilities of the reference ETL engine ``aniketkapdule/emission-project``
(see SURVEY.md): incremental star-schema ETL (dedup, surrogate keys,
null-safe dimensional joins, derived measures, roll-ups) plus
large-scale training-data operators (dedup at scale, similarity search,
multimodal columns, text analysis).

Everything is lazy DataFrame/Catalyst — no custom execution engine.
"""

__version__ = "0.1.0"

from emission_project_spark.session import get_spark  # noqa: F401
