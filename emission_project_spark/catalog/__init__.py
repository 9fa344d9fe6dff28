from emission_project_spark.catalog.tables import TESTDATA_TABLES, load_table, load_tables  # noqa: F401
