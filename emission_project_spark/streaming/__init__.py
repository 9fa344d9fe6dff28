from emission_project_spark.streaming.file_stream import (  # noqa: F401
    run_available_now,
    stream_feed,
    windowed_counts,
)
