from busdata_pipeline_spark.functions.core import (  # noqa: F401
    dow_pg,
    hour_utc,
    event_date,
    epoch_seconds,
    service_key_for,
    weekday_name_expr,
)
