from .scalars import (  # noqa: F401
    coalesce_empty,
    concat_resolution,
    datepart_str,
    epoch_ms_precise,
    epoch_ms_to_ts,
    event_time_seconds,
    to_day_date,
)
