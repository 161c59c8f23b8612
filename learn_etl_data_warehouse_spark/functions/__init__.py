"""Scalar function surface (SURVEY §2.2/§2.6).

- :mod:`.cleaning` — native Column expressions for every reference
  transformer UDF (P1-P12); Catalyst-optimizable, whole-stage-codegen'd.
- :mod:`.cleaning_pandas` — ``pandas_udf`` twins of the same semantics
  (the declared UDF escape hatch; conformance-tested against native).
- :mod:`.datetime_fns` — quarter key, hour extraction, duration.
- :mod:`.histogram` — the A3 binned-count aggregate.
"""

from .cleaning import (  # noqa: F401
    clean_sci_notation_id,
    duration_minutes,
    empty_to_null,
    get_lat,
    get_lng,
    is_male,
    remove_after_dot,
    rounded_dist,
    split_date_end,
    split_date_start,
)
from .datetime_fns import hour_of, quarter_key  # noqa: F401
from .histogram import categorical_histogram, histogram  # noqa: F401
