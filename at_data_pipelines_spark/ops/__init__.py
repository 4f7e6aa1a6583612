from .asof import asof_join  # noqa: F401
from .range_join import range_join  # noqa: F401
from .skew import salted_join, two_phase_agg, with_salt  # noqa: F401
