from .projections import MarginProjection, PROJECTION_NAMES, cohort_weights  # noqa: F401
from . import schedules  # noqa: F401
