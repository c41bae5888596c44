"""Utilities: structured logging and on-device profiling."""

from cilrs_tpu.utils.logging import get_logger  # noqa: F401
from cilrs_tpu.utils.profiling import StepTimer, trace  # noqa: F401
