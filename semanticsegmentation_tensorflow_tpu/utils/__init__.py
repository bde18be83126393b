"""Utilities: profiling/tracing, debug modes, timing."""

from semanticsegmentation_tensorflow_tpu.utils.profiling import (  # noqa: F401
    Timer,
    trace,
    enable_nan_debug,
    value_sync,
)
