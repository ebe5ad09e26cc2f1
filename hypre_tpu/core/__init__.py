from hypre_tpu.core.config import Config, get_config, set_config  # noqa: F401
from hypre_tpu.core.timing import Timer, timers  # noqa: F401
from hypre_tpu.core.errors import (  # noqa: F401
    HypreTpuError, ConvergenceError, ArgumentError, get_error, set_error,
    clear_error, ERROR_GENERIC, ERROR_MEMORY, ERROR_ARG, ERROR_CONV,
)
