from .logging import (  # noqa: F401
    log_debug,
    log_error,
    log_info,
    log_warn,
    pretty_progress,
    set_log_callback,
    set_log_level,
)
