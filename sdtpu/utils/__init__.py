from .logging import log_debug, log_error, log_info, log_warn, set_log_callback, set_log_level  # noqa: F401
