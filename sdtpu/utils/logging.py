"""Leveled logging with a replaceable callback (reference src/core/util.h:78-85,
sd_set_log_callback include/stable-diffusion.h:426)."""
from __future__ import annotations

import sys
import time
from typing import Callable, Optional

LEVELS = {"debug": 10, "info": 20, "warn": 30, "error": 40}
_level = LEVELS["info"]
_callback: Optional[Callable[[str, str], None]] = None
_t0 = time.time()
_color = False
# ANSI per level (reference --color tag coloring, cli/main.cpp:118)
_COLORS = {"debug": "\x1b[90m", "info": "\x1b[32m", "warn": "\x1b[33m",
           "error": "\x1b[31m"}
_RESET = "\x1b[0m"


def set_log_level(level: str) -> None:
    global _level
    _level = LEVELS[level]


def set_log_color(enabled: bool) -> None:
    """Colorize level tags with ANSI codes (reference --color)."""
    global _color
    _color = enabled


def set_log_callback(cb: Optional[Callable[[str, str], None]]) -> None:
    """cb(level_name, message); None restores the default stderr printer."""
    global _callback
    _callback = cb


def _log(level: str, msg: str) -> None:
    if LEVELS[level] < _level:
        return
    if _callback is not None:
        _callback(level, msg)
    else:
        tag = f"{level.upper():5s}"
        if _color:
            tag = f"{_COLORS[level]}{tag}{_RESET}"
        print(f"[{tag}] {time.time() - _t0:8.2f}s | {msg}", file=sys.stderr)


def log_debug(msg: str) -> None:
    _log("debug", msg)


def log_info(msg: str) -> None:
    _log("info", msg)


def log_warn(msg: str) -> None:
    _log("warn", msg)


def log_error(msg: str) -> None:
    _log("error", msg)


def pretty_progress(step: int, steps: int, time_per_step: float) -> None:
    """In-place progress bar (reference pretty_progress, src/core/util.cpp):
    |====>     | 5/20 - 2.10it/s."""
    width = 50
    filled = int(width * step / max(steps, 1))
    bar = "=" * max(filled - 1, 0) + (">" if 0 < filled < width else "=" * min(filled, 1))
    bar = bar.ljust(width)
    if time_per_step >= 1.0 or time_per_step <= 0:
        rate = f"{time_per_step:.2f}s/it"
    else:
        rate = f"{1.0 / time_per_step:.2f}it/s"
    end = "\n" if step == steps else ""
    print(f"\r|{bar}| {step}/{steps} - {rate}", end=end, file=sys.stderr, flush=True)
