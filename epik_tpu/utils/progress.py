"""Humanized output + progress metering.

Re-provides the reference driver's display helpers (reference:
epik/src/epik/main.cpp): ``to_human_readable`` (main.cpp:66-111),
``humanize_time`` (main.cpp:115-152), ``parse_human_readable`` for --max-ram
(main.cpp:156-194), and a progress bar keyed to bytes of FASTA consumed with
a seq/s prefix (main.cpp:308-320,347-358; the reference uses the
p-ranav/indicators submodule -- here a dependency-free ANSI bar).
"""

from __future__ import annotations

import math
import sys
import time

__all__ = ["to_human_readable", "humanize_time", "parse_human_readable", "ProgressBar"]


def to_human_readable(num: float) -> str:
    """1234 -> "1.2K" etc. (reference: main.cpp:66-111; 1024-based)."""
    if num < 1024:
        # cosmetic deviation: the reference's std::fixed prints 6 decimals
        # for floating inputs; one decimal reads better and this string is
        # display-only
        return str(int(num)) if float(num).is_integer() else f"{num:.1f}"
    if num < 1024 * 1024:
        value, suffix = num / 1024.0, "K"
    elif num < 1024 * 1024 * 1024:
        value, suffix = num / (1024.0 * 1024.0), "M"
    else:
        value, suffix = num / (1024.0 * 1024.0 * 1024.0), "B"
    frac, intpart = math.modf(value)
    if frac == 0.0:
        return f"{int(intpart)}{suffix}"
    return f"{value:.1f}{suffix}"


def humanize_time(milliseconds: int) -> str:
    """12345678 ms -> "03:25:45" (reference: main.cpp:115-152)."""
    ms_per_sec = 1000
    ms_per_min = 60 * ms_per_sec
    ms_per_hour = 60 * ms_per_min
    ms_per_day = 24 * ms_per_hour
    days, milliseconds = divmod(milliseconds, ms_per_day)
    hours, milliseconds = divmod(milliseconds, ms_per_hour)
    minutes, milliseconds = divmod(milliseconds, ms_per_min)
    seconds = milliseconds // ms_per_sec
    out = ""
    if days > 0:
        out += f"{days} day" + ("s" if days > 1 else "") + ", "
    if hours > 0 or days > 0:
        out += f"{hours:02d}:"
    out += f"{minutes:02d}:{seconds:02d}"
    return out


def parse_human_readable(max_ram: str) -> int:
    """"4.2G" -> bytes (reference: main.cpp:156-194; B/K/M/G, 1024-based)."""
    s = max_ram.strip()
    i = 0
    while i < len(s) and (s[i].isdigit() or s[i] in ".+-eE"):
        i += 1
    try:
        value = float(s[:i])
    except ValueError:
        raise ValueError("Could not parse --max-ram parameter: wrong numerical part")
    unit = s[i : i + 1].upper() if i < len(s) else ""
    if unit in ("", "B"):
        return int(value)
    if unit == "K":
        return int(value * 1024)
    if unit == "M":
        return int(value * 1024 * 1024)
    if unit == "G":
        return int(value * 1024 * 1024 * 1024)
    raise ValueError("Unknown memory unit.")


class ProgressBar:
    """Minimal ANSI progress bar keyed to a byte total (reference:
    main.cpp:308-320 ProgressBar over total_fasta_size)."""

    def __init__(self, total: int, width: int = 60, stream=None):
        self.total = max(total, 1)
        self.width = width
        self.stream = stream if stream is not None else sys.stderr
        self.prefix = "Placing "
        self.postfix = ""
        self._isatty = hasattr(self.stream, "isatty") and self.stream.isatty()
        self._last_draw = 0.0

    def update(self, progress: int, prefix: str | None = None, postfix: str | None = None):
        if prefix is not None:
            self.prefix = prefix
        if postfix is not None:
            self.postfix = postfix
        now = time.monotonic()
        if self._isatty and now - self._last_draw < 0.05 and progress < self.total:
            return
        self._last_draw = now
        frac = min(progress / self.total, 1.0)
        filled = int(frac * self.width)
        bar = "=" * filled + (">" if filled < self.width else "") + " " * max(0, self.width - filled - 1)
        line = f"\r{self.prefix}[{bar}] {self.postfix}"
        if self._isatty:
            self.stream.write(line)
            self.stream.flush()

    def finish(self):
        if self._isatty:
            self.stream.write("\n")
            self.stream.flush()
