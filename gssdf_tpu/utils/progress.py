"""Terminal progress bars (analog of the reference's vendored tqdm.hpp,
used at local_map.cpp:237,361 and mesher.cpp:109).

TTY-aware: renders a carriage-return bar with rate + ETA on interactive
stderr, and falls back to sparse plain-line prints when output is a file
(so train logs and CI output stay readable).
"""

from __future__ import annotations

import sys
import time
from typing import Iterable, Iterator, Optional, Sequence, TypeVar, Union

T = TypeVar("T")

_BAR_WIDTH = 28


def _fmt_t(seconds: float) -> str:
    s = int(max(seconds, 0))
    if s >= 3600:
        return f"{s // 3600}:{s % 3600 // 60:02d}:{s % 60:02d}"
    return f"{s // 60:02d}:{s % 60:02d}"


class ProgressBar:
    """Iterate with a live progress bar: ``for i in ProgressBar(range(n))``.

    ``prefix`` mirrors tqdm.hpp's ``set_prefix``; ``min_interval`` throttles
    redraws; non-TTY streams get at most ~10 plain status lines total.
    """

    def __init__(
        self,
        iterable: Union[Iterable[T], Sequence[T]],
        prefix: str = "",
        total: Optional[int] = None,
        stream=None,
        min_interval: float = 0.1,
    ):
        self._it = iterable
        self.prefix = prefix
        self.total = total if total is not None else (
            len(iterable) if hasattr(iterable, "__len__") else None
        )
        self.stream = stream if stream is not None else sys.stderr
        self.min_interval = min_interval
        self._isatty = bool(getattr(self.stream, "isatty", lambda: False)())

    def set_prefix(self, prefix: str) -> None:
        self.prefix = prefix

    def __iter__(self) -> Iterator[T]:
        start = time.perf_counter()
        last = 0.0
        n = 0
        drawn_at = -1
        try:
            for item in self._it:
                yield item
                n += 1
                now = time.perf_counter()
                if self._isatty:
                    redraw = now - last >= self.min_interval
                elif self.total:
                    # plain mode: ~10 lines over the whole run
                    step = max(self.total // 10, 1)
                    redraw = (n % step == 0) or (n == self.total)
                else:
                    # unsized iterable on a file stream: time-throttled
                    redraw = now - last >= 30.0
                if redraw:
                    last = now
                    drawn_at = n
                    self._draw(n, now - start, done=False)
            if drawn_at != n:
                self._draw(n, time.perf_counter() - start, done=True)
        finally:
            if self._isatty:
                self.stream.write("\n")
                self.stream.flush()

    def _draw(self, n: int, elapsed: float, done: bool) -> None:
        rate = n / elapsed if elapsed > 0 else 0.0
        if self.total:
            frac = min(n / self.total, 1.0)
            filled = int(frac * _BAR_WIDTH)
            bar = "█" * filled + "░" * (_BAR_WIDTH - filled)
            eta = (self.total - n) / rate if rate > 0 else 0.0
            msg = (
                f"{self.prefix} {frac * 100:3.0f}%|{bar}| {n}/{self.total}"
                f" [{_fmt_t(elapsed)}<{_fmt_t(eta)}, {rate:.1f}it/s]"
            )
        else:
            msg = f"{self.prefix} {n}it [{_fmt_t(elapsed)}, {rate:.1f}it/s]"
        if self._isatty:
            self.stream.write("\r" + msg + "\x1b[K")
        else:
            self.stream.write(msg + "\n")
        self.stream.flush()


def trange(n: int, prefix: str = "", **kw) -> ProgressBar:
    """tq::trange analog: progress-bar over ``range(n)``."""
    return ProgressBar(range(n), prefix=prefix, total=n, **kw)
