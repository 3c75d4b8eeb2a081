"""Metrics/timing registry writing reference-compatible column logs.

Reference analog: the llog submodule (SURVEY.md §2.2/§5): named accumulating
wall-clock timers + per-iteration scalar series flushed as a column text log
(``nsdf_log.txt`` / ``gs_log.txt``) consumed by ``eval/draw_loss.py``.
``FlashValue`` appends one row per iteration (header on first write) and
returns a short progress string.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, List, Optional


class Timer:
    def __init__(self, name: str):
        self.name = name
        self.total = 0.0
        self.count = 0
        self._t0: Optional[float] = None

    def tic(self):
        self._t0 = time.perf_counter()

    def toc_sum(self):
        if self._t0 is not None:
            self.total += time.perf_counter() - self._t0
            self.count += 1
            self._t0 = None

    @property
    def mean_ms(self) -> float:
        return 1e3 * self.total / max(self.count, 1)


class Llog:
    def __init__(self):
        self.timers: Dict[str, Timer] = {}
        self.values: Dict[str, float] = {}
        self._order: List[str] = []
        self._avg: Dict[str, List[float]] = {}
        self._file_columns: Dict = {}

    def timer(self, name: str) -> Timer:
        if name not in self.timers:
            self.timers[name] = Timer(name)
        return self.timers[name]

    def record(self, name: str, value: float, avg: bool = False):
        """RecordValue analog; avg=True keeps a running series mean note in
        the progress string (the file always gets the raw value)."""
        if name not in self.values:
            self._order.append(name)
        self.values[name] = float(value)
        if avg:
            self._avg.setdefault(name, []).append(float(value))

    def flash(self, path, n_digits: int = 3, cols=None) -> str:
        """Append one row; returns 'k1=v1 k2=v2 ...' for a progress bar.

        The column set is frozen per file at header time — values recorded
        for the first time later in the run do not widen existing logs.
        Pass ``cols`` to scope a file to an explicit column set (e.g. the
        GS-phase log must not re-flash stale SDF-phase values); only keys
        recorded at least once are kept, so optional metrics don't emit
        all-zero columns."""
        path = Path(path)
        file_cols = self._file_columns.get(path)
        if file_cols is None:
            if path.exists():
                # resumed run appending to an existing log: rows MUST
                # follow the file's own header, not this process's
                # recorded-value set (which can differ at resume time)
                with open(path) as f:
                    file_cols = f.readline().split()
            else:
                file_cols = (
                    [k for k in cols if k in self.values]
                    if cols is not None
                    else list(self._order)
                )
                path.parent.mkdir(parents=True, exist_ok=True)
                with open(path, "w") as f:
                    f.write(" ".join(file_cols) + "\n")
            self._file_columns[path] = file_cols
        with open(path, "a") as f:
            f.write(
                " ".join(f"{self.values.get(k, 0.0):.6g}" for k in file_cols)
                + "\n"
            )
        parts = []
        for k in file_cols[:8]:
            parts.append(f"{k}={self.values.get(k, 0.0):.{n_digits}g}")
        return " ".join(parts)

    def reset(self):
        self.values.clear()
        self._order.clear()
        self._avg.clear()
        self._file_columns.clear()

    def timing_summary(self) -> str:
        rows = [
            f"{t.name}: total {t.total:.2f}s over {t.count} calls "
            f"({t.mean_ms:.2f} ms/call)"
            for t in self.timers.values()
        ]
        return "\n".join(rows)

    def save_timing(self, path):
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        with open(path, "w") as f:
            f.write(self.timing_summary() + "\n")


def memory_stats() -> Dict[str, float]:
    """Host RSS + device memory stats (utils.cpp:31-74 analog),
    best-effort."""
    out: Dict[str, float] = {}
    try:
        rss_kb = 0
        with open("/proc/self/status") as f:
            for ln in f:
                if ln.startswith("VmRSS"):
                    rss_kb = float(ln.split()[1])
                    break
        out["host_rss_gb"] = rss_kb / 1e6
    except OSError:
        pass
    try:
        import jax

        st = jax.devices()[0].memory_stats() or {}
        if "bytes_in_use" in st:
            out["device_gb"] = st["bytes_in_use"] / 1e9
        if "peak_bytes_in_use" in st:
            out["device_peak_gb"] = st["peak_bytes_in_use"] / 1e9
    except Exception:
        pass
    return out


LLOG = Llog()
