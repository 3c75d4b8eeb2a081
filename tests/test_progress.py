"""ProgressBar edge cases (non-TTY log hygiene)."""

import io

from gssdf_tpu.utils.progress import ProgressBar, trange


def test_non_tty_known_total_no_duplicate_final_line():
    buf = io.StringIO()
    list(ProgressBar(range(20), total=20, stream=buf))
    lines = [l for l in buf.getvalue().splitlines() if l.strip()]
    assert len(lines) == len(set(lines)) or lines[-1] != lines[-2]
    # ~10 lines, not one per iteration
    assert 5 <= len(lines) <= 12, lines


def test_non_tty_unknown_total_does_not_flood():
    buf = io.StringIO()
    gen = (i for i in range(500))   # no __len__
    list(ProgressBar(gen, stream=buf))
    lines = [l for l in buf.getvalue().splitlines() if l.strip()]
    # time-throttled: a fast loop produces at most the final line
    assert len(lines) <= 2, lines


def test_trange_counts():
    buf = io.StringIO()
    out = list(trange(7, stream=buf))
    assert out == list(range(7))
    assert "7/7" in buf.getvalue()
