"""Stage-keyed wall-clock timing registry.

Reproduces the reference's accumulating named-timer registry
(``smartVidCrop.py:98-127``): keys starting with ``_`` roll up into a
``total`` entry, and :func:`sc_all_times` reports every stage as
``"<sec>s, <percent-of-video-duration>%"`` — the exact string contract that
the per-video ``_info.txt`` files and ``retargetvid_eval.py:196-222`` parse.

Device work is asynchronous under JAX; callers that time jitted stages must
block on results (``jax.block_until_ready``) before closing a timer.  The
:func:`stage_timer` context manager does this automatically when given the
stage outputs.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

_sc_times: dict[str, float] = {}


def sc_init_time() -> None:
    """Clear all registered timers (reference ``sc_init_time``)."""
    _sc_times.clear()


def sc_register_time(t_start: float, key_name: str) -> None:
    """Accumulate elapsed seconds since ``t_start`` under ``key_name``.

    Unlike the reference (which passes ``cv2.getTickCount`` ticks), ``t_start``
    is a ``time.perf_counter()`` timestamp.
    """
    add_t = time.perf_counter() - t_start
    _sc_times[key_name] = _sc_times.get(key_name, 0.0) + add_t


def sc_save_time_override(key_name: str, t: float) -> None:
    """Overwrite a timer with an absolute value (reference parity)."""
    _sc_times[key_name] = t


def sc_all_times(vid_dur: float) -> dict[str, str]:
    """Format all timers; keys starting '_' roll up into 'total'.

    String format matches reference ``smartVidCrop.py:113-124`` so the
    ``_info.txt`` contract parsed by ``retargetvid_eval.py`` is preserved.
    """
    t_dict: dict[str, str] = {}
    sum_t = 0.0
    sum_p = 0.0
    for key_name, val in _sc_times.items():
        if key_name.startswith('_'):
            sum_t += val
            sum_p += (val / vid_dur) * 100.0
        t_dict[key_name] = '%7.3fs, %6.3f%%' % (val, (val / vid_dur) * 100.0)
    t_dict['total'] = '%7.3fs, %6.3f%%' % (sum_t, sum_p)
    return t_dict


def sc_get_time(key_name: str) -> float:
    return _sc_times[key_name]


@contextlib.contextmanager
def stage_timer(key_name: str, *block_on) -> Iterator[None]:
    """Context manager: time a stage, blocking on given JAX outputs first."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if block_on:
            import jax
            jax.block_until_ready(block_on)
        sc_register_time(t0, key_name)
