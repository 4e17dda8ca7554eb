"""Persistent XLA compilation cache setup.

The dev TPU compiles through a loopback relay at minutes per big program;
the persistent cache turns every repeat compile (driver re-runs, test
sessions, bench iterations) into a sub-second disk hit.  Safe on any
platform — CPU test runs benefit equally.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser('~/.cache/jax_comp')


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    cache_dir = path or os.environ.get('JAX_COMPILATION_CACHE_DIR',
                                       _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.3)
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
