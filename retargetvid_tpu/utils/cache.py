"""Persistent XLA compilation cache setup.

The dev TPU compiles through a loopback relay at minutes per big program;
the persistent cache turns every repeat compile (driver re-runs, test
sessions, bench iterations) into a sub-second disk hit.

CPU-backend caveat: XLA:CPU serializes AOT executables specialized to the
COMPILING host's CPU features (avx512/amx variants), and the cache key does
NOT include them — an entry written on one host can SIGILL/SIGSEGV when
deserialized on another (observed: `cpu_aot_loader.cc` feature-mismatch
errors followed by a segfault inside `get_executable_and_time`).  Since the
cache directory outlives any one machine (home dir persists across rounds
on different cloud hosts), CPU runs get a per-host-fingerprint directory;
accelerator backends keep the shared one (their executables are compiled
for the accelerator, not the host).
"""

from __future__ import annotations

import hashlib
import os

_DEFAULT_DIR = os.path.expanduser('~/.cache/jax_comp')


def _cpu_fingerprint() -> str:
    """Stable hash of this host's CPU feature flags."""
    try:
        with open('/proc/cpuinfo') as fp:
            for line in fp:
                if line.startswith('flags'):
                    feats = ' '.join(sorted(line.split(':', 1)[1].split()))
                    return hashlib.sha256(feats.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform
    return hashlib.sha256(platform.processor().encode()).hexdigest()[:12]


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    cache_dir = path or os.environ.get('JAX_COMPILATION_CACHE_DIR',
                                       _DEFAULT_DIR)
    if path is None and 'JAX_COMPILATION_CACHE_DIR' not in os.environ \
            and jax.default_backend() == 'cpu':
        cache_dir = f'{cache_dir}_cpu_{_cpu_fingerprint()}'
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.3)
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
