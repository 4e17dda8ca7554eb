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

#: Process-wide memo for traced/jitted program objects (see
#: :func:`shared_program`).
_TRACE_CACHE: dict = {}


def tree_signature(tree) -> tuple:
    """Hashable (treedef, shapes, dtypes) signature of a pytree of arrays.

    Two parameter trees with equal structure/shapes/dtypes trace to the
    same program when they enter it as jit ARGUMENTS (values never touch
    the trace), so this is the right cache-key ingredient for
    :func:`shared_program`.
    """
    import jax
    import numpy as np

    flat, treedef = jax.tree_util.tree_flatten(tree)
    return (str(treedef), tuple(
        (tuple(np.shape(v)), str(getattr(v, 'dtype', type(v).__name__)))
        for v in flat))


def shared_program(key: tuple, builder):
    """Process-wide memo for traced/jitted programs.

    The program classes (``OneShotClipProgram``, ``FusedClipProgram``,
    ``Sharded*``, ``TransNetPredictor``) each carry an instance-level
    ``lru_cache`` over their static signature — but that keys on the
    INSTANCE, so two equal-config objects re-trace and re-lower a
    byte-identical program (the XLA disk cache saves the backend compile;
    the trace + lowering of a whole-clip program still costs seconds per
    duplicate, which the test suite pays dozens of times).  ``key`` must
    capture everything that affects the traced program: model configs
    (``repr`` of the flax module), dtype/static knobs, mesh, and the
    parameter-tree signature (shapes enter the trace via the zero-arg
    ``eval_shape``); parameter VALUES must enter the program as jit
    arguments for sharing to be sound.
    """
    if key not in _TRACE_CACHE:
        _TRACE_CACHE[key] = builder()
    return _TRACE_CACHE[key]


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
