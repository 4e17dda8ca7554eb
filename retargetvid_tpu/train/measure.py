"""Model runtime / size measurement (reference ``train.py:1458-1528``).

``measure_runtime``: single-frame inference fps on the accelerator and on
CPU; ``measure_model_size``: parameter count and bytes.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["measure_runtime", "measure_model_size"]


def measure_runtime(model, variables, *, input_hw=(256, 416),
                    target_hw=(140, 250), source='SALICON',
                    n_iters: int = 20) -> dict:
    """Single-frame static-inference latency on device and host CPU."""
    x = jnp.zeros((1, 1, *input_hw, 3), jnp.float32)

    def fwd(v, xx):
        out, _ = model.apply(v, xx, target_size=target_hw, source=source,
                             static=True)
        return out

    results = {}
    for platform in ('device', 'cpu'):
        try:
            if platform == 'cpu':
                dev = jax.devices('cpu')[0]
            else:
                dev = jax.devices()[0]
        except RuntimeError:
            continue
        sharding = jax.sharding.SingleDeviceSharding(dev)
        v = jax.device_put(variables, sharding)
        xx = jax.device_put(x, sharding)
        # Placement rides the input shardings (jit's `device=` is gone).
        fn = jax.jit(fwd)
        np.asarray(fn(v, xx))                       # compile
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = fn(v, xx)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / n_iters
        results[f'fps_{platform}'] = 1.0 / dt
    return results


def measure_model_size(variables) -> dict:
    """Parameter count and byte size of a variable tree."""
    leaves = jax.tree_util.tree_leaves(variables.get('params', variables))
    n_params = sum(int(np.prod(np.shape(p))) for p in leaves)
    n_bytes = sum(int(np.prod(np.shape(p))) * np.dtype(
        getattr(p, 'dtype', np.float32)).itemsize for p in leaves)
    return {'n_params': n_params, 'bytes': n_bytes,
            'mb': n_bytes / (1024 ** 2)}
