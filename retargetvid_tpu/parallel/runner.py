"""Multi-chip benchmark execution: clips sharded across the dp axis.

The RetargetVid benchmark is embarrassingly parallel over videos
(SURVEY.md §2.9/§5.8): saliency inference — the dominant device cost — runs
as one SPMD program with the frame batch sharded over the mesh's ``dp`` axis,
so N chips process N videos' frame chunks concurrently with zero hot-path
collectives; only the tiny per-video crop boxes return to the host.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from retargetvid_tpu.models.unisal import UNISAL
from retargetvid_tpu.pipeline.saliency import get_optimal_out_size, preprocess_frames

__all__ = ["ShardedSaliency"]


class ShardedSaliency:
    """UNISAL saliency with the frame batch sharded over the mesh dp axis.

    ``predict(frames)`` accepts (T, H, W, 3) uint8 from any number of clips
    concatenated; chunks are padded to a multiple of (dp * per_chip) and
    dispatched as one SPMD program.
    """

    def __init__(self, mesh: Mesh, variables=None,
                 model: Optional[UNISAL] = None, source: str = 'SALICON',
                 per_chip: int = 16, dtype=jnp.float32, rng_seed: int = 0):
        self.mesh = mesh
        self.model = model or UNISAL()
        self.source = source
        self.per_chip = per_chip
        self.dtype = dtype
        if variables is None:
            x0 = jnp.zeros((1, 1, 224, 416, 3), jnp.float32)
            variables = self.model.init(jax.random.PRNGKey(rng_seed), x0,
                                        static=True)
        # Replicate parameters across the mesh.
        self.variables = jax.device_put(
            variables, NamedSharding(mesh, P()))
        self.batch = self.per_chip * mesh.shape['dp']

    @functools.lru_cache(maxsize=8)
    def _compiled(self, in_hw, net_hw):
        model, variables, source = self.model, self.variables, self.source
        in_sharding = NamedSharding(self.mesh, P('dp'))
        out_sharding = NamedSharding(self.mesh, P('dp'))

        @functools.partial(jax.jit, in_shardings=(in_sharding,),
                           out_shardings=out_sharding)
        def fn(frames):
            x = preprocess_frames(frames, net_hw).astype(self.dtype)
            logp, _ = model.apply(variables, x[:, None],
                                  target_size=in_hw, source=source,
                                  static=True)
            p = jnp.exp(logp[:, 0, :, :, 0].astype(jnp.float32))
            mx = jnp.max(p, axis=(1, 2), keepdims=True)
            return (jnp.where(mx > 0, p / mx, p) * 255.0).astype(jnp.uint8)

        return fn

    def predict(self, frames: np.ndarray) -> np.ndarray:
        t, h, w, _ = frames.shape
        net_hw = get_optimal_out_size((h, w))
        fn = self._compiled((h, w), net_hw)
        out = np.empty((t, h, w), np.uint8)
        b = self.batch
        for s in range(0, t, b):
            e = min(t, s + b)
            chunk = frames[s:e]
            if e - s < b:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], b - (e - s), axis=0)])
            out[s:e] = np.asarray(fn(jnp.asarray(chunk)))[:e - s]
        return out
