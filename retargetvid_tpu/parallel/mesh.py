"""Device mesh construction and sharding rules.

The reference is single-process/single-GPU (SURVEY.md §2.9); TPU-native
scaling replaces that with SPMD over a ``jax.sharding.Mesh``:

- ``dp``  — data parallel: clips/samples shard across this axis (the
  200-video benchmark is embarrassingly parallel);
- ``sp``  — spatial parallel: the frame H axis shards so very large frames /
  activations split across chips (XLA inserts halo exchanges for convs);
- ``tp``  — tensor parallel: wide conv output-channel dims shard, with XLA
  placing the all-gathers/reduce-scatters on ICI.

All collectives are XLA-inserted from sharding annotations — no explicit
NCCL-style calls anywhere, per the scaling-book recipe: pick a mesh, annotate
shardings, let XLA do the rest.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "param_shardings", "AXES"]

AXES = ('dp', 'sp', 'tp')


def _factorize(n: int) -> tuple:
    """Split n devices over (dp, sp, tp), favoring dp.

    The 200-video benchmark is embarrassingly parallel over clips, so all
    factors go to the data axis by default; callers that want model
    parallelism (e.g. the training dryrun) pass explicit ``axis_sizes``.
    """
    return (n, 1, 1)


def make_mesh(n_devices: Optional[int] = None,
              axis_sizes: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    """Build a (dp, sp, tp) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if axis_sizes is None:
        axis_sizes = _factorize(n_devices)
    assert int(np.prod(axis_sizes)) == n_devices, (axis_sizes, n_devices)
    dev_array = np.asarray(devices).reshape(axis_sizes)
    return Mesh(dev_array, AXES)


def batch_sharding(mesh: Mesh, ndim: int, *, batch_axis: int = 0,
                   spatial_axis: Optional[int] = None) -> NamedSharding:
    """Sharding for an activation batch: B over dp, H over sp."""
    spec = [None] * ndim
    spec[batch_axis] = 'dp'
    if spatial_axis is not None:
        spec[spatial_axis] = 'sp'
    return NamedSharding(mesh, P(*spec))


def param_shardings(mesh: Mesh, params, *, tp_threshold: int = 256):
    """Per-parameter shardings: wide conv/dense output channels over tp.

    Conv kernels are HWIO; the O axis shards when it is both large and
    divisible by the tp size.  Everything else replicates.
    """
    tp = mesh.shape['tp']

    def rule(x):
        shape = np.shape(x)
        if len(shape) >= 2 and shape[-1] >= tp_threshold \
                and shape[-1] % tp == 0:
            spec = [None] * (len(shape) - 1) + ['tp']
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, params)
