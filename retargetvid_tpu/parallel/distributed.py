"""Multi-process (multi-controller) mesh utilities.

The reference is single-process (SURVEY.md §2.9); this framework's meshes
can span OS processes and hosts (`jax.distributed`), where three
single-controller habits break:

- a host numpy array can no longer be fed to a jit whose sharding spans
  non-addressable devices — every process must construct the global array
  from its host copy (:func:`global_put`, via
  ``jax.make_array_from_callback``);
- a dp-sharded output can no longer be ``np.asarray``-ed — it must first be
  replicated across processes by an explicit XLA all-gather
  (:func:`global_fetch`);
- process-local device order is not global device order, so meshes must be
  built from ``jax.devices()`` (globally consistent) rather than
  ``jax.local_devices()``.

These helpers make the sharded runners (``parallel.runner``) behave
identically on a single-process virtual mesh and a multi-process mesh whose
``dp`` boundary crosses DCN — validated bit-exactly by
``tests/test_multiprocess_mesh.py`` (2 OS processes x 4 virtual CPU devices
vs the single-process 8-device run).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ["initialize_from_env", "is_multiprocess", "global_put",
           "global_fetch"]


def initialize_from_env() -> bool:
    """`jax.distributed.initialize` from ``RTV_COORD`` / ``RTV_NUM_PROCS`` /
    ``RTV_PROC_ID`` env vars (no-op when unset or single-process).

    Must run before the first JAX backend touch in each worker process.
    Returns True when a multi-process runtime was initialized.
    """
    n = int(os.environ.get("RTV_NUM_PROCS", "1"))
    if n <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=os.environ["RTV_COORD"],
        num_processes=n,
        process_id=int(os.environ["RTV_PROC_ID"]))
    return True


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def global_put(tree, sharding: NamedSharding):
    """Place host data onto the mesh under ``sharding``, single- or
    multi-process.

    ``tree``: a pytree of numpy/jnp arrays, each holding the FULL global
    value (every process passes the same data — the runners' host inputs are
    process-replicated by construction).  Single-process this is a plain
    ``device_put``; multi-process each process donates its addressable
    shards via ``make_array_from_callback``.
    """
    if not is_multiprocess():
        return jax.device_put(tree, sharding)

    def put_one(x):
        x = np.asarray(x)
        # NB: not ascontiguousarray — it promotes 0-d shards to (1,).
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: np.asarray(x[idx]))

    return jax.tree_util.tree_map(put_one, tree)


def global_fetch(arr) -> np.ndarray:
    """Fetch a (possibly non-addressable) device array to host numpy.

    Fully-addressable or fully-replicated arrays fetch directly; otherwise
    an identity program with replicated ``out_shardings`` makes XLA insert
    the cross-process all-gather first (the runners' outputs are KB-scale
    crop boxes/probs, so the gather is noise).
    """
    if getattr(arr, "is_fully_addressable", True) or \
            getattr(arr, "is_fully_replicated", False):
        return np.asarray(arr)
    mesh = arr.sharding.mesh
    rep = NamedSharding(mesh, P())
    return np.asarray(jax.jit(lambda a: a, out_shardings=rep)(arr))
