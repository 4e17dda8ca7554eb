"""Focus-center extraction (reference ``sc_find_center_of_mass``).

The reference (``smartVidCrop.py:1163-1219``) runs a 1-cluster KMeans over
the (row, col, scaled-value) triples of nonzero pixels of the
nearest-downscaled map.  With k=1 the assignment step is trivial, so KMeans
converges to the plain mean of the points after one update — the "clustering"
is exactly a masked mean over nonzero pixel coordinates.  We compute that
closed form directly, batched over all frames with ``vmap``: no iterative
solver, one reduction per frame.

With ``km=False`` the center is the argmax pixel (reference ``:1164-1178``).

Returns (x, y) in the *original process-map* coordinate system (already
scaled back by ``factor``) plus a validity mask (False where the map was
empty — the reference returns ``None`` there and repairs later).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from retargetvid_tpu.ops.resize import resize_by_factor

__all__ = ["center_of_mass"]


def center_of_mass(smaps, *, km: bool = True, factor: float = 2.0,
                   bias: float = 1.0):
    """Per-frame focus centers of a (T, H, W) saliency volume.

    Returns ``(x, y, valid)`` — float32 (T,) arrays and a bool mask.
    ``bias`` only affects the value channel of the reference's KMeans points,
    which never influences the spatial mean; it is accepted for config parity.
    """
    del bias  # value channel does not move the k=1 spatial mean
    smaps = jnp.asarray(smaps).astype(jnp.float32)
    t, h, w = smaps.shape

    if not km:
        flat = smaps.reshape(t, -1)
        idx = jnp.argmax(flat, axis=1)
        max_val = jnp.max(flat, axis=1)
        y = (idx // w).astype(jnp.float32)
        x = (idx % w).astype(jnp.float32)
        valid = max_val > 0
        return x, y, valid

    if factor != 1.0:
        # cv2 fx= call form: dst dims cvRound(src/factor), coords map with
        # exactly `factor` (reference smartVidCrop.py:1186).
        work = resize_by_factor(smaps, factor, 'nearest')
    else:
        work = smaps

    def one(m):
        mask = (m > 0).astype(jnp.float32)
        n = jnp.sum(mask)
        rows = jnp.sum(mask * jnp.arange(m.shape[0], dtype=jnp.float32)[:, None])
        cols = jnp.sum(mask * jnp.arange(m.shape[1], dtype=jnp.float32)[None, :])
        safe_n = jnp.maximum(n, 1.0)
        return cols / safe_n, rows / safe_n, n > 0

    x, y, valid = jax.vmap(one)(work)
    scale = factor if factor != 1.0 else 1.0
    return x * scale, y * scale, valid
