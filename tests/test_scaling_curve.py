"""ShardedOneShot dp-scaling curve on the virtual mesh (VERDICT r4 next #7).

"Linear by construction" is an argument; this measures it.  The one-dispatch
whole-clip program runs one clip per dp shard with zero hot-path
collectives, so per-clip wall time must not GROW with dp beyond dispatch
amortization noise — accidental cross-shard serialization (a stray gather
over the clip axis, a D^2 term, a per-shard recompile) would show up as
super-linear wall growth.  On this 1-core CPU host all shards' compute runs
serially on one core, so per-clip wall is flat-to-falling in dp (the fixed
dispatch/fetch overhead amortizes); on real chips the same program gives
the multi-chip speedup (docs/SCALING.md).

The measured relative curve is recorded in docs/SCALING.md §"Measured
dp-scaling curve".
"""

import time

import numpy as np
import pytest

pytestmark = [pytest.mark.slow, pytest.mark.mesh]


def _make_clips(n_clips, n=12, h=70, w=125, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    clips = []
    for i in range(n_clips):
        frames = np.zeros((n, h, w, 3), np.uint8)
        jitter = rng.integers(0, 10)
        for t in range(n):
            cx = 20 + 3 * t + 25 * (i % 2) + jitter
            blob = 220 * np.exp(-(((yy - 35) ** 2 + (xx - cx) ** 2) / 200.0))
            frames[t] = blob[..., None].astype(np.uint8)
        clips.append(frames)
    return clips


def test_oneshot_per_clip_wall_flat_in_dp(capsys):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _tiny_unisal
    from retargetvid_tpu.config import sc_init_crop_params
    from retargetvid_tpu.models.transnet import TransNetV1
    from retargetvid_tpu.parallel.mesh import make_mesh
    from retargetvid_tpu.parallel.runner import ShardedOneShot

    model = _tiny_unisal()
    x0 = jnp.zeros((1, 1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, static=True)
    tn_model = TransNetV1(f=2, l=3, s=2, d=16)
    tn_params = tn_model.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 8, 27, 48, 3), jnp.uint8))
    tn_params['params']['dense2']['bias'] = jnp.asarray([5.0, -5.0])
    cp = sc_init_crop_params()
    cp['out_ratio'] = '1:3'
    kw = dict(fps=6.0, w_final=41, h_final=125)

    per_clip = {}
    for dp in (1, 2, 4, 8):
        mesh = make_mesh(dp)   # dp-only factorization (the benchmark shape)
        runner = ShardedOneShot(mesh, tn_model, tn_params,
                                variables=variables, model=model,
                                dtype=jnp.float32, s_pad=4, tn_fullseq=True)
        # Warm up (compile) on a dedicated clip set, then time fresh inputs
        # (byte-identical dispatches can be memoized on some backends).
        warm = runner.run_batch(_make_clips(dp, seed=99), cp, **kw)
        assert not any(o['overrun'] for o in warm)
        walls = []
        for rep in range(3):
            clips = _make_clips(dp, seed=rep)
            t0 = time.perf_counter()
            outs = runner.run_batch(clips, cp, **kw)
            walls.append(time.perf_counter() - t0)
            assert len(outs) == dp
            assert not any(o['overrun'] for o in outs)
        per_clip[dp] = min(walls) / dp

    with capsys.disabled():
        print('\ndp-scaling curve (per-clip wall, relative to dp=1):')
        for dp, w in per_clip.items():
            print(f'  dp={dp}: {w:.3f}s per clip '
                  f'({w / per_clip[1]:.2f}x dp=1)')

    # No cross-shard serialization: per-clip wall at dp=8 stays within 1.5x
    # of dp=1 even though one CPU core serializes all shards' compute.
    assert per_clip[8] <= 1.5 * per_clip[1], per_clip
    # And the curve never blows up at intermediate points either.
    for dp in (2, 4):
        assert per_clip[dp] <= 1.5 * per_clip[1], per_clip
