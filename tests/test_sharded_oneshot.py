"""ShardedOneShot: dp-sharded whole-clip batch equals per-clip one-shot.

The batched variant pads clips to a shared frame capacity and threads each
clip's live count through the program as data (``make_oneshot_body``'s
``n``); this asserts the padded/traced-``n`` composition is EXACTLY the
per-clip ``OneShotClipProgram`` (which compiles at the clip's own frame
count) for a mixed-length batch on the virtual 8-device CPU mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

#: 8-virtual-device SPMD compiles: the heaviest tier, deselected by the
#: default run (pytest.ini addopts); run with -m mesh (or -m "").
pytestmark = [pytest.mark.slow, pytest.mark.mesh]


def _clip(rng, fc, h, w, phase):
    yy, xx = np.mgrid[0:h, 0:w]
    frames = np.zeros((fc, h, w, 3), np.uint8)
    for t in range(fc):
        cx = w * (0.2 + 0.6 * t / fc) if t < fc // 2 else w * (0.6 + phase)
        blob = 225 * np.exp(-(((yy - h * 0.5) ** 2 +
                               (xx - cx) ** 2) / 250.0))
        frames[t] = np.clip(blob[..., None] +
                            (10 if t < fc // 2 else 50 + 40 * phase), 0,
                            255).astype(np.uint8)
    return frames


def test_sharded_oneshot_matches_single():
    from retargetvid_tpu.config import sc_init_crop_params
    from retargetvid_tpu.models.transnet import TransNetV1
    from retargetvid_tpu.models.unisal import UNISAL
    from retargetvid_tpu.ops.boxes import calc_dest_size
    from retargetvid_tpu.parallel.mesh import make_mesh
    from retargetvid_tpu.parallel.runner import ShardedOneShot, group_raw_clips
    from retargetvid_tpu.pipeline.oneshot import OneShotClipProgram

    h, w = 90, 160
    fps = 30.0
    cp = sc_init_crop_params()
    cp['out_ratio'] = '1:3'
    dest = calc_dest_size(w, h, cp['out_ratio'])
    rng = np.random.default_rng(11)

    tn_model = TransNetV1(f=2, l=3, s=2, d=16)
    tn_params = tn_model.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 8, 27, 48, 3), jnp.uint8))
    # Bias probs ~ 0 (random weights otherwise fire a cut on every frame).
    tn_params['params']['dense2']['bias'] = jnp.asarray([5.0, -5.0])
    from conftest import TINY_UNISAL_CFG
    un_model = UNISAL(**TINY_UNISAL_CFG)
    x0 = jnp.zeros((1, 1, 224, 416, 3), jnp.float32)
    un_vars = un_model.init(jax.random.PRNGKey(1), x0, static=True)

    # Mixed frame counts in one bucket (both <= 64) exercise the pad +
    # traced-n path against per-clip programs compiled at the EXACT count.
    raws = [_clip(rng, 52, h, w, 0.0), _clip(rng, 60, h, w, 0.15)]

    mesh = make_mesh(8, axis_sizes=(2, 2, 2))
    sharded = ShardedOneShot(mesh, tn_model, tn_params, variables=un_vars,
                             model=un_model, dtype=jnp.float32)
    kw = dict(fps=fps, w_final=dest['w_final'], h_final=dest['h_final'])
    batch = sharded.run_batch(raws, cp, **kw)

    single = OneShotClipProgram(tn_model, tn_params, variables=un_vars,
                                model=un_model, dtype=jnp.float32)
    for raw, res in zip(raws, batch):
        ref = single.run(jnp.asarray(raw), cp, **kw)
        assert not res['overrun']
        assert res['fc_sel'] == ref['fc_sel']
        assert res['n_segments'] == ref['n_segments']
        fc = raw.shape[0]
        np.testing.assert_allclose(res['probs'][:fc], ref['probs'][:fc],
                                   rtol=1e-5, atol=1e-5)
        assert np.array_equal(res['boxes'], ref['boxes'])

    # group_raw_clips: one signature pool, padded tail batch.
    items = [{'raw': r, 'fps': fps} for r in raws] + \
        [{'raw': _clip(rng, 40, h, w, 0.3), 'fps': fps}]
    batches = group_raw_clips(items, dp=2)
    assert [(len(b), n) for b, n in batches] == [(2, 2), (2, 1)]

    # Overrun detection: flip the TransNet bias to cut on EVERY frame so
    # n_segments blows past s_pad.  Params ride as jit arguments, so the
    # new values reuse the compiled program (no recompile), the clamped
    # device program still completes, and the batch flags the overrun for
    # the caller's streaming fallback.
    import jax.tree_util as jtu
    cut_params = jtu.tree_map(lambda x: x, sharded.tn_params)
    cut_params['params']['dense2']['bias'] = jnp.asarray([-5.0, 5.0])
    sharded.tn_params = jax.device_put(
        cut_params, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))
    over = sharded.run_batch(raws, cp, **kw)
    assert all(o['overrun'] for o in over)
