"""ShardedClipRunner: dp-sharded multi-clip batch equals per-clip results."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

#: 8-virtual-device SPMD compiles: the heaviest tier, deselected by the
#: default run (pytest.ini addopts); run with -m mesh (or -m "").
pytestmark = [pytest.mark.slow, pytest.mark.mesh]



@pytest.mark.slow
def test_sharded_clip_batch_matches_single():
    from retargetvid_tpu.config import sc_init_crop_params
    from retargetvid_tpu.models.unisal import UNISAL
    from retargetvid_tpu.parallel.mesh import make_mesh
    from retargetvid_tpu.parallel.runner import ShardedClipRunner
    from retargetvid_tpu.pipeline.fused import FusedClipProgram

    from conftest import TINY_UNISAL_CFG
    model = UNISAL(**TINY_UNISAL_CFG)
    x0 = jnp.zeros((1, 1, 224, 416, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(5), x0, static=True)

    rng = np.random.default_rng(7)
    h, w, n = 140, 250, 24
    yy, xx = np.mgrid[0:h, 0:w]

    def make_clip(phase):
        frames = np.zeros((n, h, w, 3), np.uint8)
        for t in range(n):
            cx = 40 + 2 * t + 20 * phase
            blob = 220 * np.exp(-(((yy - 70) ** 2 + (xx - cx) ** 2) / 300.0))
            frames[t] = blob[..., None].astype(np.uint8)
        selected = list(range(0, n, 6)) + [n - 1]
        return {
            'sal_frames': frames,
            'selected': selected,
            'true_inds': selected,
            'segmentation': np.array([[0, n - 1]]),
            'segmentation_sel': np.array([[0, len(selected) - 1]]),
            'fc': n,
        }

    clips = [make_clip(0), make_clip(1)]
    cp = sc_init_crop_params()
    kw = dict(fps=30.0, h_orig=360, w_orig=640, w_final=120, h_final=360)

    mesh = make_mesh(8, axis_sizes=(2, 2, 2))
    runner = ShardedClipRunner(mesh, variables=variables, model=model)
    batch = runner.run_batch(clips, cp, **kw)

    single = FusedClipProgram(variables=variables, model=model,
                              dtype=jnp.float32)
    for clip, res in zip(clips, batch):
        ref = single.run(jnp.asarray(clip['sal_frames']), clip['selected'],
                         clip['true_inds'], clip['segmentation'],
                         clip['segmentation_sel'], cp, fc=clip['fc'], **kw)
        diff = np.abs(res['boxes'] - ref['boxes'])
        assert diff.max() <= 1, diff.max()
        assert res['boxes'].shape == (clip['fc'], 4)
