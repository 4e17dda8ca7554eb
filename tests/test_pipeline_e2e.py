"""Full-pipeline end-to-end tests on synthetic inputs (random weights)."""

import pickle

import numpy as np
import pytest

#: Compile-heavy on CPU; excluded from the fast tier (pytest -m "not slow").
pytestmark = pytest.mark.slow


cv2 = pytest.importorskip("cv2")


def _synthetic_frames(n=48, h=180, w=320):
    """Moving bright blob on dark background, RGB uint8."""
    yy, xx = np.mgrid[0:h, 0:w]
    frames = np.zeros((n, h, w, 3), np.uint8)
    for t in range(n):
        cx = w * (0.2 + 0.6 * t / n)
        cy = h * 0.5
        blob = (220 * np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / 400.0)))
        frames[t, :, :, 0] = blob
        frames[t, :, :, 1] = blob * 0.8
        frames[t, :, :, 2] = 30
    return frames


@pytest.fixture(scope="module")
def models():
    """Random-weight model forwards (tiny TransNet for speed)."""
    import jax
    import jax.numpy as jnp

    from retargetvid_tpu.models.transnet import TransNetV1, predict_video_windows
    from retargetvid_tpu.pipeline.saliency import SaliencyPredictor

    model = TransNetV1(f=2, d=16)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8, 27, 48, 3), jnp.uint8))
    apply_fn = jax.jit(lambda batch: model.apply(params, batch))

    def transnet_fn(frames):
        return predict_video_windows(apply_fn, frames)

    from conftest import TINY_UNISAL_CFG
    from retargetvid_tpu.models.unisal import UNISAL
    un_model = UNISAL(**TINY_UNISAL_CFG)
    predictor = SaliencyPredictor(model=un_model, chunk=8)
    return transnet_fn, predictor.predict


@pytest.fixture(scope="module")
def tiny_video(tmp_path_factory):
    path = tmp_path_factory.mktemp("vids") / "042.mp4"
    frames = _synthetic_frames()
    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*'mp4v'),
                             30.0, (320, 180))
    if not writer.isOpened():
        pytest.skip("cv2 VideoWriter cannot encode mp4 here")
    for f in frames:
        writer.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    writer.release()
    return path


@pytest.mark.slow
def test_video_end_to_end(tiny_video, models, tmp_path):
    from retargetvid_tpu.config import sc_init_crop_params
    from retargetvid_tpu.eval.annotations import read_boxes_file, write_boxes_file
    from retargetvid_tpu.pipeline.crop import smart_vid_crop

    transnet_fn, saliency_fn = models
    cp = sc_init_crop_params()
    cp['out_ratio'] = '1:3'
    vd, res = smart_vid_crop(str(tiny_video), cp, save_vid=False,
                             transnet_fn=transnet_fn, saliency_fn=saliency_fn)

    assert res['result'] == 'smart cropped'
    boxes = np.asarray(vd['bbs'])
    assert boxes.shape == (vd['fc'], 4)
    assert vd['fc'] == 48
    # 1:3 on 320x180: preserve height -> 60x180 window
    assert ((boxes[:, 2] - boxes[:, 0]) == 60).all()
    assert ((boxes[:, 3] - boxes[:, 1]) == 180).all()
    assert (boxes[:, 0] >= 0).all() and (boxes[:, 2] <= 320).all()

    # info string contract
    assert res['info'].startswith(' (180x320)->')
    assert 't_total' in res
    assert '%' in res['t_total']

    # txt round trip
    out = tmp_path / '042_1-3.txt'
    write_boxes_file(out, boxes)
    back = read_boxes_file(out)
    np.testing.assert_array_equal(back, boxes)


@pytest.mark.slow
def test_feature_cache_roundtrip(tiny_video, models, tmp_path):
    """temp_path caching: second run skips ingest and gives identical boxes."""
    from retargetvid_tpu.config import sc_init_crop_params
    from retargetvid_tpu.pipeline.crop import smart_vid_crop

    transnet_fn, saliency_fn = models
    cp = sc_init_crop_params()
    cp['out_ratio'] = '3:1'
    vd1, _ = smart_vid_crop(str(tiny_video), cp, save_vid=False,
                            temp_path=str(tmp_path),
                            transnet_fn=transnet_fn, saliency_fn=saliency_fn)
    assert (tmp_path / '042.pkl').is_file()
    # Second run: no model fns -> must come from cache.
    vd2, _ = smart_vid_crop(str(tiny_video), cp, save_vid=False,
                            temp_path=str(tmp_path))
    np.testing.assert_array_equal(np.asarray(vd1['bbs']),
                                  np.asarray(vd2['bbs']))


@pytest.mark.slow
def test_pickle_ingest_path(models, tmp_path):
    """Reference .pkl web-service contract with precomputed shot cuts."""
    from retargetvid_tpu.config import sc_init_crop_params
    from retargetvid_tpu.pipeline.crop import smart_vid_crop

    _, saliency_fn = models
    frames = _synthetic_frames(n=40)
    pkl = tmp_path / 'clip.pkl'
    with open(pkl, 'wb') as fp:
        pickle.dump({'fr': 25.0, 'frame_count': 40, 'w': 320, 'h': 180,
                     'frames': frames, 'trans_inds': [20]}, fp)

    cp = sc_init_crop_params()
    cp['out_ratio'] = '1:3'
    vd, res = smart_vid_crop(str(pkl), cp, save_vid=False,
                             saliency_fn=saliency_fn)
    # cut at frame 20 -> two segments
    assert vd['segmentation'].shape[0] == 2
    assert vd['segmentation'][1][0] == 21
    assert len(vd['bbs']) == 40


@pytest.mark.slow
def test_rendering(tiny_video, models, tmp_path):
    from retargetvid_tpu.config import sc_init_crop_params
    from retargetvid_tpu.io.video import probe_video
    from retargetvid_tpu.pipeline.crop import smart_vid_crop

    transnet_fn, saliency_fn = models
    cp = sc_init_crop_params()
    cp['out_ratio'] = '1:3'
    out = tmp_path / 'rendered'
    vd, res = smart_vid_crop(str(tiny_video), cp, save_vid=True,
                             final_vid_fn=str(out),
                             demo_fn=str(out) + '_demo',
                             transnet_fn=transnet_fn, saliency_fn=saliency_fn)
    info = probe_video(str(out) + '.mp4')
    assert info['frame_count'] == 48
    assert (info['width'], info['height']) == (60, 180)
    demo = probe_video(str(out) + '_demo.mp4')
    assert demo['frame_count'] == 48
