"""Flag plumbing of tools/parity_oneshot.py's real-weight preflight mode.

The heavy arms (model builds, reference chain, the one-shot program) are
stubbed; what these tests pin is the CLI contract `docs/PREFLIGHT.md` §4 and
`docs/PARITY.md` §"Speckle promotion rule" quote verbatim: `--videos DIR`
builds the real-clip corpus, `--best-settings` selects the ISM preset,
`--adaptive-link` sets `tpu_adaptive_link` on our side's crop params, and
real weights skip the random-init tn-bias calibration.
"""

import importlib.util
import os

import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')

TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'tools')


@pytest.fixture()
def po(monkeypatch):
    spec = importlib.util.spec_from_file_location(
        'parity_oneshot_under_test', os.path.join(TOOLS, 'parity_oneshot.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_clip(path, n=8, h=36, w=64):
    wr = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*'mp4v'),
                         30.0, (w, h))
    if not wr.isOpened():
        pytest.skip('cv2 cannot encode mp4 here')
    for t in range(n):
        wr.write(np.full((h, w, 3), 20 * t, np.uint8))
    wr.release()


def test_real_video_corpus_and_flags(po, monkeypatch, tmp_path):
    vids = tmp_path / 'DHF1k'
    vids.mkdir()
    _write_clip(vids / '002.mp4')
    _write_clip(vids / '001.mp4')
    _write_clip(vids / '003.avi')

    seen = {}

    def fake_build_models(**kw):
        seen['build'] = kw
        return 'tn', 'sal', 'prog'

    def fake_evaluate(corpus, ref, presets, ratios, program):
        seen.update(corpus=corpus, presets=presets, ratios=ratios,
                    program=program)
        return []

    monkeypatch.setattr(po, 'build_models', fake_build_models)
    monkeypatch.setattr(po, 'evaluate', fake_evaluate)
    monkeypatch.setattr(po.pf, 'load_reference_pipeline', lambda: {})
    monkeypatch.setattr(
        po, 'calibrate_tn_bias',
        lambda *a, **k: pytest.fail('real weights must skip calibration'))

    po.main(['--unisal-weights', 'w.pth', '--transnet-weights', 't.pkl',
             '--videos', str(vids), '--max-videos', '2',
             '--best-settings', '--adaptive-link'])

    # Corpus: first 2 clips by sorted name, stems as case names.
    assert sorted(seen['corpus']) == ['001', '002']
    for _stem, (path, overrides) in seen['corpus'].items():
        assert os.path.isfile(path)
        assert overrides == {'tpu_adaptive_link': True}
    # --best-settings selects exactly the ISM preset.
    assert [name for name, _cp in seen['presets']] == ['ISM']
    # Real weights flow to build_models; calibration skipped (tn_bias=0).
    assert seen['build']['unisal_weights'] == 'w.pth'
    assert seen['build']['transnet_weights'] == 't.pkl'
    assert seen['build']['tn_bias'] == 0.0


def test_videos_dir_empty_errors(po, monkeypatch, tmp_path):
    monkeypatch.setattr(po, 'build_models', lambda **kw: ('t', 's', 'p'))
    with pytest.raises(SystemExit):
        po.main(['--videos', str(tmp_path), '--unisal-weights', 'w.pth'])


def test_build_models_loads_real_weights(po, tmp_path, monkeypatch):
    """build_models with transnet_weights loads the pickle verbatim and
    applies no bias shift; the random-init path still calibrates."""
    import pickle

    import jax
    import jax.numpy as jnp

    from retargetvid_tpu.models.transnet import TransNetV1

    tn = TransNetV1()
    params = tn.init(jax.random.PRNGKey(3),
                     jnp.zeros((1, 8, 27, 48, 3), jnp.uint8))
    pkl = tmp_path / 'tn.pkl'
    with open(pkl, 'wb') as fp:
        pickle.dump(jax.tree_util.tree_map(np.asarray, params), fp)

    transnet_fn, _sal, _prog = po.build_models(
        tn_bias=99.0, transnet_weights=str(pkl))
    got = np.asarray(transnet_fn.params['params']['dense2']['bias'])
    want = np.asarray(params['params']['dense2']['bias'])
    np.testing.assert_array_equal(got, want)  # tn_bias NOT applied
