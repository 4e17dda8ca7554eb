"""Preflight runbook test (docs/PREFLIGHT.md; VERDICT r03 missing #1).

Drives the EXACT real-weight command chain the runbook tells the
weight-holder to paste — convert checkpoints -> ``cli benchmark
--ratios 1:3,3:1 ... --oneshot`` (the flagship one-dispatch path, default
``--tn-plan fullseq``) -> ``cli eval`` — end-to-end on hermetic mock
checkpoints (reference layouts, deterministically synthesized content)
and two synthetic DHF1K-named videos, asserting the result tree and
``eval_current.txt`` appear and that the runbook's stated streaming
alternative (drop ``--oneshot``) produces the same boxes.  Anyone holding
the real ``weights_best.pth`` / TransNet TF bundle and the DHF1K videos
reproduces the 200x2 run by substituting assets into the same commands.
The ``--mesh 2 --oneshot`` runbook variant is covered in the mesh tier
(``test_preflight_runbook_mesh``).

The UNISAL checkpoint goes through the torch ``state_dict`` load path the
CLI uses for the released weights (``models/torch_import.py``); the TransNet
checkpoint goes through ``tools/convert_transnet.map_variables`` — the same
mapping ``convert()`` applies to the real TF bundle — and is saved as the
converter's pickle artifact.
"""

import importlib.util
import json
import pathlib
import pickle

import numpy as np
import pytest

#: Full-width models + two ratios: the heaviest single test outside the mesh
#: tier (it IS the real-weight code path).
pytestmark = pytest.mark.slow

cv2 = pytest.importorskip("cv2")

REPO = pathlib.Path(__file__).resolve().parent.parent
TOOLS = REPO / 'tools'
FIXTURES = REPO / 'tests' / 'fixtures'


def _load_tool(name):
    spec = importlib.util.spec_from_file_location(name, TOOLS / f'{name}.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _full_transnet_tf_shapes():
    """TF variable name -> shape for the FULL TransNet config, derived from
    the flax model's own parameter tree (the full-size analogue of
    ``make_conversion_fixtures.transnet_tf_shapes``)."""
    import jax
    import jax.numpy as jnp

    from retargetvid_tpu.models.transnet import TransNetV1

    model = TransNetV1()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 8, 27, 48, 3), jnp.uint8))
    p = variables['params']
    shapes = {}
    for l in range(1, 4):
        for s in range(1, 3):
            for d in (1, 2, 4, 8):
                src = p[f'sddcnn{l}_ddcnn{s}'][f'conv3d_dil{d}']
                base = f'TransNet/SDDCNN_{l}/DDCNN_{s}/Conv3D_{d}'
                shapes[f'{base}/kernel'] = list(src['kernel'].shape)
                shapes[f'{base}/bias'] = list(src['bias'].shape)
    shapes['TransNet/dense/kernel'] = list(p['dense1']['kernel'].shape)
    shapes['TransNet/dense/bias'] = list(p['dense1']['bias'].shape)
    shapes['TransNet/dense_1/kernel'] = list(p['dense2']['kernel'].shape)
    shapes['TransNet/dense_1/bias'] = list(p['dense2']['bias'].shape)
    return shapes


def _write_clip(path, n=24, h=360, w=640, phase=0.0):
    # 24 frames: one below the 32-frame capacity bucket — the smallest
    # program shapes that still exercise multi-pick sampling, both ratios'
    # geometry and the eval frame-count mismatch path (real annotations
    # have hundreds of frames).
    yy, xx = np.mgrid[0:h, 0:w]
    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*'mp4v'),
                             30.0, (w, h))
    if not writer.isOpened():
        pytest.skip('cv2 cannot encode mp4 here')
    for t in range(n):
        cx = w * (0.25 + 0.4 * t / n + phase)
        blob = (230 * np.exp(-(((yy - h / 2) ** 2 +
                                (xx - cx) ** 2) / 2000.0))).astype(np.uint8)
        writer.write(np.stack([blob] * 3, axis=-1))
    writer.release()


def _stable_unisal_sd():
    """A ``weights_best.pth``-layout state_dict whose static forward is an
    exactly LINEAR, contractive function: saliency == Gaussian-blurred input
    luminance.

    Why engineered values: a pseudo-random full-width UNISAL emits either
    delta-peaked or decorrelating maps — the bf16 one-dispatch arm and the
    f32 streaming arm then diverge chaotically (an He-init random net
    propagates a 1-LSB input delta at O(1) relative magnitude), and a
    box-for-box cross-arm assert is noise, not a contract.  Real trained
    checkpoints are in the smooth stable regime (docs/PARITY.md), so the
    mock is put there by construction:

    - every BatchNorm: running stats (0, 1), affine (1, 0) — pass-through;
    - every conv: center-tap channel passthrough (out ``o`` reads in
      ``o % in_c``) — the first conv averages RGB, so the signal is
      luminance; ReLU6 only clips the (negative) background to 0;
    - inverted-residual blocks WITH a skip: final projection conv zeroed —
      the block is an exact identity (out = x + 0);
    - ``smoothing``: the reference's own fixed Gaussian init
      (``model.py:264-272``; rank-1, so the loader's SVD factorization is
      exact);
    - ``adaptation``: uniform positive 1x1 readout (2/64 per channel) —
      field amplitude O(4), sharp enough for content-driven boxes, smooth
      enough that the threshold mask spans the blob.

    The values are deterministic and flow through the SAME torch
    ``state_dict`` load path as the released checkpoint
    (``models/torch_import.py``) — built on the reference's own vendored
    module (``tests/reference_oracles.py``) so the key set is exactly the
    released layout."""
    import torch
    from torch import nn

    from reference_oracles import make_reference_unisal

    from retargetvid_tpu.models.unisal import smoothing_kernel_init

    net = make_reference_unisal(seed=0)
    with torch.no_grad():
        for mod in net.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.weight.fill_(1.0)
                mod.bias.zero_()
                mod.running_mean.zero_()
                mod.running_var.fill_(1.0)
            elif isinstance(mod, nn.Conv2d):
                w = mod.weight
                w.zero_()
                out_c, in_pg, kh, kw = w.shape
                for o in range(out_c):
                    w[o, o % in_pg, kh // 2, kw // 2] = 1.0
                if mod.bias is not None:
                    mod.bias.zero_()
        # Blocks with a residual skip: zero the projection conv -> exact
        # identity.  (Covers both the MobileNetV2 backbone blocks and the
        # decoder's inverted-residual reuse.)
        for mod in net.modules():
            if getattr(mod, 'use_res_connect', False):
                last_conv = [m for m in mod.modules()
                             if isinstance(m, nn.Conv2d)][-1]
                last_conv.weight.zero_()
                if last_conv.bias is not None:
                    last_conv.bias.zero_()
        gauss = torch.from_numpy(
            smoothing_kernel_init(41).astype(np.float32).reshape(41, 41))
        sd = net.state_dict()
        for k in sd:
            if k.startswith('smoothing'):
                sd[k] = gauss.reshape(sd[k].shape).clone()
            elif k.startswith('adaptation') and k.endswith('weight'):
                sd[k] = torch.full_like(sd[k], 2.0 / sd[k].shape[1])
            elif k.startswith('adaptation') and k.endswith('bias'):
                sd[k] = torch.zeros_like(sd[k])
    return sd


def _synth_assets(tmp_path):
    """Step 0 of the runbook: mock assets in the reference's released
    layouts — a torch ``weights_best.pth`` (reference key set via the
    vendored module itself, values engineered for the smooth stable map
    regime — `_stable_unisal_sd`), the TransNet converter's pickle
    artifact (full TF variable set through
    ``tools/convert_transnet.map_variables``), and two synthetic
    DHF1K-named videos (one from each benchmark index range so
    annotation-driven flows engage)."""
    torch = pytest.importorskip('torch')
    fixgen = _load_tool('make_conversion_fixtures')
    conv = _load_tool('convert_transnet')

    sd = _stable_unisal_sd()
    weights_pth = tmp_path / 'weights_best.pth'
    torch.save(sd, weights_pth)

    tf_shapes = _full_transnet_tf_shapes()
    tensors = {n: fixgen.synth_value(n, sh) for n, sh in tf_shapes.items()}
    # Tame the synthesized net's shot decisions: a raw pseudo-random
    # TransNet fires "cut" on ~half the frames with per-frame logits near
    # the threshold, so resize-path fp noise flips decisions between the
    # oneshot and streaming arms (the same effect tools/parity_oneshot.py
    # calibrates away — its docstring).  Shifting the final dense bias
    # pushes every frame robustly below threshold (single-shot regime);
    # the conversion MAPPING under test is untouched — the bias flows
    # through map_variables like any real checkpoint value.
    tensors['TransNet/dense_1/bias'] = np.asarray([5.0, -5.0], np.float32)
    tn_variables = conv.map_variables(tensors.__getitem__)
    tn_pkl = tmp_path / 'transnet.pkl'
    with open(tn_pkl, 'wb') as fp:
        pickle.dump(tn_variables, fp)

    vids = tmp_path / 'DHF1k'
    vids.mkdir()
    _write_clip(vids / '001.mp4', phase=0.0)
    _write_clip(vids / '601.mp4', phase=0.1)
    return weights_pth, tn_pkl, vids


def test_preflight_runbook(reference_dir, tmp_path, capsys):
    weights_pth, tn_pkl, vids = _synth_assets(tmp_path)

    # --- step 2 of the runbook: the EXACT documented command
    # (docs/PREFLIGHT.md §2 — including `--oneshot`, the flagship
    # one-dispatch path, under the default `--tn-plan fullseq`), both
    # ratios, with the annotations wired so the reference's inline
    # per-video 6-user eval engages (smartVidCrop.py:2798-2836).  Only the
    # asset paths are substituted (plus --annotations-extract because the
    # reference tree is read-only here).
    import time as _time

    from retargetvid_tpu.cli import main
    out_dir = tmp_path / 'results'
    _t0 = _time.monotonic()
    main(['benchmark',
          '--videos', str(vids),
          '--out', str(out_dir),
          '--test-name', 'smartvidcrop_tpu',
          '--ratios', '1:3,3:1',
          '--unisal-weights', str(weights_pth),
          '--transnet-weights', str(tn_pkl),
          '--annotations', str(reference_dir / 'annotations'),
          '--annotations-extract', str(tmp_path / 'annots'),
          '--oneshot'])
    console = capsys.readouterr().out
    print(f'[preflight] oneshot arm: {_time.monotonic() - _t0:.0f}s')
    assert 'loaded UNISAL weights' in console
    assert 'loaded TransNet weights' in console
    assert 'WARNING: no --unisal-weights' not in console
    assert 'user #1:' in console and 'mean   :' in console

    from retargetvid_tpu.eval.annotations import read_boxes_file
    run = out_dir / 'smartvidcrop_tpu'
    for vid in ('001', '601'):
        for ar in ('1-3', '3-1'):
            boxes = read_boxes_file(run / f'{vid}_{ar}.txt')
            assert boxes.shape == (24, 4)
            info = (run / f'{vid}_{ar}_info.txt').read_text()
            assert 'result:smart cropped' in info
            assert 't_total' in info and '%' in info
    boxes13 = read_boxes_file(run / '001_1-3.txt')
    assert ((boxes13[:, 2] - boxes13[:, 0]) == 120).all()
    boxes31 = read_boxes_file(run / '001_3-1.txt')
    # 3:1 on 640x360 preserves width: floor(640/3) = 213-tall window (the
    # golden outputs' convention, e.g. results/smartvidcrop/001_3-1.txt).
    assert ((boxes31[:, 3] - boxes31[:, 1]) == 213).all()

    # --- "drop it for the streaming 2-dispatch path" (the runbook's
    # stated alternative): same command without --oneshot must produce
    # the same result tree (1:3 bounds the extra full-width compiles).
    _t0 = _time.monotonic()
    main(['benchmark',
          '--videos', str(vids),
          '--out', str(out_dir),
          '--test-name', 'streaming',
          '--ratios', '1:3',
          '--unisal-weights', str(weights_pth),
          '--transnet-weights', str(tn_pkl),
          '--chunk', '8'])
    capsys.readouterr()
    print(f'[preflight] streaming arm: {_time.monotonic() - _t0:.0f}s')
    for vid in ('001', '601'):
        one = read_boxes_file(run / f'{vid}_1-3.txt')
        seq = read_boxes_file(out_dir / 'streaming' / f'{vid}_1-3.txt')
        assert one.shape == seq.shape, vid
        # Whole-clip program vs chunked streaming: identical math modulo
        # batched-fp reassociation (same tolerance as test_oneshot).
        assert np.abs(one - seq).max() <= 1, vid

    # --- step 3: the standalone evaluator over the result tree.  The mock
    # runs have 36-frame videos vs the real annotation counts, so the
    # validity report must flag frame-count errors yet still score
    # (warn-don't-raise parity, retargetvid_eval.py:92-125).
    eval_out = tmp_path / 'eval_current.txt'
    main(['eval', str(out_dir),
          '--annotations', str(reference_dir / 'annotations'),
          '--annotations-extract', str(tmp_path / 'annots'),
          '--out', str(eval_out)])
    console = capsys.readouterr().out
    assert 'Checking runs validity' in console
    assert 'smartvidcrop_tpu' in console
    assert eval_out.is_file()
    body = eval_out.read_text()
    assert body.startswith('Method')
    assert 'smartvidcrop_tpu' in body


@pytest.mark.mesh
def test_preflight_runbook_mesh(tmp_path, capsys):
    """The runbook's `--mesh N` variant (docs/PREFLIGHT.md §2 notes) through
    the same converted mock checkpoints: `--mesh 2 --oneshot` must produce
    the per-clip one-shot path's boxes (one clip per dp shard)."""
    weights_pth, tn_pkl, vids = _synth_assets(tmp_path)

    from retargetvid_tpu.cli import main
    from retargetvid_tpu.eval.annotations import read_boxes_file

    out_dir = tmp_path / 'results'
    main(['benchmark',
          '--videos', str(vids),
          '--out', str(out_dir),
          '--test-name', 'oneshot',
          '--ratios', '1:3',
          '--unisal-weights', str(weights_pth),
          '--transnet-weights', str(tn_pkl),
          '--oneshot'])
    main(['benchmark',
          '--videos', str(vids),
          '--out', str(out_dir),
          '--test-name', 'mesh2',
          '--ratios', '1:3',
          '--unisal-weights', str(weights_pth),
          '--transnet-weights', str(tn_pkl),
          '--oneshot', '--mesh', '2'])
    capsys.readouterr()
    for vid in ('001', '601'):
        one = read_boxes_file(out_dir / 'oneshot' / f'{vid}_1-3.txt')
        sh = read_boxes_file(out_dir / 'mesh2' / f'{vid}_1-3.txt')
        assert one.shape == sh.shape, vid
        assert np.abs(one - sh).max() <= 1, vid
        info = (out_dir / 'mesh2' / f'{vid}_1-3_info.txt').read_text()
        assert 'oneshot dp=2' in info or 'smart cropped' in info
