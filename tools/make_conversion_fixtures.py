"""Generate hermetic weight-conversion fixtures (VERDICT round-2 item #7).

Produces committed fixtures so conversion parity asserts in ANY environment
(no tensorflow / torch imports at test time — ``tests/
test_conversion_hermetic.py``):

- ``tests/fixtures/transnet_tiny_shapes.json`` — TF variable name -> shape
  for the tiny TransNet test config (F=2, L=3, S=2, D=16), derived from the
  flax model's own parameter tree via the inverse of the converter mapping.
- ``tests/fixtures/unisal_sd_shapes.json`` — torch ``state_dict`` key ->
  (shape, dtype) for the reference UNISAL model, harvested ONCE here (torch +
  the reference source are needed only at generation time).
- ``tests/fixtures/conversion_goldens.npz`` — golden outputs: TransNet
  window probabilities and the UNISAL static saliency map computed from the
  deterministically-synthesized weights after conversion.

The synthesized weights are a pure function of the variable NAME
(``synth_value``), so tests re-create the exact same checkpoint content from
the shapes JSON alone.  The goldens anchor the converter mapping + model
semantics that the live-TF / live-torch parity tests
(``tests/test_transnet_conversion.py``, ``tests/test_models_unisal.py``)
verified against the real frameworks when this file was generated.

Run:  JAX_PLATFORMS=cpu python tools/make_conversion_fixtures.py
"""

from __future__ import annotations

import json
import os
import sys
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'tests', 'fixtures')

TN_CFG = dict(f=2, l=3, s=2, d=16)     # tiny TransNet test variant


def synth_value(name: str, shape, dtype: str = 'float32') -> np.ndarray:
    """Deterministic synthetic weight for a checkpoint entry.

    Seeded by the NAME alone so generator and hermetic tests produce
    byte-identical checkpoints from the shapes JSON.  Rules keep the nets
    numerically sane: positive BatchNorm running variances, near-unit BN
    scales, small conv/linear weights, zero counters.
    """
    shape = tuple(int(x) for x in shape)
    rng = np.random.default_rng(zlib.crc32(name.encode()))
    if 'num_batches_tracked' in name:
        return np.zeros(shape, np.int64)
    if 'running_var' in name:
        v = 0.5 + 0.3 * np.abs(rng.standard_normal(shape))
    elif 'running_mean' in name:
        v = 0.1 * rng.standard_normal(shape)
    elif name.endswith('bias') or name.endswith('.bias'):
        v = 0.05 * rng.standard_normal(shape)
    elif len(shape) == 1:              # BN scale / affine vectors
        v = 1.0 + 0.1 * rng.standard_normal(shape)
    else:                              # conv / linear weights
        fan_in = int(np.prod(shape)) // max(shape[0], 1) if len(shape) > 1 \
            else int(np.prod(shape))
        v = rng.standard_normal(shape) * np.sqrt(2.0 / max(fan_in, 1))
    return v.astype(dtype)


# --------------------------------------------------------------------------
# TransNet


def transnet_tf_shapes() -> dict:
    """TF variable name -> shape, from the flax model's own param tree
    (TF Conv3D kernels are DHWIO = flax layout; dense (in, out) in both)."""
    import jax
    import jax.numpy as jnp

    from retargetvid_tpu.models.transnet import TransNetV1

    model = TransNetV1(**TN_CFG)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 8, 27, 48, 3), jnp.uint8))
    p = variables['params']
    shapes = {}
    for l in range(1, TN_CFG['l'] + 1):
        for s in range(1, TN_CFG['s'] + 1):
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


def transnet_golden(shapes: dict) -> np.ndarray:
    import importlib.util
    import jax.numpy as jnp

    from retargetvid_tpu.models.transnet import TransNetV1

    spec = importlib.util.spec_from_file_location(
        'convert_transnet',
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     'convert_transnet.py'))
    conv = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(conv)

    tensors = {n: synth_value(n, sh) for n, sh in shapes.items()}
    variables = conv.map_variables(tensors.__getitem__)
    model = TransNetV1(**TN_CFG)
    frames = np.random.default_rng(0).integers(
        0, 255, (2, 12, 27, 48, 3)).astype(np.uint8)
    probs = np.asarray(model.apply(
        {'params': variables['params']}, jnp.asarray(frames)))
    return probs


# --------------------------------------------------------------------------
# UNISAL


def unisal_sd_shapes() -> dict:
    """torch state_dict key -> [shape, dtype] from the reference model
    (needs torch + /root/reference; generation time only)."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'tests'))
    from reference_oracles import make_reference_unisal

    ref = make_reference_unisal(seed=0)
    return {k: [list(v.shape), str(v.numpy().dtype)]
            for k, v in ref.state_dict().items()}


def unisal_golden(shapes: dict):
    import jax.numpy as jnp

    from retargetvid_tpu.models.torch_import import load_unisal_variables
    from retargetvid_tpu.models.unisal import UNISAL

    sd = {k: synth_value(k, sh, dt) for k, (sh, dt) in shapes.items()}
    model = UNISAL()
    variables = load_unisal_variables(model, sd)
    x = np.random.default_rng(1).normal(
        0, 1, (1, 1, 224, 416, 3)).astype(np.float32)
    out, _ = model.apply(variables, jnp.asarray(x), target_size=(140, 250),
                         source='SALICON', static=True)
    return np.asarray(out, np.float32)


def tree_fingerprint(tree, prefix='') -> dict:
    """path -> sum|leaf| for a nested variables dict: a cheap, deterministic
    signature of the converted tree (catches mapping/transpose regressions
    without running a forward)."""
    out = {}
    for k, v in tree.items():
        path = f'{prefix}/{k}' if prefix else k
        if isinstance(v, dict):
            out.update(tree_fingerprint(v, path))
        else:
            arr = np.asarray(v, np.float64)
            out[path] = [list(np.asarray(v).shape),
                         float(np.abs(arr).sum())]
    return out


def unisal_fingerprint(shapes: dict) -> dict:
    from retargetvid_tpu.models.torch_import import load_unisal_variables
    from retargetvid_tpu.models.unisal import UNISAL

    sd = {k: synth_value(k, sh, dt) for k, (sh, dt) in shapes.items()}
    variables = load_unisal_variables(UNISAL(), sd)
    return tree_fingerprint(
        {k: dict(v) for k, v in variables.items()})


def main():
    os.makedirs(FIXTURE_DIR, exist_ok=True)

    tn_shapes = transnet_tf_shapes()
    with open(os.path.join(FIXTURE_DIR, 'transnet_tiny_shapes.json'),
              'w') as fp:
        json.dump(tn_shapes, fp, indent=1, sort_keys=True)
    tn_probs = transnet_golden(tn_shapes)
    print(f'transnet golden probs: shape={tn_probs.shape} '
          f'std={tn_probs.std():.4f}')

    un_shapes = unisal_sd_shapes()
    with open(os.path.join(FIXTURE_DIR, 'unisal_sd_shapes.json'), 'w') as fp:
        json.dump(un_shapes, fp, indent=1, sort_keys=True)
    fps_un = unisal_fingerprint(un_shapes)
    with open(os.path.join(FIXTURE_DIR, 'unisal_tree_fingerprint.json'),
              'w') as fp:
        json.dump(fps_un, fp, indent=1, sort_keys=True)
    un_map = unisal_golden(un_shapes)
    print(f'unisal golden map: shape={un_map.shape} std={un_map.std():.4f}')

    assert np.all(np.isfinite(tn_probs)) and tn_probs.std() > 1e-4
    assert np.all(np.isfinite(un_map)) and un_map.std() > 1e-6

    np.savez_compressed(
        os.path.join(FIXTURE_DIR, 'conversion_goldens.npz'),
        transnet_probs=tn_probs, unisal_logmap=un_map)
    print(f'fixtures -> {FIXTURE_DIR}')


if __name__ == '__main__':
    main()
