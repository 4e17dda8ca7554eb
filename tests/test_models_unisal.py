"""UNISAL flax model: architecture + converted-weight parity vs torch oracle."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_oracles import make_reference_unisal

from retargetvid_tpu.models.torch_import import load_unisal_variables
from retargetvid_tpu.models.unisal import UNISAL

#: Compile-heavy on CPU; excluded from the fast tier (pytest -m "not slow").
pytestmark = pytest.mark.slow



@pytest.fixture(scope="module")
def oracle_and_ours():
    ref = make_reference_unisal(seed=0)
    model = UNISAL()
    variables = load_unisal_variables(model, ref.state_dict())
    return ref, model, variables


@pytest.mark.slow
def test_static_forward_parity(oracle_and_ours):
    """Static (RNN-bypassed) forward — the crop pipeline's exact mode
    (reference train.py:789, model.py:459)."""
    ref, model, variables = oracle_and_ours
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (1, 1, 224, 416, 3)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x.transpose(0, 1, 4, 2, 3)),
                      target_size=(140, 250), source='SALICON', static=True)
    ref_np = ref_out.numpy()[:, :, 0]           # (B, T, H, W)

    out, hidden = model.apply(variables, x, target_size=(140, 250),
                              source='SALICON', static=True)
    ours = np.asarray(out)[..., 0]
    assert hidden is None
    assert ours.shape == ref_np.shape
    # log-probabilities: compare in probability space
    p_ref = np.exp(ref_np)
    p_ours = np.exp(ours)
    denom = p_ref.max()
    rel = np.abs(p_ours - p_ref).max() / denom
    assert rel < 5e-3, rel


@pytest.mark.slow
def test_dynamic_forward_parity(oracle_and_ours):
    """Dynamic path with the ConvGRU scan and carried hidden state."""
    ref, model, variables = oracle_and_ours
    rng = np.random.default_rng(1)
    t = 3
    x = rng.normal(0, 1, (1, t, 96, 160, 3)).astype(np.float32)

    with torch.no_grad():
        ref_out, ref_hidden = ref(
            torch.from_numpy(x.transpose(0, 1, 4, 2, 3)),
            target_size=(96, 160), source='DHF1K', static=False,
            return_hidden=True)
    ref_np = ref_out.numpy()[:, :, 0]

    out, hidden = model.apply(variables, x, target_size=(96, 160),
                              source='DHF1K', static=False)
    ours = np.asarray(out)[..., 0]
    assert hidden is not None
    p_ref, p_ours = np.exp(ref_np), np.exp(ours)
    rel = np.abs(p_ours - p_ref).max() / p_ref.max()
    assert rel < 1e-2, rel
    # hidden state parity (NHWC vs NCHW)
    ref_h = ref_hidden[0].numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(hidden), ref_h, atol=2e-3)


@pytest.mark.slow
def test_hidden_state_carryover(oracle_and_ours):
    """Chunked inference with carried h0 equals one long sequence
    (reference run_inference_fast2 semantics, train.py:862-921)."""
    ref, model, variables = oracle_and_ours
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, (1, 4, 96, 160, 3)).astype(np.float32)

    full, _ = model.apply(variables, x, target_size=(96, 160),
                          source='DHF1K', static=False)
    out1, h = model.apply(variables, x[:, :2], target_size=(96, 160),
                          source='DHF1K', static=False)
    out2, _ = model.apply(variables, x[:, 2:], target_size=(96, 160),
                          source='DHF1K', static=False, h0=h)
    chunked = np.concatenate([np.asarray(out1), np.asarray(out2)], axis=1)
    np.testing.assert_allclose(chunked, np.asarray(full), atol=1e-4)


def test_spatial_log_softmax_normalizes():
    from retargetvid_tpu.models.unisal import spatial_log_softmax
    rng = np.random.default_rng(3)
    x = rng.normal(0, 3, (2, 5, 7, 1)).astype(np.float32)
    out = np.asarray(spatial_log_softmax(x))
    sums = np.exp(out).sum(axis=(1, 2, 3))
    np.testing.assert_allclose(sums, 1.0, rtol=1e-5)
