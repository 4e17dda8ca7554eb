"""shot_scoring vs the reference post_process.py's own extracted functions."""

import ast
import importlib.util

import numpy as np
import pytest

REFERENCE = '/root/reference/3rd_party_libs/transnetv1/post_process.py'
ORACLE_FUNCS = ['mov_avg', 'smooth', 'find_extremas', 'process_sd_x',
                'trans_to_boundaries', 'trans_to_list']


@pytest.fixture(scope='module')
def oracle():
    from scipy.signal import argrelextrema, find_peaks

    import warnings
    with warnings.catch_warnings():
        # The reference file itself contains an invalid '\%' escape; the
        # SyntaxWarning belongs to the oracle source, not this suite (it is
        # emitted at ast.parse time, so the parse must sit inside the guard).
        warnings.simplefilter('ignore', SyntaxWarning)
        with open(REFERENCE) as fp:
            tree = ast.parse(fp.read())
        nodes = [n for n in tree.body
                 if isinstance(n, ast.FunctionDef) and n.name in ORACLE_FUNCS]
        assert {n.name for n in nodes} == set(ORACLE_FUNCS)
        ns = {'np': np, 'argrelextrema': argrelextrema,
              'find_peaks': find_peaks, 'print': lambda *a, **k: None}
        exec(compile(ast.Module(body=nodes, type_ignores=[]), REFERENCE,
                     'exec'), ns)
    return ns


def _signals():
    rng = np.random.default_rng(4)
    out = []
    for n in (30, 80, 200):
        t = np.linspace(0, 6 * np.pi, n)
        sig = 0.3 + 0.3 * np.sin(t) + 0.15 * rng.random(n)
        # a few sharp transition spikes
        sig[np.linspace(5, n - 6, 4).astype(int)] += 0.5
        out.append(np.clip(sig, 0, 1))
    return out


def test_reference_mov_avg_is_broken(oracle):
    """The reference's mov_avg rebinds ``x`` to the scalar loop element
    (``for i, x in enumerate(x)``), so its edge branches index a float and
    raise for ANY window >= 3 — latent-broken dead code (never called
    anywhere in the reference tree)."""
    with pytest.raises((IndexError, TypeError)):
        oracle['mov_avg'](list(_signals()[0]), window=3)


def test_mov_avg_intended_semantics():
    """Our port implements the evident intent: interior box mean, constant
    edge means over the leading/trailing half-windows."""
    from retargetvid_tpu.models.shot_scoring import mov_avg
    sig = np.arange(10, dtype=float)
    out = mov_avg(sig, window=5)[:, 0]
    assert out[0] == out[1] == sig[:2].mean()
    assert out[-1] == out[-2] == sig[-2:].mean()
    np.testing.assert_allclose(out[2:8],
                               [sig[i - 2:i + 3].mean() for i in range(2, 8)])


def test_smooth_matches(oracle):
    from retargetvid_tpu.models.shot_scoring import smooth
    for sig in _signals():
        np.testing.assert_allclose(smooth(sig, 5),
                                   oracle['smooth'](sig, 5), rtol=1e-12)


def test_extremas_and_scores_match(oracle):
    from retargetvid_tpu.models.shot_scoring import (
        find_extremas,
        process_sd_x,
    )
    for sig in _signals():
        xs = oracle['smooth'](sig, 3)
        rmin, rmax = oracle['find_extremas'](xs, order=3)
        omin, omax = find_extremas(xs, order=3)
        assert np.array_equal(omin, rmin)
        assert np.array_equal(omax, rmax)

        ry, rxs, rmint, rmaxt = oracle['process_sd_x'](sig)
        oy, oxs, omint, omaxt = process_sd_x(sig)
        np.testing.assert_allclose(oy, ry, rtol=1e-12)
        np.testing.assert_allclose(oxs, rxs, rtol=1e-12)
        np.testing.assert_allclose(omint, rmint, rtol=1e-12)
        np.testing.assert_allclose(omaxt, rmaxt, rtol=1e-12)


def test_boundaries_match(oracle):
    from retargetvid_tpu.models.shot_scoring import (
        trans_to_boundaries,
        trans_to_list,
    )
    for sig in _signals():
        y, *_ = oracle['process_sd_x'](sig)
        assert trans_to_boundaries(y) == oracle['trans_to_boundaries'](y)
        assert trans_to_list(y) == oracle['trans_to_list'](y)
