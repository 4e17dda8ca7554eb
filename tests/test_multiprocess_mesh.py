"""Multi-process mesh validation (VERDICT r4 missing #2 / next #2).

Every other mesh test in this repo runs a SINGLE process with 8 virtual
devices — which cannot catch process-boundary bugs: host-local data feeding,
per-process device ordering, non-addressable output fetching.  This test
runs the same deterministic scenario (one sharded train step + one
``ShardedOneShot.run_batch`` over a (dp=2, sp=2, tp=2) 8-device mesh,
``tests/mp_worker.py``) in two arms:

- 1 process x 8 virtual CPU devices (the repo's usual configuration);
- 2 OS processes x 4 virtual CPU devices joined via ``jax.distributed`` —
  dp/sp/tp all cross the process (stand-in DCN) boundary,

and asserts the outputs are BIT-EQUAL: same loss, same updated-parameter
checksum, same per-clip shot probabilities and crop boxes.  docs/SCALING.md
§validation points here.
"""

import os
import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = [pytest.mark.slow, pytest.mark.mesh]

REPO = pathlib.Path(__file__).resolve().parent.parent
WORKER = REPO / 'tests' / 'mp_worker.py'


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(('localhost', 0))
        return s.getsockname()[1]


def _worker_env(n_local_devices: int, extra=None) -> dict:
    env = dict(os.environ)
    env.pop('RTV_NUM_PROCS', None)
    env.pop('RTV_PROC_ID', None)
    env.pop('RTV_COORD', None)
    env['JAX_PLATFORMS'] = 'cpu'
    env['PYTHONPATH'] = str(REPO)  # skip the axon sitecustomize
    # Same compile-speed flags as tests/conftest.py (semantics-only run).
    env['XLA_FLAGS'] = (
        f'--xla_force_host_platform_device_count={n_local_devices}'
        ' --xla_backend_optimization_level=0'
        ' --xla_llvm_disable_expensive_passes=true')
    env.update(extra or {})
    return env


def test_two_process_mesh_matches_single_process(tmp_path):
    out_single = tmp_path / 'single.npz'
    out_multi = tmp_path / 'multi.npz'

    # Arm 1: single process, 8 virtual devices.
    r = subprocess.run(
        [sys.executable, str(WORKER), str(out_single)],
        env=_worker_env(8), cwd=REPO, capture_output=True, text=True,
        timeout=3600)
    assert r.returncode == 0, f'single-process arm failed:\n{r.stdout}' \
                              f'\n{r.stderr}'
    assert out_single.is_file()

    # Arm 2: 2 OS processes x 4 virtual devices via jax.distributed.
    port = _free_port()
    procs = []
    for rank in range(2):
        env = _worker_env(4, {
            'RTV_NUM_PROCS': '2',
            'RTV_PROC_ID': str(rank),
            'RTV_COORD': f'localhost:{port}',
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(WORKER), str(out_multi)],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outputs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=3600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f'rank {rank} failed:\n{out}'
    assert out_multi.is_file(), outputs[0]

    a = np.load(out_single)
    b = np.load(out_multi)
    # Identical partitioning, identical arithmetic order -> bit equality.
    np.testing.assert_array_equal(a['loss'], b['loss'])
    np.testing.assert_array_equal(a['kld'], b['kld'])
    np.testing.assert_array_equal(a['param_sum'], b['param_sum'])
    np.testing.assert_array_equal(a['probs'], b['probs'])
    np.testing.assert_array_equal(a['boxes'], b['boxes'])
    # The scenario itself produced live results (distinct clips diverge).
    assert not np.array_equal(a['probs'][0], a['probs'][1])
    assert np.isfinite(a['loss'])
