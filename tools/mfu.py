"""Per-model FLOPs + MFU measurement on the real chip (VERDICT r2 item #3).

Measures the two conv-heavy programs of the benchmark pipeline — the UNISAL
static saliency forward and the folded TransNet shot-detection windows — at
the exact shapes the benchmark dispatches them, and reports achieved
FLOP/s / peak as MFU.

Methodology (the dev-relay timing traps are documented in docs/PERF.md):
- FLOPs come from XLA's own ``compiled.cost_analysis()['flops']`` of the
  single-forward program (analytic, shape-exact).
- Device time uses a SLOPE measurement: the program is wrapped in
  ``lax.scan`` over K stacked distinct inputs, timed at K=1 and K=8 with a
  value-fetch sync, and per-forward time = (t8 - t1) / 7.  This cancels the
  ~25 ms dispatch+fetch floor of the loopback relay, which is the same
  order as the kernels being measured.  Each t is the median of ``reps``
  runs over distinct input stacks (the relay memoizes byte-identical
  dispatches).
- Peak: TPU v5e bf16 matmul peak = 197 TFLOP/s/chip.

Run (on the TPU host):  python tools/mfu.py [--reps 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_PEAK_FLOPS = 197e12


def _flops_of(jitted, *args) -> float:
    compiled = jitted.lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca['flops'])


def _median_time(fn, inputs, reps):
    """Median wall seconds of fn over distinct device inputs, value-fetch
    synced (``block_until_ready`` under-synchronizes through the relay)."""
    import jax.numpy as jnp
    ts = []
    for i in range(reps):
        x = inputs[i % len(inputs)]
        t0 = time.perf_counter()
        out = fn(x)
        float(np.asarray(jnp.sum(out.astype(jnp.float32))))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def measure_program(name, single_fn, example, k_big=8, reps=5):
    """MFU for ``single_fn(x)`` at input shape ``example.shape`` (uint8)."""
    import jax
    import jax.numpy as jnp

    flops = _flops_of(jax.jit(single_fn), example)

    def scan_k(k):
        def body(carry, x):
            out = single_fn(x)
            return carry + jnp.sum(out.astype(jnp.float32)), ()

        @jax.jit
        def run(stack):
            tot, _ = jax.lax.scan(body, jnp.float32(0.0), stack)
            return tot
        return run

    rng = np.random.default_rng(7)

    def stacks(k, n):
        out = []
        for _ in range(n):
            s = rng.integers(0, 255, (k,) + example.shape, np.uint8)
            out.append(jax.device_put(jnp.asarray(s)))
        return out

    run1, runk = scan_k(1), scan_k(k_big)
    in1, ink = stacks(1, reps), stacks(k_big, reps)
    # warmup/compile on dedicated stacks (never timed)
    float(np.asarray(run1(stacks(1, 1)[0])))
    float(np.asarray(runk(stacks(k_big, 1)[0])))

    t1 = _median_time(run1, in1, reps)
    tk = _median_time(runk, ink, reps)
    per_fwd = max((tk - t1) / (k_big - 1), 1e-9)
    mfu = flops / per_fwd / V5E_PEAK_FLOPS
    return {
        'name': name, 'flops': flops, 't_fwd_ms': per_fwd * 1e3,
        'achieved_tflops': flops / per_fwd / 1e12, 'mfu': mfu,
        't1_ms': t1 * 1e3, f't{k_big}_ms': tk * 1e3,
    }


def build_targets():
    """The two benchmark hot programs at their benchmark shapes."""
    import jax
    import jax.numpy as jnp

    from retargetvid_tpu.models.transnet import TransNetPredictor, TransNetV1
    from retargetvid_tpu.models.unisal import UNISAL
    from retargetvid_tpu.pipeline.saliency import preprocess_frames

    targets = []

    # --- UNISAL static forward: 96 selected frames (the 480-frame bench
    # clip's bucket), 140x250 maps, bf16 — as inside FusedClipProgram.
    model = UNISAL()
    x0 = jnp.zeros((1, 1, 224, 416, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, static=True)

    def unisal_fwd(frames):
        # bf16 activations, exactly like FusedClipProgram's default path.
        x = preprocess_frames(frames, (256, 416)).astype(jnp.bfloat16)
        logp, _ = model.apply(variables, x[:, None],
                              target_size=(140, 250), source='SALICON',
                              static=True)
        p = jnp.exp(logp[:, 0, :, :, 0])
        mx = jnp.max(p, axis=(1, 2), keepdims=True)
        return (jnp.where(mx > 0, p / mx, p) * 255.0).astype(jnp.uint8)

    targets.append(('UNISAL forward (96x140x250, bf16)', unisal_fwd,
                    np.zeros((96, 140, 250, 3), np.uint8)))

    # --- TransNet folded windows over the bench clip's shot buffer
    # (25-frame overlap + 480 frames + 75 zero tail = 580).
    tn_model = TransNetV1(dtype=jnp.bfloat16)
    tn_params = tn_model.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 8, 27, 48, 3), jnp.uint8))
    tn_predict = TransNetPredictor(tn_model, tn_params)
    n_tn = 580
    n_pad = -(-n_tn // 64) * 64
    tn_inner = tn_predict._compiled(n_pad)

    def transnet_fwd(frames):
        padded = jnp.concatenate(
            [frames, jnp.zeros((n_pad - n_tn,) + frames.shape[1:],
                               frames.dtype)], axis=0)
        return tn_inner(tn_params, padded, jnp.int32(n_tn))

    targets.append(('TransNet windows (580x27x48, bf16)', transnet_fwd,
                    np.zeros((580, 27, 48, 3), np.uint8)))
    return targets


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--reps', type=int, default=5)
    args = parser.parse_args(argv)

    from retargetvid_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    rows = []
    for name, fn, example in build_targets():
        r = measure_program(name, fn, example, reps=args.reps)
        rows.append(r)
        print(f"{r['name']}: {r['flops'] / 1e9:.1f} GFLOP, "
              f"{r['t_fwd_ms']:.2f} ms/fwd, "
              f"{r['achieved_tflops']:.1f} TFLOP/s, "
              f"MFU {100 * r['mfu']:.1f}%  "
              f"(t1={r['t1_ms']:.1f} ms, t8={r['t8_ms']:.1f} ms)",
              flush=True)

    print()
    print('| program | GFLOP/fwd | ms/fwd | TFLOP/s | MFU (v5e bf16 peak '
          '197 TFLOP/s) |')
    print('|---|---|---|---|---|')
    for r in rows:
        print(f"| {r['name']} | {r['flops'] / 1e9:.1f} "
              f"| {r['t_fwd_ms']:.2f} | {r['achieved_tflops']:.1f} "
              f"| {100 * r['mfu']:.1f}% |")
    return rows


if __name__ == '__main__':
    main()
