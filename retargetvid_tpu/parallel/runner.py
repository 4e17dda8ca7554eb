"""Multi-chip benchmark execution: clips sharded across the dp axis.

The RetargetVid benchmark is embarrassingly parallel over videos
(SURVEY.md §2.9/§5.8): saliency inference — the dominant device cost — runs
as one SPMD program with the frame batch sharded over the mesh's ``dp`` axis,
so N chips process N videos' frame chunks concurrently with zero hot-path
collectives; only the tiny per-video crop boxes return to the host.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from retargetvid_tpu.models.unisal import UNISAL
from retargetvid_tpu.pipeline.saliency import get_optimal_out_size, preprocess_frames

__all__ = ["ShardedSaliency", "ShardedClipRunner", "ShardedOneShot",
           "group_clips", "group_raw_clips", "clip_signature",
           "raw_clip_signature"]


class ShardedClipRunner:
    """Whole clips sharded across the mesh dp axis — one SPMD program runs
    D clips' full post-shot-detection pipelines (gather + saliency +
    geometry) concurrently, one clip per dp shard.

    This is the multi-chip benchmark execution model (SURVEY.md §7.7): the
    200-video RetargetVid run groups same-bucket clips into dp-sized batches;
    no hot-path collectives exist, only the KB-scale crop boxes return.
    """

    def __init__(self, mesh, variables=None, model=None,
                 source: str = 'SALICON', dtype=jnp.float32,
                 t_border: int = -1, rng_seed: int = 0):
        from retargetvid_tpu.models.unisal import UNISAL
        self.mesh = mesh
        self.model = model or UNISAL()
        self.source = source
        self.dtype = dtype
        self.t_border = t_border
        if variables is None:
            x0 = jnp.zeros((1, 1, 224, 416, 3), jnp.float32)
            variables = self.model.init(jax.random.PRNGKey(rng_seed), x0,
                                        static=True)
        self.variables = jax.device_put(variables, NamedSharding(mesh, P()))

    @functools.lru_cache(maxsize=16)
    def _compiled(self, t_sel_pad, t_out, s_pad, in_hw, net_hw, cfg,
                  fps, h_orig, w_orig):
        from retargetvid_tpu.utils.cache import shared_program, tree_signature

        # w_final/h_final ride as traced (replicated) args: one SPMD
        # program per clip signature serves both benchmark ratios.
        key = ('sharded-clips', self.mesh, repr(self.model), self.source,
               jnp.dtype(self.dtype).name, self.t_border,
               tree_signature(self.variables),
               t_sel_pad, t_out, s_pad, in_hw, net_hw, cfg, fps,
               h_orig, w_orig)
        return shared_program(key, lambda: self._build(
            t_sel_pad, t_out, s_pad, in_hw, net_hw, cfg, fps,
            h_orig, w_orig))

    def _build(self, t_sel_pad, t_out, s_pad, in_hw, net_hw, cfg,
               fps, h_orig, w_orig):
        from retargetvid_tpu.pipeline.fused import make_clip_fn

        fn = make_clip_fn(
            self.model, source=self.source, dtype=self.dtype,
            t_border=self.t_border, cfg=cfg, in_hw=in_hw, net_hw=net_hw,
            t_out=t_out, fps=fps, h_orig=h_orig, w_orig=w_orig)
        clip_sharding = NamedSharding(self.mesh, P('dp'))
        rep = NamedSharding(self.mesh, P())
        return jax.jit(
            jax.vmap(fn, in_axes=(None,) + (0,) * 11 + (None, None)),
            in_shardings=(rep,) + (clip_sharding,) * 11 + (rep, rep),
            out_shardings=clip_sharding)

    def run_batch(self, clips, crop_params: dict, *, fps: float,
                  h_orig: int, w_orig: int, w_final: int, h_final: int,
                  seg_bucket: Optional[int] = None) -> list:
        """Run a dp-sized batch of clips sharing one bucket signature.

        ``clips``: list of dicts with keys ``sal_frames`` (T_all, H, W, 3),
        ``selected``, ``true_inds``, ``segmentation``, ``segmentation_sel``,
        ``fc``.  All clips must share H/W and bucketized shapes — use
        :func:`group_clips` to schedule an arbitrary clip list into such
        batches.  Frame counts inside a batch may differ; the frame axis pads
        to the common bucket.  Returns a per-clip list of result dicts
        (boxes trimmed to each clip's fc).
        """
        from retargetvid_tpu.pipeline.geometry import (
            GeometryConfig,
            bucket_size,
            seg_bucket_size,
        )
        from retargetvid_tpu.pipeline.saliency import get_optimal_out_size

        d = len(clips)
        cfg = GeometryConfig.from_crop_params(crop_params)
        t_sel_pad = bucket_size(max(len(c['selected']) for c in clips))
        t_out = bucket_size(max(c['fc'] for c in clips))
        if seg_bucket is None:
            s_pad = seg_bucket_size(max(len(c['segmentation'])
                                        for c in clips))
        else:
            s_pad = seg_bucket
        t_all_pad = bucket_size(max(int(c['sal_frames'].shape[0])
                                    for c in clips))
        h, w = int(clips[0]['sal_frames'].shape[1]), \
            int(clips[0]['sal_frames'].shape[2])
        net_hw = get_optimal_out_size((h, w))

        def pad_frames(c):
            f = jnp.asarray(c['sal_frames'])
            if f.shape[0] != t_all_pad:
                f = jnp.pad(f, ((0, t_all_pad - f.shape[0]), (0, 0),
                                (0, 0), (0, 0)))
            return f

        def stack(key, build):
            return jnp.stack([build(c) for c in clips])

        def pad_1d(vals, n, fill=0):
            out = np.full(n, fill, np.int32)
            out[:len(vals)] = np.asarray(vals, np.int32)
            return out

        def sel_idx(c):
            return jnp.asarray(pad_1d(c['selected'], t_sel_pad))

        def sel_mask(c):
            m = np.zeros(t_sel_pad, bool)
            m[:len(c['selected'])] = True
            return jnp.asarray(m)

        def ti(c):
            arr = pad_1d(c['true_inds'], t_sel_pad)
            n = len(c['true_inds'])
            arr[n:] = arr[n - 1] + np.arange(1, t_sel_pad - n + 1)
            return jnp.asarray(arr)

        def seg_col(c, key, col):
            return jnp.asarray(pad_1d(np.asarray(c[key])[:, col], s_pad))

        fn = self._compiled(t_sel_pad, t_out, s_pad, (h, w), net_hw, cfg,
                            float(fps), int(h_orig), int(w_orig))
        out = fn(self.variables,
                 stack('sal_frames', pad_frames),
                 stack('sel', sel_idx), stack('mask', sel_mask),
                 jnp.asarray([len(c['selected']) for c in clips], jnp.int32),
                 stack('ti', ti),
                 stack('ss', lambda c: seg_col(c, 'segmentation', 0)),
                 stack('se', lambda c: seg_col(c, 'segmentation', 1)),
                 stack('sss', lambda c: seg_col(c, 'segmentation_sel', 0)),
                 stack('sse', lambda c: seg_col(c, 'segmentation_sel', 1)),
                 jnp.asarray([len(c['segmentation']) for c in clips],
                             jnp.int32),
                 jnp.asarray([c['fc'] for c in clips], jnp.int32),
                 jnp.int32(w_final), jnp.int32(h_final))
        out = {k: np.asarray(v) for k, v in out.items()}
        results = []
        for i, c in enumerate(clips):
            results.append({
                'boxes': out['boxes'][i][:c['fc']],
                'mean_sal': out['mean_sal'][i],
            })
        return results


class ShardedOneShot:
    """The whole-clip one-dispatch program, one clip per dp shard.

    Extends :class:`retargetvid_tpu.pipeline.oneshot.OneShotClipProgram`
    to the mesh: ``make_oneshot_body`` (decode hand-off -> resizes ->
    TransNet windows -> on-device sampling/scenes -> saliency -> geometry)
    is vmapped over a clip axis and jitted with the clip axis sharded over
    ``dp`` — D chips each run one video's ENTIRE post-decode pipeline with
    zero hot-path collectives (SURVEY.md §2.9/§5.8; the multi-chip analogue
    of the reference's per-process video split).  Clips inside a batch pad
    to a shared frame capacity; each clip's live count rides as data.
    """

    def __init__(self, mesh: Mesh, tn_model, tn_params, variables=None,
                 model: Optional[UNISAL] = None, source: str = 'SALICON',
                 dtype=jnp.bfloat16, rng_seed: int = 0, t_border: int = -1,
                 s_pad: int = 8, window: int = 100, stride: int = 50,
                 keep: tuple = (25, 75), tn_fullseq: bool = False,
                 fc_bucket: Optional[int] = None,
                 t_sel_bucket: Optional[int] = None):
        self.mesh = mesh
        self.tn_model = tn_model
        self.model = model or UNISAL()
        self.source = source
        self.dtype = dtype
        self.t_border = t_border
        self.s_pad = s_pad
        self.window = window
        self.stride = stride
        self.keep = keep
        self.tn_fullseq = tn_fullseq
        #: Optional static-capacity overrides below the default bucket table
        #: (min 32): short-clip workloads (and the driver dryrun) pay padded
        #: geometry work proportional to these capacities, so a caller that
        #: KNOWS its clips are tiny can shrink the program.  A clip
        #: exceeding them falls back like any other overrun.
        self.fc_bucket = fc_bucket
        self.t_sel_bucket = t_sel_bucket
        if variables is None:
            x0 = jnp.zeros((1, 1, 224, 416, 3), jnp.float32)
            variables = self.model.init(jax.random.PRNGKey(rng_seed), x0,
                                        static=True)
        from retargetvid_tpu.parallel.distributed import global_put
        rep = NamedSharding(mesh, P())
        self.variables = global_put(variables, rep)
        self.tn_params = global_put(tn_params, rep)

    @functools.lru_cache(maxsize=16)
    def _compiled(self, fc_cap, hw, sal_hw, cfg, fps, skip):
        from retargetvid_tpu.utils.cache import shared_program, tree_signature

        # w_final/h_final ride as traced (replicated) args: one SPMD
        # program per clip signature serves both benchmark ratios.
        key = ('sharded-oneshot', self.mesh, repr(self.model),
               repr(self.tn_model), self.source, jnp.dtype(self.dtype).name,
               self.t_border, self.s_pad, self.window, self.stride,
               self.keep, self.tn_fullseq, self.t_sel_bucket,
               tree_signature(self.variables),
               tree_signature(self.tn_params),
               fc_cap, hw, sal_hw, cfg, fps, skip)
        return shared_program(key, lambda: self._build(
            fc_cap, hw, sal_hw, cfg, fps, skip))

    def _build(self, fc_cap, hw, sal_hw, cfg, fps, skip):
        from retargetvid_tpu.pipeline.fused import pack_clip_outputs
        from retargetvid_tpu.pipeline.geometry import bucket_size
        from retargetvid_tpu.pipeline.oneshot import make_oneshot_body

        h_orig, w_orig = hw
        t_sel_pad = self.t_sel_bucket or \
            bucket_size(fc_cap // skip + 2 + self.s_pad)
        net_hw = get_optimal_out_size(sal_hw)
        body = make_oneshot_body(
            self.model, self.tn_model, source=self.source,
            dtype=self.dtype, t_border=self.t_border, cfg=cfg, fc=fc_cap,
            sal_hw=sal_hw, net_hw=net_hw,
            t_out=fc_cap if self.fc_bucket else bucket_size(fc_cap),
            t_sel_pad=t_sel_pad, s_pad=self.s_pad, skip=skip, fps=fps,
            h_orig=h_orig, w_orig=w_orig,
            window=self.window, stride=self.stride, keep=self.keep,
            tn_fullseq=self.tn_fullseq)

        spec_holder = {}

        def one(variables, tn_params, raw, n, w_final, h_final):
            vec, spec = pack_clip_outputs(
                body(variables, tn_params, raw, n, w_final, h_final))
            spec_holder.update(spec)
            return vec

        clip_sh = NamedSharding(self.mesh, P('dp'))
        rep = NamedSharding(self.mesh, P())
        fn = jax.jit(
            jax.vmap(one, in_axes=(None, None, 0, 0, None, None)),
            in_shardings=(rep, rep, clip_sh, clip_sh, rep, rep),
            out_shardings=clip_sh)
        zeros = lambda tree: jax.tree_util.tree_map(
            lambda v: jax.ShapeDtypeStruct(np.shape(v), v.dtype), tree)
        d = self.mesh.shape['dp']
        jax.eval_shape(fn, zeros(self.variables), zeros(self.tn_params),
                       jax.ShapeDtypeStruct((d, fc_cap, h_orig, w_orig, 3),
                                            jnp.uint8),
                       jax.ShapeDtypeStruct((d,), jnp.int32),
                       jax.ShapeDtypeStruct((), jnp.int32),
                       jax.ShapeDtypeStruct((), jnp.int32))
        return fn, dict(spec_holder), t_sel_pad

    def dispatch_batch(self, raws, crop_params: dict, *, fps: float,
                       w_final: int, h_final: int):
        """Enqueue a dp-sized batch WITHOUT fetching (ticket for
        :meth:`collect_batch`).  Dispatch is asynchronous, so a caller can
        enqueue signature-group N+1 while the mesh still runs group N —
        the benchmark's steady-state pattern (mirrors
        ``OneShotClipProgram.dispatch``)."""
        from retargetvid_tpu.pipeline.geometry import GeometryConfig, bucket_size
        from retargetvid_tpu.pipeline.ingest import sal_dims

        fcs = [int(r.shape[0]) for r in raws]
        h, w = int(raws[0].shape[1]), int(raws[0].shape[2])
        if self.fc_bucket and max(fcs) <= self.fc_bucket:
            fc_cap = self.fc_bucket
        else:
            fc_cap = bucket_size(max(fcs))
        sal_hw = sal_dims(w, h, crop_params['max_input_d'])
        cfg = GeometryConfig.from_crop_params(crop_params)
        fn, spec, t_sel_pad = self._compiled(
            fc_cap, (h, w), sal_hw, cfg, float(fps),
            int(crop_params['skip']))

        from retargetvid_tpu.parallel.distributed import global_put, is_multiprocess

        if is_multiprocess():
            # Multi-controller feed: every process holds the full clip
            # list (host-replicated by construction); each donates its
            # addressable dp shards.
            def pad_np(r):
                r = np.asarray(r)
                if r.shape[0] != fc_cap:
                    r = np.pad(r, ((0, fc_cap - r.shape[0]), (0, 0),
                                   (0, 0), (0, 0)))
                return r

            clip_sh = NamedSharding(self.mesh, P('dp'))
            rep = NamedSharding(self.mesh, P())
            stacked = global_put(np.stack([pad_np(r) for r in raws]),
                                 clip_sh)
            fcs_dev = global_put(np.asarray(fcs, np.int32), clip_sh)
            vecs = fn(self.variables, self.tn_params, stacked, fcs_dev,
                      global_put(np.int32(w_final), rep),
                      global_put(np.int32(h_final), rep))
            return vecs, spec, fcs, t_sel_pad

        def pad(r):
            r = jnp.asarray(r)
            if r.shape[0] != fc_cap:
                r = jnp.pad(r, ((0, fc_cap - r.shape[0]), (0, 0), (0, 0),
                                (0, 0)))
            return r

        vecs = fn(self.variables, self.tn_params,
                  jnp.stack([pad(r) for r in raws]),
                  jnp.asarray(fcs, jnp.int32),
                  jnp.int32(w_final), jnp.int32(h_final))
        return vecs, spec, fcs, t_sel_pad

    def collect_batch(self, ticket) -> list:
        """Fetch + unpack a :meth:`dispatch_batch` ticket (blocks)."""
        from retargetvid_tpu.parallel.distributed import global_fetch
        from retargetvid_tpu.pipeline.fused import unpack_clip_outputs

        vecs, spec, fcs, t_sel_pad = ticket
        vecs = global_fetch(vecs)
        results = []
        for i, fc in enumerate(fcs):
            out = unpack_clip_outputs(vecs[i], spec)
            out['boxes'] = out['boxes'][:fc].astype(np.int32)
            out['fc_sel'] = int(out['fc_sel'])
            out['n_segments'] = int(out['n_segments'])
            out['overrun'] = (out['n_segments'] > self.s_pad or
                              out['fc_sel'] > t_sel_pad)
            results.append(out)
        return results

    def run_batch(self, raws, crop_params: dict, *, fps: float,
                  w_final: int, h_final: int) -> list:
        """Run a dp-sized batch of raw clips sharing one signature.

        ``raws``: list of (fc_i, H, W, 3) uint8 arrays (one per dp shard,
        same H/W and ``bucket_size(fc_i)`` — use :func:`group_raw_clips`).
        Returns one outputs dict per clip (``OneShotClipProgram.run``
        contract: boxes trimmed to fc_i), plus an ``overrun`` flag where a
        clip exceeded the static pick/shot bounds — callers re-run just
        those clips on the streaming fallback path.
        """
        return self.collect_batch(self.dispatch_batch(
            raws, crop_params, fps=fps, w_final=w_final, h_final=h_final))


def raw_clip_signature(raw, fps) -> tuple:
    """Everything that shapes the compiled one-shot SPMD program for a raw
    clip: (H, W, frame-capacity bucket, fps)."""
    from retargetvid_tpu.pipeline.geometry import bucket_size

    fc, h, w = raw.shape[:3]
    return (int(h), int(w), bucket_size(int(fc)), float(fps))


def group_raw_clips(items, dp: int):
    """Schedule (raw, meta) items into dp-sized same-signature batches.

    ``items``: iterable of dicts with ``raw`` (fc, H, W, 3) and ``fps``.
    A final partial batch repeats its last item (outputs dropped).  Returns
    (batch_items, n_real) tuples, arrival order per signature."""
    pools: dict = {}
    order: list = []
    for it in items:
        k = raw_clip_signature(it['raw'], it['fps'])
        if k not in pools:
            pools[k] = []
            order.append(k)
        pools[k].append(it)
    batches = []
    for k in order:
        pool = pools[k]
        for i in range(0, len(pool), dp):
            batch = pool[i:i + dp]
            n_real = len(batch)
            while len(batch) < dp:
                batch.append(batch[-1])
            batches.append((batch, n_real))
    return batches


class ShardedSaliency:
    """UNISAL saliency with the frame batch sharded over the mesh dp axis.

    ``predict(frames)`` accepts (T, H, W, 3) uint8 from any number of clips
    concatenated; chunks are padded to a multiple of (dp * per_chip) and
    dispatched as one SPMD program.
    """

    def __init__(self, mesh: Mesh, variables=None,
                 model: Optional[UNISAL] = None, source: str = 'SALICON',
                 per_chip: int = 16, dtype=jnp.float32, rng_seed: int = 0):
        self.mesh = mesh
        self.model = model or UNISAL()
        self.source = source
        self.per_chip = per_chip
        self.dtype = dtype
        if variables is None:
            x0 = jnp.zeros((1, 1, 224, 416, 3), jnp.float32)
            variables = self.model.init(jax.random.PRNGKey(rng_seed), x0,
                                        static=True)
        # Replicate parameters across the mesh.
        self.variables = jax.device_put(
            variables, NamedSharding(mesh, P()))
        self.batch = self.per_chip * mesh.shape['dp']

    @functools.lru_cache(maxsize=8)
    def _compiled(self, in_hw, net_hw):
        from retargetvid_tpu.utils.cache import shared_program, tree_signature

        key = ('sharded-saliency', self.mesh, repr(self.model), self.source,
               jnp.dtype(self.dtype).name, tree_signature(self.variables),
               in_hw, net_hw)
        return shared_program(key, lambda: self._build(in_hw, net_hw))

    def _build(self, in_hw, net_hw):
        model, source = self.model, self.source
        in_sharding = NamedSharding(self.mesh, P('dp'))
        out_sharding = NamedSharding(self.mesh, P('dp'))
        rep = NamedSharding(self.mesh, P())

        # Parameters enter as a jit argument (closed-over device arrays
        # would lower as MLIR constants AND pin the program to one
        # instance's weights, defeating the shared trace cache).
        @functools.partial(jax.jit, in_shardings=(rep, in_sharding),
                           out_shardings=out_sharding)
        def fn(variables, frames):
            x = preprocess_frames(frames, net_hw).astype(self.dtype)
            logp, _ = model.apply(variables, x[:, None],
                                  target_size=in_hw, source=source,
                                  static=True)
            p = jnp.exp(logp[:, 0, :, :, 0].astype(jnp.float32))
            mx = jnp.max(p, axis=(1, 2), keepdims=True)
            return (jnp.where(mx > 0, p / mx, p) * 255.0).astype(jnp.uint8)

        return fn

    def predict(self, frames: np.ndarray) -> np.ndarray:
        t, h, w, _ = frames.shape
        net_hw = get_optimal_out_size((h, w))
        fn = self._compiled((h, w), net_hw)
        out = np.empty((t, h, w), np.uint8)
        b = self.batch
        for s in range(0, t, b):
            e = min(t, s + b)
            chunk = frames[s:e]
            if e - s < b:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], b - (e - s), axis=0)])
            out[s:e] = np.asarray(fn(self.variables,
                                     jnp.asarray(chunk)))[:e - s]
        return out


def clip_signature(c) -> tuple:
    """Everything that shapes the compiled SPMD program for one clip:
    (H, W, frame-count bucket, selected bucket, fc bucket, segment bucket).
    Clips sharing a signature can ride one batch without recompilation."""
    from retargetvid_tpu.pipeline.geometry import bucket_size, seg_bucket_size

    t_all, h, w = c['sal_frames'].shape[:3]
    return (h, w, bucket_size(int(t_all)),
            bucket_size(len(c['selected'])), bucket_size(int(c['fc'])),
            seg_bucket_size(len(c['segmentation'])))


def group_clips(clips, dp: int):
    """Schedule clips into dp-sized batches of one bucket signature each.

    Batches are filled in arrival order per signature; a final partial batch
    is padded by repeating its last clip (the repeats' outputs are dropped).
    Returns a list of (batch_clips, n_real) tuples.
    """
    sig = clip_signature

    pools: dict = {}
    order: list = []
    for c in clips:
        k = sig(c)
        if k not in pools:
            pools[k] = []
            order.append(k)
        pools[k].append(c)

    batches = []
    for k in order:
        pool = pools[k]
        for i in range(0, len(pool), dp):
            batch = pool[i:i + dp]
            n_real = len(batch)
            while len(batch) < dp:
                batch.append(batch[-1])
            batches.append((batch, n_real))
    return batches
