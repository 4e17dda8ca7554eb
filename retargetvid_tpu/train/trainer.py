"""Multi-source UNISAL training, sharded over a TPU mesh.

Capability parity with the reference Trainer (``unisal/train.py:36-1711``)
re-designed for SPMD:

- SGD momentum 0.9, lr 0.04, ExponentialLR gamma 0.8 per epoch, global-norm
  gradient clip 2.0, weight decay 1e-4 (1e-5 and 0.1x lr for the backbone
  CNN) — reference ``train.py:96-141`` / ``Trainer.json``;
- loss = 1*kld - 0.1*nss - 0.1*cc averaged over time then batch
  (``train.py:394-399``);
- image batches (static) freeze the RNN/post-RNN parameters; every batch
  trains only its own source's domain-specific parameters
  (``train.py:375-386``) — implemented as gradient masks, so one compiled
  step per source;
- multi-source interleaving with per-source loss weights
  (salicon_weight=0.5 etc.);
- mesh training: ``fit(..., mesh=...)`` (or ``init_state(mesh=...)``)
  shards parameters over tp (wide conv channels, ``parallel.mesh.
  param_shardings``), replicates batch statistics, and places every batch
  with B over dp (and H over sp when divisible); the jitted step then runs
  SPMD with gradients reducing over dp via XLA-inserted collectives (no
  explicit psum calls).  Without a mesh, training runs on the default
  single device.

Checkpointing: numpy-pickle of the variable/optimizer trees plus the
KwConfig JSON round trip (reference ``utils.py:28-44``).
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from retargetvid_tpu.config import KwConfig
from retargetvid_tpu.models.unisal import UNISAL
from retargetvid_tpu.train.losses import loss_sequences

__all__ = ["TrainState", "make_train_step", "Trainer"]


import flax.struct


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: int = 0


def _path_str(path) -> str:
    return '/'.join(getattr(k, 'key', str(k)) for k in path)


def _is_cnn(path_str: str) -> bool:
    return path_str.startswith('cnn/')


def _source_of(path_str: str, sources) -> Optional[str]:
    low = path_str.lower()
    for s in sources:
        if s.lower() in low:
            return s
    return None


def make_optimizer(params, *, lr: float = 0.04, momentum: float = 0.9,
                   lr_gamma: float = 0.8, steps_per_epoch: int = 1000,
                   weight_decay: float = 1e-4, cnn_weight_decay: float = 1e-5,
                   cnn_lr_factor: float = 0.1, grad_clip: float = 2.0):
    """The reference's SGD recipe as an explicit GradientTransformation.

    Hand-rolled (not ``optax.chain``) so frozen parameters behave exactly
    like torch's ``requires_grad=False``: with the gradient mask applied
    upstream, a masked parameter receives no weight decay, no momentum-trace
    update, and no movement — optax's ``add_decayed_weights`` would otherwise
    keep decaying it.  Per-parameter recipe (reference ``train.py:96-141``):

        g <- clip_by_global_norm(g, 2.0)            # torch clip_grad_norm_
        g <- g + wd * p          (wd: 1e-5 CNN, 1e-4 rest; only where mask)
        trace <- momentum * trace + g               (only where mask)
        update <- -lr_t * lr_factor * trace         (lr_factor: 0.1 CNN)

    with lr_t = lr * gamma^(epoch) via staircase exponential decay.  The
    incoming ``updates`` (grads) are assumed pre-masked (zeros where frozen);
    the trace freezes wherever the gradient is exactly zero AND
    ``tx.update`` is given ``mask`` via ``params=(params, mask)`` — see
    ``make_train_step``.
    """
    schedule = optax.exponential_decay(
        lr, transition_steps=steps_per_epoch, decay_rate=lr_gamma,
        staircase=True)

    def lr_factor(path, _):
        return cnn_lr_factor if _is_cnn(_path_str(path)) else 1.0

    def wd_for(path, _):
        return cnn_weight_decay if _is_cnn(_path_str(path)) else weight_decay

    factors = jax.tree_util.tree_map_with_path(lr_factor, params)
    wds = jax.tree_util.tree_map_with_path(wd_for, params)

    def init(params_):
        return {'trace': jax.tree_util.tree_map(jnp.zeros_like, params_),
                'count': jnp.zeros([], jnp.int32)}

    def update(grads, state, params_and_mask=None):
        params_, mask = params_and_mask
        gnorm = optax.global_norm(grads)
        scale = jnp.minimum(1.0, grad_clip / jnp.maximum(gnorm, 1e-12))
        lr_t = schedule(state['count'])

        def one(g, p, m, tr, f, wd):
            g = g * scale + wd * p * m
            tr_new = jnp.where(m > 0, momentum * tr + g, tr)
            upd = -lr_t * f * tr_new * m
            return upd, tr_new

        flat = jax.tree_util.tree_map(one, grads, params_, mask,
                                      state['trace'], factors, wds)
        updates = jax.tree_util.tree_map(lambda pair: pair[0], flat,
                                         is_leaf=lambda x: isinstance(x, tuple))
        trace = jax.tree_util.tree_map(lambda pair: pair[1], flat,
                                       is_leaf=lambda x: isinstance(x, tuple))
        return updates, {'trace': trace, 'count': state['count'] + 1}

    return optax.GradientTransformation(init, update)


def _grad_mask(params, *, source: str, static_batch: bool,
               train_cnn: bool, sources) -> Any:
    """Zero-mask for params not trained on this batch (reference
    ``train.py:375-386``): other sources' domain params; RNN modules on
    static batches; optionally the frozen backbone."""

    def rule(path, _):
        ps = _path_str(path)
        src = _source_of(ps, sources)
        if src is not None and src != source:
            return 0.0
        if static_batch and (ps.startswith('rnn/') or
                             ps.startswith('post_rnn/')):
            return 0.0
        if not train_cnn and _is_cnn(ps):
            return 0.0
        return 1.0

    return jax.tree_util.tree_map_with_path(rule, params)


def make_train_step(model: UNISAL, tx, *, source: str,
                    loss_weights=(1.0, -0.1, -0.1),
                    metrics=('kld', 'nss', 'cc'),
                    static_batch: Optional[bool] = None,
                    train_cnn: bool = True,
                    sources=('DHF1K', 'Hollywood', 'UCFSports', 'SALICON'),
                    donate: bool = True) -> Callable:
    """Build a jitted train step for one (static) source.

    step(state, x (B,T,H,W,3) float, sal (B,T,H,W,1), fix (B,T,H,W,1),
         rng) -> (state, metrics dict)
    """

    bn_train = getattr(model, 'bn_train', False)

    def loss_fn(params, batch_stats, x, sal, fix, rng):
        variables = {'params': params, 'batch_stats': batch_stats}
        static = x.shape[1] == 1 if static_batch is None else static_batch
        if bn_train:
            (logp, _), mutated = model.apply(
                variables, x, source=source, static=static,
                deterministic=False, rngs={'dropout': rng},
                mutable=['batch_stats'])
            new_stats = mutated['batch_stats']
        else:
            logp, _ = model.apply(
                variables, x, source=source, static=static,
                deterministic=False, rngs={'dropout': rng})
            new_stats = batch_stats
        summands = loss_sequences(logp, sal, fix, metrics)
        summands = [jnp.mean(s) for s in summands]
        loss = sum(wt * s for wt, s in zip(loss_weights, summands))
        return loss, (summands, new_stats)

    def step(state: TrainState, x, sal, fix, rng):
        (loss, (summands, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats,
                                   x, sal, fix, rng)
        static = x.shape[1] == 1 if static_batch is None else static_batch
        mask = _grad_mask(state.params, source=source, static_batch=static,
                          train_cnn=train_cnn, sources=sources)
        grads = jax.tree_util.tree_map(lambda g, m: g * m, grads, mask)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       (state.params, mask))
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, batch_stats=new_stats,
                               opt_state=opt_state, step=state.step + 1)
        out = {'loss': loss}
        for name, val in zip(metrics, summands):
            out[name] = val
        return new_state, out

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model: UNISAL, *, source: str,
                   loss_weights=(1.0, -0.1, -0.1),
                   metrics=('kld', 'nss', 'cc'),
                   static_batch: Optional[bool] = None) -> Callable:
    """Jitted forward-only loss evaluation (the reference's valid phase:
    ``fit_sample`` under ``torch.set_grad_enabled(False)``, train.py:356-366).

    Shared process-wide on the full config (no optimizer state enters, so
    equal-config Trainers — e.g. ``cli train`` then ``cli score`` in one
    process — reuse one compiled step instead of re-jitting per instance).
    """
    from retargetvid_tpu.utils.cache import shared_program

    def build():
        def step(params, batch_stats, x, sal, fix):
            variables = {'params': params, 'batch_stats': batch_stats}
            static = (x.shape[1] == 1 if static_batch is None
                      else static_batch)
            logp, _ = model.apply(variables, x, source=source, static=static)
            summands = [jnp.mean(s)
                        for s in loss_sequences(logp, sal, fix, metrics)]
            loss = sum(wt * s for wt, s in zip(loss_weights, summands))
            out = {'loss': loss}
            for name, val in zip(metrics, summands):
                out[name] = val
            return out

        return jax.jit(step)

    key = ('eval-step', repr(model), source, tuple(loss_weights),
           tuple(metrics), static_batch)
    return shared_program(key, build)


class Trainer(KwConfig):
    """Host-side training loop with the reference's multi-source schedule."""

    def __init__(self, num_epochs=16, lr=0.04, momentum=0.9, lr_gamma=0.8,
                 weight_decay=1e-4, cnn_weight_decay=1e-5, grad_clip=2.0,
                 cnn_lr_factor=0.1, train_cnn_after=2,
                 loss_metrics=('kld', 'nss', 'cc'),
                 loss_weights=(1, -0.1, -0.1),
                 data_sources=('DHF1K', 'Hollywood', 'UCFSports', 'SALICON'),
                 salicon_weight=0.5, hollywood_weight=1.0,
                 ucfsports_weight=1.0,
                 steps_per_epoch=1000,
                 model_cfg=None, new_instance=True):
        self.num_epochs = num_epochs
        self.lr = lr
        self.momentum = momentum
        self.lr_gamma = lr_gamma
        self.weight_decay = weight_decay
        self.cnn_weight_decay = cnn_weight_decay
        self.grad_clip = grad_clip
        self.cnn_lr_factor = cnn_lr_factor
        self.train_cnn_after = train_cnn_after
        self.loss_metrics = tuple(loss_metrics)
        self.loss_weights = tuple(loss_weights)
        self.data_sources = tuple(data_sources)
        self.salicon_weight = salicon_weight
        self.hollywood_weight = hollywood_weight
        self.ucfsports_weight = ucfsports_weight
        self.steps_per_epoch = steps_per_epoch
        self.model_cfg = dict(model_cfg or {})
        self.new_instance = new_instance

        # Training mode: BN statistics update with the reference's momenta;
        # the backbone CNN stays in eval mode (cnn_eval, train.py:116-118).
        self.model = UNISAL(**{'bn_train': True, **self.model_cfg})
        self._steps: dict = {}
        self.state: Optional[TrainState] = None
        self._tx = None
        #: Optional jax.sharding.Mesh for SPMD training (set via
        #: ``fit(mesh=...)`` / ``init_state(mesh=...)``); runtime-only,
        #: never serialized by KwConfig.
        self.mesh = None

        # Loop bookkeeping (reference train.py:190-205).
        self.epoch = 0
        self.best_epoch = 0
        self.best_val_score = None
        self.is_best = False
        self.history: list = []
        self.mit1003_finetuned = False

    # -- setup -----------------------------------------------------------
    def init_state(self, rng_seed: int = 0, example_shape=(1, 1, 224, 416, 3),
                   variables: Optional[dict] = None, mesh=None,
                   tp_threshold: int = 256) -> TrainState:
        """Create (or adopt) model variables and the optimizer state.

        With ``mesh`` (a (dp, sp, tp) ``jax.sharding.Mesh``), parameters
        shard over tp via ``parallel.mesh.param_shardings`` and batch
        statistics replicate; the optimizer trace inherits the parameter
        shardings (``zeros_like`` preserves sharding), so every subsequent
        jitted step runs SPMD over the mesh.
        """
        if mesh is not None:
            self.mesh = mesh
        if variables is None:
            variables = self.model.init(
                jax.random.PRNGKey(rng_seed),
                jnp.zeros(example_shape, jnp.float32), static=False)
        params = variables['params']
        batch_stats = variables.get('batch_stats', {})
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from retargetvid_tpu.parallel.mesh import param_shardings
            params = jax.device_put(
                params, param_shardings(self.mesh, params,
                                        tp_threshold=tp_threshold))
            batch_stats = jax.device_put(batch_stats,
                                         NamedSharding(self.mesh, P()))
        self._tx = make_optimizer(
            params, lr=self.lr, momentum=self.momentum,
            lr_gamma=self.lr_gamma, steps_per_epoch=self.steps_per_epoch,
            weight_decay=self.weight_decay,
            cnn_weight_decay=self.cnn_weight_decay,
            cnn_lr_factor=self.cnn_lr_factor, grad_clip=self.grad_clip)
        self.state = TrainState(params=params, batch_stats=batch_stats,
                                opt_state=self._tx.init(params), step=0)
        return self.state

    def step_fn(self, source: str, static_batch: bool, train_cnn: bool):
        key = (source, static_batch, train_cnn)
        if key not in self._steps:
            self._steps[key] = make_train_step(
                self.model, self._tx, source=source,
                loss_weights=self.loss_weights, metrics=self.loss_metrics,
                static_batch=static_batch, train_cnn=train_cnn,
                sources=self.data_sources, donate=False)
        return self._steps[key]

    def _shard_batch(self, arr):
        """Place one batch array: B over dp, H over sp (when divisible)."""
        arr = jnp.asarray(arr)
        if self.mesh is None:
            return arr
        from retargetvid_tpu.parallel.mesh import batch_sharding
        dp = self.mesh.shape['dp']
        if arr.shape[0] % dp:
            raise ValueError(
                f'batch size {arr.shape[0]} not divisible by the mesh dp '
                f'axis ({dp})')
        sp = self.mesh.shape['sp']
        spatial = 2 if (arr.ndim >= 5 and sp > 1
                        and arr.shape[2] % sp == 0) else None
        return jax.device_put(arr, batch_sharding(self.mesh, arr.ndim,
                                                  spatial_axis=spatial))

    def source_weight(self, source: str) -> float:
        return {'SALICON': self.salicon_weight,
                'Hollywood': self.hollywood_weight,
                'UCFSports': self.ucfsports_weight}.get(source, 1.0)

    # -- training --------------------------------------------------------
    def fit(self, dataloaders, train_dir, *, rng_seed: int = 0,
            chkpnt_warmup: int = 3, chkpnt_epochs: int = 2,
            shuffle_datasets: bool = True, mesh=None):
        """The reference's full training loop (``train.py:223-354``).

        ``dataloaders``: ``{source: {'train': factory, 'valid': factory}}``
        where each factory is a zero-arg callable returning an iterator of
        ``(x, sal, fix)`` numpy batches and exposes ``n_batches`` (or
        supports ``len``).  Per epoch: multi-source batch interleaving
        (round-robin ``zip_longest`` over sources, shuffled), a train phase
        and a valid phase; after warmup, the DHF1K valid loss selects the
        best weights (saved to ``train_dir``); checkpoints follow the
        reference's warmup/period rule; scalars export at the end.

        With ``mesh``, the whole run is SPMD over the (dp, sp, tp) mesh:
        see ``init_state``/``_shard_batch`` (batch sizes must divide dp).

        Returns the best validation score (``-val_loss``, reference
        ``fit:245``).
        """
        if mesh is not None:
            self.mesh = mesh
        train_dir = Path(train_dir)
        train_dir.mkdir(parents=True, exist_ok=True)
        rng = jax.random.PRNGKey(rng_seed)
        pyrng = np.random.default_rng(rng_seed)

        n_train = sum(self._n_batches(dataloaders[s].get('train'))
                      for s in dataloaders)
        if self.state is None:
            self.steps_per_epoch = max(n_train, 1)
            self.init_state()
        self.save_cfg(train_dir)

        while self.epoch < self.num_epochs:
            rng, sub = jax.random.split(rng)
            self.fit_full_epoch(dataloaders, train_dir, sub, pyrng,
                                chkpnt_warmup=chkpnt_warmup,
                                shuffle_datasets=shuffle_datasets)
            if (self.epoch >= chkpnt_warmup
                    and (self.epoch + 1) % chkpnt_epochs == 0) \
                    or self.epoch == self.num_epochs - 1:
                self.save_chkpnt(train_dir, self.epoch)
            self.epoch += 1

        self.export_scalars(train_dir, self.history)
        return self.best_val_score

    @staticmethod
    def _n_batches(factory) -> int:
        if factory is None:
            return 0
        n = getattr(factory, 'n_batches', None)
        if n is None:
            n = len(factory)
        return int(n)

    def _interleave(self, dataloaders, phase: str, pyrng,
                    shuffle_datasets: bool):
        """The reference's batch schedule (``train.py:278-287``): round-robin
        ``zip_longest`` over the sources' batch counts, then shuffled."""
        from itertools import chain, zip_longest

        sources = [s for s in dataloaders if phase in dataloaders[s]]
        counts = {s: self._n_batches(dataloaders[s][phase]) for s in sources}
        schedule = [s for s in chain.from_iterable(zip_longest(
            *[[s] * counts[s] for s in sources])) if s is not None]
        if shuffle_datasets:
            pyrng.shuffle(schedule)
        iters = {s: iter(dataloaders[s][phase]()) for s in sources}
        return schedule, iters

    def fit_full_epoch(self, dataloaders, train_dir, rng, pyrng, *,
                       chkpnt_warmup: int = 3, shuffle_datasets: bool = True):
        """One epoch = train phase + valid phase (reference ``fit_epoch``)."""
        epoch_scalars: dict = {}
        for phase in ('train', 'valid'):
            stats = self.fit_phase(dataloaders, phase, rng, pyrng,
                                   shuffle_datasets=shuffle_datasets)
            for src, vals in stats.items():
                key = 'conv' if src == 'DHF1K' else src.lower()
                epoch_scalars[f'{key}/loss/{phase}'] = vals['loss']
                for name in self.loss_metrics:
                    epoch_scalars[f'{key}/{name}/{phase}'] = vals[name]

            # Best-weights selection on the DHF1K (or sole-source) valid
            # loss after warmup (reference train.py:340-354).
            sel_src = 'DHF1K' if 'DHF1K' in stats else \
                (list(stats)[0] if len(stats) == 1 else None)
            if phase == 'valid' and sel_src is not None and \
                    self.epoch >= chkpnt_warmup and sel_src in stats:
                val_score = -stats[sel_src]['loss']
                if self.best_val_score is None:
                    self.best_val_score = val_score
                elif val_score > self.best_val_score:
                    self.best_val_score = val_score
                    self.is_best = True
                    self.save_weights(train_dir, 'best')
                    with open(Path(train_dir) / 'best_epoch.dat', 'w') as fp:
                        fp.write(str(self.epoch))
                    with open(Path(train_dir) / 'best_val_loss.dat',
                              'w') as fp:
                        fp.write(str(val_score))
                else:
                    self.is_best = False
        self.history.append(epoch_scalars)

    def fit_phase(self, dataloaders, phase: str, rng, pyrng, *,
                  shuffle_datasets: bool = True) -> dict:
        """Run one train or valid phase over the interleaved schedule.

        Returns per-source mean metrics.  MIT1003 batches run under the
        SALICON domain (reference ``train.py:300``).
        """
        schedule, iters = self._interleave(dataloaders, phase, pyrng,
                                           shuffle_datasets)
        train_cnn = self.epoch >= self.train_cnn_after
        running: dict = {}
        counts: dict = {}
        for src in schedule:
            x, sal, fix = next(iters[src])
            x = self._shard_batch(x)
            sal = self._shard_batch(sal)
            fix = self._shard_batch(fix)
            model_src = 'SALICON' if src == 'MIT1003' else src
            static = x.shape[1] == 1
            if phase == 'train':
                rng, sub = jax.random.split(rng)
                step = self.step_fn(model_src, static, train_cnn)
                self.state, m = step(self.state, x, sal, fix, sub)
            else:
                key = ('eval', model_src, static)
                if key not in self._steps:
                    self._steps[key] = make_eval_step(
                        self.model.clone(bn_train=False), source=model_src,
                        loss_weights=self.loss_weights,
                        metrics=self.loss_metrics, static_batch=static)
                m = self._steps[key](self.state.params,
                                     self.state.batch_stats, x, sal, fix)
            b = int(x.shape[0])
            acc = running.setdefault(src, {k: 0.0 for k in m})
            for k, v in m.items():
                acc[k] += float(v) * b
            counts[src] = counts.get(src, 0) + b
        return {src: {k: v / counts[src] for k, v in acc.items()}
                for src, acc in running.items()}

    def fine_tune_mit(self, dataloaders, train_dir, *, lr: float = 0.01,
                      num_epochs: int = 8, lr_gamma: float = 0.8,
                      train_cnn_after: int = 0, rng_seed: int = 0):
        """MIT1003 fine-tuning for MIT300 submission (reference
        ``train.py:1326-1392``): kld-only loss, lr 0.01, best weights loaded
        first, best val tracked per epoch.

        ``dataloaders``: ``{'MIT1003': {'train': ..., 'valid': ...}}``.
        Returns ``(best_val, best_epoch)``.
        """
        self.lr = lr
        self.num_epochs = num_epochs
        self.lr_gamma = lr_gamma
        self.loss_weights = (1.0,)
        self.loss_metrics = ('kld',)
        self.data_sources = ('MIT1003',)
        self.train_cnn_after = train_cnn_after
        self.mit1003_finetuned = True
        self.epoch = 0

        train_dir = Path(train_dir)
        try:
            self.load_weights(train_dir / 'weights_best.pkl')
        except FileNotFoundError:
            pass                       # reference: fall back to last chkpnt

        n_train = self._n_batches(dataloaders['MIT1003'].get('train'))
        self.steps_per_epoch = max(n_train, 1)
        if self.state is None:
            self.init_state()
        else:                          # new optimizer recipe over old params
            self.reconfigure_optimizer()

        rng = jax.random.PRNGKey(rng_seed)
        pyrng = np.random.default_rng(rng_seed)
        best_epoch, best_val = None, None
        while self.epoch < self.num_epochs:
            rng, sub = jax.random.split(rng)
            stats = {}
            for phase in ('train', 'valid'):
                stats[phase] = self.fit_phase(dataloaders, phase, sub, pyrng)
            val_loss = stats['valid'].get('MIT1003', {}).get(
                'loss', float('nan'))
            self.history.append({'mit1003/loss/train':
                                 stats['train'].get('MIT1003', {}).get(
                                     'loss', float('nan')),
                                 'mit1003/loss/valid': val_loss})
            if np.isnan(val_loss):     # reference train.py:1377-1380
                best_epoch, best_val = 0, 1000
                break
            val_score = -val_loss
            if self.best_val_score is None:
                self.best_val_score = val_score
            elif val_score > self.best_val_score:
                self.best_val_score = val_score
                best_epoch, best_val = self.epoch, val_loss
                self.save_weights(train_dir, 'best')
            self.epoch += 1
        self.export_scalars(train_dir, self.history)
        return best_val, best_epoch

    def reconfigure_optimizer(self):
        """Rebuild the optimizer (e.g. after fine-tune reconfig) keeping
        the current parameters; momentum/schedule state restarts."""
        self._tx = make_optimizer(
            self.state.params, lr=self.lr, momentum=self.momentum,
            lr_gamma=self.lr_gamma, steps_per_epoch=self.steps_per_epoch,
            weight_decay=self.weight_decay,
            cnn_weight_decay=self.cnn_weight_decay,
            cnn_lr_factor=self.cnn_lr_factor, grad_clip=self.grad_clip)
        self._steps = {}
        self.state = TrainState(
            params=self.state.params, batch_stats=self.state.batch_stats,
            opt_state=self._tx.init(self.state.params), step=self.state.step)

    # -- weights (reference model.py:26-49) --------------------------------
    def save_weights(self, directory, name: str = 'best') -> Path:
        directory = Path(directory)
        directory.mkdir(parents=True, exist_ok=True)
        path = directory / f'weights_{name}.pkl'
        tree = jax.tree_util.tree_map(np.asarray, {
            'params': self.state.params,
            'batch_stats': self.state.batch_stats})
        with open(path, 'wb') as fp:
            pickle.dump(tree, fp)
        return path

    def load_weights(self, path):
        with open(path, 'rb') as fp:
            tree = pickle.load(fp)
        if self.state is None:
            self.init_state()
        self.state = TrainState(
            params=tree['params'], batch_stats=tree['batch_stats'],
            opt_state=self.state.opt_state, step=self.state.step)
        return self.state

    def fit_epoch(self, batches, epoch: int, rng) -> dict:
        """Run one epoch over an iterable of (source, x, sal, fix) batches."""
        train_cnn = epoch >= self.train_cnn_after
        totals: dict = {}
        count = 0
        for source, x, sal, fix in batches:
            rng, sub = jax.random.split(rng)
            step = self.step_fn(source, x.shape[1] == 1, train_cnn)
            self.state, m = step(self.state, self._shard_batch(x),
                                 self._shard_batch(sal),
                                 self._shard_batch(fix), sub)
            for k, v in m.items():
                totals[k] = totals.get(k, 0.0) + float(v) * \
                    self.source_weight(source)
            count += 1
        return {k: v / max(count, 1) for k, v in totals.items()}

    # -- evaluation (reference score_model, train.py:977-1075) ------------
    def score_model(self, batches, source: str = 'DHF1K',
                    metrics=('kld', 'nss', 'cc', 'sim', 'aucj')) -> dict:
        """Score held-out (x, sal, fix) batches with saliency metrics.

        ``batches``: iterable of (x (B,T,H,W,3), sal (B,T,H,W,1),
        fix (B,T,H,W,1)).  kld/nss/cc run on device; SIM and AUC-Judd use
        the numpy metrics (``eval/saliency_metrics.py``).
        """
        import jax.numpy as jnp

        from retargetvid_tpu.eval.saliency_metrics import auc_judd, sim
        from retargetvid_tpu.train.losses import loss_sequences

        variables = {'params': self.state.params,
                     'batch_stats': self.state.batch_stats}
        eval_model = self.model.clone(bn_train=False)
        totals: dict = {m: [] for m in metrics}
        for x, sal, fix in batches:
            logp, _ = eval_model.apply(
                variables, jnp.asarray(x), source=source,
                static=x.shape[1] == 1)
            dev = loss_sequences(logp, jnp.asarray(sal), jnp.asarray(fix),
                                 [m for m in metrics
                                  if m in ('kld', 'nss', 'cc')])
            for name, val in zip(
                    [m for m in metrics if m in ('kld', 'nss', 'cc')], dev):
                totals[name].append(float(jnp.mean(val)))
            if 'sim' in metrics or 'aucj' in metrics:
                pred = np.exp(np.asarray(logp))
                sal_np = np.asarray(sal)
                fix_np = np.asarray(fix)
                for b in range(pred.shape[0]):
                    for t in range(pred.shape[1]):
                        if 'sim' in metrics:
                            totals['sim'].append(
                                sim(pred[b, t, :, :, 0], sal_np[b, t, :, :, 0]))
                        if 'aucj' in metrics:
                            totals['aucj'].append(
                                auc_judd(pred[b, t, :, :, 0],
                                         fix_np[b, t, :, :, 0]))
        return {m: float(np.nanmean(v)) if v else float('nan')
                for m, v in totals.items()}

    def run_inference(self, frames, *, source: str = 'DHF1K',
                      frame_modulo: int = 4, seq_len: int = 6,
                      smooth_method=None, sal=None, fix=None,
                      metrics=('kld', 'nss', 'cc', 'sim', 'aucj')):
        """Whole-video recurrent inference + optional scoring (reference
        ``run_inference``, train.py:425-556).

        ``frames``: (T, H, W, 3) uint8.  With ``sal``/``fix`` targets
        ((T, H, W) float/binary), returns ``(maps, scores)``; otherwise
        ``(maps, None)``.  Dynamic sources run the interleaved frame-modulo
        recurrent scheme; static sources (SALICON/MIT*) run per-frame.
        """
        from retargetvid_tpu.pipeline.saliency import SaliencyPredictor

        predictor = SaliencyPredictor(
            variables={'params': self.state.params,
                       'batch_stats': self.state.batch_stats},
            model=self.model.clone(bn_train=False), source=source)
        static = source in ('SALICON', 'MIT300', 'MIT1003')
        if static:
            maps = predictor.predict(frames)
        else:
            maps = predictor.predict_video(
                frames, source=source, frame_modulo=frame_modulo,
                seq_len=seq_len, smooth_method=smooth_method)
        if sal is None and fix is None:
            return maps, None

        from retargetvid_tpu.eval.saliency_metrics import auc_judd, sim
        pred = maps.astype(np.float32)
        pred = pred / np.maximum(pred.sum(axis=(1, 2), keepdims=True), 1e-6)
        scores: dict = {}
        if sal is not None:
            sal = np.asarray(sal, np.float32)
            sal_n = sal / np.maximum(sal.sum(axis=(1, 2), keepdims=True),
                                     1e-6)
            if 'kld' in metrics:
                eps = 1e-7
                scores['kld'] = float(np.mean(np.sum(
                    sal_n * np.log(eps + sal_n / (pred + eps)),
                    axis=(1, 2))))
            if 'cc' in metrics:
                ccs = []
                for i in range(pred.shape[0]):
                    a, b = pred[i].ravel(), sal_n[i].ravel()
                    if a.std() > 0 and b.std() > 0:
                        ccs.append(float(np.corrcoef(a, b)[0, 1]))
                scores['cc'] = float(np.mean(ccs)) if ccs else float('nan')
            if 'sim' in metrics:
                scores['sim'] = float(np.mean(
                    [sim(pred[i], sal_n[i]) for i in range(pred.shape[0])]))
        if fix is not None:
            fixb = np.asarray(fix) > 0.5
            if 'nss' in metrics:
                vals = []
                for i in range(pred.shape[0]):
                    p = pred[i]
                    std = p.std()
                    if std > 0 and fixb[i].any():
                        z = (p - p.mean()) / std
                        vals.append(float(z[fixb[i]].mean()))
                scores['nss'] = float(np.mean(vals)) if vals else float('nan')
            if 'aucj' in metrics:
                scores['aucj'] = float(np.nanmean(
                    [auc_judd(pred[i], fixb[i].astype(np.float32))
                     for i in range(pred.shape[0])]))
        return maps, scores

    # -- checkpointing (reference train.py:1627-1650 equivalents) ---------
    def save_chkpnt(self, directory, epoch: int) -> Path:
        directory = Path(directory)
        directory.mkdir(parents=True, exist_ok=True)
        path = directory / f'chkpnt_epoch{epoch:04d}.pkl'
        tree = jax.tree_util.tree_map(np.asarray, {
            'params': self.state.params,
            'batch_stats': self.state.batch_stats,
            'opt_state': self.state.opt_state,
            'step': self.state.step,
        })
        with open(path, 'wb') as fp:
            pickle.dump(tree, fp)
        self.save_cfg(directory)
        return path

    def copy_code(self, directory) -> Path:
        """Archive the framework source next to the checkpoints
        (reference ``train.py:1597-1625``)."""
        import shutil

        import retargetvid_tpu
        src = Path(retargetvid_tpu.__file__).parent
        directory = Path(directory)
        directory.mkdir(parents=True, exist_ok=True)
        dst = directory / 'code_copy'
        if dst.exists():
            shutil.rmtree(dst)
        shutil.copytree(src, dst, ignore=shutil.ignore_patterns('__pycache__'))
        return dst

    def export_scalars(self, directory, history) -> Path:
        """Write accumulated scalar history as ``all_scalars.json``
        (reference's TensorboardX export, ``train.py:1652-1699``).

        ``history``: list of per-epoch metric dicts (e.g. from fit_epoch).
        """
        import json

        directory = Path(directory)
        directory.mkdir(parents=True, exist_ok=True)
        path = directory / 'all_scalars.json'
        scalars: dict = {}
        for epoch, metrics in enumerate(history):
            for k, v in metrics.items():
                scalars.setdefault(k, []).append([epoch, float(v)])
        with open(path, 'w') as fp:
            json.dump(scalars, fp, indent=2)
        return path

    def load_chkpnt(self, path) -> TrainState:
        with open(path, 'rb') as fp:
            tree = pickle.load(fp)
        if self._tx is None:
            self.init_state()
        self.state = TrainState(params=tree['params'],
                                batch_stats=tree['batch_stats'],
                                opt_state=tree['opt_state'],
                                step=int(tree['step']))
        return self.state
