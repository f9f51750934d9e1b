"""Trainers: offline (SimpleTrainer) and interactive (InteractiveTrainer).

TPU-native redesign of autolabel/trainer.py:14-218 plus the torch-ngp
Trainer base it inherits (checkpointing, EMA, workspace, AMP). The whole
optimization step — render, loss, backward, Adam update — is ONE jitted
function over pytrees; bf16 compute replaces AMP+GradScaler; EMA is a tree
lerp. With a device mesh the same step runs data-parallel: params
replicated, ray batch sharded over 'data', XLA inserts the gradient psum.
"""
import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from autolabel_tpu.render.renderer import (RenderOptions, StagedRenderer,
                                           render_rays)
from autolabel_tpu.train import checkpoints
from autolabel_tpu.train.losses import LossOptions, compute_losses
from autolabel_tpu.train.metrics import MetricsLogger
from autolabel_tpu.train.optim import make_optimizer

_BATCH_KEYS = ('rays_o', 'rays_d', 'direction_norms', 'pixels', 'depth',
               'semantic')


def _make_step(field, tx, loss_options, render_options,
               occupancy_threshold=None, pose_init=None):
    """Build the jitted train step: (state, batch, key[, occ]) ->
    (state, losses). With pose_init=(R0, t0), params['pose'] carries
    per-frame SE(3) deltas and the rays are rebuilt from the refined
    poses inside the step (train/pose_refine.py)."""

    def loss_fn(params, batch, key, occupancy):
        rays_o, rays_d = batch['rays_o'], batch['rays_d']
        if pose_init is not None:
            from autolabel_tpu.train.pose_refine import refined_rays
            rays_o, rays_d = refined_rays(params['pose'], pose_init,
                                          batch['frame_idx'],
                                          batch['rays_d_cam'])
        outputs = render_rays(field, params, rays_o,
                              rays_d, batch['direction_norms'],
                              key=key, options=render_options,
                              occupancy=occupancy)
        return compute_losses(outputs, batch, loss_options)

    def step(state, batch, base_key, occ_density=None, occ_trained=None):
        occupancy = None
        if occ_density is not None:
            occupancy = (occ_density, occ_trained, occupancy_threshold)
        key = jax.random.fold_in(base_key, state['step'])
        (loss, parts), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state['params'], batch, key, occupancy)
        updates, opt_state = tx.update(grads, state['opt_state'],
                                       state['params'])
        params = optax.apply_updates(state['params'], updates)
        new_state = {
            'params': params,
            'opt_state': opt_state,
            'ema': state['ema'],
            'step': state['step'] + 1,
        }
        parts = dict(parts, total=loss)
        return new_state, parts

    return step


def _ema_update(state, decay):
    ema = jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p,
                       state['ema'], state['params'])
    return dict(state, ema=ema)


class SimpleTrainer:
    """Offline trainer: epochs of 1000 iterations, per-epoch EMA +
    checkpoint, staged eval renders. Parity: autolabel/trainer.py:14-160 +
    torch-ngp Trainer services."""

    def __init__(self,
                 name,
                 field,
                 lr=5e-3,
                 iters=10000,
                 loss_options=None,
                 render_options=None,
                 workspace=None,
                 ema_decay=0.95,
                 use_checkpoint='latest',
                 mesh=None,
                 max_ray_batch=4096,
                 occupancy=None,
                 occupancy_update_every=100,
                 exact_final_fraction=0.0,
                 sampled_warmup_fraction=0.0,
                 metrics=True,
                 tensorboard=False,
                 pose_refine=None,
                 seed=0):
        self.name = name
        self.field = field
        self.workspace = workspace
        self.ema_decay = ema_decay
        self.mesh = mesh
        self.loss_options = loss_options or LossOptions()
        self.render_options = render_options or RenderOptions(perturb=True)
        self.occupancy = occupancy
        self.occupancy_update_every = occupancy_update_every
        self.epoch = 0
        self.global_step = 0
        self.metrics_logger = (MetricsLogger(workspace)
                               if metrics and workspace is not None else None)
        # Opt-in TensorBoard events at <workspace>/run/<name> (the
        # reference's SummaryWriter path, autolabel/trainer.py:17-19);
        # written epoch-aligned with metrics.jsonl, no tensorboardX dep
        # (train/tb_events.py).
        self.tb_writer = None
        if tensorboard and workspace is not None:
            from autolabel_tpu.train.tb_events import TBEventWriter
            self.tb_writer = TBEventWriter(
                os.path.join(workspace, 'run', name))

        params = field.init(jax.random.PRNGKey(seed))
        # Joint camera refinement: pose_refine = (R0 (N,3,3) cam->world,
        # t0 (N,3) centers) from the dataset; per-frame SE(3) deltas
        # join the parameter pytree (train/pose_refine.py) and train
        # under the same Adam step as the field.
        self._pose_init = None
        if pose_refine is not None:
            from autolabel_tpu.train.pose_refine import init_pose_params
            R0, t0 = pose_refine
            self._pose_init = (jnp.asarray(R0, jnp.float32),
                               jnp.asarray(t0, jnp.float32))
            params = dict(params, pose=init_pose_params(len(t0)))
            # Pose gradients flow through dField/dPosition; the
            # sampled-backward and stochastic-corner estimators drop the
            # position cotangent (their custom VJPs scatter table
            # gradients only), so camera refinement requires exact
            # gathers.
            self.render_options = dataclasses.replace(
                self.render_options, stochastic_corners=0,
                sampled_backward=0)
        self.tx = make_optimizer(params, lr=lr, iters=iters)
        self.state = {
            'params': params,
            'opt_state': self.tx.init(params),
            # Distinct buffers — params and ema are both donated by the
            # jitted step and may not alias.
            'ema': jax.tree.map(jnp.copy, params),
            'step': jnp.zeros((), jnp.int32),
        }
        self._base_key = jax.random.PRNGKey(seed + 1)

        # Gather-annealing phases. The schedule tightens the gradient
        # estimator as training converges (noise matters least early):
        #   [0, warmup):            sampled-backward-1 (one scatter row)
        #                           — only with sampled_warmup_fraction
        #   [warmup, exact_start):  the configured render options
        #   [exact_start, end):     fully exact gathers, so estimator
        #                           noise does not cap converged quality
        #                           (sphere A/B: stochastic-only
        #                           plateaus ~1.5 dB below exact).
        # Default exact_final_fraction=0: the tail matters for the
        # forward-stochastic estimator above, but for the flagship
        # sampled-backward estimator (exact forward) a 3-seed A/B
        # measured NO tail benefit — tail-on scored 0.06 dB worse on
        # mean PSNR (benchmarks/exact_tail_seeds.py; BASELINE.md r5).
        # Each phase is its own jitted step; selection happens on the
        # host by global_step (no in-jit branching).
        phase_starts = [0]
        phase_options = [self.render_options]
        if (iters is not None and sampled_warmup_fraction > 0
                and self.render_options.sampled_backward == 2):
            phase_starts = [0, int(iters * sampled_warmup_fraction)]
            phase_options = [
                dataclasses.replace(self.render_options, sampled_backward=1),
                self.render_options,
            ]
        if (iters is not None and exact_final_fraction > 0
                and (self.render_options.stochastic_corners
                     or self.render_options.sampled_backward)):
            phase_starts.append(int(iters * (1 - exact_final_fraction)))
            phase_options.append(
                dataclasses.replace(self.render_options,
                                    stochastic_corners=0,
                                    sampled_backward=0,
                                    backward_points=1.0))
        if (self._pose_init is not None and iters is not None
                and field.config.grid_config is not None):
            # BARF-style coarse-to-fine for joint pose refinement: the
            # hash grid absorbs a sub-cell camera misalignment within a
            # few hundred steps, after which the photometric loss is
            # MINIMIZED at the wrong poses (measured; NOTES.md). Gate
            # the fine levels in over the first half of training so the
            # field stays too coarse to co-adapt while the poses move.
            L = field.config.grid_config.n_levels
            phase_starts = [int(iters * 0.5 * k / L) for k in range(L)]
            phase_options = [
                dataclasses.replace(
                    self.render_options,
                    level_window=(1.0,) * (k + 1) + (0.0,) * (L - 1 - k))
                for k in range(L)
            ]
            phase_starts.append(int(iters * 0.5))
            phase_options.append(self.render_options)

        occupancy_threshold = (occupancy.config.threshold
                               if occupancy is not None else None)
        self._batch_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            replicated = NamedSharding(mesh, P())
            self._batch_sharding = NamedSharding(mesh, P('data'))
            # With a 'model' mesh axis the hash table (and its Adam
            # moments / EMA copy) shard on the feature axis — grid
            # tensor parallelism; everything else replicates.
            state_spec = replicated
            if 'model' in mesh.axis_names:
                from autolabel_tpu.parallel import tree_shardings
                gc = field.config.grid_config
                grid_shape = ((gc.n_levels, gc.table_size, gc.n_features)
                              if gc is not None else None)
                state_spec = tree_shardings(mesh, self.state, grid_shape)
                self.state = jax.device_put(self.state, state_spec)
            in_shardings = [state_spec, self._batch_sharding, replicated]
            if occupancy is not None:
                in_shardings += [replicated, replicated]

            def _jit_step(fn):
                return jax.jit(fn,
                               donate_argnums=0,
                               in_shardings=tuple(in_shardings),
                               out_shardings=(state_spec, replicated))
        else:

            def _jit_step(fn):
                return jax.jit(fn, donate_argnums=0)

        # (first_step, jitted step fn) per phase, ascending; jax.jit is
        # lazy, so phases never reached never compile.
        self._phases = [
            (start,
             _jit_step(
                 _make_step(field, self.tx, self.loss_options, options,
                            occupancy_threshold=occupancy_threshold,
                            pose_init=self._pose_init)))
            for start, options in zip(phase_starts, phase_options)
        ]
        self._train_step = self._phases[0][1]

        self._ema_step = jax.jit(_ema_update, static_argnums=1,
                                 donate_argnums=0)
        self._staged = StagedRenderer(
            field,
            RenderOptions(num_steps=self.render_options.num_steps,
                          upsample_steps=self.render_options.upsample_steps,
                          proposal_steps=self.render_options.proposal_steps,
                          perturb=False),
            max_ray_batch=max_ray_batch)

        if workspace is not None and use_checkpoint == 'latest':
            self._try_resume()

    # -- checkpointing -----------------------------------------------------

    @property
    def checkpoint_dir(self):
        return os.path.join(self.workspace, 'checkpoints')

    def _try_resume(self):
        payload = checkpoints.load_checkpoint(self.checkpoint_dir)
        if payload is None:
            return
        # Pose-refinement deltas are not part of the model hash (the
        # field weights are interchangeable), so a workspace can be
        # resumed across a --pose-refine toggle: reconcile the 'pose'
        # entry before any tx.init touches the pytree — optax.masked
        # masks were built for the CURRENT structure and a dict-key
        # mismatch raises deep inside jax.tree.map otherwise.
        for tree_key in ('model', 'ema'):
            tree = payload.get(tree_key)
            if tree is None:
                continue
            if self._pose_init is not None and 'pose' not in tree:
                from autolabel_tpu.train.pose_refine import init_pose_params
                tree = dict(tree,
                            pose=init_pose_params(len(self._pose_init[1])))
            elif self._pose_init is None and 'pose' in tree:
                tree = {k: v for k, v in tree.items() if k != 'pose'}
            else:
                continue
            payload[tree_key] = tree
            # The saved moments cover a different param set; restart.
            payload['optimizer'] = None
        opt_state = payload.get('optimizer')
        if opt_state is not None:
            # A checkpoint written under a different optimizer config
            # (e.g. interactive constant-lr vs offline StepLR) has a
            # different state pytree; silently feeding it to tx.update
            # corrupts the schedule. Reinit the moments on mismatch.
            expected = jax.tree.structure(self.tx.init(payload['model']))
            if jax.tree.structure(opt_state) != expected:
                opt_state = None
        if opt_state is None:
            # Lightweight epoch snapshot: restart the Adam moments.
            opt_state = self.tx.init(payload['model'])
        self.state = {
            'params': payload['model'],
            'ema': payload['ema'],
            'opt_state': opt_state,
            'step': jnp.asarray(payload['global_step'], jnp.int32),
        }
        self.global_step = payload['global_step']
        self.epoch = payload.get('epoch', self.global_step // 1000)

    def save_checkpoint(self, name=None, include_optimizer=True):
        if self.workspace is None:
            return
        if name is None:
            name = f'{self.name}_ep{self.epoch:04d}'
        path = os.path.join(self.checkpoint_dir, f'{name}.pth')
        state = dict(self.state, step=self.global_step)
        checkpoints.save_checkpoint(path, state, extra={'epoch': self.epoch},
                                    include_optimizer=include_optimizer)

    # -- training ----------------------------------------------------------

    def _device_batch(self, data):
        if isinstance(data.get('rays_o'), jax.Array):
            return data  # already transformed (PrefetchIterator path)
        batch = {k: data[k] for k in _BATCH_KEYS}
        if self.loss_options.feature_loss:
            batch['features'] = data['features']
        if self._pose_init is not None:
            batch['frame_idx'] = data['frame_idx']
            batch['rays_d_cam'] = data['rays_d_cam']
        batch['direction_norms'] = batch['direction_norms'].reshape(-1)[:,
                                                                        None]
        if self._batch_sharding is not None:
            batch = jax.device_put(batch, self._batch_sharding)
        return batch

    def train(self, dataloader, epochs, iters_per_epoch=1000,
              checkpoint_interval=None):
        """checkpoint_interval: save a params+ema snapshot every N epochs.
        Default None = final save only — any mid-training device->host
        transfer permanently degrades tunneled-TPU execution to ~600 ms
        per step (see SYNC_EVERY note), so periodic snapshots are opt-in.
        """
        for epoch in range(epochs):
            losses = self.train_iterations(dataloader, iters_per_epoch)
            self.epoch += 1
            if losses is not None and (self.metrics_logger is not None
                                       or self.tb_writer is not None):
                # One tiny device->host fetch per epoch, at the epoch
                # boundary — the inner loop stays fetch-free.
                fetched = {k: float(v) for k, v in losses.items()}
                if self.metrics_logger is not None:
                    self.metrics_logger.log(self.epoch, self.global_step,
                                            fetched)
                if self.tb_writer is not None:
                    self.tb_writer.add_scalars(
                        self.global_step,
                        {f'train/{k}': v for k, v in fetched.items()})
            if (checkpoint_interval is not None
                    and (epoch + 1) % checkpoint_interval == 0
                    and epoch + 1 < epochs):
                self.save_checkpoint(include_optimizer=False)

    # How often to force completion of in-flight steps: bounds the async
    # dispatch queue without a device->host transfer. NOTE: the training
    # loop deliberately performs NO device_get anywhere — on tunneled TPU
    # runtimes (axon relay) the first d2h transfer costs minutes and
    # permanently degrades every subsequent execute to ~600 ms; keeping
    # the loop fetch-free preserves ~1 ms/step. The reference synced every
    # step for its tqdm loss bar; we return device arrays instead.
    SYNC_EVERY = 10

    def train_iterations(self, dataloader, iterations, progress=True):
        """Run `iterations` optimization steps + one EMA/schedule tick.

        Returns the last step's loss dict as DEVICE arrays (convert with
        float() only when a host value is truly needed — see note above).
        """
        iterator = iter(dataloader)
        losses = None
        for i in range(iterations):
            data = next(iterator)
            if (self.occupancy is not None and
                    self.global_step % self.occupancy_update_every == 0):
                self.occupancy.update(self.field, self.state['params'])
            args = ()
            if self.occupancy is not None:
                args = self.occupancy.state()
            step_fn = self._phases[0][1]
            for first_step, fn in self._phases:
                if self.global_step >= first_step:
                    step_fn = fn
            self.state, losses = step_fn(
                self.state, self._device_batch(data), self._base_key, *args)
            self.global_step += 1
            if (i + 1) % self.SYNC_EVERY == 0:
                losses['total'].block_until_ready()
        self.state = self._ema_step(self.state, self.ema_decay)
        return losses

    # -- inference ---------------------------------------------------------

    def eval_params(self):
        """Live parameters — the reference's preview/eval path renders the
        raw model (backend.py:123-152 calls test_step directly); EMA is
        kept separately in state['ema'] for checkpoint consumers."""
        return self.state['params']

    def test_step(self, data, use_ema=False):
        """Full-frame staged render -> (rgb, depth, semantic probs,
        features), shapes (H, W, ...). Parity: trainer.py:96-116."""
        params = self.state['ema'] if use_ema else self.state['params']
        out = self._staged.render(params, data['rays_o'], data['rays_d'],
                                  data['direction_norms'].reshape(
                                      *data['rays_o'].shape[:-1]))
        return out['image'], out['depth'], out['semantic'], out[
            'semantic_features']

    def eval_step(self, data):
        """Render one eval frame and compute the validation loss terms."""
        params = self.eval_params()
        out = self._staged.render(params, data['rays_o'], data['rays_d'],
                                  data['direction_norms'].reshape(
                                      *data['rays_o'].shape[:-1]))
        gt_rgb = np.asarray(data['pixels'])
        loss = float(np.mean((out['image'] - gt_rgb) ** 2))
        return out, loss


class InteractiveTrainer(SimpleTrainer):
    """Single-step trainer for the paint->train->preview loop. EMA and lr
    schedule tick every 100 steps. Parity: autolabel/trainer.py:163-218."""

    EMA_EVERY = 100

    # How many dispatched-but-unfinished steps may be in flight. JAX
    # dispatch is asynchronous: the message pump can ENQUEUE steps far
    # faster than the device executes them (the reference's sync torch
    # step was self-pacing), and every preview request then stalls for
    # the whole backlog — measured r4: preview round trips grew 22 s ->
    # 75 s across a session as the queue ran away. A small window keeps
    # host/device pipelining (no per-step sync) while bounding preview
    # latency at ~window x step time.
    MAX_INFLIGHT = 8

    def __init__(self, *args, **kwargs):
        kwargs.setdefault('iters', None)  # ConstantLR (backend.py:55-56)
        super().__init__(*args, **kwargs)
        self.iterator = None
        self.step = 0
        import collections
        self._inflight = collections.deque()

    def init(self, dataloader):
        self.iterator = iter(dataloader)
        self.step = 0

    def take_step(self):
        data = next(self.iterator)
        if (self.occupancy is not None and
                self.global_step % self.occupancy_update_every == 0):
            self.occupancy.update(self.field, self.state['params'])
        args = self.occupancy.state() if self.occupancy is not None else ()
        self.state, losses = self._train_step(
            self.state, self._device_batch(data), self._base_key, *args)
        self.global_step += 1
        self.step += 1
        if self.step % self.EMA_EVERY == 0:
            self.state = self._ema_step(self.state, self.ema_decay)
        self._inflight.append(losses)
        while len(self._inflight) > self.MAX_INFLIGHT:
            jax.block_until_ready(self._inflight.popleft())
        return losses

    def dataset_updated(self, loader):
        self.iterator = iter(loader)
