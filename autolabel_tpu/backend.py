"""GUI backend: the child process that trains forever, re-reads repainted
label PNGs, and streams preview renders back over a Pipe.

Message protocol parity (autolabel/backend.py:97-164): receives
('update_image', idx) / ('get_image', idx) / ('checkpoint', None); sends
('image', {image_index, rgb, depth, semantic, features}). The disk is part
of the protocol — labels travel as PNG paths, not pixels.
"""
import os
import pickle

import h5py
import numpy as np

from autolabel_tpu import model_utils
from autolabel_tpu.core.dataset import SceneDataset
from autolabel_tpu.render.renderer import RenderOptions
from autolabel_tpu.train.losses import LossOptions
from autolabel_tpu.train.trainer import InteractiveTrainer


def _fetch_frame(rgb, depth):
    """Device->host fetch of a preview frame in compact dtypes (uint8
    rgb, f16 depth — 5x fewer bytes than f32), restored to the float
    payload contract on the host. Tunneled TPU links move single-digit
    MB/s, so the fetch, not the render, dominates preview latency
    (measured r4: 640x480 volumetric preview RTT 14.8 s mean)."""
    import jax.numpy as jnp
    rgb8 = np.asarray(jnp.clip(jnp.round(rgb * 255.0), 0, 255)
                      .astype(jnp.uint8))
    d16 = np.asarray(depth.astype(jnp.float16))
    return (rgb8.astype(np.float32) / 255.0), d16.astype(np.float32)


class TrainingLoop:

    def __init__(self, scene, flags, connection, dataset_factor=4.0):
        self.scene_path = scene
        self.flags = flags
        model_hash = model_utils.model_hash(flags)
        self.workspace = os.path.join(scene, 'nerf', model_hash)
        # Pay the device->host transfer handshake NOW, before the user
        # asks for a preview: on tunneled TPUs the FIRST d2h fetch of a
        # process costs a large variable setup (measured 10-400 s;
        # NOTES.md), and the natural first fetch would otherwise be the
        # first preview the user waits on. Microseconds on a local chip.
        import jax.numpy as jnp
        np.asarray(jnp.zeros(()))
        self._load_pca()
        self.train_dataset = SceneDataset('train',
                                          scene,
                                          factor=dataset_factor,
                                          batch_size=flags.batch_size,
                                          features=flags.features)
        n_classes = (self.train_dataset.n_classes
                     if self.train_dataset.n_classes is not None else 2)
        self.field = model_utils.create_model(self.train_dataset.min_bounds,
                                              self.train_dataset.max_bounds,
                                              n_classes, flags)
        loss_options = LossOptions(rgb_weight=flags.rgb_weight,
                                   depth_weight=flags.depth_weight,
                                   semantic_weight=flags.semantic_weight,
                                   feature_weight=flags.feature_weight,
                                   feature_loss=flags.features is not None)
        # Interactive training runs the flagship sampled-backward step
        # (exact forward, 2 sampled gradient-scatter rows): there is no
        # schedule/annealing here, so zero forward noise matters for the
        # preview the user paints against. Only the wide-row (TPU_GRID)
        # layout implements it; narrow reference-preset rows train exact.
        sampled_backward = getattr(flags, 'sampled_backward', 2)
        grid_cfg = self.field.config.grid
        if grid_cfg is None or grid_cfg.n_features % 8 != 0:
            sampled_backward = 0
        # Magnitude-weighted backward point subsample (unbiased; the
        # measured top-25% of points carry ~all gradient mass). Safe
        # without the offline schedule's exact tail: room 10k with NO
        # tail at 0.25 measures 24.23 dB, inside the flagship band
        # (BASELINE.md round 4).
        backward_points = (getattr(flags, 'backward_points', 0.25)
                           if sampled_backward else 1.0)
        if getattr(flags, 'proposal', False):
            render_options = RenderOptions(
                num_steps=32, perturb=True,
                sampled_backward=sampled_backward,
                backward_points=backward_points,
                proposal_steps=getattr(flags, 'proposal_steps', 64))
        else:
            render_options = RenderOptions(num_steps=128, perturb=True,
                                           sampled_backward=sampled_backward,
                                           backward_points=backward_points)
        occupancy = None
        if getattr(flags, 'occupancy_grid', False):
            from autolabel_tpu.render.occupancy import (OccupancyGrid,
                                                        OccupancyGridConfig)
            occupancy = OccupancyGrid(OccupancyGridConfig(),
                                      self.field.config.bound)
            occupancy.mark_untrained_grid(self.train_dataset.poses,
                                          self.train_dataset.intrinsics,
                                          self.train_dataset.camera.size)
        self.trainer = InteractiveTrainer(
            'ngp',
            self.field,
            lr=flags.lr,
            loss_options=loss_options,
            render_options=render_options,
            workspace=self.workspace,
            ema_decay=0.95,
            use_checkpoint='latest',
            occupancy=occupancy)
        self.done = False
        self.connection = connection
        # Baked fast preview (--baked-preview): serve get_image from a
        # splat cache instead of a full volumetric render per request
        # (render/baked.py). The cache refreshes INCREMENTALLY — one
        # volume slab per update, interleaved with train steps in run()
        # — so a full refresh cycle spans `rebake_every` steps but no
        # single message-pump iteration ever pays a full bake
        # (IncrementalBaker; replaces the round-2 synchronous re-bake
        # and its multi-second freeze).
        self.baked_preview = getattr(flags, 'baked_preview', False)
        self.rebake_every = getattr(flags, 'rebake_every', 2000)
        self._baker = None
        self._governed = None
        self._bake_step = None

    def _load_pca(self):
        feature_path = os.path.join(self.scene_path, 'features.hdf')
        if self.flags.features is None or not os.path.exists(feature_path):
            self.pca = None
            return
        with h5py.File(feature_path, 'r') as f:
            features = f[f'features/{self.flags.features}']
            self.pca = pickle.loads(features.attrs['pca'].tobytes())
            self.feature_min = features.attrs['min']
            self.feature_range = features.attrs['range']

    def run(self):
        self.trainer.init(self.train_dataset)
        while not self.done:
            self._check_messages()
            self.trainer.take_step()
            self._maybe_update_bake()

    def _maybe_update_bake(self):
        """Refresh one splat-cache slab when its share of the rebake
        period has elapsed — amortized, never a full-bake stall."""
        if self._baker is None:
            return
        step = self.trainer.global_step
        per_block = max(self.rebake_every // self._baker.n_blocks, 1)
        if step - self._bake_step >= per_block:
            self._baker.update_next_block(self.trainer.eval_params())
            self._bake_step = step

    def _check_messages(self):
        get_image_message = None
        while self.connection.poll():
            message_type, data = self.connection.recv()
            if message_type == 'update_image':
                self._update_image(data)
            elif message_type == 'get_image':
                # Only the latest image request is relevant.
                get_image_message = data
            elif message_type == 'checkpoint':
                self._save_checkpoint()
        if get_image_message is not None:
            self._get_image(get_image_message)

    def _get_baked_image(self, image_index):
        import numpy as np

        from autolabel_tpu.render.baked import (GovernedPreviewRenderer,
                                                IncrementalBaker)

        if self._baker is None:
            # One-time full population (the old full-bake cost, paid
            # once); afterwards _maybe_update_bake keeps it fresh one
            # slab at a time. Config matches benchmarks/preview_fps.py's
            # 2^18-splat budget; the fps governor then adapts the
            # rendered subset to hold the 30 fps target under whatever
            # the day's device/tunnel latency is.
            self._baker = IncrementalBaker(self.field, resolution=128,
                                           max_points=2 ** 18)
            self._baker.update_all(self.trainer.eval_params())
            self._bake_step = self.trainer.global_step
            self._governed = GovernedPreviewRenderer(self._baker.scene())
        else:
            self._governed.set_scene(self._baker.scene())

        T_CW = np.linalg.inv(self.train_dataset.poses[image_index])
        camera = self.train_dataset.camera
        out = self._governed.render(camera.camera_matrix, T_CW,
                                    camera.size)
        rgb, depth = _fetch_frame(out['image'], out['depth'])
        import jax.numpy as jnp
        semantic = np.asarray(
            jnp.asarray(out['semantic']).astype(jnp.uint8)).astype(np.int32)
        self.log(f"Sending {image_index} (baked)")
        self.connection.send(('image', {
            'image_index': image_index,
            'rgb': rgb,
            'depth': depth,
            'semantic': semantic,
            'features': None,
        }))

    def _get_image(self, image_index):
        if self.baked_preview:
            return self._get_baked_image(image_index)
        import jax.numpy as jnp

        data = self.train_dataset._get_test(image_index)
        p_rgb, p_depth, p_semantic, p_features = self.trainer.test_step(data)
        # Class decision on DEVICE: fetching the (H, W, C) float logits
        # to argmax on the host is C x 4 bytes/pixel over a link that
        # tunneled devices serve at single-digit MB/s. uint8 carries any
        # realistic class count at 1/4 the bytes of int32.
        semantic = np.asarray(jnp.argmax(p_semantic, axis=-1)
                              .astype(jnp.uint8)).astype(np.int32)
        rgb, depth = _fetch_frame(p_rgb, p_depth)

        if self.pca is not None:
            feats = np.asarray(p_features.astype(jnp.float16))
            H, W, C = feats.shape
            features = self.pca.transform(
                feats.reshape(H * W, C).astype(np.float32))
            features = np.clip(
                (features - self.feature_min) / self.feature_range, 0.0, 1.0)
            features = features.reshape(H, W, 3)
        else:
            features = None

        self.log(f"Sending {image_index}")
        self.connection.send(('image', {
            'image_index': image_index,
            'rgb': rgb,
            'depth': depth,
            'semantic': semantic,
            'features': features,
        }))

    def _update_image(self, image_index):
        self.train_dataset.semantic_map_updated(image_index)

    def _save_checkpoint(self):
        self.trainer.save_checkpoint(name='best')

    def log(self, message):
        print(message)

    def shutdown(self, *args):
        self.done = True
