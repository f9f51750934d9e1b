"""Interactive backend: the paint -> train -> propagate loop, driven
headless over a real multiprocessing Pipe (in-process, no Qt)."""
import multiprocessing
import os

import cv2
import numpy as np
import pytest

from autolabel_tpu.backend import TrainingLoop
from autolabel_tpu.utils.ros_utils import MessageBuffer

# Training/compile-heavy: excluded from the smoke tier (pytest -m 'not slow').
pytestmark = pytest.mark.slow



class _Flags:
    lr = 1e-4
    geometric_features = 15
    encoding = 'hg+freq'
    features = None
    rgb_weight = 1.0
    semantic_weight = 1.0
    feature_weight = 0.5
    depth_weight = 0.1
    feature_dim = 16
    batch_size = 512


def test_backend_message_protocol(sphere_scene, tmp_path):
    # The backend mutates the scene (repainted labels, checkpoints);
    # run against a private copy so the session fixture stays pristine.
    import shutil
    scene = str(tmp_path / 'scene')
    shutil.copytree(sphere_scene, scene)
    sphere_scene = scene

    parent, child = multiprocessing.Pipe()
    loop = TrainingLoop(sphere_scene, _Flags(), child, dataset_factor=1.0)
    loop.trainer.init(loop.train_dataset)

    # A few train steps.
    for _ in range(3):
        loop.trainer.take_step()

    # get_image: the GUI requests a preview render.
    parent.send(('get_image', 0))
    loop._check_messages()
    assert parent.poll(5)
    message_type, payload = parent.recv()
    assert message_type == 'image'
    assert payload['image_index'] == 0
    assert payload['rgb'].shape == (36, 48, 3)
    assert payload['depth'].shape == (36, 48)
    assert payload['semantic'].shape == (36, 48)
    assert payload['features'] is None  # no feature field configured

    # update_image: repaint a label PNG on disk, notify, check the sampler
    # picks it up (the disk is the protocol).
    name = loop.train_dataset.image_names[1]
    semantic_path = os.path.join(sphere_scene, 'semantic', f'{name}.png')
    new_labels = np.full((36, 48), 2, dtype=np.uint8)
    cv2.imwrite(semantic_path, new_labels)
    parent.send(('update_image', 1))
    loop._check_messages()
    assert (loop.train_dataset.semantics[1] == 2).all()

    # checkpoint: writes best.pth under the model-hash workspace.
    parent.send(('checkpoint', None))
    loop._check_messages()
    best = os.path.join(sphere_scene, 'nerf',
                        'g15_hg+freq_plain_rgb1.0_d0.1_s1.0_f0.5',
                        'checkpoints', 'best.pth')
    assert os.path.exists(best)

    # Coalescing: only the latest get_image request is answered.
    parent.send(('get_image', 2))
    parent.send(('get_image', 3))
    loop._check_messages()
    _, payload = parent.recv()
    assert payload['image_index'] == 3
    assert not parent.poll(0.1)

    loop.shutdown()


def test_message_buffer_matching():
    class Stamp:
        def __init__(self, t):
            self.t = t

        def to_sec(self):
            return self.t

    class Msg:
        def __init__(self, t):
            self.header = type('H', (), {'stamp': Stamp(t)})()

    buf = MessageBuffer(sync_threshold=1 / 60.0, max_size=3)
    for t in (0.0, 0.1, 0.2, 0.3):
        buf.add_message(Msg(t))
    assert len(buf) == 3  # bounded
    match = buf.closest(Stamp(0.21))
    assert match is not None
    assert abs(match.header.stamp.to_sec() - 0.2) < 1e-9
    assert buf.closest(Stamp(5.0)) is None


def test_backend_baked_preview(sphere_scene, tmp_path):
    """--baked-preview serves get_image from the splat cache with the
    same payload contract; the cache refreshes INCREMENTALLY (one slab
    per cadence tick interleaved with train steps), never a full
    re-bake inside the message pump."""
    import shutil
    scene = str(tmp_path / 'scene')
    shutil.copytree(sphere_scene, scene)

    class _BakedFlags(_Flags):
        baked_preview = True
        rebake_every = 16  # one slab per step (16 slabs)

    parent, child = multiprocessing.Pipe()
    loop = TrainingLoop(scene, _BakedFlags(), child, dataset_factor=1.0)
    loop.trainer.init(loop.train_dataset)
    for _ in range(3):
        loop.trainer.take_step()

    parent.send(('get_image', 0))
    loop._check_messages()
    assert parent.poll(5)
    message_type, payload = parent.recv()
    assert message_type == 'image'
    assert payload['rgb'].shape == (36, 48, 3)
    assert payload['depth'].shape == (36, 48)
    assert payload['semantic'].shape == (36, 48)
    assert loop._baker is not None  # populated once at first request
    first_bake_step = loop._bake_step
    assert first_bake_step is not None

    # Another request reuses the cache (no step progress: no refresh).
    parent.send(('get_image', 1))
    loop._check_messages()
    assert parent.recv()[1]['image_index'] == 1
    assert loop._bake_step == first_bake_step

    # Stepping past the per-slab cadence refreshes one slab at a time.
    block_before = loop._baker._next_block
    for _ in range(3):
        loop.trainer.take_step()
        loop._maybe_update_bake()
    assert loop._bake_step > first_bake_step
    assert loop._baker._next_block == (block_before +
                                       3) % loop._baker.n_blocks


def test_backend_occupancy_grid(sphere_scene, tmp_path):
    """--occupancy-grid wires an occupancy grid into the interactive
    trainer; steps keep running and update it on cadence."""
    import shutil
    scene = str(tmp_path / 'scene')
    shutil.copytree(sphere_scene, scene)

    class _OccFlags(_Flags):
        occupancy_grid = True

    parent, child = multiprocessing.Pipe()
    loop = TrainingLoop(scene, _OccFlags(), child, dataset_factor=1.0)
    assert loop.trainer.occupancy is not None
    loop.trainer.init(loop.train_dataset)
    for _ in range(3):
        losses = loop.trainer.take_step()
    assert np.isfinite(float(losses['total']))


def test_synchronized_streams_and_pose_matrix():
    """ros_utils.SynchronizedStreams: the online node's rgb/depth/
    keyframe triple-match, and pose_matrix's quaternion inversion —
    both pure-python, no rospy."""
    from autolabel_tpu.utils.ros_utils import (SynchronizedStreams,
                                               pose_matrix)

    class Stamp:
        def __init__(self, t):
            self.t = t

        def to_sec(self):
            return self.t

    class Msg:
        def __init__(self, t):
            self.header = type('H', (), {'stamp': Stamp(t)})()

    streams = SynchronizedStreams(('rgb', 'depth', 'pose'), 1 / 60.0,
                                  max_size=4)
    assert streams.offer('rgb', Msg(0.0)) is None
    assert streams.offer('depth', Msg(0.005)) is None
    matched = streams.offer('pose', Msg(0.01))
    assert matched is not None
    assert matched['rgb'].header.stamp.to_sec() == 0.0
    # A lone far-future message does not match the stale pair.
    assert streams.offer('rgb', Msg(10.0)) is None

    class Pose:
        class pose:
            class position:
                x, y, z = 1.0, 2.0, 3.0

            class orientation:
                # 90 degrees about z.
                x, y, z, w = 0.0, 0.0, np.sin(np.pi / 4), np.cos(np.pi / 4)

    T_CW = pose_matrix(Pose())
    T_WC = np.linalg.inv(T_CW)
    np.testing.assert_allclose(T_WC[:3, 3], [1.0, 2.0, 3.0], atol=1e-9)
    # R_WC rotates x onto y for a +90 z rotation.
    np.testing.assert_allclose(T_WC[:3, :3] @ [1, 0, 0], [0, 1, 0],
                               atol=1e-9)
    np.testing.assert_allclose(T_CW[:3, :3] @ T_CW[:3, :3].T, np.eye(3),
                               atol=1e-9)
