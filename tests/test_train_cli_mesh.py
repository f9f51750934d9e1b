"""scripts/train.py driven end to end on the virtual 8-device mesh.

Covers the seams the trainer-level parallel tests and
__graft_entry__.dryrun_multichip skip: the host data loader feeding a
sharded step through the REAL CLI, checkpoint save under a mesh, resume
under the same mesh, and eval parity with a single-device run of the
same schedule.

Tiny grid via monkeypatched TPU_GRID: the CI host is single-core and
XLA's CPU collective rendezvous aborts if 8 serialized replica
computations exceed its 40 s timeout (same constraint as
tests/test_parallel.py).
"""
import os
import sys

import numpy as np
import pytest

from autolabel_tpu.ops.encoders import HashGridConfig
from autolabel_tpu.train import checkpoints

# Training/compile-heavy fixture-training tests: slow tier + e2e sub-tier.
pytestmark = [pytest.mark.slow, pytest.mark.e2e]

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'scripts')
sys.path.insert(0, SCRIPTS)

# Small but representative: n_features 16 keeps the lane-aligned wide-row
# layout (so the flagship sampled-backward estimator stays ON — train.py
# disables it for n_features % 8 != 0).
SMALL_GRID = HashGridConfig(n_levels=2,
                            n_features=16,
                            log2_hashmap_size=10,
                            base_resolution=8,
                            per_level_scale=2.0)

MODEL_HASH = 'g15_hg+freq_plain_rgb1.0_d0.1_s1.0_f0.5_tpugrid_simplex'


@pytest.fixture
def small_grid(monkeypatch):
    import autolabel_tpu.ops.encoders as encoders
    monkeypatch.setattr(encoders, 'TPU_GRID', SMALL_GRID)


def _run_train(monkeypatch, capsys, scene, workspace, iters, extra=()):
    """Drive scripts/train.py's real main(); returns eval PSNR (dB) if
    --eval was passed."""
    import importlib
    module = importlib.import_module('train')
    argv = ['train.py', scene, '--iters', str(iters),
            '--batch-size', '512', '--factor-train', '1',
            '--factor-test', '1', '--num-steps', '16',
            '--workspace', workspace, '--no-metrics'] + list(extra)
    monkeypatch.setattr(sys, 'argv', argv)
    module.main()
    out = capsys.readouterr().out
    for line in out.splitlines():
        if line.startswith('eval:'):
            return float(line.split('psnr=')[1].split('dB')[0])
    return None


def _checkpoint_dir(workspace, scene):
    scene_name = os.path.basename(os.path.normpath(scene))
    return os.path.join(workspace, scene_name, MODEL_HASH, 'checkpoints')


def test_train_cli_mesh_dp8_resume_and_parity(sphere_scene, monkeypatch,
                                              capsys, tmp_path, small_grid):
    """Train via the CLI on an 8-device DP mesh, save, RESUME under the
    same mesh, and land within a band of the single-device run."""
    ws_single = str(tmp_path / 'single')
    ws_mesh = str(tmp_path / 'mesh')

    psnr_single = _run_train(monkeypatch, capsys, sphere_scene, ws_single,
                             300, ['--eval'])
    assert psnr_single is not None and psnr_single > 14.0

    # First leg: 150 iters under the mesh, checkpoint written.
    _run_train(monkeypatch, capsys, sphere_scene, ws_mesh, 150,
               ['--mesh-devices', '8'])
    ckpt_dir = _checkpoint_dir(ws_mesh, sphere_scene)
    payload = checkpoints.load_checkpoint(ckpt_dir)
    assert payload is not None and payload['global_step'] == 150

    # Second leg: resume from the mesh-written checkpoint, still under
    # the mesh (the host-numpy payload must re-shard through the jitted
    # step's in_shardings), train 150 more, eval.
    psnr_mesh = _run_train(monkeypatch, capsys, sphere_scene, ws_mesh,
                           150, ['--mesh-devices', '8', '--eval'])
    payload = checkpoints.load_checkpoint(ckpt_dir)
    assert payload['global_step'] == 300
    assert psnr_mesh is not None and psnr_mesh > 14.0
    # Different data-sampling streams: parity is a band, not equality.
    assert abs(psnr_mesh - psnr_single) < 3.0


def test_train_cli_mesh_dp4_tp2(sphere_scene, monkeypatch, capsys,
                                tmp_path, small_grid):
    """--mesh-model 2: the hash table (and its Adam moments/EMA) shard on
    the feature axis while the batch shards over 'data' — through the
    CLI, including the checkpoint save of sharded state."""
    ws = str(tmp_path / 'dp4tp2')
    psnr = _run_train(monkeypatch, capsys, sphere_scene, ws, 120,
                      ['--mesh-devices', '8', '--mesh-model', '2',
                       '--eval'])
    assert psnr is not None and psnr > 12.0
    payload = checkpoints.load_checkpoint(_checkpoint_dir(ws, sphere_scene))
    assert payload['global_step'] == 120
    # Saved checkpoints are host-complete (gathered), not shards.
    grid = payload['model']['encoder']['grid']
    assert np.asarray(grid).shape == (SMALL_GRID.n_levels,
                                      2 ** SMALL_GRID.log2_hashmap_size,
                                      SMALL_GRID.n_features)
