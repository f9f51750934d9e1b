"""Per-epoch metrics.jsonl logging (VERDICT round-1 item 9)."""
import jax.numpy as jnp

from autolabel_tpu.train.metrics import MetricsLogger, read_metrics
import pytest


def test_metrics_roundtrip(tmp_path):
    ws = str(tmp_path)
    logger = MetricsLogger(ws)
    logger.log(1, 1000, {'total': jnp.float32(0.5), 'rgb': 0.3}, lr=5e-3)
    logger.log(2, 2000, {'total': jnp.float32(0.4), 'rgb': 0.2})
    records = read_metrics(ws)
    assert [r['epoch'] for r in records] == [1, 2]
    assert records[0]['total'] == 0.5 and records[0]['lr'] == 5e-3
    assert records[1]['step'] == 2000
    assert all('wall_s' in r for r in records)


@pytest.mark.slow
def test_trainer_writes_metrics(tmp_path, sphere_scene):
    """A short CLI-shaped training run produces a loss-curve artifact."""
    import sys
    sys.argv = ['train.py', sphere_scene, '--iters', '40',
                '--batch-size', '512', '--factor-train', '4',
                '--num-steps', '16', '--workspace', str(tmp_path / 'ws')]
    sys.path.insert(0, 'scripts')
    import importlib
    train = importlib.import_module('train')
    train.main()
    import glob
    model_dir = glob.glob(str(tmp_path / 'ws' / '*' / '*'))[0]
    records = read_metrics(model_dir)
    assert len(records) == 1  # 40 iters = one (short) epoch
    assert records[0]['total'] > 0 and records[0]['step'] == 40


def test_tb_events_roundtrip(tmp_path):
    """tfevents writer round-trips through its CRC-checked reader and
    uses the real Castagnoli polynomial (known vector)."""
    from autolabel_tpu.train.tb_events import (TBEventWriter, crc32c,
                                               read_events)

    assert crc32c(b'123456789') == 0xE3069283  # standard check value

    writer = TBEventWriter(str(tmp_path / 'run'))
    writer.add_scalars(1000, {'train/total': 0.5, 'train/rgb': 0.25})
    writer.add_scalars(2000, {'train/total': 0.375})
    writer.close()

    events = read_events(writer.path)
    assert [step for step, _ in events] == [1000, 2000]
    assert events[0][1]['train/total'] == pytest.approx(0.5)
    assert events[0][1]['train/rgb'] == pytest.approx(0.25)
    assert events[1][1] == {'train/total': pytest.approx(0.375)}


@pytest.mark.slow
def test_trainer_writes_tensorboard(tmp_path, sphere_scene):
    """--tensorboard writes a readable event file at the reference's
    <workspace>/run/<name> path (autolabel/trainer.py:17-19)."""
    import glob
    import os
    import sys

    from autolabel_tpu.train.tb_events import read_events

    sys.argv = ['train.py', sphere_scene, '--iters', '40',
                '--batch-size', '512', '--factor-train', '4',
                '--num-steps', '16', '--tensorboard',
                '--workspace', str(tmp_path / 'ws')]
    sys.path.insert(0, 'scripts')
    import importlib
    train = importlib.import_module('train')
    train.main()
    model_dir = glob.glob(str(tmp_path / 'ws' / '*' / '*'))[0]
    event_files = glob.glob(os.path.join(model_dir, 'run', 'ngp',
                                         'events.out.tfevents.*'))
    assert len(event_files) == 1
    events = read_events(event_files[0])
    assert len(events) == 1 and events[0][0] == 40
    assert 'train/total' in events[0][1]
