"""Persistent training metrics: one JSONL line per epoch.

The reference writes tensorboardX scalars per run
(/root/reference/autolabel/trainer.py:17-19,29-30); this is the
equivalent observable for long runs, as an append-only
<workspace>/metrics.jsonl that plots with one pandas call and needs no
server.

Cost model: the logger fetches the (tiny) loss dict from device ONCE per
epoch — aligned with the trainer's epoch boundary, so the fetch-free
inner loop is untouched. On tunneled-TPU relays where any device->host
fetch permanently degrades execution (NOTES.md), pass --no-metrics.
"""
import json
import os
import time


class MetricsLogger:

    def __init__(self, workspace, filename='metrics.jsonl'):
        os.makedirs(workspace, exist_ok=True)
        self.path = os.path.join(workspace, filename)
        self._start = time.time()

    def log(self, epoch, step, losses, lr=None):
        """losses: dict of device arrays or floats (fetched here)."""
        record = {
            'epoch': int(epoch),
            'step': int(step),
            'wall_s': round(time.time() - self._start, 2),
        }
        if lr is not None:
            record['lr'] = float(lr)
        for key, value in losses.items():
            record[key] = float(value)
        with open(self.path, 'a') as f:
            f.write(json.dumps(record) + '\n')
        return record


def read_metrics(workspace, filename='metrics.jsonl'):
    """Parse a metrics file back into a list of dicts."""
    path = os.path.join(workspace, filename)
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]
