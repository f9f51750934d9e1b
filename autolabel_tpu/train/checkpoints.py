"""Checkpoint I/O under the reference's directory contract.

Files live at <scene>/nerf/<model-hash>/checkpoints/*.pth; the loader
prefers best.pth, else the lexicographically-last file (parity:
autolabel/model_utils.py:9-18, torch-ngp 'latest' resume). Payloads are
plain pickles of numpy pytrees — no torch tensors — but keep the .pth
suffix so every reference tool that globs the workspace keeps working.
"""
import glob
import os
import pickle
import zipfile

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path, state, extra=None, include_optimizer=True):
    """state: dict with params/ema/opt_state/step pytrees.

    include_optimizer=False skips the Adam moments — used for periodic
    epoch snapshots where device->host bandwidth is precious (the axon
    TPU tunnel moves ~0.6 MB/s); resume then restarts the moments.
    """
    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = {
        'model': _to_numpy(state['params']),
        'ema': _to_numpy(state['ema']),
        'global_step': int(state['step']),
    }
    if include_optimizer:
        payload['optimizer'] = _to_numpy(state['opt_state'])
    if extra:
        payload.update(extra)
    tmp = path + '.tmp'
    with open(tmp, 'wb') as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)


def load_checkpoint_file(path):
    """Our pickle payloads, plus torch.save archives read torch-free
    (utils/torch_zip.py) — reference workspaces load instead of erroring;
    torch_import.convert_torch_payload maps them onto the field pytree."""
    if zipfile.is_zipfile(path):
        from autolabel_tpu.utils.torch_zip import load_torch_file
        return load_torch_file(path)
    with open(path, 'rb') as f:
        payload = pickle.load(f)
    if isinstance(payload, int):  # legacy torch.save magic number
        from autolabel_tpu.utils.torch_zip import load_torch_file
        return load_torch_file(path)
    return payload


def find_checkpoint(checkpoint_dir):
    """best.pth if present, else the lexicographically-last *.pth."""
    checkpoint_list = sorted(glob.glob(f'{checkpoint_dir}/*.pth'))
    if not checkpoint_list:
        return None
    best = [c for c in checkpoint_list if 'best.pth' in c]
    return best[0] if best else checkpoint_list[-1]


def load_checkpoint(checkpoint_dir):
    """Returns the checkpoint payload dict, or None if none exists."""
    path = find_checkpoint(checkpoint_dir)
    if path is None:
        return None
    return load_checkpoint_file(path)
