"""Depth visualization helper.

Parity: reference autolabel/visualization.py:5-10 (inferno colormap over
normalized depth).
"""
import numpy as np
from matplotlib import cm


def visualize_depth(depth, maxdepth=None):
    if maxdepth is None:
        maxdepth = depth.max() if depth.size else 1.0
    if maxdepth <= 0.0:
        maxdepth = 1.0
    normalized = np.clip(np.asarray(depth) / maxdepth, 0.0, 1.0)
    return (cm.inferno(normalized)[..., :3] * 255.0).astype(np.uint8)
