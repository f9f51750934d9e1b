"""Shared color map for semantic classes.

Parity: reference autolabel/constants.py:1-5 (tab10 tiled 4x).
"""
import numpy as np
from matplotlib import cm

COLORS = np.concatenate([cm.tab10(np.linspace(0.0, 1.0, 10))[:, :3]] * 4,
                        axis=0)
