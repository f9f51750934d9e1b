"""Inference-time model handle: Field + trained params + staged renderer.

The reference passes around a torch nn.Module with .render/.density/
.semantic methods (evaluation.py, render.py, export.py call sites); this
wrapper provides the same surface over the functional field, with jitted,
chunked device execution under the hood.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

from autolabel_tpu import model_utils
from autolabel_tpu.render.renderer import RenderOptions, StagedRenderer


class InferenceModel:

    def __init__(self,
                 field,
                 params,
                 num_steps=128,
                 upsample_steps=0,
                 max_ray_batch=4096):
        self.field = field
        self.params = params
        self._staged = StagedRenderer(field,
                                      RenderOptions(num_steps=num_steps,
                                                    upsample_steps=upsample_steps,
                                                    perturb=False),
                                      max_ray_batch=max_ray_batch)
        self._density = jax.jit(field.density)
        self._semantic = jax.jit(field.semantic)
        self._chunk = 50000

    @classmethod
    def from_checkpoint(cls, field, model_dir, **kwargs):
        """Loads our pickles AND reference torch checkpoints (imported
        via torch_import; the field is swapped for its geo_relu variant
        so the heads match the reference's relu'd geo features)."""
        field, params, _ = model_utils.load_into_field(
            field, os.path.join(model_dir, 'checkpoints'))
        return cls(field, params, **kwargs)

    def render(self, batch):
        """Staged full-frame render from a dataset _get_test batch.

        Returns dict of numpy arrays shaped (H, W, ...). Contract parity:
        torch-ngp render(staged=True) as used in evaluation.py:62-67.
        The staged renderer keeps chunks on device; this fetches the
        finished frame ONCE (offline consumers want host arrays).
        """
        lead = np.asarray(batch['rays_o']).shape[:-1]
        return jax.device_get(self._staged.render(
            self.params, batch['rays_o'], batch['rays_d'],
            np.asarray(batch['direction_norms']).reshape(*lead)))

    def density(self, points):
        """Chunked density query: (N, 3) -> dict(sigma (N,), geo_feat)."""
        points = np.asarray(points, dtype=np.float32)
        sigmas, geos = [], []
        for start in range(0, len(points), self._chunk):
            sigma, geo = self._density(self.params,
                                       points[start:start + self._chunk])
            sigmas.append(np.asarray(sigma))
            geos.append(np.asarray(geo))
        return {
            'sigma': np.concatenate(sigmas),
            'geo_feat': np.concatenate(geos),
        }

    def semantic(self, geo_feat):
        """Chunked semantic head query: (N, G) -> (logits, features)."""
        geo_feat = np.asarray(geo_feat, dtype=np.float32)
        logits, feats = [], []
        for start in range(0, len(geo_feat), self._chunk):
            l, f = self._semantic(self.params,
                                  geo_feat[start:start + self._chunk])
            logits.append(np.asarray(l))
            feats.append(np.asarray(f))
        return np.concatenate(logits), np.concatenate(feats)
