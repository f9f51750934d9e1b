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
                 proposal_steps=0,
                 max_ray_batch=4096):
        """proposal_steps > 0 uses the checkpoint's proposal net (trained
        with --proposal) to place num_steps main samples from
        proposal_steps cheap uniform probes — ~num_steps/32 of the
        hash-grid queries of the dense parity path at matched quality
        (render/renderer.py proposal chain)."""
        if proposal_steps > 0 and not field.config.proposal:
            raise ValueError(
                'proposal_steps requires a proposal-trained checkpoint '
                '(FieldConfig.proposal); this field has no proposal net')
        self.field = field
        # Checkpoints load as host numpy pytrees; passing those to jitted
        # functions re-uploads every parameter on EVERY call (measured:
        # ~19 s/50k-point chunk over the tunnel vs sub-second once
        # device-resident). Pin them to the device once.
        self.params = jax.device_put(params)
        self._staged = StagedRenderer(field,
                                      RenderOptions(num_steps=num_steps,
                                                    upsample_steps=upsample_steps,
                                                    proposal_steps=proposal_steps,
                                                    perturb=False),
                                      max_ray_batch=max_ray_batch)
        self._density = jax.jit(field.density)
        self._semantic = jax.jit(field.semantic)
        self._jittered = None
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

    def jittered_semantic_features(self, points, n_samples=10, sigma=0.02,
                                   seed=0):
        """Jitter-averaged, L2-normalized semantic features at 3D points.

        The reference's 3D open-vocab evaluator averages the feature
        head over 10 gaussian-jittered queries per point
        (evaluation.py:420-428; the first sample enters with weight 1
        and the remaining N-1 with weight 1/N — quirk preserved). Its
        torch loop pays 2 host round trips per jitter sample; here the
        whole average runs inside ONE jit and each chunk is fetched
        once — on a tunneled TPU that is the difference between
        fetch-bound and compute-bound throughput.
        """
        if self._jittered is None:
            field = self.field

            def query(params, pts):
                _, geo = field.density(params, pts)
                _, f = field.semantic(params, geo)
                return f.astype(jnp.float32)

            def averaged(params, pts, key, n_samples, sigma):
                feats = query(params, pts)
                scale = 1.0 / n_samples

                def body(i, acc):
                    noise = sigma * jax.random.normal(
                        jax.random.fold_in(key, i), pts.shape,
                        dtype=jnp.float32)
                    return acc + query(params, pts + noise) * scale

                feats = jax.lax.fori_loop(0, n_samples - 1, body, feats)
                norm = jnp.linalg.norm(feats, axis=-1, keepdims=True)
                return feats / jnp.maximum(norm, 1e-9)

            self._jittered = jax.jit(averaged, static_argnums=(3, 4))
        points = np.asarray(points, dtype=np.float32)
        key = jax.random.PRNGKey(seed)
        out = []
        for start in range(0, len(points), self._chunk):
            chunk = points[start:start + self._chunk]
            n = len(chunk)
            # Pad partial chunks up to a power-of-two bucket so repeated
            # calls with ragged tails reuse one compiled program.
            padded = min(self._chunk, 1 << max(n - 1, 1).bit_length())
            if n < padded:
                chunk = np.concatenate(
                    [chunk, np.zeros((padded - n, 3), np.float32)])
            feats = self._jittered(self.params, chunk,
                                   jax.random.fold_in(key, start),
                                   int(n_samples), float(sigma))
            out.append(np.asarray(feats)[:n])
        return np.concatenate(out)

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
