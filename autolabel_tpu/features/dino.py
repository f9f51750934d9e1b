"""DINO ViT-S/8 feature teacher.

Parity: autolabel/features/dino.py:9-27 (torch hub dino_vits8, last-layer
patch tokens -> H/8 x W/8 x 384). Resolution order:
  1. torch hub (needs network the first time);
  2. AUTOLABEL_DINO_WEIGHTS=<path to the official dino_deitsmall8
     checkpoint .pth> — runs the TPU-native JAX ViT (features/vit_jax.py,
     numerically validated against transformers' ViT);
  3. deterministic fallback (only with allow_fallback).
"""
import os
import warnings

import numpy as np

from autolabel_tpu.features.fallback import RandomFeatureExtractor

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class Dino:
    out_dim = 384

    def __init__(self, allow_fallback=False):
        self._model = None
        self._jax_params = None
        try:
            import torch
            self._model = torch.hub.load('facebookresearch/dino:main',
                                         'dino_vits8')
            self._model.eval()
            self._torch = torch
        except Exception as e:  # offline / no weights
            weights = os.environ.get('AUTOLABEL_DINO_WEIGHTS')
            if weights and os.path.exists(weights):
                import torch

                from autolabel_tpu.features import vit_jax
                state = torch.load(weights, map_location='cpu')
                state = state.get('student', state.get('model', state))
                state = {k.replace('module.', '').replace('backbone.', ''):
                         v for k, v in state.items()}
                self._jax_params = vit_jax.load_timm_state_dict(state)
                return
            if not allow_fallback:
                raise RuntimeError(
                    "DINO ViT-S/8 weights are unavailable (torch hub "
                    f"load failed: {e!r}). Pass --allow-fallback to use "
                    "deterministic random-projection stand-in features "
                    "(testing only — NOT real DINO features).") from e
            warnings.warn(
                f"DINO weights unavailable ({e!r}); using deterministic "
                "fallback features.")
            self._fallback = RandomFeatureExtractor(self.out_dim, stride=8,
                                                    seed=384)

    def shape(self, input_shape):
        return (input_shape[0] // 8, input_shape[1] // 8)

    def __call__(self, x):
        """x: (B, 3, H, W) float in [0, 1] -> (B, H/8, W/8, 384)."""
        if self._jax_params is not None:
            from autolabel_tpu.features import vit_jax
            x = np.asarray(x, np.float32)
            x = (x - _IMAGENET_MEAN[None, :, None, None]) \
                / _IMAGENET_STD[None, :, None, None]
            return np.asarray(
                vit_jax.encode_image(self._jax_params, x)).astype(np.float16)
        if self._model is None:
            return self._fallback(x)
        torch = self._torch
        with torch.inference_mode():
            t = torch.as_tensor(np.asarray(x, np.float32))
            t = (t - torch.as_tensor(_IMAGENET_MEAN)[None, :, None, None]) \
                / torch.as_tensor(_IMAGENET_STD)[None, :, None, None]
            tokens = self._model.get_intermediate_layers(t)[0]
            B, _, H, W = t.shape
            return tokens[:, 1:, :].reshape(B, H // 8, W // 8,
                                            self.out_dim).cpu().numpy()
