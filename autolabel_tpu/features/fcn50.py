"""FCN-ResNet50 feature teacher.

Parity: autolabel/features/fcn50.py:9-29 (torchvision fcn_resnet50, the
'classifier.2' node -> 512-channel maps at stride 8). Resolution order:
  1. torchvision pretrained weights (needs network the first time);
  2. AUTOLABEL_FCN50_WEIGHTS=<path to a fcn_resnet50_coco .pth state
     dict> through torchvision when installed, else through the
     TPU-native JAX port (features/fcn_jax.py, numerically validated
     against transformers' ResNetModel);
  3. deterministic fallback (only with allow_fallback).
"""
import os
import warnings

import numpy as np

from autolabel_tpu.features.fallback import RandomFeatureExtractor

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class FCN50:
    out_dim = 512

    def __init__(self, allow_fallback=False):
        self._extractor = None
        self._jax = None
        try:
            import torch
            from torchvision.models import feature_extraction
            from torchvision.models.segmentation import fcn_resnet50
            weights = os.environ.get('AUTOLABEL_FCN50_WEIGHTS')
            if weights and os.path.exists(weights):
                # weights_backbone defaults to pretrained (a download);
                # the local state dict covers the backbone too.
                model = fcn_resnet50(weights=None, weights_backbone=None)
                state = torch.load(weights, map_location='cpu')
                state = state.get('state_dict', state.get('model', state))
                # aux_classifier.* is the only legitimately optional part
                # of a fcn_resnet50_coco checkpoint; anything else missing
                # means the file is not an FCN50 checkpoint at all, and a
                # silently half-random model must not pose as a real
                # teacher.
                state = {k: v for k, v in state.items()
                         if not k.startswith('aux_classifier.')}
                missing, _ = model.load_state_dict(state, strict=False)
                missing = [k for k in missing
                           if not k.startswith('aux_classifier.')]
                if missing:
                    raise RuntimeError(
                        f"AUTOLABEL_FCN50_WEIGHTS={weights} does not match "
                        f"fcn_resnet50 (missing {len(missing)} keys, e.g. "
                        f"{missing[:3]})")
            else:
                model = fcn_resnet50(weights='DEFAULT')
            model.eval()
            self._extractor = feature_extraction.create_feature_extractor(
                model, return_nodes={'classifier.2': 'features'})
            self._torch = torch
        except Exception as e:
            weights = os.environ.get('AUTOLABEL_FCN50_WEIGHTS')
            if weights and os.path.exists(weights):
                # The torchvision path failed; try the TPU-native JAX
                # port. This may itself fail (e.g. torch was the missing
                # dependency) — fall through to the descriptive error /
                # fallback handling below rather than crashing with an
                # unrelated ImportError.
                try:
                    import torch

                    from autolabel_tpu.features import fcn_jax
                    state = torch.load(weights, map_location='cpu')
                    state = state.get('state_dict',
                                      state.get('model', state))
                    self._jax = fcn_jax.FCNJax(
                        fcn_jax.load_torchvision_state_dict(state))
                    return
                except Exception as e2:
                    e = e2
            if not allow_fallback:
                raise RuntimeError(
                    "FCN-ResNet50 weights are unavailable (torchvision "
                    f"load failed: {e!r}). Set AUTOLABEL_FCN50_WEIGHTS "
                    "for the TPU-native JAX port, or pass "
                    "--allow-fallback to use deterministic "
                    "random-projection stand-in features "
                    "(testing only — NOT real FCN features).") from e
            warnings.warn(
                f"FCN-ResNet50 weights unavailable ({e!r}); using "
                "deterministic fallback features.")
            self._fallback = RandomFeatureExtractor(self.out_dim, stride=8,
                                                    seed=512)

    def shape(self, input_shape):
        return (input_shape[0] // 8, input_shape[1] // 8)

    def __call__(self, x):
        """x: (B, 3, H, W) float in [0, 1] -> (B, H/8, W/8, 512)."""
        if self._extractor is None:
            if self._jax is not None:
                return self._jax(x)
            return self._fallback(x)
        torch = self._torch
        with torch.inference_mode():
            t = torch.as_tensor(np.asarray(x, np.float32))
            t = (t - torch.as_tensor(_IMAGENET_MEAN)[None, :, None, None]) \
                / torch.as_tensor(_IMAGENET_STD)[None, :, None, None]
            out = self._extractor(t)['features']
            return out.cpu().numpy().transpose([0, 2, 3, 1]).astype(
                np.float16)
