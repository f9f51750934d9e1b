"""LSeg vision-language feature teacher + CLIP text encoder.

Parity: autolabel/features/lseg.py:9-66 (lang-seg ViT-L/16 backbone,
half-resolution 512-d pixel features aligned with CLIP text embeddings;
encode_text -> unit-norm N x 512). Resolution order, per side:

Pixel features:
  1. the lang-seg torch stack (needs the lang-seg package + CUDA env);
  2. the TPU-native JAX image tower (features/lseg_jax.py — ViT-L/16 +
     DPT decoder + 512-d CLIP-space projection, numerically validated
     against transformers ViT/DPTNeck), fed from the `checkpoint`
     argument or AUTOLABEL_LSEG_WEIGHTS=<lang-seg demo_e200.ckpt>;
  3. deterministic stand-in features (only with allow_fallback).

Text embeddings:
  1. the lang-seg module's CLIP;
  2. AUTOLABEL_CLIP_WEIGHTS=<OpenAI CLIP .pt/state dict> +
     AUTOLABEL_CLIP_BPE=<bpe_simple_vocab_16e6.txt.gz> — the JAX CLIP
     text transformer (features/clip_text_jax.py);
  3. deterministic hash text encoder (only with allow_fallback).
"""
import warnings

from autolabel_tpu.features.fallback import (HashTextEncoder,
                                             RandomFeatureExtractor)


class LSegFE:
    out_dim = 512

    def __init__(self, checkpoint=None, allow_fallback=False):
        self._evaluator = None
        self._text_encoder = None
        self._jax_clip = None
        self._jax_image = None
        self._fallback = None
        self._hash_text = None
        try:
            import clip  # noqa: F401
            import torch
            from modules.lseg_module import LSegModule
            from additional_utils.models import LSeg_MultiEvalModule
            module = LSegModule.load_from_checkpoint(
                checkpoint_path=checkpoint,
                backbone='clip_vitl16_384',
                data_path=None,
                num_features=256,
                batch_size=1,
                base_lr=1e-3,
                max_epochs=100,
                augment=False,
                aux=True,
                aux_weight=0,
                ignore_index=255,
                dataset='ade20k',
                se_loss=False,
                se_weight=0,
                arch_option=0,
                block_depth=0,
                activation='lrelu')
            self._evaluator = LSeg_MultiEvalModule(module, scales=[1.0],
                                                   flip=False).eval()
            self._clip = clip
            self._torch = torch
            self._text_encoder = module.net.clip_pretrained
            return
        except Exception as e:
            lang_seg_err = e

        from autolabel_tpu.features import clip_text_jax, lseg_jax
        self._jax_clip = clip_text_jax.from_env()
        try:
            self._jax_image = (lseg_jax.load(checkpoint) if checkpoint
                               else lseg_jax.from_env())
        except Exception as load_err:
            warnings.warn('LSeg JAX tower weight load failed '
                          f'({load_err!r}); pixel features unavailable.')
        if self._jax_image is not None:
            self.out_dim = self._jax_image.out_dim

        if (self._jax_clip is None and self._jax_image is None
                and not allow_fallback):
            raise RuntimeError(
                "LSeg (lang-seg + CLIP) is unavailable "
                f"({lang_seg_err!r}). Set AUTOLABEL_LSEG_WEIGHTS (or pass "
                "--checkpoint) for the JAX image tower and "
                "AUTOLABEL_CLIP_WEIGHTS + AUTOLABEL_CLIP_BPE for the JAX "
                "CLIP text encoder, or pass --allow-fallback to use "
                "deterministic stand-in features + hash text encoder "
                "(testing only — NOT real vision-language features).")
        warnings.warn(
            f'lang-seg unavailable ({lang_seg_err!r}); pixel features: '
            + ('JAX LSeg tower (real weights)' if self._jax_image
               else 'STAND-IN (--allow-fallback)' if allow_fallback
               else 'DISABLED (set AUTOLABEL_LSEG_WEIGHTS or pass '
                    '--allow-fallback)')
            + '; text embeddings: '
            + ('JAX CLIP (real weights).' if self._jax_clip
               else 'hash stand-in (--allow-fallback).' if allow_fallback
               else 'DISABLED (set AUTOLABEL_CLIP_WEIGHTS/BPE or pass '
                    '--allow-fallback).'))
        if self._jax_image is None and allow_fallback:
            self._fallback = RandomFeatureExtractor(self.out_dim,
                                                    stride=2, seed=1512)
        if self._jax_clip is None:
            self._hash_text = HashTextEncoder(self.out_dim)

    def shape(self, input_shape):
        return (input_shape[0] // 2, input_shape[1] // 2)

    def encode_text(self, prompts):
        """list of N strings -> unit-norm (N, 512) embeddings."""
        if self._text_encoder is None:
            if self._jax_clip is not None:
                return self._jax_clip.encode_text(prompts)
            if self._hash_text is None:
                raise RuntimeError(
                    'LSeg text embeddings are unavailable (no lang-seg, '
                    'no AUTOLABEL_CLIP_WEIGHTS/BPE). Pass --allow-fallback '
                    'for the hash stand-in (testing only).')
            return self._hash_text.encode_text(prompts)
        torch = self._torch
        with torch.inference_mode():
            tokens = self._clip.tokenize(list(prompts))
            features = torch.cat([
                self._text_encoder.encode_text(t[None]) for t in tokens
            ])
            features = features / features.norm(dim=-1, keepdim=True)
            return features.cpu().numpy()

    def __call__(self, x):
        """x: (B, 3, H, W) float in [0, 1] -> (B, H/2, W/2, 512)."""
        if self._evaluator is None:
            if self._jax_image is not None:
                return self._jax_image(x)
            if self._fallback is None:
                raise RuntimeError(
                    'LSeg pixel-feature extraction is unavailable '
                    '(lang-seg not installed and no '
                    'AUTOLABEL_LSEG_WEIGHTS). Pass --allow-fallback to '
                    'use deterministic stand-in features (testing only — '
                    'NOT real LSeg features).')
            return self._fallback(x)
        torch = self._torch
        import torch.nn.functional as F
        with torch.inference_mode():
            t = torch.as_tensor(x)
            _, _, H, W = t.shape
            out = [
                self._evaluator.compute_features(
                    F.interpolate(img[None], [H // 2, W // 2]))
                for img in t
            ]
            return torch.cat(out).permute(0, 2, 3, 1).cpu().numpy()
