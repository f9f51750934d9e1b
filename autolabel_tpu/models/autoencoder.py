"""Feature-compression autoencoder.

Compresses high-dimensional teacher features (e.g. LSeg 512-d) to the
feature-head width before distillation. Parity: autolabel/models.py:268-294
(two CutlassMLP-128 nets, relu bottleneck, dropout 0.1 on the code).
"""
import jax
import jax.numpy as jnp

from autolabel_tpu.ops.mlp import mlp_apply, mlp_init


class Autoencoder:

    def __init__(self, in_features, bottleneck):
        self.in_features = in_features
        self.bottleneck = bottleneck

    def init(self, key):
        k_enc, k_dec = jax.random.split(key)
        return {
            'encoder': mlp_init(k_enc, self.in_features, 128,
                                self.bottleneck, 1),
            'decoder': mlp_init(k_dec, self.bottleneck, 128,
                                self.in_features, 1),
        }

    def encode(self, params, x):
        # Output activation is ReLU (models.py:277).
        return jnp.maximum(mlp_apply(params['encoder'], x), 0.0)

    def decode(self, params, code):
        return mlp_apply(params['decoder'], code)

    def apply(self, params, x, key=None, p=0.1):
        """Returns (reconstruction, code); dropout on the code if key given."""
        code = self.encode(params, x)
        dropped = code
        if key is not None:
            keep = jax.random.bernoulli(key, 1.0 - p, code.shape)
            dropped = jnp.where(keep, code / (1.0 - p), 0.0)
        return self.decode(params, dropped), code
