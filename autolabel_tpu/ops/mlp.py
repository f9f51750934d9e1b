"""Small bias-free MLPs for the field heads.

The reference runs these as tiny-cuda-nn FullyFusedMLP / CutlassMLP
(autolabel/models.py:84-136) — bias-free ReLU networks 64/128 wide. On TPU
the right shape is a chain of (N, W) x (W, W) matmuls in bf16 on the MXU;
XLA fuses the ReLUs in. Params are fp32, compute dtype is configurable.
"""
import jax
import jax.numpy as jnp


def mlp_init(key, in_dim, hidden_dim, out_dim, n_hidden, dtype=jnp.float32):
    """He-uniform init of [in->h, h->h (*n_hidden-? ), h->out] weights.

    n_hidden counts hidden layers, matching tcnn's n_hidden_layers: the
    network has n_hidden + 1 weight matrices.
    """
    dims = [in_dim] + [hidden_dim] * n_hidden + [out_dim]
    keys = jax.random.split(key, len(dims) - 1)
    weights = []
    for k, d_in, d_out in zip(keys, dims[:-1], dims[1:]):
        bound = (6.0 / d_in) ** 0.5
        weights.append(jax.random.uniform(k, (d_in, d_out), dtype,
                                          -bound, bound))
    return weights


def mlp_apply(weights, x, compute_dtype=jnp.bfloat16):
    """ReLU MLP forward; matmuls in compute_dtype with fp32 accumulation."""
    h = x.astype(compute_dtype)
    for i, w in enumerate(weights):
        h = jnp.dot(h, w.astype(compute_dtype),
                    preferred_element_type=jnp.float32)
        if i + 1 < len(weights):
            h = jnp.maximum(h, 0.0).astype(compute_dtype)
    return h
