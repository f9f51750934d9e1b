"""Small bias-free MLPs for the field heads.

The reference runs these as tiny-cuda-nn FullyFusedMLP / CutlassMLP
(autolabel/models.py:84-136) — bias-free ReLU networks 64/128 wide. On TPU
the right shape is a chain of (N, W) x (W, W) matmuls in bf16 on the MXU;
XLA fuses the ReLUs in. Params are fp32, compute dtype is configurable.
"""
import os

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


def _default_compute_dtype():
    """bf16 on TPU (MXU-native), fp32 elsewhere: XLA:CPU's bf16 dot
    support is incidental — thunk selection varies with fusion context
    and some shapes abort at dispatch ("Unsupported element type for
    DotThunk") — and the CPU backend only runs tests anyway.
    AUTOLABEL_COMPUTE_DTYPE overrides (read at trace time) — used by
    benchmarks/heads_parity.py to build an fp32 on-chip ground truth."""
    override = os.environ.get('AUTOLABEL_COMPUTE_DTYPE')
    if override:
        return jnp.dtype(override).type
    return jnp.bfloat16 if jax.default_backend() == 'tpu' else jnp.float32


def mlp_apply(weights, x, compute_dtype=None):
    """ReLU MLP forward; matmuls in compute_dtype with fp32 accumulation.

    x may be a list/tuple of feature segments instead of one
    pre-concatenated array: the first layer is then computed as a sum of
    partial matmuls over row slices of weights[0] (identical math —
    concat([a, b]) @ W == a @ W[:da] + b @ W[da:]). On TPU this skips
    materializing the concatenated activation, whose trailing dim
    usually lands off the 128-lane tile grid (e.g. the sigma net's
    12 + 512 = 524-wide input pads to 640 lanes — a pure-padding memory
    pass in both the forward and the cotangent slice of the backward).
    """
    if compute_dtype is None:
        compute_dtype = _default_compute_dtype()
    if isinstance(x, (list, tuple)):
        w0 = weights[0]
        h = None
        offset = 0
        for segment in x:
            width = segment.shape[-1]
            # Segments narrower than a lane tile are padding-dominated:
            # bf16 buys nothing there and XLA:CPU's bf16 dot thunk
            # rejects tiny contraction dims — keep them fp32.
            seg_dtype = compute_dtype if width >= 32 else jnp.float32
            part = jnp.dot(segment.astype(seg_dtype),
                           w0[offset:offset + width].astype(seg_dtype),
                           preferred_element_type=jnp.float32)
            h = part if h is None else h + part
            offset += width
        if offset != w0.shape[0]:
            raise ValueError(
                f"segments cover {offset} of {w0.shape[0]} input dims")
        if len(weights) == 1:
            return h
        h = jnp.maximum(h, 0.0).astype(compute_dtype)
        weights = weights[1:]
    else:
        h = x.astype(compute_dtype)
    for i, w in enumerate(weights):
        h = jnp.dot(h, w.astype(compute_dtype),
                    preferred_element_type=jnp.float32)
        if i + 1 < len(weights):
            h = jnp.maximum(h, 0.0).astype(compute_dtype)
    return h
