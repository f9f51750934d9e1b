"""Truncated exponential: exp with a clamped gradient.

The density head exponentiates raw MLP output; early in training that
output can spike and exp's gradient explodes. The reference uses a custom
CUDA autograd op (torch_ngp.activation.trunc_exp, used at
autolabel/models.py:158,182); on TPU it is one jnp.exp with a custom VJP —
XLA fuses it into the surrounding kernel.
"""
import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x):
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)
