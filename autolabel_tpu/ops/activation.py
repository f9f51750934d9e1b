"""Truncated exponential: exp with a clamped input and gradient.

The density head exponentiates raw MLP output; early in training that
output can spike and exp explodes. The reference uses a custom CUDA
autograd op (torch_ngp.activation.trunc_exp, used at
autolabel/models.py:158,182) whose fp16 autocast bounds the forward at
~6.5e4 (overflow -> inf -> AMP GradScaler skips the step). In fp32 on
TPU there is no such implicit bound, so the forward clamps its input at
15 (sigma <= 3.3e6 — far past where compositing saturates: alpha hits
1.0 around sigma*delta ~ 20) and the VJP clamps likewise. XLA fuses it
into the surrounding kernel.
"""
import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x):
    return jnp.exp(jnp.minimum(x, 15.0))


def _trunc_exp_fwd(x):
    return jnp.exp(jnp.minimum(x, 15.0)), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)
