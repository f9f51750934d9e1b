"""Isolate the head-stack (MLP) backward cost on hardware.

step_breakdown.py shows the MLP stack's forward nearly free (~0.7 ms
fused into the step) while grad-vs-encode arithmetic leaves ~10 ms in
the backward. This lab feeds a PRECOMPUTED encode output (no hash grid
at all) through the sigma/color/semantic stack and times grad w.r.t.
the weights under variants, to find where the backward milliseconds
live:

  stack      full sigma+color+semantic stack, split-segment inputs
  stack_cat  same but pre-concatenated (N, 524) input
  sigma      sigma net only
  nogeo      stack but color/semantic consume a CONSTANT geo (breaks the
             fan-out of geo cotangents from three heads)
  wide_geo   stack with geo padded to 128 features (lane-aligned
             cotangents; measures the narrow-tensor padding tax)

Usage: python benchmarks/mlp_lab.py [--batch 131072]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type=int, default=131072)
    flags = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from autolabel_tpu.ops.activation import trunc_exp
    from autolabel_tpu.ops.encoders import sh_encode
    from autolabel_tpu.ops.mlp import mlp_apply, mlp_init

    n = flags.batch
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    freq = jax.random.normal(ks[0], (n, 12), jnp.float32)
    grid = jax.random.normal(ks[1], (n, 512), jnp.float32) * 0.01
    d = jax.random.normal(ks[2], (n, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    def make_params(geo_dim):
        return {
            'sigma_net': mlp_init(ks[3], 524, 128, 1 + geo_dim, 2),
            'color_net': mlp_init(ks[4], 16 + geo_dim, 128, 3, 2),
            'semantic_features': mlp_init(ks[5], geo_dim, 64, 64, 2),
            'semantic_out': mlp_init(ks[6], 64 + geo_dim, 64, 6, 1),
        }

    params15 = make_params(15)
    params128 = make_params(128)

    def stack_d(p, geo_dim, sigma_in, d):
        h = mlp_apply(p['sigma_net'], sigma_in)
        sigma = trunc_exp(h[..., 0])
        geo = h[..., 1:]
        rgb = jax.nn.sigmoid(mlp_apply(p['color_net'], [sh_encode(d), geo]))
        feats = mlp_apply(p['semantic_features'], geo)
        logits = mlp_apply(p['semantic_out'],
                           [jnp.maximum(feats, 0.0), geo])
        return (sigma.sum() + rgb.sum() + logits.sum()).astype(jnp.float32)

    @jax.jit
    def g_stack(p, freq, grid, d):
        return jax.grad(lambda q: stack_d(q, 15, [freq, grid], d))(p)

    cat = jnp.concatenate([freq, grid], axis=-1)

    @jax.jit
    def g_stack_cat(p, cat, d):
        return jax.grad(lambda q: stack_d(q, 15, cat, d))(p)

    @jax.jit
    def g_sigma(p, freq, grid):
        def f(q):
            h = mlp_apply(q['sigma_net'], [freq, grid])
            return (trunc_exp(h[..., 0]).sum() + h[..., 1:].sum()).astype(
                jnp.float32)
        return jax.grad(f)(p)

    geo_const = jax.random.normal(ks[7], (n, 15), jnp.float32)

    @jax.jit
    def g_nogeo(p, freq, grid, d, geo):
        def f(q):
            h = mlp_apply(q['sigma_net'], [freq, grid])
            sigma = trunc_exp(h[..., 0])
            rgb = jax.nn.sigmoid(
                mlp_apply(q['color_net'], [sh_encode(d), geo]))
            feats = mlp_apply(q['semantic_features'], geo)
            logits = mlp_apply(q['semantic_out'],
                               [jnp.maximum(feats, 0.0), geo])
            return (sigma.sum() + rgb.sum() + logits.sum()).astype(
                jnp.float32)
        return jax.grad(f)(p)

    @jax.jit
    def g_wide_geo(p, freq, grid, d):
        return jax.grad(lambda q: stack_d(q, 128, [freq, grid], d))(p)

    def timed(fn, *args, warmup=5, iters=30):
        out = None
        for _ in range(warmup):
            out = fn(*args)
        _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])  # fence
        start = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        return (time.perf_counter() - start) / iters * 1000

    results = {
        'stack_ms': round(timed(g_stack, params15, freq, grid, d), 2),
        'stack_cat_ms': round(timed(g_stack_cat, params15, cat, d), 2),
        'sigma_ms': round(timed(g_sigma, params15, freq, grid), 2),
        'nogeo_ms': round(timed(g_nogeo, params15, freq, grid, d,
                                geo_const), 2),
        'wide_geo_ms': round(timed(g_wide_geo, params128, freq, grid, d),
                             2),
        'batch': n,
    }
    print(json.dumps(results))


if __name__ == '__main__':
    main()
