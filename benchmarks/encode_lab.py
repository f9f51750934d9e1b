"""Forward hash-encode variant lab: where do 6.73 ms of gathers go?

Round-5 companion to scatter_lab.py. step_breakdown measured the exact
simplex encode forward (131k points x 4 levels x 4 corners over the
TPU_GRID table) at 6.73 ms — >2x the predicted floor. This lab times
candidate formulations of the SAME interpolation on hardware so the
production path can adopt the winner:

  exact_now        — _encode_rows_simplex as shipped (per-level 4x
                     take + fp32 multiply-accumulate chains)
  bf16_gather      — cast the table to bf16 once, gather bf16 rows,
                     accumulate bf16 (halves every gather/accumulate
                     byte; the consuming MLP casts to bf16 anyway)
  fused_take       — per level, ONE take of the (4N,) concatenated
                     corner indices -> (4, N, F), one weighted reduce
                     (fewer, larger kernels; same bytes)
  fused_take_bf16  — both together
  flat_take_bf16   — all 16 (level, corner) gathers as ONE take into
                     the (L*T, F) flattened bf16 table
  weights_only     — the VPU geometry/weights work with the gathers
                     stubbed out (the non-gather floor)

Every variant feeds its (N, 512) output through the sigma net's first
matmul so XLA sees the production consumer and cannot dead-code or
over-fuse the interpolation differently than the real step would.
Fetch-fenced like bench.py. Prints one JSON line.
"""
import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--points', type=int, default=4096 * 32)
    parser.add_argument('--iters', type=int, default=30)
    parser.add_argument('--warmup', type=int, default=5)
    parser.add_argument('--cpu', action='store_true')
    flags = parser.parse_args()

    if flags.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')
    import jax
    import jax.numpy as jnp

    from autolabel_tpu.ops.encoders import (TPU_GRID, _grid_geometry,
                                            _corner_index, _simplex_corners,
                                            _encode_rows_simplex,
                                            hashgrid_init)

    config = TPU_GRID
    L, T, F = config.n_levels, config.table_size, config.n_features
    n = flags.points

    key = jax.random.PRNGKey(0)
    table = hashgrid_init(key, config)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    w_mlp = jnp.asarray(rng.normal(size=(L * F, 128)) * 0.05, jnp.float32)

    def consume(out):
        # The production consumer: encode output -> sigma net layer 0
        # (bf16 matmul, fp32 accum), summed to a scalar for the fence.
        return jnp.dot(out.astype(jnp.bfloat16),
                       w_mlp.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32).sum()

    @jax.jit
    def exact_now(table, x):
        return consume(_encode_rows_simplex(table, x, config))

    def _level_indices_weights(x):
        cell, frac, stride, use_dense, size = _grid_geometry(x, config)
        idxs, weights = [], []
        for l in range(L):
            offsets, w = _simplex_corners(frac[:, l])  # (4,3,N), (4,N)
            lvl_idx = [
                _corner_index(cell[:, l],
                              (offsets[c, 0], offsets[c, 1], offsets[c, 2]),
                              stride[l], use_dense[l], size[l])
                for c in range(4)
            ]
            idxs.append(lvl_idx)
            weights.append(w)
        return idxs, weights

    @jax.jit
    def bf16_gather(table, x):
        tb = table.astype(jnp.bfloat16)
        idxs, weights = _level_indices_weights(x)
        outs = []
        for l in range(L):
            acc = None
            for c in range(4):
                rows = jnp.take(tb[l], idxs[l][c], axis=0)
                term = rows * weights[l][c].astype(jnp.bfloat16)[:, None]
                acc = term if acc is None else acc + term
            outs.append(acc)
        return consume(jnp.concatenate(outs, axis=-1))

    def _fused_take(table, x, dtype):
        tb = table.astype(dtype)
        idxs, weights = _level_indices_weights(x)
        outs = []
        for l in range(L):
            idx = jnp.concatenate(idxs[l])  # (4N,)
            rows = jnp.take(tb[l], idx, axis=0).reshape(4, n, F)
            w = weights[l].astype(dtype)[:, :, None]  # (4, N, 1)
            outs.append((rows * w).sum(axis=0))
        return consume(jnp.concatenate(outs, axis=-1))

    fused_take = jax.jit(functools.partial(_fused_take, dtype=jnp.float32))
    fused_take_bf16 = jax.jit(
        functools.partial(_fused_take, dtype=jnp.bfloat16))

    @jax.jit
    def flat_take_bf16(table, x):
        tb = table.astype(jnp.bfloat16).reshape(L * T, F)
        idxs, weights = _level_indices_weights(x)
        idx = jnp.concatenate(
            [idxs[l][c] + l * T for l in range(L) for c in range(4)])
        rows = jnp.take(tb, idx, axis=0).reshape(L, 4, n, F)
        w = jnp.stack(weights).astype(jnp.bfloat16)[:, :, :, None]
        out = (rows * w).sum(axis=1)  # (L, N, F)
        return consume(out.transpose(1, 0, 2).reshape(n, L * F))

    @jax.jit
    def bf16_segments(table, x):
        # bf16 gathers + NO concat: each level's (N, F) output feeds the
        # consuming matmul as a partial dot over the matching weight-row
        # slice (mlp_apply's segment path) — the (N, 512) concatenated
        # activation never materializes.
        tb = table.astype(jnp.bfloat16)
        idxs, weights = _level_indices_weights(x)
        w16 = w_mlp.astype(jnp.bfloat16)
        h = None
        for l in range(L):
            acc = None
            for c in range(4):
                rows = jnp.take(tb[l], idxs[l][c], axis=0)
                term = rows * weights[l][c].astype(jnp.bfloat16)[:, None]
                acc = term if acc is None else acc + term
            part = jnp.dot(acc, w16[l * F:(l + 1) * F],
                           preferred_element_type=jnp.float32)
            h = part if h is None else h + part
        return h.sum()

    @jax.jit
    def weights_only(table, x):
        idxs, weights = _level_indices_weights(x)
        # Touch the indices/weights so the geometry survives DCE, but
        # replace every gather with a broadcast row.
        outs = []
        for l in range(L):
            acc = None
            for c in range(4):
                rows = table[l, :1] + idxs[l][c].astype(
                    jnp.float32)[:, None] * 0.0
                term = rows * weights[l][c][:, None]
                acc = term if acc is None else acc + term
            outs.append(acc)
        return consume(jnp.concatenate(outs, axis=-1))

    def timed(fn):
        out = None
        for _ in range(flags.warmup):
            out = fn(table, x)
        _ = float(np.asarray(out))  # fence
        start = time.perf_counter()
        for _ in range(flags.iters):
            out = fn(table, x)
        _ = float(np.asarray(out))
        return (time.perf_counter() - start) / flags.iters * 1000

    ref = np.asarray(jax.jit(
        lambda t, x: _encode_rows_simplex(t, x, config))(table, x))

    def check(fn_raw):
        out = np.asarray(fn_raw(table, x))
        return float(np.max(np.abs(out - ref)) / (np.abs(ref).max() + 1e-9))

    # Numerics: variants must agree with the shipped exact interpolation
    # to bf16 resolution.
    errs = {
        'bf16_gather': check(jax.jit(lambda t, x: jnp.concatenate([
            sum(jnp.take(t.astype(jnp.bfloat16)[l],
                         _level_indices_weights(x)[0][l][c], axis=0)
                * _level_indices_weights(x)[1][l][c].astype(
                    jnp.bfloat16)[:, None] for c in range(4))
            for l in range(L)], axis=-1).astype(jnp.float32))),
    }

    results = {
        'exact_now_ms': round(timed(exact_now), 3),
        'bf16_gather_ms': round(timed(bf16_gather), 3),
        'fused_take_ms': round(timed(fused_take), 3),
        'fused_take_bf16_ms': round(timed(fused_take_bf16), 3),
        'flat_take_bf16_ms': round(timed(flat_take_bf16), 3),
        'bf16_segments_ms': round(timed(bf16_segments), 3),
        'weights_only_ms': round(timed(weights_only), 3),
        'bf16_rel_err': round(errs['bf16_gather'], 6),
        'points': n,
        'backend': jax.default_backend(),
    }
    print(json.dumps(results))


if __name__ == '__main__':
    main()
