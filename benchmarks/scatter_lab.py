"""Measure hash-grid BACKWARD-scatter strategies on hardware.

Round-2 step breakdown localized the flagship's cost center in the
backward: scatter-adds of (points, levels, corners) cotangents into the
hash table (~74 of 93.9 ms exact, ~19.6 of 32 ms stochastic k=2 —
benchmarks/step_breakdown.py). This lab times candidate formulations of
d_table so the round-3 custom VJP is built on measured numbers, not
guesses:

  - autodiff baseline (XLA's scatter-add from jnp.take's transpose)
  - manual per-corner scatters, chained vs independent-buffers
  - one fused flat scatter over all (level, corner) rows
  - sorted indices + scatter(indices_are_sorted) / segment_sum
  - bf16 update payloads
  - one-hot MXU matmul for the dense coarse level
  - raw scatter/gather primitives vs index distribution (conflict probe)

Workload shape = flagship: 4096 rays x 32 main samples = 131072 points,
TPU_GRID (L=4, T=2^15, F=128), realistic ray-correlated sample positions.

Usage: python benchmarks/scatter_lab.py [--iters 20]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WARMUP = 3


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--iters', type=int, default=20)
    parser.add_argument('--rays', type=int, default=4096)
    parser.add_argument('--samples', type=int, default=32)
    flags = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from autolabel_tpu.ops import encoders
    from autolabel_tpu.ops.encoders import TPU_GRID, hashgrid_encode

    cfg = TPU_GRID
    L, T, F = cfg.n_levels, cfg.table_size, cfg.n_features
    n = flags.rays * flags.samples

    rng = np.random.default_rng(0)
    # Ray-correlated positions: consecutive samples share cells at coarse
    # levels, which is exactly the conflict/locality structure the real
    # step scatters with.
    o = rng.uniform(0.2, 0.8, (flags.rays, 1, 3))
    d = rng.normal(size=(flags.rays, 1, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t = np.linspace(0.0, 0.6, flags.samples)[None, :, None]
    pts = np.clip(o + t * d, 0.0, 1.0).reshape(-1, 3).astype(np.float32)

    x = jnp.asarray(pts)
    table = jnp.asarray(
        rng.uniform(-1e-4, 1e-4, (L, T, F)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(n, L * F)).astype(np.float32))
    key = jax.random.PRNGKey(1)

    results = {'n_points': n, 'L': L, 'T': T, 'F': F}

    def timed(label, fn, *args):
        out = None
        for _ in range(WARMUP):
            out = fn(*args)
        _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])  # fence
        start = time.perf_counter()
        for _ in range(flags.iters):
            out = fn(*args)
        _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        ms = (time.perf_counter() - start) / flags.iters * 1000
        results[label] = round(ms, 2)
        print(f'{label}: {ms:.2f} ms', flush=True)
        return ms

    # ---- geometry shared by the manual variants -------------------------
    cell, frac, stride, use_dense = encoders._grid_geometry(x, cfg)
    corner_idx = []   # (L, 8, N) int32
    corner_w = []     # (L, 8, N) fp32
    for l in range(L):
        idx_l, w_l = [], []
        for corner in encoders._CORNERS:
            idx_l.append(encoders._corner_index(
                cell[:, l], corner, stride[l], use_dense[l], T))
            w_l.append(encoders._corner_weight(frac[:, l], corner))
        corner_idx.append(jnp.stack(idx_l))
        corner_w.append(jnp.stack(w_l))
    corner_idx = jax.device_put(jnp.stack(corner_idx))   # (L, 8, N)
    corner_w = jax.device_put(jnp.stack(corner_w))       # (L, 8, N)
    cot_l = cot.reshape(n, L, F).transpose(1, 0, 2)       # (L, N, F)
    cot_l = jax.device_put(cot_l)

    # ---- 1. autodiff baselines ------------------------------------------
    def enc_loss(tbl, xx, ct, k):
        out = hashgrid_encode(tbl, xx, cfg, key=k,
                              n_samples=(2 if k is not None else 1))
        return jnp.vdot(out, ct)

    @jax.jit
    def vjp_exact(tbl, xx, ct):
        g = jax.grad(lambda tb: enc_loss(tb, xx, ct, None))(tbl)
        return jnp.sum(jnp.abs(g))

    @jax.jit
    def vjp_stoch2(tbl, xx, ct, k):
        g = jax.grad(lambda tb: enc_loss(tb, xx, ct, k))(tbl)
        return jnp.sum(jnp.abs(g))

    timed('vjp_autodiff_exact', vjp_exact, table, x, cot)
    timed('vjp_autodiff_stoch2', vjp_stoch2, table, x, cot, key)

    # ---- 2. manual d_table variants (exact, all 8 corners) ---------------
    @jax.jit
    def manual_chained(ci, cw, ct):
        total = 0.0
        for l in range(L):
            acc = jnp.zeros((T, F), jnp.float32)
            for c in range(8):
                acc = acc.at[ci[l, c]].add(ct[l] * cw[l, c][:, None])
            total = total + jnp.sum(jnp.abs(acc))
        return total

    @jax.jit
    def manual_indep(ci, cw, ct):
        total = 0.0
        for l in range(L):
            parts = [
                jnp.zeros((T, F), jnp.float32).at[ci[l, c]].add(
                    ct[l] * cw[l, c][:, None]) for c in range(8)
            ]
            total = total + jnp.sum(jnp.abs(sum(parts)))
        return total

    @jax.jit
    def flat_per_level(ci, cw, ct):
        total = 0.0
        for l in range(L):
            idx = ci[l].reshape(-1)                       # (8N,)
            v = (ct[l][None] * cw[l][..., None]).reshape(-1, F)
            acc = jnp.zeros((T, F), jnp.float32).at[idx].add(v)
            total = total + jnp.sum(jnp.abs(acc))
        return total

    @jax.jit
    def flat_global(ci, cw, ct):
        offs = (jnp.arange(L, dtype=jnp.int32) * T)[:, None, None]
        idx = (ci + offs).reshape(-1)                     # (L*8*N,)
        v = (ct[:, None] * cw[..., None]).reshape(-1, F)
        acc = jnp.zeros((L * T, F), jnp.float32).at[idx].add(v)
        return jnp.sum(jnp.abs(acc))

    timed('manual_chained', manual_chained, corner_idx, corner_w, cot_l)
    timed('manual_indep', manual_indep, corner_idx, corner_w, cot_l)
    timed('flat_per_level', flat_per_level, corner_idx, corner_w, cot_l)
    timed('flat_global', flat_global, corner_idx, corner_w, cot_l)

    # ---- 3. sort-based ---------------------------------------------------
    @jax.jit
    def sorted_scatter_global(ci, cw, ct):
        offs = (jnp.arange(L, dtype=jnp.int32) * T)[:, None, None]
        idx = (ci + offs).reshape(-1)
        v = (ct[:, None] * cw[..., None]).reshape(-1, F)
        order = jnp.argsort(idx)
        idx_s = idx[order]
        v_s = jnp.take(v, order, axis=0)
        acc = jnp.zeros((L * T, F), jnp.float32).at[idx_s].add(
            v_s, indices_are_sorted=True)
        return jnp.sum(jnp.abs(acc))

    @jax.jit
    def segsum_sorted_global(ci, cw, ct):
        offs = (jnp.arange(L, dtype=jnp.int32) * T)[:, None, None]
        idx = (ci + offs).reshape(-1)
        v = (ct[:, None] * cw[..., None]).reshape(-1, F)
        order = jnp.argsort(idx)
        acc = jax.ops.segment_sum(jnp.take(v, order, axis=0), idx[order],
                                  num_segments=L * T,
                                  indices_are_sorted=True)
        return jnp.sum(jnp.abs(acc))

    timed('sorted_scatter_global', sorted_scatter_global, corner_idx,
          corner_w, cot_l)
    timed('segsum_sorted_global', segsum_sorted_global, corner_idx,
          corner_w, cot_l)

    # ---- 4. dtype of the update payload ----------------------------------
    @jax.jit
    def flat_global_bf16(ci, cw, ct):
        offs = (jnp.arange(L, dtype=jnp.int32) * T)[:, None, None]
        idx = (ci + offs).reshape(-1)
        v = (ct[:, None] * cw[..., None]).astype(jnp.bfloat16).reshape(-1, F)
        acc = jnp.zeros((L * T, F), jnp.bfloat16).at[idx].add(v)
        return jnp.sum(jnp.abs(acc.astype(jnp.float32)))

    timed('flat_global_bf16', flat_global_bf16, corner_idx, corner_w, cot_l)

    # ---- 5. one-hot MXU for the dense coarse level ------------------------
    # Level 0 (res 16) addresses only stride^3 = 4913 distinct rows; its
    # 8N scattered rows have ~200x write conflicts. Compute its gradient as
    # a (pad to 128-multiple) one-hot matmul instead.
    t_eff = int(np.asarray(stride)[0, 0]) ** 3
    t_pad = ((t_eff + 127) // 128) * 128

    @jax.jit
    def onehot_dense_l0(ci, cw, ct):
        # (8N, t_pad) one-hot in bf16, (8N, F) payload: d = onehot^T @ v.
        idx = ci[0].reshape(-1)
        v = (ct[0][None] * cw[0][..., None]).reshape(-1, F)
        oh = jax.nn.one_hot(idx, t_pad, dtype=jnp.bfloat16)
        d = jnp.dot(oh.T, v.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        return jnp.sum(jnp.abs(d))

    timed(f'onehot_dense_l0_T{t_eff}', onehot_dense_l0, corner_idx,
          corner_w, cot_l)

    # ---- 6. raw primitive probes ------------------------------------------
    m = 8 * n  # one level's exact row count
    v_raw = jnp.asarray(rng.normal(size=(m, F)).astype(np.float32))
    idx_uniform = jnp.asarray(rng.integers(0, T, m).astype(np.int32))
    idx_coarse = jnp.asarray(rng.integers(0, 4913, m).astype(np.int32))
    idx_unique = jnp.asarray(
        (rng.permutation(m) % T).astype(np.int32))
    idx_sorted = jnp.sort(idx_uniform)

    def scatter_fn(sorted_flag=False):
        @jax.jit
        def f(idx, v):
            acc = jnp.zeros((T, F), jnp.float32).at[idx].add(
                v, indices_are_sorted=sorted_flag)
            return jnp.sum(jnp.abs(acc))
        return f

    plain = scatter_fn()
    timed('raw_scatter_1M_uniform', plain, idx_uniform, v_raw)
    timed('raw_scatter_1M_coarse4913', plain, idx_coarse, v_raw)
    timed('raw_scatter_1M_unique', plain, idx_unique, v_raw)
    timed('raw_scatter_1M_sorted', scatter_fn(True), idx_sorted, v_raw)

    @jax.jit
    def raw_gather(tbl_l0, idx):
        return jnp.sum(jnp.abs(jnp.take(tbl_l0, idx, axis=0)))

    timed('raw_gather_1M_uniform', raw_gather, table[0], idx_uniform)

    @jax.jit
    def raw_sort_1m(idx):
        order = jnp.argsort(idx)
        return idx[order][0], order[0]

    timed('raw_argsort_1M', raw_sort_1m, idx_uniform)

    print(json.dumps(results))


if __name__ == '__main__':
    main()
