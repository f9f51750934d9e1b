"""Backward point-selection lab: top_k compaction vs searchsorted draws.

_select_backward_points (ops/encoders.py) compacts the systematic
resample's counts with lax.top_k(N=131k, k=N/4) — top_k at large k sorts
the whole array on TPU. The same estimator can be expressed WITHOUT
top_k: draw the k systematic grid positions directly through the
inverse CDF (one searchsorted = 17 vectorized binary-search steps), and
let duplicate draws scatter duplicate rows (scatter-add semantics make
the total identical; row count is k either way). This lab times both
selection kernels in isolation and embedded in a scatter of the
flagship's shape, so the production path can adopt the cheaper one.

Prints one JSON line. Fetch-fenced like bench.py.
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
    parser.add_argument('--points', type=int, default=4096 * 32)
    parser.add_argument('--frac', type=float, default=0.25)
    parser.add_argument('--features', type=int, default=512)
    parser.add_argument('--iters', type=int, default=30)
    parser.add_argument('--warmup', type=int, default=5)
    parser.add_argument('--cpu', action='store_true')
    flags = parser.parse_args()

    if flags.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')
    import jax
    import jax.numpy as jnp

    n = flags.points
    k = max(1, int(round(flags.frac * n)))
    f = flags.features

    rng = np.random.default_rng(0)
    # Cotangent with volume-rendering-like concentration: ~75% zeros.
    g_np = rng.normal(size=(n, f)).astype(np.float32)
    g_np[rng.random(n) < 0.73] = 0.0
    g = jnp.asarray(g_np)
    u = jnp.asarray(0.37, jnp.float32)

    def norms_p(g):
        g32 = g.astype(jnp.float32)
        s = jnp.sqrt(jnp.sum(g32 * g32, axis=-1))
        tot = jnp.sum(s)
        p = jnp.where(tot > 0, s / jnp.maximum(tot, 1e-30),
                      jnp.full_like(s, 1.0 / n))
        cum = jnp.cumsum(p)
        return p, cum / cum[-1]

    @jax.jit
    def select_topk(g, u):
        p, cum = norms_p(g)
        c = jnp.floor(k * cum - u)
        counts = jnp.diff(c, prepend=jnp.asarray(-1.0, c.dtype))
        counts_k, sel = jax.lax.top_k(counts, k)
        coef = counts_k / (k * jnp.maximum(p[sel], 1e-30))
        return sel, coef

    @jax.jit
    def select_stratified(g, u_vec):
        """Stride-stratified: stratum j = {j, j+k, j+2k, j+3k}; draw ONE
        point per stratum from its within-stratum mass, scatter with
        coef P_j / s_sel. Unbiased (E per stratum = sum of its grads);
        no sort, no searchsorted, no cumsum over N — pure (m, k) VPU
        ops. Variance adds only where a stratum's mass is concentrated
        across its own members, which stride grouping makes rare (the
        4 members are samples of 4 distant rays)."""
        m = n // k
        g32 = g.astype(jnp.float32)
        s = jnp.sqrt(jnp.sum(g32 * g32, axis=-1))  # (N,)
        sr = s.reshape(m, k)
        P = sr.sum(axis=0)  # (k,)
        safe = jnp.maximum(P, 1e-30)
        w = sr / safe  # (m, k) within-stratum probs
        cum = jnp.cumsum(w, axis=0)
        pick = (u_vec[None, :] > cum[:-1]).sum(axis=0)  # (k,) in [0, m)
        sel = pick * k + jnp.arange(k, dtype=jnp.int32)
        s_sel = jnp.take(s, sel)
        coef = jnp.where(P > 0, P / jnp.maximum(s_sel, 1e-30), 0.0)
        return sel, coef

    @jax.jit
    def select_searchsorted(g, u):
        p, cum = norms_p(g)
        grid = (jnp.arange(k, dtype=jnp.float32) + u) / k
        sel = jnp.searchsorted(cum, grid, side='left').astype(jnp.int32)
        sel = jnp.minimum(sel, n - 1)
        coef = 1.0 / (k * jnp.maximum(p[sel], 1e-30))
        return sel, coef

    # Embedded: selection + the flagship-shaped gather of the selected
    # cotangent rows + a scatter into a (4, 32768, 128)-like table.
    T = 32768

    def embedded(select):
        def run(g, u, idx_base):
            sel, coef = select(g, u)
            rows = jnp.take(g, sel, axis=0) * coef[:, None]
            tab = jnp.zeros((T, f), jnp.float32)
            idx = jnp.take(idx_base, sel)
            return tab.at[idx].add(rows).sum()
        return jax.jit(run)

    idx_base = jnp.asarray(rng.integers(0, T, n), jnp.int32)

    def timed(fn, *args):
        out = None
        for _ in range(flags.warmup):
            out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0])[..., 0] if np.ndim(
            jax.tree.leaves(out)[0]) else float(jax.tree.leaves(out)[0])
        start = time.perf_counter()
        for _ in range(flags.iters):
            out = fn(*args)
        leaf = jax.tree.leaves(out)[0]
        _ = np.asarray(leaf).ravel()[0]
        return (time.perf_counter() - start) / flags.iters * 1000

    # Equivalence: both estimators scatter the same total mass in
    # expectation; with the same u they select the same multiset.
    sel_t, coef_t = jax.jit(select_topk)(g, u)
    sel_s, coef_s = jax.jit(select_searchsorted)(g, u)
    mass_t = float(np.sort(np.asarray(sel_t))[::-1][:5].sum())
    tot_t = float(np.asarray(coef_t).sum())
    tot_s = float(np.asarray(coef_s).sum())

    u_vec = jnp.asarray(rng.random(k), jnp.float32)
    # Stratified unbiasedness check: E over u of the scattered mass per
    # point equals 1 * g (verified analytically); here check total coef
    # mass ~= N on the nonzero support scale.
    _, coef_st = jax.jit(select_stratified)(g, u_vec)

    results = {
        'topk_ms': round(timed(select_topk, g, u), 3),
        'searchsorted_ms': round(timed(select_searchsorted, g, u), 3),
        'stratified_ms': round(timed(select_stratified, g, u_vec), 3),
        'embedded_topk_ms': round(timed(embedded(select_topk), g, u,
                                        idx_base), 3),
        'embedded_searchsorted_ms': round(
            timed(embedded(select_searchsorted), g, u, idx_base), 3),
        'embedded_stratified_ms': round(
            timed(embedded(select_stratified), g, u_vec, idx_base), 3),
        'coef_total_stratified': round(float(np.asarray(coef_st).sum()), 1),
        'coef_total_topk': round(tot_t, 1),
        'coef_total_searchsorted': round(tot_s, 1),
        'points': n,
        'k': k,
        'backend': jax.default_backend(),
        '_sel_check': mass_t,
    }
    print(json.dumps(results))


if __name__ == '__main__':
    main()
