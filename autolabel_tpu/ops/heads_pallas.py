"""Fused Pallas kernel for the field's head stack (sigma + color +
semantic nets in one VMEM pass).

Why: the reference fuses its heads with tiny-cuda-nn FullyFusedMLP /
CutlassMLP (autolabel/models.py:84-136) — the whole MLP lives in
registers/smem per thread block. The XLA path here (ops/mlp.mlp_apply)
is MXU matmuls, but XLA cannot fuse ACROSS dot boundaries: every layer
round-trips its (N, 128) activations through HBM, and the backward
re-reads them all, so the measured head-stack cost (~4 ms per 131k
points on v5e, benchmarks/mlp_lab.py) is ~8x its flop time. This kernel
is the TPU equivalent of FullyFusedMLP: all head weights are zero-padded
to 128-lane tiles and stay VMEM-resident; each grid step streams one
tile of points through sigma -> (trunc_exp, geo) -> color / semantic
heads without touching HBM in between; the custom-VJP backward
RECOMPUTES the activations in VMEM (cheap — they never hit HBM) and
accumulates the weight gradients across grid steps in a revisited
output block.

Semantics match models/field.py density+color+semantic (bf16 matmuls,
fp32 accumulation, trunc_exp clamp at 15, sigmoid rgb, relu(features)
into the logits head) up to one deliberate precision difference on
TPU: mlp_apply keeps segments narrower than 32 lanes (freq, SH, geo)
in fp32, while this kernel computes every matmul in bf16 — a ~0.4%
relative rounding on those inputs. Checkpoints remain interchangeable
(same parameters); benchmarks/heads_parity.py bounds the compiled
divergence on hardware, and the interpret-mode tests
(tests/test_heads_pallas.py) prove the math exactly at fp32.

Layout invariant: every padded weight matrix is zero in all unused rows
AND columns, so the padding lanes of every activation block are exactly
0.0 throughout the stack (relu(0) = 0) and never leak into real lanes.

Input packing (built by the field wrapper):
  A (N, Dg)  hash-grid encode output (the big segment)
  B (N, 128) extras: cols [0:freq) = frequency encode of the raw
             position, cols [16:32) = SH-deg-4 view-direction encode,
             rest zero.
Outputs:
  OUT1 (N, 128): col 0 = sigma (trunc_exp applied), cols 1..3 = rgb.
  OUTF (N, Sp):  semantic feature head output (first S cols real).
  OUTL (N, Cp):  class logits (first C cols real).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024
_SH_OFFSET = 16  # SH block starts at col 16 of B (freq occupies < 16)


def _round128(d):
    return ((d + 127) // 128) * 128


def _pad_to(mat, rows, cols, row0=0, col0=0):
    out = jnp.zeros((rows, cols), mat.dtype)
    return out.at[row0:row0 + mat.shape[0],
                  col0:col0 + mat.shape[1]].set(mat)


def supported(params, freq_dim):
    """The fused kernel covers the reference head topology (2 hidden
    sigma/color layers, 2 semantic-feature layers, 1 logits layer);
    anything else falls back to the XLA path."""
    try:
        return (len(params['sigma_net']) == 3
                and len(params['color_net']) == 3
                and len(params['semantic_features']) == 3
                and len(params['semantic_out']) == 2
                and freq_dim <= _SH_OFFSET
                and params['sigma_net'][2].shape[1] <= 128
                and params['color_net'][0].shape[0] == 16 +
                params['sigma_net'][2].shape[1] - 1)
    except (KeyError, IndexError, TypeError):
        return False


def pack_head_weights(params, freq_dim):
    """Params pytree -> tuple of 12 zero-padded matrices (differentiable
    jnp ops — autodiff maps padded grads back to the raw weights)."""
    Ws0, Ws1, Ws2 = params['sigma_net']
    Wc0, Wc1, Wc2 = params['color_net']
    Wf0, Wf1, Wf2 = params['semantic_features']
    Wo0, Wo1 = params['semantic_out']
    G = Ws2.shape[1] - 1          # geo feature dim
    S = Wf2.shape[1]              # semantic feature dim
    H = _round128(Ws1.shape[0])
    Hc = _round128(Wc1.shape[0])
    Hf = _round128(Wf1.shape[0])
    Ho = _round128(Wo0.shape[1])
    Sp = _round128(S)
    Cp = _round128(Wo1.shape[1])
    Dg = Ws0.shape[0] - freq_dim  # grid segment width
    Ap = _round128(Dg)
    packed = (
        _pad_to(Ws0[freq_dim:], Ap, H),                     # WA
        _pad_to(Ws0[:freq_dim], 128, H),                    # WBs
        _pad_to(Ws1, H, H),                                 # W1s
        _pad_to(Ws2, H, 128),                               # W2s
        _pad_to(Wc0[:16], 128, Hc, row0=_SH_OFFSET),        # WBc (SH rows)
        _pad_to(Wc0[16:], 128, Hc, row0=1),                 # WSc (geo rows)
        _pad_to(Wc1, Hc, Hc),                               # W1c
        _pad_to(Wc2, Hc, 128),                              # W2c
        _pad_to(Wf0, 128, Hf, row0=1),                      # WSf
        _pad_to(Wf1, Hf, Hf),                               # W1f
        _pad_to(Wf2, Hf, Sp),                               # W2f
        _pad_to(Wo0[:S], Sp, Ho),                           # WFo
        _pad_to(Wo0[S:], 128, Ho, row0=1),                  # WSo
        _pad_to(Wo1, Ho, Cp),                               # W1o
    )
    return packed


def _compute_dtype():
    """bf16 on TPU (MXU-native), fp32 elsewhere — the same rule as
    ops/mlp._default_compute_dtype, so interpret-mode parity against the
    XLA path is exact on CPU."""
    return jnp.bfloat16 if jax.default_backend() == 'tpu' else jnp.float32


def _dot(a, b):
    dt = _compute_dtype()
    return jnp.dot(a.astype(dt), b.astype(dt),
                   preferred_element_type=jnp.float32)


def _dot_nt(a, b):
    """a @ b.T without materializing the transpose (Mosaic lowers the
    dot_general contraction directly; an explicit 128x128 transpose is
    an avoidable lowering risk + relayout)."""
    dt = _compute_dtype()
    return jax.lax.dot_general(a.astype(dt), b.astype(dt),
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_tn(a, b):
    """a.T @ b via dot_general (used for the per-tile dW partials)."""
    dt = _compute_dtype()
    return jax.lax.dot_general(a.astype(dt), b.astype(dt),
                               (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _cols(vals, width):
    """(T, width) fp32 block with vals[j] (each (T, 1)) in column j,
    zeros elsewhere — built from iota + select because Mosaic TC has no
    lowering for the scatter primitive that `.at[...].set` produces
    inside a kernel (interpret mode accepts it; hardware does not)."""
    t = vals[0].shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (t, width), 1)
    out = jnp.zeros((t, width), jnp.float32)
    for j, v in enumerate(vals):
        out = jnp.where(col == j, v.astype(jnp.float32), out)
    return out


def _forward_blocks(A, B, ws):
    """The stack on fp32 (T, .) blocks; returns every activation the
    backward needs. Shared verbatim by the fwd and bwd kernels (the
    backward recomputes instead of saving HBM residuals)."""
    (WA, WBs, W1s, W2s, WBc, WSc, W1c, W2c, WSf, W1f, W2f, WFo, WSo,
     W1o) = ws
    h1s = jnp.maximum(_dot(A, WA) + _dot(B, WBs), 0.0)
    h2s = jnp.maximum(_dot(h1s, W1s), 0.0)
    S = _dot(h2s, W2s)            # col 0 raw sigma, cols 1..G geo
    c1 = jnp.maximum(_dot(B, WBc) + _dot(S, WSc), 0.0)
    c2 = jnp.maximum(_dot(c1, W1c), 0.0)
    R = _dot(c2, W2c)             # cols 0..2 raw rgb
    f1 = jnp.maximum(_dot(S, WSf), 0.0)
    f2 = jnp.maximum(_dot(f1, W1f), 0.0)
    F = _dot(f2, W2f)             # features (linear output)
    o1 = jnp.maximum(_dot(jnp.maximum(F, 0.0), WFo) + _dot(S, WSo), 0.0)
    L = _dot(o1, W1o)
    return h1s, h2s, S, c1, c2, R, f1, f2, F, o1, L


def _fwd_kernel(A_ref, B_ref, *refs):
    ws = [r[:] for r in refs[:14]]
    out1_ref, outf_ref, outl_ref = refs[14:]
    A = A_ref[:].astype(jnp.float32)
    B = B_ref[:].astype(jnp.float32)
    _, _, S, _, _, R, _, _, F, _, L = _forward_blocks(A, B, ws)
    sigma = jnp.exp(jnp.minimum(S[:, :1], 15.0))
    rgb = jax.nn.sigmoid(R[:, :3])
    out1_ref[:] = _cols([sigma, rgb[:, :1], rgb[:, 1:2], rgb[:, 2:3]],
                        out1_ref.shape[1]).astype(out1_ref.dtype)
    outf_ref[:] = F
    outl_ref[:] = L


def _bwd_kernel(A_ref, B_ref, *refs):
    ws_refs = refs[:14]
    g1_ref, gf_ref, gl_ref = refs[14:17]
    dA_ref, dB_ref = refs[17:19]
    dw_refs = refs[19:]
    ws = [r[:] for r in ws_refs]
    (WA, WBs, W1s, W2s, WBc, WSc, W1c, W2c, WSf, W1f, W2f, WFo, WSo,
     W1o) = ws
    A = A_ref[:].astype(jnp.float32)
    B = B_ref[:].astype(jnp.float32)
    h1s, h2s, S, c1, c2, R, f1, f2, F, o1, L = _forward_blocks(A, B, ws)

    g1 = g1_ref[:]
    # trunc_exp VJP: g * exp(clip(x, -15, 15)) (ops/activation.py).
    dsig = g1[:, :1] * jnp.exp(jnp.clip(S[:, :1], -15.0, 15.0))
    rgb = jax.nn.sigmoid(R[:, :3])
    drgb = g1[:, 1:4] * rgb * (1.0 - rgb)
    dR = _cols([drgb[:, :1], drgb[:, 1:2], drgb[:, 2:3]], R.shape[1])

    # logits head
    do1 = _dot_nt(gl_ref[:], W1o) * (o1 > 0)
    dW1o = _dot_tn(o1, gl_ref[:])
    dWFo = _dot_tn(jnp.maximum(F, 0.0), do1)
    dWSo = _dot_tn(S, do1)
    # feature head (+ the relu(F) branch into the logits head)
    dF = gf_ref[:] + _dot_nt(do1, WFo) * (F > 0)
    df2 = _dot_nt(dF, W2f) * (f2 > 0)
    dW2f = _dot_tn(f2, dF)
    df1 = _dot_nt(df2, W1f) * (f1 > 0)
    dW1f = _dot_tn(f1, df2)
    dWSf = _dot_tn(S, df1)
    # color head
    dc2 = _dot_nt(dR, W2c) * (c2 > 0)
    dW2c = _dot_tn(c2, dR)
    dc1 = _dot_nt(dc2, W1c) * (c1 > 0)
    dW1c = _dot_tn(c1, dc2)
    dWBc = _dot_tn(B, dc1)
    dWSc = _dot_tn(S, dc1)
    # gather every path into dS, then the sigma trunk
    dS = (_dot_nt(dc1, WSc) + _dot_nt(df1, WSf) + _dot_nt(do1, WSo))
    dS = dS + _cols([dsig], dS.shape[1])
    dh2s = _dot_nt(dS, W2s) * (h2s > 0)
    dW2s = _dot_tn(h2s, dS)
    dh1s = _dot_nt(dh2s, W1s) * (h1s > 0)
    dW1s = _dot_tn(h1s, dh2s)
    dWA = _dot_tn(A, dh1s)
    dWBs = _dot_tn(B, dh1s)

    dA_ref[:] = _dot_nt(dh1s, WA)
    dB_ref[:] = (_dot_nt(dh1s, WBs) + _dot_nt(dc1, WBc))

    dws = (dWA, dWBs, dW1s, dW2s, dWBc, dWSc, dW1c, dW2c, dWSf, dW1f,
           dW2f, dWFo, dWSo, dW1o)
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        for ref, val in zip(dw_refs, dws):
            ref[:] = val

    @pl.when(step > 0)
    def _():
        for ref, val in zip(dw_refs, dws):
            ref[:] = ref[:] + val


def _interpret():
    return jax.default_backend() != 'tpu'


# The backward kernel's working set (recomputed activations + dW
# partials + the fp32 copies of the bf16 point blocks) peaks at ~18 MB
# per 1024-point tile at flagship widths — just over Mosaic's default
# 16 MB scoped-VMEM limit (v5e has 128 MB of VMEM). Raise the limit
# rather than shrinking TILE: smaller tiles multiply the dW-accumulate
# revisits of all 14 weight-gradient blocks.
_COMPILER_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=48 * 1024 * 1024)


def _weight_specs(packed):
    return [pl.BlockSpec(w.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
            for w in packed]


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_heads(packed, A, B):
    return _fused_heads_fwd_impl(packed, A, B)


def _fused_heads_fwd_impl(packed, A, B):
    n = A.shape[0]
    n_pad = ((n + TILE - 1) // TILE) * TILE
    Ap = packed[0].shape[0]
    Sp = packed[10].shape[1]
    Cp = packed[13].shape[1]
    dt = _compute_dtype()
    A_p = jnp.zeros((n_pad, Ap), dt).at[:n, :A.shape[1]].set(
        A.astype(dt))
    B_p = jnp.zeros((n_pad, 128), dt).at[:n].set(B.astype(dt))
    grid = (n_pad // TILE,)
    point_spec = lambda width: pl.BlockSpec((TILE, width), lambda i: (i, 0),
                                            memory_space=pltpu.VMEM)
    out1, outf, outl = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[point_spec(Ap), point_spec(128)] + _weight_specs(packed),
        out_specs=[point_spec(128), point_spec(Sp), point_spec(Cp)],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, Sp), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, Cp), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(A_p, B_p, *packed)
    return out1[:n], outf[:n], outl[:n]


def _fused_heads_vjp_fwd(packed, A, B):
    out = _fused_heads_fwd_impl(packed, A, B)
    return out, (packed, A, B)


def _fused_heads_vjp_bwd(res, g):
    packed, A, B = res
    g1, gf, gl = g
    n = A.shape[0]
    n_pad = ((n + TILE - 1) // TILE) * TILE
    Ap = packed[0].shape[0]
    Sp = packed[10].shape[1]
    Cp = packed[13].shape[1]
    dt = _compute_dtype()
    A_p = jnp.zeros((n_pad, Ap), dt).at[:n, :A.shape[1]].set(
        A.astype(dt))
    B_p = jnp.zeros((n_pad, 128), dt).at[:n].set(B.astype(dt))
    g1_p = jnp.zeros((n_pad, 128), jnp.float32).at[:n].set(
        g1.astype(jnp.float32))
    gf_p = jnp.zeros((n_pad, Sp), jnp.float32).at[:n].set(
        gf.astype(jnp.float32))
    gl_p = jnp.zeros((n_pad, Cp), jnp.float32).at[:n].set(
        gl.astype(jnp.float32))
    grid = (n_pad // TILE,)
    point_spec = lambda width: pl.BlockSpec((TILE, width), lambda i: (i, 0),
                                            memory_space=pltpu.VMEM)
    dw_specs = [pl.BlockSpec(w.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM) for w in packed]
    outs = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=([point_spec(Ap), point_spec(128)]
                  + _weight_specs(packed)
                  + [point_spec(128), point_spec(Sp), point_spec(Cp)]),
        out_specs=[point_spec(Ap), point_spec(128)] + dw_specs,
        out_shape=([jax.ShapeDtypeStruct((n_pad, Ap), jnp.float32),
                    jax.ShapeDtypeStruct((n_pad, 128), jnp.float32)]
                   + [jax.ShapeDtypeStruct(w.shape, jnp.float32)
                      for w in packed]),
        interpret=_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(A_p, B_p, *packed, g1_p, gf_p, gl_p)
    dA_p, dB_p = outs[0], outs[1]
    dws = tuple(d.astype(w.dtype) for d, w in zip(outs[2:], packed))
    dA = dA_p[:n, :A.shape[1]].astype(A.dtype)
    dB = dB_p[:n].astype(B.dtype)
    return dws, dA, dB


fused_heads.defvjp(_fused_heads_vjp_fwd, _fused_heads_vjp_bwd)


def heads_reference(params, freq_dim, A, B):
    """Pure-XLA reference of the fused op's exact contract (for parity
    tests): consumes the SAME packed A/B blocks and returns the same
    (out1, features, logits) blocks, via models/field.py math."""
    from autolabel_tpu.ops.activation import trunc_exp
    from autolabel_tpu.ops.mlp import mlp_apply
    freq = B[:, :freq_dim]
    sh = B[:, _SH_OFFSET:_SH_OFFSET + 16]
    h = mlp_apply(params['sigma_net'], [freq, A])
    sigma = trunc_exp(h[..., 0])
    geo = h[..., 1:]
    rgb = jax.nn.sigmoid(
        mlp_apply(params['color_net'], [sh, geo.astype(jnp.float32)]))
    sem_features = mlp_apply(params['semantic_features'],
                             geo.astype(jnp.float32))
    logits = mlp_apply(params['semantic_out'],
                       [jnp.maximum(sem_features, 0.0),
                        geo.astype(jnp.float32)])
    out1 = jnp.zeros((A.shape[0], 128), jnp.float32)
    out1 = out1.at[:, 0].set(sigma).at[:, 1:4].set(rgb)
    return out1, sem_features, logits


# ---------------------------------------------------------------- mlp3
# A generic fused 3-matrix ReLU MLP (in -> h -> h -> out) on padded
# (N, 128)-lane blocks — used for the proposal density net (36 -> 64 ->
# 64 -> 1, models/field.py proposal_sigma), whose XLA form materializes
# every activation in HBM just like the head stack.


def pack_mlp3(weights):
    """[W0, W1, W2] -> zero-padded 128-lane tiles (differentiable)."""
    W0, W1, W2 = weights
    Din = _round128(W0.shape[0])
    H = _round128(W1.shape[0])
    Dout = _round128(W2.shape[1])
    return (_pad_to(W0, Din, H), _pad_to(W1, H, H), _pad_to(W2, H, Dout))


def _mlp3_fwd_kernel(x_ref, w0_ref, w1_ref, w2_ref, out_ref):
    x = x_ref[:].astype(jnp.float32)
    h1 = jnp.maximum(_dot(x, w0_ref[:]), 0.0)
    h2 = jnp.maximum(_dot(h1, w1_ref[:]), 0.0)
    out_ref[:] = _dot(h2, w2_ref[:])


def _mlp3_bwd_kernel(x_ref, w0_ref, w1_ref, w2_ref, g_ref,
                     dx_ref, dw0_ref, dw1_ref, dw2_ref):
    x = x_ref[:].astype(jnp.float32)
    w0, w1, w2 = w0_ref[:], w1_ref[:], w2_ref[:]
    h1 = jnp.maximum(_dot(x, w0), 0.0)
    h2 = jnp.maximum(_dot(h1, w1), 0.0)
    g = g_ref[:]
    dh2 = _dot_nt(g, w2) * (h2 > 0)
    dh1 = _dot_nt(dh2, w1) * (h1 > 0)
    dx_ref[:] = _dot_nt(dh1, w0)
    dws = (_dot_tn(x, dh1), _dot_tn(h1, dh2), _dot_tn(h2, g))
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        for ref, val in zip((dw0_ref, dw1_ref, dw2_ref), dws):
            ref[:] = val

    @pl.when(step > 0)
    def _():
        for ref, val in zip((dw0_ref, dw1_ref, dw2_ref), dws):
            ref[:] = ref[:] + val


@jax.custom_vjp
def fused_mlp3(packed, X):
    return _mlp3_fwd_impl(packed, X)


def _mlp3_stage(packed, X):
    n = X.shape[0]
    n_pad = ((n + TILE - 1) // TILE) * TILE
    Din = packed[0].shape[0]
    dt = _compute_dtype()
    X_p = jnp.zeros((n_pad, Din), dt).at[:n, :X.shape[1]].set(X.astype(dt))
    return X_p, n, n_pad


def _mlp3_specs(packed, n_pad):
    point = lambda width: pl.BlockSpec((TILE, width), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)
    weight = [pl.BlockSpec(w.shape, lambda i: (0, 0),
                           memory_space=pltpu.VMEM) for w in packed]
    return point, weight, (n_pad // TILE,)


def _mlp3_fwd_impl(packed, X):
    X_p, n, n_pad = _mlp3_stage(packed, X)
    point, weight, grid = _mlp3_specs(packed, n_pad)
    Dout = packed[2].shape[1]
    out = pl.pallas_call(
        _mlp3_fwd_kernel,
        grid=grid,
        in_specs=[point(packed[0].shape[0])] + weight,
        out_specs=point(Dout),
        out_shape=jax.ShapeDtypeStruct((n_pad, Dout), jnp.float32),
        interpret=_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(X_p, *packed)
    return out[:n]


def _mlp3_vjp_fwd(packed, X):
    return _mlp3_fwd_impl(packed, X), (packed, X)


def _mlp3_vjp_bwd(res, g):
    packed, X = res
    X_p, n, n_pad = _mlp3_stage(packed, X)
    point, weight, grid = _mlp3_specs(packed, n_pad)
    Din = packed[0].shape[0]
    Dout = packed[2].shape[1]
    g_p = jnp.zeros((n_pad, Dout), jnp.float32).at[:n].set(
        g.astype(jnp.float32))
    outs = pl.pallas_call(
        _mlp3_bwd_kernel,
        grid=grid,
        in_specs=[point(Din)] + weight + [point(Dout)],
        out_specs=[point(Din)] + weight,
        out_shape=([jax.ShapeDtypeStruct((n_pad, Din), jnp.float32)]
                   + [jax.ShapeDtypeStruct(w.shape, jnp.float32)
                      for w in packed]),
        interpret=_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(X_p, *packed, g_p)
    dX = outs[0][:n, :X.shape[1]].astype(X.dtype)
    dws = tuple(d.astype(w.dtype) for d, w in zip(outs[1:], packed))
    return dws, dX


fused_mlp3.defvjp(_mlp3_vjp_fwd, _mlp3_vjp_bwd)
