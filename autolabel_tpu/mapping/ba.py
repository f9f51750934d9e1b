"""Bundle adjustment as a batched JAX solve.

Classic BA builds a sparse Jacobian and Schur-eliminates the points
(COLMAP/ceres; the reference reaches it through pycolmap's mapper,
reference scripts/mapping.py:103-121). On TPU the natural formulation is
matrix-free: the reprojection residual of every observation is one row
of a single batched computation (rotate + project, vectorized over the
observation list), and Levenberg-Marquardt only ever needs Jacobian
products — `jax.jvp` gives J·v, `jax.vjp` gives Jᵀ·v — so the damped
normal equations (JᵀWJ + λI)δ = −JᵀWr are solved by conjugate gradients
without materializing J. Everything inside one LM iteration is one jit.

Robustness is IRLS-Huber: weights from the residuals at the top of each
LM iteration, held fixed through the CG solve.

Conventions match COLMAP: poses are world→camera (x_c = R x_w + t),
rotations as Rodrigues vectors. Camera 0 is the gauge anchor (its pose
update is masked out).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np


def rodrigues(rvec):
    """Rodrigues vector(s) (..., 3) -> rotation matrix (..., 3, 3).

    Written in the UNNORMALIZED form R = I + A·K + B·K² with
    K = skew(rvec), A = sinθ/θ, B = (1−cosθ)/θ², Taylor-switched near
    zero — this keeps the function differentiable AT θ = 0 (the
    axis-normalized form has a 0/0 in ∂θ/∂rvec there, which poisons
    pose-refinement gradients whose deltas start at exactly zero;
    train/pose_refine.py)."""
    kx, ky, kz = rvec[..., 0], rvec[..., 1], rvec[..., 2]
    zero = jnp.zeros_like(kx)
    K = jnp.stack([
        jnp.stack([zero, -kz, ky], axis=-1),
        jnp.stack([kz, zero, -kx], axis=-1),
        jnp.stack([-ky, kx, zero], axis=-1),
    ], axis=-2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rvec.dtype), K.shape)
    t2 = (rvec * rvec).sum(-1)[..., None, None]  # theta^2, smooth at 0
    th = jnp.sqrt(jnp.maximum(t2, 1e-12))  # safe: untaken-branch grads finite
    small = t2 < 1e-8
    A = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(th) / th)
    B = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(th)) / (th * th))
    return eye + A * K + B * (K @ K)


def _project(rvecs, tvecs, points, intr, cam_idx, pt_idx):
    """Reproject each observation; returns (N, 2) pixel coordinates."""
    R = rodrigues(rvecs)[cam_idx]            # (N, 3, 3)
    X = points[pt_idx]                       # (N, 3)
    Xc = jnp.einsum('nij,nj->ni', R, X) + tvecs[cam_idx]
    z = jnp.maximum(Xc[:, 2:3], 1e-6)
    uv = Xc[:, :2] / z
    fx, fy, cx, cy = intr
    return jnp.stack([uv[:, 0] * fx + cx, uv[:, 1] * fy + cy], axis=-1)


def _residual(params, const):
    rvecs, tvecs, points, dlog_f = params
    intr0, cam_idx, pt_idx, xy, sqrt_w = const
    f_scale = jnp.exp(dlog_f)
    intr = (intr0[0] * f_scale, intr0[1] * f_scale, intr0[2], intr0[3])
    pred = _project(rvecs, tvecs, points, intr, cam_idx, pt_idx)
    return (pred - xy) * sqrt_w[:, None]


def _mask_gauge(params, refine_focal):
    """Zero the gauge-anchor (camera 0) and, optionally, focal updates."""
    rvecs, tvecs, points, dlog_f = params
    mask = jnp.ones((rvecs.shape[0], 1)).at[0].set(0.0)
    return (rvecs * mask, tvecs * mask, points,
            dlog_f if refine_focal else jnp.zeros_like(dlog_f))


@functools.partial(jax.jit, static_argnums=(3, 4))
def _lm_step(params, const, lam, refine_focal, cg_iters):
    """One damped Gauss-Newton step: returns (candidate params, cost)."""
    r, pullback = jax.vjp(lambda p: _residual(p, const), params)
    cost = 0.5 * jnp.sum(r * r)
    g = _mask_gauge(pullback(r)[0], refine_focal)

    def normal_matvec(v):
        v = _mask_gauge(v, refine_focal)
        jv = jax.jvp(lambda p: _residual(p, const), (params,), (v,))[1]
        jtjv = _mask_gauge(pullback(jv)[0], refine_focal)
        return jax.tree.map(lambda a, b: a + lam * b, jtjv, v)

    neg_g = jax.tree.map(jnp.negative, g)
    delta, _ = jax.scipy.sparse.linalg.cg(normal_matvec, neg_g,
                                          maxiter=cg_iters)
    delta = _mask_gauge(delta, refine_focal)
    cand = jax.tree.map(lambda a, b: a + b, params, delta)
    return cand, cost


@functools.partial(jax.jit, static_argnums=(2,))
def _cost(params, const, _refine_focal):
    r = _residual(params, const)
    return 0.5 * jnp.sum(r * r)


@jax.jit
def _huber_sqrt_weights(params, const_unit, delta):
    """IRLS sqrt-weights: w = min(1, delta / |r|) per observation."""
    r = _residual(params, const_unit)
    norm = jnp.linalg.norm(r, axis=-1)
    return jnp.sqrt(jnp.minimum(1.0, delta / jnp.maximum(norm, 1e-9)))


def bundle_adjust(rvecs, tvecs, points, intrinsics, cam_idx, pt_idx, xy,
                  max_iters=25, huber_px=4.0, refine_focal=False,
                  cg_iters=50, verbose=False):
    """Levenberg-Marquardt bundle adjustment.

    rvecs/tvecs: (M, 3) world->camera Rodrigues + translation.
    points: (P, 3). intrinsics: (fx, fy, cx, cy) shared pinhole.
    cam_idx/pt_idx: (N,) int observation lists; xy: (N, 2) pixels.

    Returns (rvecs, tvecs, points, (fx, fy, cx, cy), rms_px) as numpy.
    """
    params = (jnp.asarray(rvecs, jnp.float32),
              jnp.asarray(tvecs, jnp.float32),
              jnp.asarray(points, jnp.float32),
              jnp.zeros((), jnp.float32))
    intr0 = tuple(float(v) for v in intrinsics)
    cam_idx = jnp.asarray(cam_idx, jnp.int32)
    pt_idx = jnp.asarray(pt_idx, jnp.int32)
    xy = jnp.asarray(xy, jnp.float32)
    ones = jnp.ones(xy.shape[0], jnp.float32)

    lam = 1e-2
    for it in range(max_iters):
        sqrt_w = _huber_sqrt_weights(params,
                                     (intr0, cam_idx, pt_idx, xy, ones),
                                     huber_px)
        const = (intr0, cam_idx, pt_idx, xy, sqrt_w)
        cand, cost = _lm_step(params, const, lam, refine_focal, cg_iters)
        new_cost = _cost(cand, const, refine_focal)
        if bool(new_cost < cost):
            params, lam = cand, max(lam * 0.3, 1e-7)
        else:
            lam = min(lam * 10.0, 1e5)
        if verbose:
            print(f'BA iter {it}: cost {float(cost):.1f} -> '
                  f'{float(new_cost):.1f} lam {lam:.1e}')
        if lam >= 1e5:
            break

    rvecs, tvecs, points, dlog_f = params
    f_scale = float(jnp.exp(dlog_f))
    intr = (intr0[0] * f_scale, intr0[1] * f_scale, intr0[2], intr0[3])
    r = _residual(params, (intr0, cam_idx, pt_idx, xy, ones))
    rms = float(jnp.sqrt(jnp.mean(jnp.sum(r * r, axis=-1))))
    return (np.asarray(rvecs), np.asarray(tvecs), np.asarray(points),
            intr, rms)
