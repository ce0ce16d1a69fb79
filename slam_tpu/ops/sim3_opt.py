"""Sim3 transform refinement: small LM over one similarity transform.

Rebuild of ``OptimizeSim3Transform`` (reference: optimize_transform.cpp:
63-155): one Sim3 vertex against fixed map-point pairs with forward
(EdgeSim3ProjectXYZ) and inverse (EdgeInverseSim3ProjectXYZ) projection
edges in the normalized camera, Huber kernel, 20 iterations.

The state is a 7-vector chart [omega, upsilon, sigma] applied as
R <- exp(omega) R, t <- t + upsilon, s <- s * exp(sigma); Jacobians come from
vmapped forward-mode autodiff and the 7x7 normal equations are solved
directly — the whole 20-iteration LM loop is one jitted device call.

Note: the reference weights edges by levelSigmaSq (not its inverse,
optimize_transform.cpp:122,137); replicated faithfully.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu.ops import lie


def _apply_chart(delta, R, t, s):
    dR = lie.so3_exp(delta[:3])
    return dR @ R, t + delta[3:6], s * jnp.exp(delta[6])


def _residuals(delta, R, t, s, pts1, pts2, obs1, obs2, w1, w2, valid):
    """Stacked whitened residuals of forward and inverse projection edges."""
    Rn, tn, sn = _apply_chart(delta, R, t, s)
    # forward: map p2 (cam2 frame) through Sim3_12 -> cam1, compare to obs1
    p_in_1 = sn * (pts2 @ Rn.T) + tn
    z1 = jnp.where(jnp.abs(p_in_1[:, 2]) > 1e-6, p_in_1[:, 2], 1e-6)
    e12 = (obs1 - p_in_1[:, :2] / z1[:, None]) * w1[:, None]
    # inverse: map p1 (cam1 frame) through Sim3_12^-1 -> cam2, compare to obs2
    sinv = 1.0 / sn
    Rinv = Rn.T
    tinv = -sinv * (Rinv @ tn)
    p_in_2 = sinv * (pts1 @ Rinv.T) + tinv
    z2 = jnp.where(jnp.abs(p_in_2[:, 2]) > 1e-6, p_in_2[:, 2], 1e-6)
    e21 = (obs2 - p_in_2[:, :2] / z2[:, None]) * w2[:, None]
    r = jnp.concatenate([e12, e21], axis=0)
    v = jnp.concatenate([valid, valid], axis=0)
    return jnp.where(v[:, None], r, 0.0)


@functools.partial(jax.jit, static_argnames=("iterations", "fix_scale"))
def _optimize_impl(R0, t0, s0, pts1, pts2, obs1, obs2, w1, w2, valid,
                   huber_delta, iterations, fix_scale):
    with jax.default_matmul_precision("highest"):  # see ops/ba._lm_run
        return _optimize_body(R0, t0, s0, pts1, pts2, obs1, obs2, w1, w2,
                              valid, huber_delta, iterations, fix_scale)


def _optimize_body(R0, t0, s0, pts1, pts2, obs1, obs2, w1, w2, valid,
                   huber_delta, iterations, fix_scale):
    def cost_fn(R, t, s):
        r = _residuals(jnp.zeros(7, R.dtype), R, t, s,
                       pts1, pts2, obs1, obs2, w1, w2, valid)
        chi2 = jnp.sum(r * r, axis=1)
        d2 = huber_delta * huber_delta
        rho = jnp.where(chi2 <= d2, chi2,
                        2.0 * huber_delta * jnp.sqrt(jnp.maximum(chi2, 1e-12)) - d2)
        return jnp.sum(rho), chi2

    def lm_step(carry, _):
        R, t, s, lam, cost = carry
        zero = jnp.zeros(7, R.dtype)
        r0 = _residuals(zero, R, t, s, pts1, pts2, obs1, obs2, w1, w2, valid)
        J = jax.jacfwd(lambda d: _residuals(d, R, t, s, pts1, pts2,
                                            obs1, obs2, w1, w2, valid))(zero)
        # Huber weights
        chi2 = jnp.sum(r0 * r0, axis=1)
        wq = jnp.sqrt(jnp.minimum(1.0, huber_delta /
                                  jnp.sqrt(jnp.maximum(chi2, 1e-12))))[:, None]
        rw = r0 * wq
        Jw = J * wq[:, :, None]
        Jf = Jw.reshape(-1, 7)
        rf = rw.reshape(-1)
        H = Jf.T @ Jf + lam * jnp.eye(7, dtype=R.dtype)
        g = -Jf.T @ rf
        if fix_scale:
            # zero the scale row/col, keep unit diagonal
            H = H.at[6, :].set(0.0).at[:, 6].set(0.0).at[6, 6].set(1.0)
            g = g.at[6].set(0.0)
        delta = jnp.linalg.solve(H, g)
        Rn, tn, sn = _apply_chart(delta, R, t, s)
        new_cost, _ = cost_fn(Rn, tn, sn)
        accept = new_cost < cost
        R = jnp.where(accept, Rn, R)
        t = jnp.where(accept, tn, t)
        s = jnp.where(accept, sn, s)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e6)
        return (R, t, s, lam, cost), None

    cost0, _ = cost_fn(R0, t0, s0)
    (R, t, s, _, _), _ = jax.lax.scan(
        lm_step, (R0, t0, s0, jnp.asarray(1e-4, R0.dtype), cost0),
        None, length=iterations)
    return R, t, s


def _residuals_np(delta, R, t, s, pts1, pts2, obs1, obs2, w1, w2):
    """NumPy twin of :func:`_residuals` (all rows valid — no padding on
    host; float64 throughout)."""
    dR = _so3_exp_np(delta[:3])
    Rn, tn, sn = dR @ R, t + delta[3:6], s * np.exp(delta[6])
    p_in_1 = sn * (pts2 @ Rn.T) + tn
    z1 = np.where(np.abs(p_in_1[:, 2]) > 1e-6, p_in_1[:, 2], 1e-6)
    e12 = (obs1 - p_in_1[:, :2] / z1[:, None]) * w1[:, None]
    sinv = 1.0 / sn
    Rinv = Rn.T
    tinv = -sinv * (Rinv @ tn)
    p_in_2 = sinv * (pts1 @ Rinv.T) + tinv
    z2 = np.where(np.abs(p_in_2[:, 2]) > 1e-6, p_in_2[:, 2], 1e-6)
    e21 = (obs2 - p_in_2[:, :2] / z2[:, None]) * w2[:, None]
    return np.concatenate([e12, e21], axis=0)


def _so3_exp_np(omega):
    theta = np.linalg.norm(omega)
    wx = np.array([[0.0, -omega[2], omega[1]],
                   [omega[2], 0.0, -omega[0]],
                   [-omega[1], omega[0], 0.0]])
    if theta < 1e-12:
        return np.eye(3) + wx
    K = wx / theta
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


def optimize_sim3_transform_host(rot_12, trans_12, scale_12,
                                 pts1_cam, pts2_cam, obs1, obs2,
                                 sigma_sq1, sigma_sq2,
                                 inlier_threshold: float, fix_scale: bool,
                                 iterations: int = 20):
    """Host NumPy twin of :func:`optimize_sim3_transform`.

    Same LM (Huber weights, damping schedule, accept/reject, fixed-scale
    row masking) over the same 7-vector chart; the Jacobian is ANALYTIC in
    float64 (derivations in `_jacobian` — finite differences cost 15
    residual sweeps per iteration, ~40 ms per closure attempt on the
    1-core host) and the loop exits early once the step norm vanishes. The
    problem is one 7-dof transform against <= a few hundred point pairs —
    milliseconds on host, while the device dispatch costs a tunnel round
    trip (~26 ms); the serving-path closure consumer
    (pipeline/device_slam.py) therefore refines here.
    """
    n = len(pts1_cam)
    if n == 0:
        return rot_12, trans_12, scale_12
    R = np.asarray(rot_12, np.float64)
    t = np.asarray(trans_12, np.float64)
    s = float(scale_12)
    pts1 = np.asarray(pts1_cam, np.float64).reshape(n, 3)
    pts2 = np.asarray(pts2_cam, np.float64).reshape(n, 3)
    obs1 = np.asarray(obs1, np.float64).reshape(n, 2)
    obs2 = np.asarray(obs2, np.float64).reshape(n, 2)
    w1 = np.sqrt(np.asarray(sigma_sq1, np.float64))
    w2 = np.sqrt(np.asarray(sigma_sq2, np.float64))
    huber = float(np.sqrt(inlier_threshold))
    d2 = huber * huber

    def cost_of(R, t, s):
        r = _residuals_np(np.zeros(7), R, t, s, pts1, pts2, obs1, obs2,
                          w1, w2)
        chi2 = np.sum(r * r, axis=1)
        rho = np.where(chi2 <= d2, chi2,
                       2.0 * huber * np.sqrt(np.maximum(chi2, 1e-12)) - d2)
        return float(np.sum(rho))

    def _skew_batch(v):
        out = np.zeros((len(v), 3, 3))
        out[:, 0, 1] = -v[:, 2]
        out[:, 0, 2] = v[:, 1]
        out[:, 1, 0] = v[:, 2]
        out[:, 1, 2] = -v[:, 0]
        out[:, 2, 0] = -v[:, 1]
        out[:, 2, 1] = v[:, 0]
        return out

    def _proj_jac(p):
        """(n, 2, 3) Jacobian of the perspective division at p."""
        z = np.where(np.abs(p[:, 2]) > 1e-6, p[:, 2], 1e-6)
        J = np.zeros((len(p), 2, 3))
        J[:, 0, 0] = 1.0 / z
        J[:, 0, 2] = -p[:, 0] / (z * z)
        J[:, 1, 1] = 1.0 / z
        J[:, 1, 2] = -p[:, 1] / (z * z)
        return J

    def _jacobian(R, t, s):
        """Analytic (2n, 2, 7) Jacobian of the stacked residuals at delta=0
        under the chart R<-exp(w)R, t<-t+u, s<-s*exp(sigma). Forward edge:
        p = s R p2 + t, dp/dw = -skew(sRp2), dp/du = I, dp/dsigma = sRp2.
        Inverse edge: q = s^-1 R^T (p1 - t), dq/dw = s^-1 R^T skew(p1 - t),
        dq/du = -s^-1 R^T, dq/dsigma = -q. Residual e = (obs - proj(.)) w,
        so each block is -w * projJac @ dP."""
        n = len(pts1)
        v = s * (pts2 @ R.T)                          # (n, 3)
        p = v + t
        dP = np.zeros((n, 3, 7))
        dP[:, :, 0:3] = -_skew_batch(v)
        dP[:, :, 3:6] = np.eye(3)[None]
        dP[:, :, 6] = v
        J12 = -(_proj_jac(p) @ dP) * w1[:, None, None]

        sinv = 1.0 / s
        u = pts1 - t
        q = sinv * (u @ R)                            # R^T u, row-vector form
        dQ = np.zeros((n, 3, 7))
        dQ[:, :, 0:3] = sinv * np.einsum(
            "ji,njk->nik", R, _skew_batch(u), optimize=True)
        dQ[:, :, 3:6] = (-sinv * R.T)[None]
        dQ[:, :, 6] = -q
        J21 = -(_proj_jac(q) @ dQ) * w2[:, None, None]
        return np.concatenate([J12, J21], axis=0)

    lam = 1e-4
    cost = cost_of(R, t, s)
    for _ in range(int(iterations)):
        r0 = _residuals_np(np.zeros(7), R, t, s, pts1, pts2, obs1, obs2,
                           w1, w2)
        J = _jacobian(R, t, s)
        chi2 = np.sum(r0 * r0, axis=1)
        wq = np.sqrt(np.minimum(
            1.0, huber / np.sqrt(np.maximum(chi2, 1e-12))))[:, None]
        Jf = (J * wq[:, :, None]).reshape(-1, 7)
        rf = (r0 * wq).reshape(-1)
        H = Jf.T @ Jf + lam * np.eye(7)
        g = -Jf.T @ rf
        if fix_scale:
            H[6, :] = 0.0
            H[:, 6] = 0.0
            H[6, 6] = 1.0
            g[6] = 0.0
        try:
            delta = np.linalg.solve(H, g)
        except np.linalg.LinAlgError:
            lam = min(lam * 4.0, 1e6)
            continue
        dR = _so3_exp_np(delta[:3])
        Rn, tn, sn = dR @ R, t + delta[3:6], s * np.exp(delta[6])
        new_cost = cost_of(Rn, tn, sn)
        if new_cost < cost:
            R, t, s, cost = Rn, tn, sn, new_cost
            lam = max(lam * 0.5, 1e-9)
        else:
            lam = min(lam * 4.0, 1e6)
        # converged: further iterations cannot move the estimate (the
        # device twin runs its fixed budget regardless; results agree to
        # the tests' tolerances either way)
        if np.linalg.norm(delta) < 1e-10:
            break
    return R, t, float(s)


def optimize_sim3_transform(rot_12: np.ndarray, trans_12: np.ndarray,
                            scale_12: float,
                            pts1_cam: np.ndarray, pts2_cam: np.ndarray,
                            obs1: np.ndarray, obs2: np.ndarray,
                            sigma_sq1: np.ndarray, sigma_sq2: np.ndarray,
                            inlier_threshold: float,
                            fix_scale: bool,
                            iterations: int = 20
                            ) -> Tuple[np.ndarray, np.ndarray, float]:
    """Refine (R, t, s) of the cam2->cam1 similarity.

    pts1_cam/pts2_cam: (N, 3) matched map points in each camera frame;
    obs1/obs2: (N, 2) normalized-camera observations (bearing.xy/z);
    sigma_sq*: per-match levelSigmaSq (used as edge information, see module
    docstring).
    """
    n = len(pts1_cam)
    if n == 0:
        return rot_12, trans_12, scale_12
    huber = float(np.sqrt(inlier_threshold))
    w1 = np.sqrt(np.asarray(sigma_sq1, np.float32))
    w2 = np.sqrt(np.asarray(sigma_sq2, np.float32))
    # pad the match axis to a 64-bucket: per-closure match counts vary, and
    # each fresh static shape is a remote compile on the tunnel (CLAUDE.md
    # compile-leak rule); padded rows are masked out via ``valid``
    n_pad = max(64, -(-n // 64) * 64)
    valid = np.arange(n_pad) < n

    def _pad(a):
        a = np.asarray(a, np.float32)
        out = np.zeros((n_pad,) + a.shape[1:], np.float32)
        out[:n] = a
        return out

    R, t, s = _optimize_impl(
        jnp.asarray(rot_12, jnp.float32), jnp.asarray(trans_12, jnp.float32),
        jnp.asarray(float(scale_12), jnp.float32),
        jnp.asarray(_pad(pts1_cam)), jnp.asarray(_pad(pts2_cam)),
        jnp.asarray(_pad(obs1)), jnp.asarray(_pad(obs2)),
        jnp.asarray(_pad(w1)), jnp.asarray(_pad(w2)), jnp.asarray(valid),
        jnp.asarray(huber, jnp.float32), int(iterations), bool(fix_scale))
    return (np.asarray(R, np.float64), np.asarray(t, np.float64), float(s))
