"""Bundle adjustment: Levenberg-Marquardt with implicit-Schur PCG in XLA.

Rebuild of the reference's g2o-based solvers (reference: bundle_adjuster.cpp —
LM + BlockSolverX + LinearSolverEigen, Huber delta = sqrt(5.991)) as a
TPU-native batched solver:

  - residuals: normalized-camera reprojection edges with information
    focal^2 / levelSigmaSq (setMapPointMeasurement, bundle_adjuster.cpp:43-63),
    SE3 odometry-prior / loop-closure edges (EdgeSE3Expmap semantics:
    error = log(est_b^-1 * meas * est_a), g2o vertex order preserved), and
    unary SE3 priors used for the soft orientation anchor
    (bundle_adjuster.cpp:339-370);
  - all residuals/Jacobians are whitened and assembled with segment-sums
    (no sparse matrices); landmarks are eliminated IMPLICITLY: the Schur
    complement is never formed — PCG runs on it with matrix-vector products
    expressed as gather/segment-sum passes over the observation list, with a
    block-Jacobi preconditioner. This keeps everything static-shaped and
    MXU/VPU-friendly at any problem size;
  - left-multiplicative SE3 updates, matching g2o's VertexSE3Expmap.

The host-side problem construction (which keyframes/points enter, two-stage
fix/unfix schedule, chi2 outlier pruning) lives in
`pipeline/bundle_adjustment.py`.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu.ops import lie

CHI2_THRESHOLD = 5.991  # reference: bundle_adjuster.cpp:28


class BAProblem(NamedTuple):
    """Padded problem arrays (see builder in pipeline/bundle_adjustment.py)."""
    poses: jnp.ndarray        # (K, 4, 4) f32 world-to-camera
    pose_fixed: jnp.ndarray   # (K,) bool
    points: jnp.ndarray       # (M, 3) f32
    points_fixed: jnp.ndarray # (M,) bool
    obs_kf: jnp.ndarray       # (O,) i32
    obs_mp: jnp.ndarray       # (O,) i32
    obs_meas: jnp.ndarray     # (O, 2) f32 normalized-camera measurement
    obs_sqrt_info: jnp.ndarray  # (O,) f32  (focal / sigma_level)
    obs_valid: jnp.ndarray    # (O,) bool
    pe_a: jnp.ndarray         # (E,) i32 vertex0 index
    pe_b: jnp.ndarray         # (E,) i32 vertex1 index
    pe_meas: jnp.ndarray      # (E, 4, 4) f32
    pe_sqrt_info: jnp.ndarray # (E, 6, 6) f32 (Cholesky factor of information)
    pe_valid: jnp.ndarray     # (E,) bool
    pr_idx: jnp.ndarray       # (P,) i32 unary-prior pose index
    pr_meas: jnp.ndarray      # (P, 4, 4) f32 target pose
    pr_sqrt_info: jnp.ndarray # (P, 6, 6) f32
    pr_valid: jnp.ndarray     # (P,) bool


class BAResult(NamedTuple):
    poses: jnp.ndarray
    points: jnp.ndarray
    obs_chi2: jnp.ndarray     # (O,) final unweighted chi2 per observation
    cost: jnp.ndarray         # scalar robust cost


def _reproj_terms(poses, points, p: BAProblem, huber_delta):
    """Residuals, Jacobians and Huber weights of all reprojection edges."""
    T = poses[p.obs_kf]                       # (O, 4, 4)
    X = points[p.obs_mp]                      # (O, 3)
    pc = jnp.einsum("oij,oj->oi", T[:, :3, :3], X) + T[:, :3, 3]
    z = pc[:, 2]
    zsafe = jnp.where(jnp.abs(z) > 1e-6, z, 1e-6)
    pred = pc[:, :2] / zsafe[:, None]
    r = (pred - p.obs_meas) * p.obs_sqrt_info[:, None]        # (O, 2)
    chi2 = jnp.sum(r * r, axis=1)
    # Huber: weight rho'(chi2) = min(1, delta/|r|)  (g2o RobustKernelHuber)
    rnorm = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    w = jnp.minimum(1.0, huber_delta / rnorm)
    w = jnp.where(p.obs_valid, w, 0.0)

    inv_z = 1.0 / zsafe
    # d(pred)/d(pc): (O, 2, 3)
    Jproj = jnp.stack([
        jnp.stack([inv_z, jnp.zeros_like(z), -pc[:, 0] * inv_z * inv_z], axis=-1),
        jnp.stack([jnp.zeros_like(z), inv_z, -pc[:, 1] * inv_z * inv_z], axis=-1),
    ], axis=1)
    si = p.obs_sqrt_info[:, None, None]
    sqw = jnp.sqrt(w)[:, None, None]
    # pose tangent [omega, upsilon], left-mult: d(pc)/d xi = [-skew(pc) | I]
    Jp_pose = jnp.concatenate([-lie.skew(pc), jnp.broadcast_to(
        jnp.eye(3, dtype=pc.dtype), (pc.shape[0], 3, 3))], axis=-1)  # (O, 3, 6)
    J_pose = (Jproj @ Jp_pose) * si * sqw                      # (O, 2, 6)
    J_pt = (Jproj @ T[:, :3, :3]) * si * sqw                   # (O, 2, 3)
    # zero out for fixed vertices
    J_pose = jnp.where(p.pose_fixed[p.obs_kf][:, None, None], 0.0, J_pose)
    J_pt = jnp.where(p.points_fixed[p.obs_mp][:, None, None], 0.0, J_pt)
    r_w = r * jnp.sqrt(w)[:, None]
    chi2 = jnp.where(p.obs_valid, chi2, 0.0)
    return r_w, J_pose, J_pt, chi2, w


def _pe_error_fn(xi_a, xi_b, Ta, Tb, C):
    """EdgeSE3Expmap error with left-mult tangents applied to both vertices."""
    A = lie.se3_exp(xi_a) @ Ta
    B = lie.se3_exp(xi_b) @ Tb
    return lie.se3_log(lie.se3_inverse(B) @ C @ A)


def _pose_edge_terms(poses, p: BAProblem):
    Ta = poses[p.pe_a]
    Tb = poses[p.pe_b]
    zero = jnp.zeros(6, dtype=poses.dtype)

    def one(Ta_i, Tb_i, C_i, S_i):
        e0 = _pe_error_fn(zero, zero, Ta_i, Tb_i, C_i)
        Ja = jax.jacfwd(lambda xa: _pe_error_fn(xa, zero, Ta_i, Tb_i, C_i))(zero)
        Jb = jax.jacfwd(lambda xb: _pe_error_fn(zero, xb, Ta_i, Tb_i, C_i))(zero)
        return S_i @ e0, S_i @ Ja, S_i @ Jb

    r, Ja, Jb = jax.vmap(one)(Ta, Tb, p.pe_meas, p.pe_sqrt_info)
    valid = p.pe_valid[:, None]
    r = jnp.where(valid, r, 0.0)
    Ja = jnp.where((p.pe_valid & ~p.pose_fixed[p.pe_a])[:, None, None], Ja, 0.0)
    Jb = jnp.where((p.pe_valid & ~p.pose_fixed[p.pe_b])[:, None, None], Jb, 0.0)
    return r, Ja, Jb


def _prior_terms(poses, p: BAProblem):
    T = poses[p.pr_idx]
    zero = jnp.zeros(6, dtype=poses.dtype)

    def one(T_i, P0_i, S_i):
        fn = lambda xi: lie.se3_log(lie.se3_inverse(lie.se3_exp(xi) @ T_i) @ P0_i)
        return S_i @ fn(zero), S_i @ jax.jacfwd(fn)(zero)

    r, J = jax.vmap(one)(T, p.pr_meas, p.pr_sqrt_info)
    ok = p.pr_valid & ~p.pose_fixed[p.pr_idx]
    r = jnp.where(p.pr_valid[:, None], r, 0.0)
    J = jnp.where(ok[:, None, None], J, 0.0)
    return r, J


def _robust_cost(chi2, w_unused, huber_delta):
    """g2o Huber rho(chi2)."""
    d2 = huber_delta * huber_delta
    return jnp.where(chi2 <= d2, chi2,
                     2.0 * huber_delta * jnp.sqrt(jnp.maximum(chi2, 1e-12)) - d2)


def _total_cost(poses, points, p: BAProblem, huber_delta):
    T = poses[p.obs_kf]
    X = points[p.obs_mp]
    pc = jnp.einsum("oij,oj->oi", T[:, :3, :3], X) + T[:, :3, 3]
    zsafe = jnp.where(jnp.abs(pc[:, 2]) > 1e-6, pc[:, 2], 1e-6)
    pred = pc[:, :2] / zsafe[:, None]
    r = (pred - p.obs_meas) * p.obs_sqrt_info[:, None]
    chi2 = jnp.where(p.obs_valid, jnp.sum(r * r, axis=1), 0.0)
    cost = jnp.sum(_robust_cost(chi2, None, huber_delta) * p.obs_valid)

    r_pe, _, _ = _pose_edge_terms(poses, p)
    cost += jnp.sum(r_pe * r_pe)
    r_pr, _ = _prior_terms(poses, p)
    cost += jnp.sum(r_pr * r_pr)
    return cost, chi2


def _lm_run(p: BAProblem, iterations: int, cg_iters: int,
            huber_delta: float, init_lambda: float) -> BAResult:
    # TPU: the default matmul precision runs f32 contractions as bf16
    # passes (~3 decimal digits). The LM normal equations, Schur solves and
    # pose-chain products amplify that rounding into pose errors large
    # enough to destabilize the VIO feedback loop (measured: the device-VO
    # pose chain wanders 0.45 m at drift=0 on the EuRoC-class scene, while
    # the identical program on the f32 CPU backend stays at 0.05 m). These
    # solves are latency-bound, not FLOP-bound, so full-f32 passes are
    # effectively free — pin every contraction traced inside to HIGHEST.
    with jax.default_matmul_precision("highest"):
        return _lm_run_impl(p, iterations, cg_iters, huber_delta, init_lambda)


def _lm_run_impl(p: BAProblem, iterations: int, cg_iters: int,
                 huber_delta: float, init_lambda: float) -> BAResult:
    K = p.poses.shape[0]
    M = p.points.shape[0]

    def seg(values, idx, num):
        return jax.ops.segment_sum(values, idx, num_segments=num)

    def linearize_and_solve(poses, points, lam):
        r_obs, J_pose, J_pt, chi2, w = _reproj_terms(poses, points, p, huber_delta)
        r_pe, Ja, Jb = _pose_edge_terms(poses, p)
        r_pr, Jpr = _prior_terms(poses, p)

        # --- normal-equation blocks
        Hll = seg(jnp.einsum("oci,ocj->oij", J_pt, J_pt), p.obs_mp, M)
        bl = seg(-jnp.einsum("oci,oc->oi", J_pt, r_obs), p.obs_mp, M)
        Hpp = seg(jnp.einsum("oci,ocj->oij", J_pose, J_pose), p.obs_kf, K)
        bp = seg(-jnp.einsum("oci,oc->oi", J_pose, r_obs), p.obs_kf, K)
        # pose-edge contributions
        Hpp = Hpp + seg(jnp.einsum("eci,ecj->eij", Ja, Ja), p.pe_a, K)
        Hpp = Hpp + seg(jnp.einsum("eci,ecj->eij", Jb, Jb), p.pe_b, K)
        bp = bp + seg(-jnp.einsum("eci,ec->ei", Ja, r_pe), p.pe_a, K)
        bp = bp + seg(-jnp.einsum("eci,ec->ei", Jb, r_pe), p.pe_b, K)
        Wab = jnp.einsum("eci,ecj->eij", Ja, Jb)   # (E, 6, 6) off-diagonal
        # priors
        Hpp = Hpp + seg(jnp.einsum("pci,pcj->pij", Jpr, Jpr), p.pr_idx, K)
        bp = bp + seg(-jnp.einsum("pci,pc->pi", Jpr, r_pr), p.pr_idx, K)

        eye6 = jnp.eye(6, dtype=poses.dtype)
        eye3 = jnp.eye(3, dtype=poses.dtype)
        # damping + identity for fixed/empty slots keeps blocks invertible
        Hpp_d = Hpp + (lam + 1e-8) * eye6[None]
        Hpp_d = jnp.where(p.pose_fixed[:, None, None], eye6[None], Hpp_d)
        Hll_d = Hll + (lam + 1e-8) * eye3[None]
        Hll_d = jnp.where(p.points_fixed[:, None, None], eye3[None], Hll_d)
        Hll_inv = jnp.linalg.inv(Hll_d)
        bl = jnp.where(p.points_fixed[:, None], 0.0, bl)
        bp = jnp.where(p.pose_fixed[:, None], 0.0, bp)

        # --- implicit Schur matvec: S x = Hpp_d x + edges - Hpl Hll^-1 Hlp x
        def Hlp_apply(xp):
            contrib = jnp.einsum("oci,oi->oc", J_pose, xp[p.obs_kf])
            return seg(jnp.einsum("oci,oc->oi", J_pt, contrib), p.obs_mp, M)

        def Hpl_apply(xl):
            contrib = jnp.einsum("oci,oi->oc", J_pt, xl[p.obs_mp])
            return seg(jnp.einsum("oci,oc->oi", J_pose, contrib), p.obs_kf, K)

        def S_apply(xp):
            y = jnp.einsum("kij,kj->ki", Hpp_d, xp)
            # pose-edge off-diagonal blocks
            y = y + seg(jnp.einsum("eij,ej->ei", Wab, xp[p.pe_b]), p.pe_a, K)
            y = y + seg(jnp.einsum("eji,ej->ei", Wab, xp[p.pe_a]), p.pe_b, K)
            yl = jnp.einsum("mij,mj->mi", Hll_inv, Hlp_apply(xp))
            y = y - Hpl_apply(yl)
            return jnp.where(p.pose_fixed[:, None], xp, y)

        rhs = bp - Hpl_apply(jnp.einsum("mij,mj->mi", Hll_inv, bl))
        rhs = jnp.where(p.pose_fixed[:, None], 0.0, rhs)

        if cg_iters == 0:
            # --- dense Schur: form the reduced (6K, 6K) camera system and
            # solve it directly. For the bounded local-BA problem sizes the
            # sequential-latency cost of ~cg_iters PCG steps (each a chain of
            # small gathers/segment-sums) dwarfs the FLOPs of building S
            # densely — one einsum chain on the MXU plus one small dense
            # solve per LM iteration is far faster on TPU.
            Wkm = seg(jnp.einsum("oci,ocj->oij", J_pose, J_pt),
                      p.obs_kf * M + p.obs_mp, K * M).reshape(K, M, 6, 3)
            Y = jnp.einsum("kmij,mjl->kmil", Wkm, Hll_inv)
            S = -jnp.einsum("kmil,qmjl->kqij", Y, Wkm)
            S = S + seg(Wab, p.pe_a * K + p.pe_b, K * K).reshape(K, K, 6, 6)
            S = S + seg(jnp.swapaxes(Wab, -1, -2),
                        p.pe_b * K + p.pe_a, K * K).reshape(K, K, 6, 6)
            diag = jnp.arange(K)
            S = S.at[diag, diag].add(Hpp_d)
            # fixed poses: identity rows/cols + zero rhs => dx stays 0
            S = jnp.where(p.pose_fixed[:, None, None, None], 0.0, S)
            S = jnp.where(p.pose_fixed[None, :, None, None], 0.0, S)
            S = S.at[diag, diag].add(
                jnp.where(p.pose_fixed[:, None, None],
                          jnp.eye(6, dtype=poses.dtype)[None], 0.0))
            Sfull = S.transpose(0, 2, 1, 3).reshape(6 * K, 6 * K)
            dx_p = jnp.linalg.solve(Sfull, rhs.reshape(-1)).reshape(K, 6)
        else:
            # --- implicit Schur + PCG with block-Jacobi preconditioner (for
            # problem sizes where the dense W tensor would not fit)
            Minv = jnp.linalg.inv(Hpp_d)

            def precond(x):
                return jnp.einsum("kij,kj->ki", Minv, x)

            x0 = jnp.zeros_like(rhs)
            r0 = rhs
            z0 = precond(r0)
            d0 = z0

            def cg_step(carry, _):
                x, r, z, d = carry
                Ad = S_apply(d)
                rz = jnp.sum(r * z)
                alpha = rz / jnp.maximum(jnp.sum(d * Ad), 1e-20)
                x = x + alpha * d
                r_new = r - alpha * Ad
                z_new = precond(r_new)
                beta = jnp.sum(r_new * z_new) / jnp.maximum(rz, 1e-20)
                d_new = z_new + beta * d
                return (x, r_new, z_new, d_new), None

            (dx_p, _, _, _), _ = jax.lax.scan(cg_step, (x0, r0, z0, d0), None,
                                              length=cg_iters)
        dx_p = jnp.where(p.pose_fixed[:, None], 0.0, dx_p)
        dx_l = jnp.einsum("mij,mj->mi", Hll_inv, bl - Hlp_apply(dx_p))
        dx_l = jnp.where(p.points_fixed[:, None], 0.0, dx_l)
        return dx_p, dx_l

    def lm_step(carry, _):
        poses, points, lam, cost = carry
        dx_p, dx_l = linearize_and_solve(poses, points, lam)
        new_poses = lie.se3_exp(dx_p) @ poses
        new_points = points + dx_l
        new_cost, _ = _total_cost(new_poses, new_points, p, huber_delta)
        accept = new_cost < cost
        poses = jnp.where(accept, new_poses, poses)
        points = jnp.where(accept, new_points, points)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e6)
        return (poses, points, lam, cost), None

    cost0, _ = _total_cost(p.poses, p.points, p, huber_delta)
    (poses, points, lam, cost), _ = jax.lax.scan(
        lm_step, (p.poses, p.points, jnp.asarray(init_lambda, p.poses.dtype), cost0),
        None, length=iterations)
    _, chi2 = _total_cost(poses, points, p, huber_delta)
    return BAResult(poses, points, chi2, cost)


# Largest padded K*M for which the dense-Schur path builds its (K, M, 6, 3)
# coupling tensor (72 B/pair): 1M pairs = 72 MB of HBM. Above this, PCG.
DENSE_SCHUR_MAX_KM = 1 << 20


def pick_cg_iters(n_poses_padded: int, n_points_padded: int) -> int:
    """Static solver selection shared by every BA call site (compile key!):
    0 = dense Schur direct solve, else the PCG iteration budget."""
    if n_poses_padded * n_points_padded <= DENSE_SCHUR_MAX_KM:
        return 0
    return min(6 * n_poses_padded, 96)


@functools.partial(jax.jit, static_argnames=("iterations", "cg_iters"))
def solve_ba(p: BAProblem, iterations: int, cg_iters: int,
             huber_delta: float = float(np.sqrt(CHI2_THRESHOLD)),
             init_lambda: float = 1e-4) -> BAResult:
    return _lm_run(p, iterations, cg_iters, huber_delta, init_lambda)


# ---------------------------------------------------------------------------
# Packed entry points: the tunnel charges ~0.4 ms of host time per
# device_put, so shipping the 18 problem arrays individually costs ~8 ms per
# solve. Pack them into three flat host buffers (f32 / i32 / bool) and
# unpack with static-offset slices inside the jitted program (free on
# device).
# ---------------------------------------------------------------------------


def pack_problem(p: BAProblem):
    """Flatten a NumPy-arrays BAProblem into (f32, i32, b8) host buffers."""
    f32 = np.concatenate([
        np.asarray(p.poses, np.float32).ravel(),
        np.asarray(p.points, np.float32).ravel(),
        np.asarray(p.obs_meas, np.float32).ravel(),
        np.asarray(p.obs_sqrt_info, np.float32).ravel(),
        np.asarray(p.pe_meas, np.float32).ravel(),
        np.asarray(p.pe_sqrt_info, np.float32).ravel(),
        np.asarray(p.pr_meas, np.float32).ravel(),
        np.asarray(p.pr_sqrt_info, np.float32).ravel()])
    i32 = np.concatenate([
        np.asarray(p.obs_kf, np.int32), np.asarray(p.obs_mp, np.int32),
        np.asarray(p.pe_a, np.int32), np.asarray(p.pe_b, np.int32),
        np.asarray(p.pr_idx, np.int32)])
    b8 = np.concatenate([
        np.asarray(p.pose_fixed, bool), np.asarray(p.points_fixed, bool),
        np.asarray(p.obs_valid, bool), np.asarray(p.pe_valid, bool),
        np.asarray(p.pr_valid, bool)])
    return f32, i32, b8


def _counts(K, M, O, E, P, two_stage: bool):
    """(f32, i32, b8) element counts of a packed problem (+two-stage extras)."""
    nf = 16 * K + 3 * M + 3 * O + 52 * E + 52 * P + (36 if two_stage else 0)
    ni = 2 * O + 2 * E + P + (1 if two_stage else 0)
    nb = K + M + O + E + P + (K if two_stage else 0)
    return nf, ni, nb


def fuse_packed(f32, i32, b8) -> np.ndarray:
    """Fuse the three packed host buffers into ONE uint32 transfer buffer
    (floats/ints bit-cast, bools byte-packed little-endian). One device put
    instead of three — puts cost milliseconds each on tunnel-attached TPUs."""
    nb = len(b8)
    b8u = np.zeros(((nb + 3) // 4) * 4, np.uint8)
    b8u[:nb] = np.asarray(b8, np.uint8)
    return np.concatenate([
        np.ascontiguousarray(f32, np.float32).view(np.uint32),
        np.ascontiguousarray(i32, np.int32).view(np.uint32),
        b8u.view(np.uint32)])


def _unfuse(buf, K, M, O, E, P, two_stage: bool):
    """In-jit inverse of fuse_packed (bitcasts only, no data movement)."""
    nf, ni, nb = _counts(K, M, O, E, P, two_stage)
    f32 = jax.lax.bitcast_convert_type(buf[:nf], jnp.float32)
    i32 = jax.lax.bitcast_convert_type(buf[nf:nf + ni], jnp.int32)
    nbw = (nb + 3) // 4
    b8 = jax.lax.bitcast_convert_type(
        buf[nf + ni:nf + ni + nbw], jnp.uint8).reshape(-1)[:nb] != 0
    return f32, i32, b8


def _unpack_problem(f32, i32, b8, K, M, O, E, P) -> BAProblem:
    fo = [0]
    def f(n, shape):
        v = f32[fo[0]:fo[0] + n].reshape(shape)
        fo[0] += n
        return v
    io = [0]
    def g(n):
        v = i32[io[0]:io[0] + n]
        io[0] += n
        return v
    bo = [0]
    def h(n):
        v = b8[bo[0]:bo[0] + n]
        bo[0] += n
        return v
    return BAProblem(
        poses=f(K * 16, (K, 4, 4)), pose_fixed=h(K),
        points=f(M * 3, (M, 3)), points_fixed=h(M),
        obs_kf=g(O), obs_mp=g(O),
        obs_meas=f(O * 2, (O, 2)), obs_sqrt_info=f(O, (O,)),
        obs_valid=h(O),
        pe_a=g(E), pe_b=g(E),
        pe_meas=f(E * 16, (E, 4, 4)), pe_sqrt_info=f(E * 36, (E, 6, 6)),
        pe_valid=h(E),
        pr_idx=g(P), pr_meas=f(P * 16, (P, 4, 4)),
        pr_sqrt_info=f(P * 36, (P, 6, 6)), pr_valid=h(P))


@functools.partial(jax.jit, static_argnames=("K", "M", "O", "E", "P",
                                             "iterations", "cg_iters"))
def solve_ba_packed(f32, i32, b8, K: int, M: int, O: int, E: int, P: int,
                    iterations: int, cg_iters: int,
                    huber_delta: float = float(np.sqrt(CHI2_THRESHOLD)),
                    init_lambda: float = 1e-4) -> BAResult:
    p = _unpack_problem(f32, i32, b8, K, M, O, E, P)
    return _lm_run(p, iterations, cg_iters, huber_delta, init_lambda)


@functools.partial(jax.jit, static_argnames=("K", "M", "O", "E", "P",
                                             "iterations", "cg_iters"))
def solve_ba_two_stage_packed(
        f32, i32, b8, K: int, M: int, O: int, E: int, P: int,
        iterations: int, cg_iters: int,
        huber_delta: float = float(np.sqrt(CHI2_THRESHOLD)),
        init_lambda: float = 1e-4) -> BAResult:
    """Packed two-stage solve. The pack carries three extras appended by the
    caller: anchor_sqrt_info (36 f32 at the end of f32), anchor_slot (1 i32
    at the end of i32), stage2_pose_fixed (K bool at the end of b8)."""
    p = _unpack_problem(f32, i32, b8, K, M, O, E, P)
    anchor_sqrt_info = f32[-36:].reshape(6, 6)
    anchor_slot = i32[-1]
    stage2_fixed = b8[-K:]
    res1 = _lm_run(p, iterations, cg_iters, huber_delta, init_lambda)
    anchor_pose = res1.poses[anchor_slot]
    p2 = p._replace(
        poses=res1.poses,
        points=res1.points,
        pose_fixed=stage2_fixed,
        pr_idx=anchor_slot[None].astype(jnp.int32),
        pr_meas=anchor_pose[None],
        pr_sqrt_info=anchor_sqrt_info[None],
        pr_valid=jnp.ones((1,), bool))
    return _lm_run(p2, iterations, cg_iters, huber_delta, init_lambda)


@functools.partial(jax.jit, static_argnames=("K", "M", "O", "E", "P",
                                             "iterations", "cg_iters"))
def solve_ba_fused(buf, K: int, M: int, O: int, E: int, P: int,
                   iterations: int, cg_iters: int,
                   huber_delta: float = float(np.sqrt(CHI2_THRESHOLD)),
                   init_lambda: float = 1e-4) -> BAResult:
    """solve_ba_packed over ONE fused uint32 buffer (see fuse_packed)."""
    f32, i32, b8 = _unfuse(buf, K, M, O, E, P, two_stage=False)
    p = _unpack_problem(f32, i32, b8, K, M, O, E, P)
    return _lm_run(p, iterations, cg_iters, huber_delta, init_lambda)


@functools.partial(jax.jit, static_argnames=("K", "M", "O", "E", "P",
                                             "iterations", "cg_iters"))
def solve_ba_two_stage_fused(
        buf, K: int, M: int, O: int, E: int, P: int,
        iterations: int, cg_iters: int,
        huber_delta: float = float(np.sqrt(CHI2_THRESHOLD)),
        init_lambda: float = 1e-4) -> BAResult:
    """solve_ba_two_stage_packed over ONE fused uint32 buffer."""
    f32, i32, b8 = _unfuse(buf, K, M, O, E, P, two_stage=True)
    p = _unpack_problem(f32, i32, b8, K, M, O, E, P)
    anchor_sqrt_info = f32[-36:].reshape(6, 6)
    anchor_slot = i32[-1]
    stage2_fixed = b8[-K:]
    res1 = _lm_run(p, iterations, cg_iters, huber_delta, init_lambda)
    anchor_pose = res1.poses[anchor_slot]
    p2 = p._replace(
        poses=res1.poses,
        points=res1.points,
        pose_fixed=stage2_fixed,
        pr_idx=anchor_slot[None].astype(jnp.int32),
        pr_meas=anchor_pose[None],
        pr_sqrt_info=anchor_sqrt_info[None],
        pr_valid=jnp.ones((1,), bool))
    return _lm_run(p2, iterations, cg_iters, huber_delta, init_lambda)


@functools.partial(jax.jit, static_argnames=("iterations", "cg_iters"))
def solve_ba_two_stage(p: BAProblem, stage2_pose_fixed: jnp.ndarray,
                       anchor_slot: jnp.ndarray,
                       anchor_sqrt_info: jnp.ndarray,
                       iterations: int, cg_iters: int,
                       huber_delta: float = float(np.sqrt(CHI2_THRESHOLD)),
                       init_lambda: float = 1e-4) -> BAResult:
    """Local BA's two-stage schedule fused into one device call
    (reference: bundle_adjuster.cpp:321-373).

    Stage 1 runs with ``p.pose_fixed`` (all but the current keyframe fixed);
    stage 2 unfixes per ``stage2_pose_fixed`` and softly anchors the current
    keyframe's stage-1 orientation via a unary prior (the rotation-only
    information comes in ``anchor_sqrt_info``)."""
    res1 = _lm_run(p, iterations, cg_iters, huber_delta, init_lambda)
    anchor_pose = res1.poses[anchor_slot]
    p2 = p._replace(
        poses=res1.poses,
        points=res1.points,
        pose_fixed=stage2_pose_fixed,
        pr_idx=anchor_slot[None].astype(jnp.int32),
        pr_meas=anchor_pose[None],
        pr_sqrt_info=anchor_sqrt_info[None],
        pr_valid=jnp.ones((1,), bool))
    return _lm_run(p2, iterations, cg_iters, huber_delta, init_lambda)
