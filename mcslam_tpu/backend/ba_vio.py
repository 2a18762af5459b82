"""Visual-inertial(-GPS) sliding-window bundle adjustment.

Extends the vision-only Schur LM of ba.py to the full reference backend
state (WHAT: Backend::SmartFactor_backend + addIMUFactor + addGPSFactor,
/root/reference/MCSlam/src/Backend.cpp:2007-2082,2743-2791,2628-2675):

  per-keyframe state: [pose(6), vel(3), bias(6)]  (D = 15)
  plus one global 6-dof GPS alignment state E_T_V (the estimable
  world-to-ENU transform of newGPSFactor, newGPSFactor.h:10-43), appended
  as an extra column block in the dense pose-side system.

Vision observations touch only the 6 pose dofs of one keyframe and one
landmark (eliminated via Schur); IMU preintegration factors couple
consecutive keyframes' full 15-dof states (jacfwd on the 15+15 tangent —
K-1 factors, negligible); GPS factors couple one pose with E_T_V. The
resulting dense (K*15+6)^2 system is tiny and solves on-device.

The reference's "hold the first optimization until >= 3 GPS factors" rule
(Backend.cpp:3070-3087) lives in the driver, not here.
"""

from __future__ import annotations

from typing import NamedTuple

import functools

import jax
import jax.numpy as jnp

from mcslam_tpu.backend import ba as ba_mod
from mcslam_tpu.backend import imu as imu_mod
from mcslam_tpu.geometry import lie

D = 15  # per-keyframe state dims


class ImuFactors(NamedTuple):
    """Padded table of preintegrated IMU factors between window keyframes."""

    i: jax.Array  # (F,) int32 source keyframe (window index)
    j: jax.Array  # (F,) int32 target keyframe
    dR: jax.Array  # (F, 3, 3)
    dv: jax.Array  # (F, 3)
    dp: jax.Array  # (F, 3)
    dt: jax.Array  # (F,)
    dR_dbg: jax.Array  # (F, 3, 3)
    dv_dbg: jax.Array  # (F, 3, 3)
    dv_dba: jax.Array  # (F, 3, 3)
    dp_dbg: jax.Array  # (F, 3, 3)
    dp_dba: jax.Array  # (F, 3, 3)
    bias_hat: jax.Array  # (F, 6)
    sqrt_info: jax.Array  # (F, 15, 15) upper-triangular whitening
    valid: jax.Array  # (F,) bool


class BetweenFactors(NamedTuple):
    """SE(3) relative-pose factors between window keyframes.

    Used by the offline replay harness for 'k' loop-closure records (the
    reference replay tool builds BetweenFactor<Pose3> from them with
    betweenRotation/Translation noise, reduced_camera_system.cpp +
    parameters.yaml) and available to the live path as a loop constraint.
    """

    i: jax.Array  # (B,) int32 window keyframe index
    j: jax.Array  # (B,) int32 window keyframe index
    rel: jax.Array  # (B, 4, 4) measured i_T_j
    sigma_rot: jax.Array  # (B,) rad
    sigma_trans: jax.Array  # (B,) m
    valid: jax.Array  # (B,) bool


def _between_residual(fb: BetweenFactors, idx, pose_i, pose_j):
    """6-dim whitened log(rel^-1 * (T_i^-1 T_j))."""
    err = lie.se3_inverse(fb.rel[idx]) @ (lie.se3_inverse(pose_i) @ pose_j)
    r6 = lie.se3_log(err)
    w = jnp.concatenate(
        [
            jnp.full(3, 1.0) / jnp.maximum(fb.sigma_rot[idx], 1e-6),
            jnp.full(3, 1.0) / jnp.maximum(fb.sigma_trans[idx], 1e-6),
        ]
    )
    return r6 * w


class GpsFactors(NamedTuple):
    """GPS position factors: enu = E_T_V * (p_body + R_body t_bg)."""

    kf: jax.Array  # (G,) int32 window keyframe index
    enu: jax.Array  # (G, 3) measured ENU position
    t_bg: jax.Array  # (3,) body->GPS lever arm
    sigma: jax.Array  # (G,) measurement sigma [m]
    valid: jax.Array  # (G,) bool


class VioProblem(NamedTuple):
    poses: jax.Array  # (K, 4, 4) world_T_body
    vels: jax.Array  # (K, 3)
    biases: jax.Array  # (K, 6)
    landmarks: jax.Array  # (L, 3)
    lm_valid: jax.Array  # (L,)
    obs: ba_mod.BAObservations  # uv observations; cam_T_ref includes Tbc
    cam_T_body: jax.Array  # (C, 4, 4) camera-from-body extrinsics
    fxycxy: jax.Array  # (C, 4)
    imu: ImuFactors | None
    gps: GpsFactors | None
    E_T_V: jax.Array  # (4, 4) ENU-from-VIO-world alignment state
    prior_H: jax.Array  # (K*D+6, K*D+6)
    prior_b: jax.Array  # (K*D+6,)
    kf_valid: jax.Array  # (K,)
    g_norm: float = 9.81
    # SE(3) relative-pose constraints (loop 'k' records in replay)
    between: BetweenFactors | None = None


class VioResult(NamedTuple):
    poses: jax.Array
    vels: jax.Array
    biases: jax.Array
    landmarks: jax.Array
    E_T_V: jax.Array
    obs_inliers: jax.Array
    cost: jax.Array
    # pose-side marginal information at the solution (landmarks eliminated):
    # the fixed-lag marginalization prior source (reference
    # BatchFixedLagSmoother::marginalize / CalculateMarginalFactors,
    # OurFixedLagSmoother.h:109-168)
    marginal_H: jax.Array  # (K*D+6, K*D+6)


def _imu_residual_whitened(fi: ImuFactors, idx, state_i, state_j, g_norm):
    """15-dim whitened residual of one IMU factor at the given states."""
    pre = imu_mod.Preintegrated(
        dR=fi.dR[idx], dv=fi.dv[idx], dp=fi.dp[idx], dt=fi.dt[idx],
        dR_dbg=fi.dR_dbg[idx], dv_dbg=fi.dv_dbg[idx], dv_dba=fi.dv_dba[idx],
        dp_dbg=fi.dp_dbg[idx], dp_dba=fi.dp_dba[idx],
        cov=jnp.eye(9), bias_hat=fi.bias_hat[idx],
        n_samples=jnp.asarray(1, jnp.int32),
    )
    r = imu_mod.residual(
        state_i, state_j, pre, imu_mod.ImuParams(g_norm=g_norm)
    )
    return fi.sqrt_info[idx] @ r


def _gps_residual(pose_i, E_T_V, enu, t_bg):
    p_gps_world = lie.se3_apply(pose_i, t_bg)
    pred = lie.se3_apply(E_T_V, p_gps_world)
    return pred - enu


def _retract_state(pose, vel, bias, xi):
    return (
        lie.se3_retract(pose, xi[:6]),
        vel + xi[6:9],
        bias + xi[9:15],
    )


def _assemble_vio(problem: VioProblem, huber_px: float,
                  kf_blocked: bool = False):
    """Full dense pose-side system (K*D+6) + landmark blocks for Schur.

    kf_blocked: the caller guarantees the observation table is laid out in
    K contiguous blocks of size O//K with obs.kf[o] == o // (O//K) (the
    SLAM driver's native layout). The vision block then assembles through
    ba._assemble's one-hot/block-sum path — per-observation scatter-adds
    lower to sorts on TPU and dominated the VIO iteration."""
    K = problem.poses.shape[0]
    L = problem.landmarks.shape[0]
    N = K * D + 6  # +6 for E_T_V
    obs = problem.obs

    # ---- vision block (reuse analytic jacobians from ba.py) ----
    vis_problem = ba_mod.BAProblem(
        poses=problem.poses,
        landmarks=problem.landmarks,
        lm_valid=problem.lm_valid,
        obs=obs,
        cam_T_ref=problem.cam_T_body,
        fxycxy=problem.fxycxy,
        prior_H=jnp.zeros((K * 6, K * 6)),
        prior_b=jnp.zeros(K * 6),
        kf_valid=problem.kf_valid,
    )
    r, Jp, Jl, w = ba_mod._residuals_and_jacobians(vis_problem, huber_px)
    Jpw = Jp * w[:, None, None]
    cost = jnp.sum(w * jnp.sum(r * r, axis=-1))

    H = jnp.zeros((N, N), jnp.float32)
    g = jnp.zeros(N, jnp.float32)

    if kf_blocked:
        # one-hot / block-sum assembly (MXU) via ba._assemble, then embed
        # the (K*6)-system into the (K*D+6) dense layout with STATIC
        # slice updates (python loop over K — tiny, fixed)
        Hpp_d, gp6, Hll, gl, Wc_blk = ba_mod._assemble(
            vis_problem, r, Jp, Jl, w, kf_blocked=True
        )
        Wc = jnp.zeros((N, L, 3))
        for k in range(K):
            H = jax.lax.dynamic_update_slice(
                H, Hpp_d[k * 6:(k + 1) * 6, k * 6:(k + 1) * 6],
                (k * D, k * D),
            )
            g = jax.lax.dynamic_update_slice(g, gp6[k * 6:(k + 1) * 6],
                                             (k * D,))
            Wc = jax.lax.dynamic_update_slice(Wc, Wc_blk[k], (k * D, 0, 0))
    else:
        # scatter vision pose blocks into the dense system at offsets kf*D
        Hpp_blocks = jnp.einsum("ori,orj->oij", Jpw, Jp)  # (O, 6, 6)
        gp_blocks = jnp.einsum("ori,or->oi", Jpw, r)  # (O, 6)
        # index helper: rows kf*D .. kf*D+6
        row0 = obs.kf * D
        ii = row0[:, None, None] + jnp.arange(6)[None, :, None]
        jj = row0[:, None, None] + jnp.arange(6)[None, None, :]
        H = H.at[ii, jj].add(Hpp_blocks)
        g = g.at[row0[:, None] + jnp.arange(6)[None, :]].add(gp_blocks)

        # landmark blocks
        Jlw = Jl * w[:, None, None]
        Hll = jnp.zeros((L, 3, 3)).at[obs.lm].add(
            jnp.einsum("ori,orj->oij", Jlw, Jl))
        gl = jnp.zeros((L, 3)).at[obs.lm].add(
            jnp.einsum("ori,or->oi", Jlw, r))
        Wc = jnp.zeros((N, L, 3))
        WcB = jnp.einsum("ori,orj->oij", Jpw, Jl)  # (O, 6, 3)
        Wc = Wc.at[
            row0[:, None] + jnp.arange(6)[None, :], obs.lm[:, None]
        ].add(WcB)

    # ---- IMU factors ----
    if problem.imu is not None:
        fi = problem.imu
        F = fi.i.shape[0]

        def one_factor(idx):
            i, j = fi.i[idx], fi.j[idx]

            def resfn(xi_i, xi_j):
                pi, vi, bi = _retract_state(
                    problem.poses[i], problem.vels[i], problem.biases[i], xi_i
                )
                pj, vj, bj = _retract_state(
                    problem.poses[j], problem.vels[j], problem.biases[j], xi_j
                )
                return _imu_residual_whitened(
                    fi, idx,
                    imu_mod.ImuState(pi, vi, bi),
                    imu_mod.ImuState(pj, vj, bj),
                    problem.g_norm,
                )

            z = jnp.zeros(15)
            r15 = resfn(z, z)
            Ji = jax.jacfwd(resfn, argnums=0)(z, z)
            Jj = jax.jacfwd(resfn, argnums=1)(z, z)
            return r15, Ji, Jj

        r15, Ji, Jj = jax.vmap(one_factor)(jnp.arange(problem.imu.i.shape[0]))
        wv = fi.valid.astype(jnp.float32)
        cost = cost + jnp.sum(wv * jnp.sum(r15 * r15, axis=-1))
        Jiw = Ji * wv[:, None, None]
        Jjw = Jj * wv[:, None, None]
        ri = fi.i * D
        rj = fi.j * D
        di = ri[:, None, None] + jnp.arange(D)[None, :, None]
        dj = rj[:, None, None] + jnp.arange(D)[None, :, None]
        H = H.at[di, ri[:, None, None] + jnp.arange(D)[None, None, :]].add(
            jnp.einsum("fri,frj->fij", Jiw, Ji))
        H = H.at[dj, rj[:, None, None] + jnp.arange(D)[None, None, :]].add(
            jnp.einsum("fri,frj->fij", Jjw, Jj))
        H = H.at[di, rj[:, None, None] + jnp.arange(D)[None, None, :]].add(
            jnp.einsum("fri,frj->fij", Jiw, Jj))
        H = H.at[dj, ri[:, None, None] + jnp.arange(D)[None, None, :]].add(
            jnp.einsum("fri,frj->fij", Jjw, Ji))
        g = g.at[ri[:, None] + jnp.arange(D)[None, :]].add(
            jnp.einsum("fri,fr->fi", Jiw, r15))
        g = g.at[rj[:, None] + jnp.arange(D)[None, :]].add(
            jnp.einsum("fri,fr->fi", Jjw, r15))

    # ---- GPS factors ----
    if problem.gps is not None:
        gf = problem.gps
        ecol = K * D  # E_T_V block offset

        def one_gps(idx):
            k = gf.kf[idx]

            def resfn(xi_p, xi_e):
                pose = lie.se3_retract(problem.poses[k], xi_p)
                E = lie.se3_retract(problem.E_T_V, xi_e)
                return _gps_residual(pose, E, gf.enu[idx], gf.t_bg)

            z = jnp.zeros(6)
            r3 = resfn(z, z)
            Jp6 = jax.jacfwd(resfn, argnums=0)(z, z)
            Je6 = jax.jacfwd(resfn, argnums=1)(z, z)
            return r3, Jp6, Je6

        r3, Jp6, Je6 = jax.vmap(one_gps)(jnp.arange(gf.kf.shape[0]))
        wg = gf.valid.astype(jnp.float32) / jnp.maximum(gf.sigma, 1e-3) ** 2
        cost = cost + jnp.sum(wg * jnp.sum(r3 * r3, axis=-1))
        Jpw6 = Jp6 * wg[:, None, None]
        Jew6 = Je6 * wg[:, None, None]
        rk = gf.kf * D
        pk = rk[:, None, None] + jnp.arange(6)[None, :, None]
        H = H.at[pk, rk[:, None, None] + jnp.arange(6)[None, None, :]].add(
            jnp.einsum("gri,grj->gij", Jpw6, Jp6))
        ecols = ecol + jnp.arange(6)
        H = H.at[pk, ecols[None, None, :]].add(
            jnp.einsum("gri,grj->gij", Jpw6, Je6))
        H = H.at[ecols[None, :, None] + jnp.zeros_like(pk),
                 rk[:, None, None] + jnp.arange(6)[None, None, :]].add(
            jnp.einsum("gri,grj->gij", Jew6, Jp6))
        H = H.at[ecols[:, None], ecols[None, :]].add(
            jnp.sum(jnp.einsum("gri,grj->gij", Jew6, Je6), axis=0))
        g = g.at[rk[:, None] + jnp.arange(6)[None, :]].add(
            jnp.einsum("gri,gr->gi", Jpw6, r3))
        g = g.at[ecols].add(jnp.sum(jnp.einsum("gri,gr->gi", Jew6, r3), axis=0))

    # ---- SE(3) between factors (loop constraints in replay) ----
    if problem.between is not None:
        fb = problem.between

        def one_between(idx):
            i, j = fb.i[idx], fb.j[idx]

            def resfn(xi_i, xi_j):
                return _between_residual(
                    fb, idx,
                    lie.se3_retract(problem.poses[i], xi_i),
                    lie.se3_retract(problem.poses[j], xi_j),
                )

            z = jnp.zeros(6)
            r6 = resfn(z, z)
            Ji = jax.jacfwd(resfn, argnums=0)(z, z)
            Jj = jax.jacfwd(resfn, argnums=1)(z, z)
            return r6, Ji, Jj

        r6, Ji6, Jj6 = jax.vmap(one_between)(jnp.arange(fb.i.shape[0]))
        wb = fb.valid.astype(jnp.float32)
        cost = cost + jnp.sum(wb * jnp.sum(r6 * r6, axis=-1))
        Jiw6 = Ji6 * wb[:, None, None]
        Jjw6 = Jj6 * wb[:, None, None]
        bi = fb.i * D
        bj = fb.j * D
        pi = bi[:, None, None] + jnp.arange(6)[None, :, None]
        pj = bj[:, None, None] + jnp.arange(6)[None, :, None]
        H = H.at[pi, bi[:, None, None] + jnp.arange(6)[None, None, :]].add(
            jnp.einsum("fri,frj->fij", Jiw6, Ji6))
        H = H.at[pj, bj[:, None, None] + jnp.arange(6)[None, None, :]].add(
            jnp.einsum("fri,frj->fij", Jjw6, Jj6))
        H = H.at[pi, bj[:, None, None] + jnp.arange(6)[None, None, :]].add(
            jnp.einsum("fri,frj->fij", Jiw6, Jj6))
        H = H.at[pj, bi[:, None, None] + jnp.arange(6)[None, None, :]].add(
            jnp.einsum("fri,frj->fij", Jjw6, Ji6))
        g = g.at[bi[:, None] + jnp.arange(6)[None, :]].add(
            jnp.einsum("fri,fr->fi", Jiw6, r6))
        g = g.at[bj[:, None] + jnp.arange(6)[None, :]].add(
            jnp.einsum("fri,fr->fi", Jjw6, r6))

    H = H + problem.prior_H
    g = g + problem.prior_b
    return H, g, Hll, gl, Wc, (r, w), cost


def _vio_cost(problem: VioProblem, huber_px: float):
    H, g, Hll, gl, Wc, (r, w) = None, None, None, None, None, (None, None)
    # cheaper: recompute residuals only
    vis_problem = ba_mod.BAProblem(
        poses=problem.poses, landmarks=problem.landmarks,
        lm_valid=problem.lm_valid, obs=problem.obs,
        cam_T_ref=problem.cam_T_body, fxycxy=problem.fxycxy,
        prior_H=jnp.zeros((problem.poses.shape[0] * 6,) * 2),
        prior_b=jnp.zeros(problem.poses.shape[0] * 6),
        kf_valid=problem.kf_valid,
    )
    rv, _, _, wv = ba_mod._residuals_and_jacobians(vis_problem, huber_px)
    cost = jnp.sum(wv * jnp.sum(rv * rv, axis=-1))
    if problem.imu is not None:
        fi = problem.imu

        def one(idx):
            si = imu_mod.ImuState(
                problem.poses[fi.i[idx]], problem.vels[fi.i[idx]],
                problem.biases[fi.i[idx]],
            )
            sj = imu_mod.ImuState(
                problem.poses[fi.j[idx]], problem.vels[fi.j[idx]],
                problem.biases[fi.j[idx]],
            )
            r = _imu_residual_whitened(fi, idx, si, sj, problem.g_norm)
            return jnp.sum(r * r) * fi.valid[idx]

        cost = cost + jnp.sum(jax.vmap(one)(jnp.arange(fi.i.shape[0])))
    if problem.gps is not None:
        gf = problem.gps

        def oneg(idx):
            r = _gps_residual(
                problem.poses[gf.kf[idx]], problem.E_T_V, gf.enu[idx], gf.t_bg
            )
            wg = gf.valid[idx] / jnp.maximum(gf.sigma[idx], 1e-3) ** 2
            return jnp.sum(r * r) * wg

        cost = cost + jnp.sum(jax.vmap(oneg)(jnp.arange(gf.kf.shape[0])))
    if problem.between is not None:
        fb = problem.between

        def oneb(idx):
            r = _between_residual(
                fb, idx, problem.poses[fb.i[idx]], problem.poses[fb.j[idx]]
            )
            return jnp.sum(r * r) * fb.valid[idx]

        cost = cost + jnp.sum(jax.vmap(oneb)(jnp.arange(fb.i.shape[0])))
    return cost


@functools.partial(
    jax.jit, static_argnames=("iters", "gate_rounds", "kf_blocked")
)
def vio_solve(
    problem: VioProblem,
    iters: int = 10,
    huber_px: float = 2.5,
    init_lambda: float = 1e-4,
    chi2_thresh: float = 5.991,
    gate_rounds: int = 2,
    kf_blocked: bool = False,
) -> VioResult:
    K = problem.poses.shape[0]
    L = problem.landmarks.shape[0]
    N = K * D + 6

    from mcslam_tpu.geometry import linalg3

    eye3 = jnp.eye(3)

    def system(state, obs_valid):
        poses, vels, biases, lms, ETV = state
        p = problem._replace(
            poses=poses, vels=vels, biases=biases, landmarks=lms,
            E_T_V=ETV, obs=problem.obs._replace(valid=obs_valid),
        )
        H, g, Hll, gl, Wc, (rv, wv), cost = _assemble_vio(
            p, huber_px, kf_blocked
        )
        cost_vis = jnp.sum(wv * jnp.sum(rv * rv, axis=-1))
        # (total, non-vision part): the gate re-weights only the vision
        # term, so the non-vision part is carried separately
        return (H, g, Hll, gl, Wc), (cost, cost - cost_vis), rv

    def solve(sys_, lam, state):
        H, g, Hll, gl, Wc = sys_
        poses, vels, biases, lms, ETV = state
        Hll_inv = linalg3.inv3(Hll + (lam + 1e-6) * eye3[None])
        WHinv = jnp.einsum("plj,ljk->plk", Wc, Hll_inv)
        S = H + lam * jnp.eye(N) - jnp.einsum("plk,qlk->pq", WHinv, Wc)
        rhs = g - jnp.einsum("plk,lk->p", WHinv, gl)
        dx = -jnp.linalg.solve(S, rhs)
        dl = -jnp.einsum("ljk,lk->lj", Hll_inv,
                         gl + jnp.einsum("plj,p->lj", Wc, dx))
        dl = dl * problem.lm_valid[:, None]
        dstate = dx[: K * D].reshape(K, D)
        return (
            lie.se3_retract(poses, dstate[:, :6]),
            vels + dstate[:, 6:9],
            biases + dstate[:, 9:15],
            lms + dl,
            lie.se3_retract(ETV, dx[K * D:]),
        )

    # Deferred accept/reject, single scan (mirrors ba.ba_solve): ONE
    # assembly per LM iteration — it doubles as the previous step's
    # acceptance check — with the chi2 vision-outlier gate fired in-scan
    # every `iters` steps from the carried residuals.
    total = iters * gate_rounds
    gate_at = iters

    def gate(rv, base_valid):
        chi2 = jnp.sum(rv * rv, axis=-1) / jnp.maximum(
            problem.obs.sigma2, 1e-6
        )
        return base_valid & (chi2 < chi2_thresh)

    state0 = (problem.poses, problem.vels, problem.biases,
              problem.landmarks, problem.E_T_V)
    obs_valid0 = problem.obs.valid
    sys0, (c0, c0_nv), r0 = system(state0, obs_valid0)

    def step(carry, idx):
        b_state, b_sys, b_cost, b_nv, b_r, lam, obs_valid = carry
        # the gate step takes no LM step: it re-linearizes the carried
        # state under the tightened mask (adopted unconditionally) and
        # resets lambda — otherwise a rejected post-gate step would
        # re-solve the stale pre-gate system forever
        do_gate = (idx % gate_at == 0) & (idx > 0)
        gated = gate(b_r, problem.obs.valid)
        obs_valid = jnp.where(do_gate, gated, obs_valid)
        t_state = solve(b_sys, lam, b_state)
        # gate step: stay at the carried state (pure re-linearization)
        t_state = jax.tree.map(
            lambda t, b: jnp.where(do_gate, b, t), t_state, b_state
        )
        sys_t, (c_t, c_nv), r_t = system(t_state, obs_valid)
        improved = c_t < b_cost
        adopt = improved | do_gate
        pick = lambda a, b: jax.tree.map(
            lambda x, y: jnp.where(adopt, x, y), a, b
        )
        b_state = pick(t_state, b_state)
        b_sys = pick(sys_t, b_sys)
        b_r = jnp.where(adopt, r_t, b_r)
        b_nv = jnp.where(adopt, c_nv, b_nv)
        b_cost = jnp.where(adopt, c_t, b_cost)
        lam = jnp.clip(
            jnp.where(
                do_gate,
                jnp.asarray(init_lambda, jnp.float32),
                jnp.where(improved, lam * 0.3, lam * 5.0),
            ),
            1e-8, 1e4,
        )
        return (b_state, b_sys, b_cost, b_nv, b_r, lam, obs_valid), c_t

    (state, fin_sys, cost, _, rv, _, obs_valid), _ = jax.lax.scan(
        step,
        (state0, sys0, c0, c0_nv, r0,
         jnp.asarray(init_lambda, jnp.float32), obs_valid0),
        jnp.arange(total),
    )
    obs_valid = gate(rv, problem.obs.valid)

    # marginal information of the pose-side states at the solution, from
    # the carried (accepted-state) system — no extra assembly pass
    H, _, Hll, _, Wc = fin_sys
    Hll_inv = linalg3.inv3(Hll + 1e-6 * eye3[None])
    WHinv = jnp.einsum("plj,ljk->plk", Wc, Hll_inv)
    S = H - jnp.einsum("plk,qlk->pq", WHinv, Wc)

    return VioResult(
        poses=state[0], vels=state[1], biases=state[2], landmarks=state[3],
        E_T_V=state[4], obs_inliers=obs_valid, cost=cost, marginal_H=S,
    )


def make_imu_factors(preints: list, pairs: list, capacity: int,
                     params: imu_mod.ImuParams = imu_mod.ImuParams()) -> ImuFactors:
    """Stack host-side Preintegrated objects into a padded factor table."""
    import numpy as np

    F = capacity
    z33 = np.zeros((F, 3, 3), np.float32)
    out = dict(
        i=np.zeros(F, np.int32), j=np.zeros(F, np.int32),
        dR=np.tile(np.eye(3, dtype=np.float32), (F, 1, 1)),
        dv=np.zeros((F, 3), np.float32), dp=np.zeros((F, 3), np.float32),
        dt=np.ones(F, np.float32) * 1e-3,
        dR_dbg=z33.copy(), dv_dbg=z33.copy(), dv_dba=z33.copy(),
        dp_dbg=z33.copy(), dp_dba=z33.copy(),
        bias_hat=np.zeros((F, 6), np.float32),
        sqrt_info=np.tile(np.eye(15, dtype=np.float32), (F, 1, 1)),
        valid=np.zeros(F, bool),
    )
    for n, (pre, (i, j)) in enumerate(zip(preints, pairs)):
        if n >= F:
            break
        info = np.asarray(imu_mod.information(pre, params))
        # sqrt via cholesky of info (upper)
        sq = np.linalg.cholesky(
            info + 1e-8 * np.eye(15)
        ).T.astype(np.float32)
        out["i"][n], out["j"][n] = i, j
        out["dR"][n] = np.asarray(pre.dR)
        out["dv"][n] = np.asarray(pre.dv)
        out["dp"][n] = np.asarray(pre.dp)
        out["dt"][n] = float(pre.dt)
        out["dR_dbg"][n] = np.asarray(pre.dR_dbg)
        out["dv_dbg"][n] = np.asarray(pre.dv_dbg)
        out["dv_dba"][n] = np.asarray(pre.dv_dba)
        out["dp_dbg"][n] = np.asarray(pre.dp_dbg)
        out["dp_dba"][n] = np.asarray(pre.dp_dba)
        out["bias_hat"][n] = np.asarray(pre.bias_hat)
        out["sqrt_info"][n] = sq
        out["valid"][n] = True
    return ImuFactors(**{k: jnp.asarray(v) for k, v in out.items()})
