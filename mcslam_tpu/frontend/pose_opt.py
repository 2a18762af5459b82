"""Motion-only pose optimization: batched Levenberg-Marquardt on SE(3) with
Huber weighting and chi-square outlier rejection rounds.

Parity (WHAT): FrontEnd::OptimizePose
(/root/reference/MCSlam/src/FrontEnd.cpp:4272-4408): GTSAM LM over
RigResectioningFactors, run in 2 rounds with chi2(5.991)-based outlier
removal between rounds.

HOW (TPU): the full 6x6 normal equations are assembled with one einsum over
all observations (jacfwd on the tangent), solved in closed form; the "outlier
removal" is a soft-to-hard mask update between rounds. Runs entirely inside
jit with static iteration counts; also vmaps over batches of pose problems
(used by the relocalization candidate verifier).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import functools

import jax
import jax.numpy as jnp

from mcslam_tpu.geometry import lie, linalg3

CHI2_2DOF = 5.991

# Unrolling the LM chains removes per-step scan bookkeeping at ~2x compile
# time; identical math either way. DEFAULT: UNROLLED. The round-4
# separate-process A/B read "equal speed" (5.02 vs 5.09) and the
# pre-registered rule picked looped for compile time — but the round-5
# PAIRED in-process A/B (scripts/ab_paired.py, docs/onchip_r05/
# ab_paired1.out) measured unrolled -0.154 ms on the fused track program
# with a tight IQR [-0.231, -0.101], i.e. the separate-process read was
# window noise. With the persistent compile cache (utils/compile_cache)
# the 2x trace cost is paid once per program shape, so speed wins.
# MCSLAM_NO_UNROLL=1 opts back into looped scans for A/B. Read at TRACE
# time so the paired harness can host both variants in one process.
def _unroll() -> bool:
    if os.environ.get("MCSLAM_NO_UNROLL") == "1":
        return False
    return os.environ.get("MCSLAM_UNROLL", "1") == "1"


# 6x6 LM solves via unrolled scalar Cholesky instead of LU. REJECTED as
# default by the round-4 chip A/B (FULL fused track prod 5.41 ms with
# chol6 vs 5.09 base, docs/onchip_r04/bisect_track_chol6.out); kept as an
# opt-in A/B vehicle.
def _chol6() -> bool:
    return os.environ.get("MCSLAM_CHOL6") == "1"


# Whole-refine Pallas kernel (pose_opt_pallas): the ENTIRE LM schedule
# in one launch, per-observation arrays VMEM-resident, pose algebra and
# the 6x6 Cholesky unrolled to scalars. Targets the latency-bound chain
# itself rather than its per-step contents (the round-4 bisection's
# ~110 us/step is mostly inter-kernel overhead). f32 reduction order
# differs from the XLA chain (lane tree vs dot-general) — within the
# calibrated accuracy equivalence class, parity-tested in
# tests/test_pose_opt_pallas.py. DEFAULT ON (TPU only; the XLA chain
# stays the CPU/test path): the round-5 paired chip A/B measured the
# fused track program 6.10 -> 3.51 ms (-2.60 ms [-2.61, -2.53],
# docs/onchip_r05/ab_paired7.out) and the three-scene hard-drive gate
# read per-scene ATE deltas +0.085/+0.001/-0.026 (median ~0) at
# identical take-rates (fastpath3.out vs fastpath2.out).
# MCSLAM_NO_PALLAS_REFINE=1 restores the XLA chain (the adoption A/B
# ran under the pre-flip opt-in name MCSLAM_PALLAS_REFINE).
def _pallas_refine() -> bool:
    if os.environ.get("MCSLAM_NO_PALLAS_REFINE") == "1":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # noqa: BLE001
        return False


# Augmented normal-equation reduction: stack [J | r] into one (M, 2, 7)
# tensor so H = J'WJ, g = J'Wr and the robust cost all come out of a
# SINGLE einsum (a (7, 2M) x (2M, 7) MXU matmul) instead of three
# separate reductions. The LM chains are latency-bound 16-step sequences
# where every fused kernel costs fixed overhead, so collapsing 3
# reductions to 1 per linearize pass is a per-step launch-count cut, not
# a FLOP cut. Same products, different f32 reduction order (within the
# calibrated equivalence class, see PERF.md). MCSLAM_NO_AUG7=1 restores
# the separate reductions for A/B; read at trace time for the paired
# harness.
def _aug7() -> bool:
    return os.environ.get("MCSLAM_NO_AUG7") != "1"


class PoseOptResult(NamedTuple):
    world_T_ref: jax.Array  # (4, 4)
    inliers: jax.Array  # (M,) bool
    num_inliers: jax.Array  # int32
    final_cost: jax.Array  # float32


def _residuals(
    xi: jax.Array,  # (6,) tangent around T0
    T0: jax.Array,  # (4, 4) world_T_ref linearization point
    X_world: jax.Array,  # (M, 3)
    uv: jax.Array,  # (M, 2)
    cam_T_ref: jax.Array,  # (M, 4, 4)
    fxycxy: jax.Array,  # (M, 4)
) -> jax.Array:
    T = lie.se3_retract(T0, xi)
    p_ref = lie.se3_apply(lie.se3_inverse(T), X_world)
    p_cam = lie.se3_apply(cam_T_ref, p_ref)
    z = jnp.maximum(p_cam[..., 2], 1e-3)
    pred = p_cam[..., :2] / z[..., None] * fxycxy[..., :2] + fxycxy[..., 2:]
    return pred - uv  # (M, 2)


def _residuals_jac(T, X_world, uv, cam_T_ref, fxycxy):
    """Residual and ANALYTIC Jacobian wrt the right-retraction tangent
    (same derivation as ba._residuals_and_jacobians: q = T^-1 X,
    dq/domega = hat(q), dq/dv = -I). Avoids jacfwd inside the LM scan."""
    rTw = lie.se3_inverse(T)
    q = lie.se3_apply(rTw, X_world)  # (M, 3)
    p = lie.se3_apply(cam_T_ref, q)
    z = jnp.maximum(p[..., 2], 1e-3)
    inv_z = 1.0 / z
    pred = p[..., :2] * inv_z[..., None] * fxycxy[..., :2] + fxycxy[..., 2:]
    r = pred - uv
    fx, fy = fxycxy[..., 0], fxycxy[..., 1]
    zero = jnp.zeros_like(fx)
    Jproj = jnp.stack(
        [
            jnp.stack([fx * inv_z, zero, -fx * p[..., 0] * inv_z * inv_z],
                      axis=-1),
            jnp.stack([zero, fy * inv_z, -fy * p[..., 1] * inv_z * inv_z],
                      axis=-1),
        ],
        axis=-2,
    )  # (M, 2, 3)
    A = jnp.einsum("mab,mbc->mac", Jproj, cam_T_ref[..., :3, :3])
    J = jnp.concatenate(
        [jnp.einsum("mab,mbc->mac", A, lie.so3_hat(q)), -A], axis=-1
    )  # (M, 2, 6)
    return r, J


@functools.partial(
    jax.jit, static_argnames=("iters", "rounds")
)
def optimize_pose(
    T_init: jax.Array,
    X_world: jax.Array,
    uv: jax.Array,
    cam_T_ref: jax.Array,
    fxycxy: jax.Array,
    mask: jax.Array,
    sigma2: jax.Array | None = None,  # (M,) per-obs variance scale (octave)
    iters: int | tuple = 8,
    rounds: int = 2,
    huber_px: float = 2.5,
    chi2_thresh: float = CHI2_2DOF,
    lm_lambda: float = 1e-3,
) -> PoseOptResult:
    """LM with `rounds` chi2 re-gating passes of `iters` iterations each.

    `iters` may be a tuple giving a PER-ROUND schedule (its length then
    overrides `rounds`), e.g. (8, 4): full depth before the first chi2
    re-gate, a shorter polish after — the post-gate round starts at the
    converged pose, so its tail iterations are usually no-op accepts on a
    latency-bound chain (each LM step is a full linearize pass)."""
    if sigma2 is None:
        sigma2 = jnp.ones(X_world.shape[0], X_world.dtype)
    inv_sig2 = 1.0 / sigma2

    if _pallas_refine() and cam_T_ref.ndim == 3:
        from mcslam_tpu.frontend import pose_opt_pallas

        sched_pl = iters if isinstance(iters, tuple) else (iters,) * rounds
        T_pl, chi2_pl = pose_opt_pallas.optimize_pose_pallas(
            T_init, X_world, uv, cam_T_ref, fxycxy, mask, inv_sig2,
            sched=sched_pl, huber_px=huber_px, chi2_thresh=chi2_thresh,
            lm_lambda=lm_lambda,
        )
        inl = mask & (chi2_pl < chi2_thresh)
        return PoseOptResult(
            world_T_ref=T_pl,
            inliers=inl,
            num_inliers=jnp.sum(inl).astype(jnp.int32),
            final_cost=jnp.sum(jnp.where(inl, chi2_pl, 0.0)),
        )

    def linearize(T, active):
        """One residual+jacobian pass -> (H0 (undamped), g, cost, r)."""
        r, J = _residuals_jac(T, X_world, uv, cam_T_ref, fxycxy)
        # robust weights: huber on the residual norm, scaled by octave
        rn = jnp.linalg.norm(r, axis=-1)
        w_huber = jnp.where(
            rn <= huber_px, 1.0, huber_px / jnp.maximum(rn, 1e-9)
        )
        w = w_huber * inv_sig2 * active.astype(T.dtype)  # (M,)
        if _aug7():
            G = jnp.concatenate([J, r[..., None]], axis=-1)  # (M, 2, 7)
            S = jnp.einsum("mri,mrj->ij", G * w[:, None, None], G)
            H0, g, cost = S[:6, :6], S[:6, 6], S[6, 6]
        else:
            Jw = J * w[:, None, None]
            H0 = jnp.einsum("mri,mrj->ij", Jw, J)
            g = jnp.einsum("mri,mr->i", Jw, r)
            cost = jnp.sum(w * jnp.sum(r * r, axis=-1))
        return H0, g, cost, r

    def lm_round(carry, n_iters):
        T, active = carry
        H0, g, c, r = linearize(T, active)

        # Deferred accept/reject: the carried system is always the
        # linearization at the BEST state so far, so the trial pass
        # doubles as the previous step's acceptance check — ONE
        # residual+jacobian pass per iteration instead of a linearize
        # plus a residual-only acceptance pass (the 16-step chain is
        # latency-bound on TPU; same trajectory as the classic loop:
        # on rejection the carried state/system are unchanged and only
        # lambda grows).
        def lm_step(carry, _):
            T_b, H_b, g_b, c_b, r_b, lam = carry
            # 6x6 solve: linalg3.chol_solve6 (unrolled scalar Cholesky,
            # no pivoting loops) is staged as the latency replacement but
            # stays OFF until the on-chip bisection proves it — swapping
            # the solver reshuffles f32 rounding and the suite's mono
            # canary is chaotically sensitive to that (see PERF.md).
            # MCSLAM_CHOL6=1 flips it on for the push-button chip A/B.
            H_lm = H_b + lam * jnp.eye(6, dtype=T_b.dtype)
            if _chol6():
                dx = -linalg3.chol_solve6(H_lm, g_b)
            else:
                dx = -jnp.linalg.solve(H_lm, g_b)
            T_t = lie.se3_retract(T_b, dx)
            H_t, g_t, c_t, r_t = linearize(T_t, active)
            improved = c_t < c_b
            pick = lambda a, b: jnp.where(improved, a, b)
            carry = (
                pick(T_t, T_b), pick(H_t, H_b), pick(g_t, g_b),
                pick(c_t, c_b), pick(r_t, r_b),
                jnp.where(improved, lam * 0.5, lam * 4.0),
            )
            return carry, None

        # unroll: the step body is small (one M-point linearize + a 6x6
        # solve), so the scan's per-step loop overhead is a real fraction
        # of the latency-bound 16-step chain; unrolling keeps identical
        # math while letting XLA schedule across steps
        (T, _, _, _, r, _), _ = jax.lax.scan(
            lm_step, (T, H0, g, c, r, jnp.asarray(lm_lambda, T.dtype)),
            None, length=n_iters, unroll=_unroll(),
        )
        # chi2 re-gate for the next round from the carried residuals
        chi2 = jnp.sum(r * r, axis=-1) * inv_sig2
        active = mask & (chi2 < chi2_thresh)
        return (T, active), None

    sched = iters if isinstance(iters, tuple) else (iters,) * rounds
    if _unroll() or len(set(sched)) > 1:
        carry = (T_init, mask)
        for n in sched:
            carry, _ = lm_round(carry, n)
        T, active = carry
    else:
        (T, active), _ = jax.lax.scan(
            lambda c, _: lm_round(c, sched[0]), (T_init, mask), None,
            length=len(sched),
        )
    r = _residuals(jnp.zeros(6, T.dtype), T, X_world, uv, cam_T_ref, fxycxy)
    chi2 = jnp.sum(r * r, axis=-1) * inv_sig2
    inliers = mask & (chi2 < chi2_thresh)
    cost = jnp.sum(jnp.where(inliers, chi2, 0.0))
    return PoseOptResult(
        world_T_ref=T,
        inliers=inliers,
        num_inliers=jnp.sum(inliers).astype(jnp.int32),
        final_cost=cost,
    )
