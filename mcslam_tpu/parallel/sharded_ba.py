"""Multi-chip sharded bundle adjustment via shard_map over a device mesh.

The reference has no multi-device story at all (single-process CPU,
SURVEY.md §2.5); this module is the TPU-native scaling path for large
keyframe windows / maps: observations are sharded across the `obs` mesh
axis (data parallelism over reprojection factors), each device assembles
partial normal equations for its observation shard, and the pose-side
system + landmark blocks are combined with `psum` over ICI. The dense
Schur solve is tiny (K*6 square) and runs replicated on every device.

Collectives: one psum per LM iteration over (Hpp, gp, Hll, gl, W) — a
fixed ~1-2 MB payload that rides ICI, no host round-trips inside the loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mcslam_tpu.backend import ba as ba_mod
from mcslam_tpu.geometry import lie

AXIS = "obs"


def make_mesh(n_devices: int | None = None, platform: str | None = None) -> Mesh:
    devs = jax.devices(platform) if platform else jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise ValueError(
            f"mesh needs {n} devices, platform has {len(devs)}"
        )
    return Mesh(devs[:n], axis_names=(AXIS,))


def _local_normal_eqs(poses, landmarks, lm_valid, kf_valid, obs, cam_T_ref,
                      fxycxy, huber_px):
    """Partial (Hpp, gp, Hll, gl, W) from this device's observation shard."""
    problem = ba_mod.BAProblem(
        poses=poses, landmarks=landmarks, lm_valid=lm_valid, obs=obs,
        cam_T_ref=cam_T_ref, fxycxy=fxycxy,
        prior_H=jnp.zeros((poses.shape[0] * 6, poses.shape[0] * 6), jnp.float32),
        prior_b=jnp.zeros(poses.shape[0] * 6, jnp.float32),
        kf_valid=kf_valid,
    )
    r, Jp, Jl, w = ba_mod._residuals_and_jacobians(problem, huber_px)
    return ba_mod._assemble(problem, r, Jp, Jl, w)


def sharded_lm_step(
    mesh: Mesh,
    poses: jax.Array,  # (K, 4, 4) replicated
    landmarks: jax.Array,  # (L, 3) replicated
    lm_valid: jax.Array,  # (L,)
    kf_valid: jax.Array,  # (K,)
    obs: ba_mod.BAObservations,  # arrays sharded on axis 0 across mesh
    cam_T_ref: jax.Array,
    fxycxy: jax.Array,
    prior_H: jax.Array,
    prior_b: jax.Array,
    lam: float = 1e-3,
    huber_px: float = 2.5,
):
    """One damped Schur LM step with observation-sharded assembly.

    Returns (new_poses, new_landmarks) replicated on every device.
    """
    K = poses.shape[0]

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(), P(), P(), P(),  # poses, landmarks, lm_valid, kf_valid
            P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS),  # obs fields
            P(), P(), P(), P(),  # cam_T_ref, fxycxy, prior_H, prior_b
        ),
        out_specs=(P(), P()),
        check_rep=False,
    )
    def step(poses, landmarks, lm_valid, kf_valid,
             o_kf, o_cam, o_lm, o_uv, o_sig2, o_valid,
             cam_T_ref, fxycxy, prior_H, prior_b):
        obs_local = ba_mod.BAObservations(
            kf=o_kf, cam=o_cam, lm=o_lm, uv=o_uv, sigma2=o_sig2, valid=o_valid
        )
        Hpp, gp, Hll, gl, Wc = _local_normal_eqs(
            poses, landmarks, lm_valid, kf_valid, obs_local, cam_T_ref,
            fxycxy, huber_px,
        )
        # ICI allreduce of the partial normal equations
        Hpp = jax.lax.psum(Hpp, AXIS) + prior_H
        gp = jax.lax.psum(gp, AXIS) + prior_b
        Hll = jax.lax.psum(Hll, AXIS)
        gl = jax.lax.psum(gl, AXIS)
        Wc = jax.lax.psum(Wc, AXIS)
        dp, dl = ba_mod._schur_solve(
            Hpp, gp, Hll, gl, Wc, jnp.asarray(lam, jnp.float32), lm_valid
        )
        new_poses = lie.se3_retract(poses, dp.reshape(K, 6))
        new_lms = landmarks + dl
        return new_poses, new_lms

    return step(
        poses, landmarks, lm_valid, kf_valid,
        obs.kf, obs.cam, obs.lm, obs.uv, obs.sigma2, obs.valid,
        cam_T_ref, fxycxy, prior_H, prior_b,
    )


def sharded_ba_solve(
    mesh: Mesh,
    poses: jax.Array,  # (K, 4, 4) replicated
    landmarks: jax.Array,  # (L, 3) replicated
    lm_valid: jax.Array,  # (L,)
    kf_valid: jax.Array,  # (K,)
    obs: ba_mod.BAObservations,  # arrays sharded on axis 0 across mesh
    cam_T_ref: jax.Array,
    fxycxy: jax.Array,
    prior_H: jax.Array,
    prior_b: jax.Array,
    iters: int = 10,
    huber_px: float = 2.5,
    init_lambda: float = 1e-4,
    chi2_thresh: float = 5.991,
    gate_rounds: int = 2,
):
    """Full sharded LM solve with the same semantics as `ba_mod.ba_solve`:
    accept/reject damping per iteration and hard chi2 outlier removal
    between `gate_rounds` passes (reference removes chi2(5.991) outlier
    factors between optimization rounds, FrontEnd.cpp:4272-4408).

    The whole solve — scan over LM iterations, gate rounds, cost
    accept/reject — runs inside ONE shard_map: each device assembles the
    normal equations for its observation shard, psums them over ICI, and
    solves the tiny replicated Schur system locally. Costs are psum-reduced
    scalars, so accept/reject decisions are identical on every device.

    Returns (poses, landmarks, obs_inliers [sharded], cost, num_inliers) —
    matching `ba_mod.BAResult` field order.
    """
    K = poses.shape[0]

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(), P(), P(), P(),  # poses, landmarks, lm_valid, kf_valid
            P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS),  # obs
            P(), P(), P(), P(),  # cam_T_ref, fxycxy, prior_H, prior_b
        ),
        out_specs=(P(), P(), P(AXIS), P(), P()),
        check_rep=False,
    )
    def solve(poses, landmarks, lm_valid, kf_valid,
              o_kf, o_cam, o_lm, o_uv, o_sig2, o_valid,
              cam_T_ref, fxycxy, prior_H, prior_b):
        def local_system(poses, lms, obs_valid):
            obs_local = ba_mod.BAObservations(
                kf=o_kf, cam=o_cam, lm=o_lm, uv=o_uv, sigma2=o_sig2,
                valid=obs_valid,
            )
            problem = ba_mod.BAProblem(
                poses=poses, landmarks=lms, lm_valid=lm_valid,
                obs=obs_local, cam_T_ref=cam_T_ref, fxycxy=fxycxy,
                prior_H=jnp.zeros_like(prior_H),
                prior_b=jnp.zeros_like(prior_b), kf_valid=kf_valid,
            )
            r, Jp, Jl, w = ba_mod._residuals_and_jacobians(problem, huber_px)
            Hpp, gp, Hll, gl, Wc = ba_mod._assemble(problem, r, Jp, Jl, w)
            cost = jax.lax.psum(jnp.sum(w * jnp.sum(r * r, axis=-1)), AXIS)
            Hpp = jax.lax.psum(Hpp, AXIS) + prior_H
            gp = jax.lax.psum(gp, AXIS) + prior_b
            Hll = jax.lax.psum(Hll, AXIS)
            gl = jax.lax.psum(gl, AXIS)
            Wc = jax.lax.psum(Wc, AXIS)
            return (Hpp, gp, Hll, gl, Wc), cost, r

        def lm_pass(poses, lms, obs_valid):
            # deferred accept/reject (mirrors ba_mod.ba_solve): one
            # linearization + ONE psum round per iteration; a rejected
            # step re-solves the carried (already reduced) system
            sys0, c0, r0 = local_system(poses, lms, obs_valid)

            def step(carry, _):
                b_poses, b_lms, b_sys, b_cost, b_r, lam = carry
                dp, dl = ba_mod._schur_solve(*b_sys, lam, lm_valid)
                t_poses = lie.se3_retract(b_poses, dp.reshape(K, 6))
                t_lms = b_lms + dl
                sys_t, c_t, r_t = local_system(t_poses, t_lms, obs_valid)
                improved = c_t < b_cost
                pick = lambda a, b: jax.tree.map(
                    lambda x, y: jnp.where(improved, x, y), a, b
                )
                b_poses = jnp.where(improved, t_poses, b_poses)
                b_lms = jnp.where(improved, t_lms, b_lms)
                b_sys = pick(sys_t, b_sys)
                b_r = jnp.where(improved, r_t, b_r)
                b_cost = jnp.minimum(c_t, b_cost)
                lam = jnp.clip(
                    jnp.where(improved, lam * 0.3, lam * 5.0), 1e-8, 1e4
                )
                return (b_poses, b_lms, b_sys, b_cost, b_r, lam), c_t

            (poses, lms, _, cost, r, _), _ = jax.lax.scan(
                step,
                (poses, lms, sys0, c0, r0,
                 jnp.asarray(init_lambda, jnp.float32)),
                None, length=iters,
            )
            return poses, lms, cost, r

        obs_valid = o_valid
        cost = jnp.asarray(0.0, jnp.float32)
        for _ in range(gate_rounds):
            poses, landmarks, cost, r = lm_pass(poses, landmarks, obs_valid)
            chi2 = jnp.sum(r * r, axis=-1) / jnp.maximum(o_sig2, 1e-6)
            obs_valid = obs_valid & (chi2 < chi2_thresh)

        num_inliers = jax.lax.psum(
            jnp.sum(obs_valid).astype(jnp.int32), AXIS
        )
        return poses, landmarks, obs_valid, cost, num_inliers

    return solve(
        poses, landmarks, lm_valid, kf_valid,
        obs.kf, obs.cam, obs.lm, obs.uv, obs.sigma2, obs.valid,
        cam_T_ref, fxycxy, prior_H, prior_b,
    )


def shard_observations(mesh: Mesh, obs: ba_mod.BAObservations):
    """Place each obs array with its leading axis sharded over the mesh."""
    sh = NamedSharding(mesh, P(AXIS))
    return ba_mod.BAObservations(
        kf=jax.device_put(obs.kf, sh),
        cam=jax.device_put(obs.cam, sh),
        lm=jax.device_put(obs.lm, sh),
        uv=jax.device_put(obs.uv, sh),
        sigma2=jax.device_put(obs.sigma2, sh),
        valid=jax.device_put(obs.valid, sh),
    )
