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
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(), P(), P(), P(),  # poses, landmarks, lm_valid, kf_valid
            P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS),  # obs fields
            P(), P(), P(), P(),  # cam_T_ref, fxycxy, prior_H, prior_b
        ),
        out_specs=(P(), P()),
        check_vma=False,
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
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(), P(), P(), P(),  # poses, landmarks, lm_valid, kf_valid
            P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS),  # obs
            P(), P(), P(), P(),  # cam_T_ref, fxycxy, prior_H, prior_b
        ),
        out_specs=(P(), P(), P(AXIS), P(), P()),
        check_vma=False,
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

        # single scan with the chi2 gate applied IN-SCAN every `iters`
        # steps from the carried residuals (mirrors ba_mod.ba_solve):
        # one linearization + ONE psum round per iteration, plus one
        # extra scalar psum at gate boundaries for the re-weighted cost
        def gate(r, base_valid):
            chi2 = jnp.sum(r * r, axis=-1) / jnp.maximum(o_sig2, 1e-6)
            return base_valid & (chi2 < chi2_thresh)


        total = iters * gate_rounds
        sys0, c0, r0 = local_system(poses, landmarks, o_valid)

        def step(carry, idx):
            b_poses, b_lms, b_sys, b_cost, b_r, lam, obs_valid = carry
            # the gate step takes no LM step: it re-linearizes the carried
            # state under the tightened mask (adopted unconditionally) and
            # resets lambda (see ba_mod.ba_solve)
            do_gate = (idx % iters == 0) & (idx > 0)
            gated = gate(b_r, o_valid)
            obs_valid = jnp.where(do_gate, gated, obs_valid)
            step_scale = jnp.where(do_gate, 0.0, 1.0)
            dp, dl = ba_mod._schur_solve(*b_sys, lam, lm_valid)
            t_poses = lie.se3_retract(
                b_poses, step_scale * dp.reshape(K, 6)
            )
            t_lms = b_lms + step_scale * dl
            sys_t, c_t, r_t = local_system(t_poses, t_lms, obs_valid)
            improved = c_t < b_cost
            adopt = improved | do_gate
            pick = lambda a, b: jax.tree.map(
                lambda x, y: jnp.where(adopt, x, y), a, b
            )
            b_poses = jnp.where(adopt, t_poses, b_poses)
            b_lms = jnp.where(adopt, t_lms, b_lms)
            b_sys = pick(sys_t, b_sys)
            b_r = jnp.where(adopt, r_t, b_r)
            b_cost = jnp.where(adopt, c_t, b_cost)
            lam = jnp.clip(
                jnp.where(
                    do_gate,
                    jnp.asarray(init_lambda, jnp.float32),
                    jnp.where(improved, lam * 0.3, lam * 5.0),
                ),
                1e-8, 1e4,
            )
            return (b_poses, b_lms, b_sys, b_cost, b_r, lam, obs_valid), c_t

        (poses, landmarks, _, cost, r, _, obs_valid), _ = jax.lax.scan(
            step,
            (poses, landmarks, sys0, c0, r0,
             jnp.asarray(init_lambda, jnp.float32), o_valid),
            jnp.arange(total),
        )
        obs_valid = gate(r, o_valid)

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


def shard_by_landmark(obs: ba_mod.BAObservations, L: int, n_dev: int,
                      pad_multiple: int = 256):
    """Regroup an observation table by landmark shard for the
    landmark-sharded solver: device d owns landmark slots
    [d*Ls, (d+1)*Ls) and every observation of those slots.

    Returns a new BAObservations (numpy-ordered, per-device groups padded
    to equal size; total length divisible by n_dev) whose rows are
    contiguous per device. Host-side prep: runs once per solve.
    """
    import numpy as np

    Ls = L // n_dev
    lm = np.asarray(obs.lm)
    valid = np.asarray(obs.valid)
    dev = np.clip(lm // Ls, 0, n_dev - 1)
    groups = [np.nonzero((dev == d) & valid)[0] for d in range(n_dev)]
    per = max(max((len(g) for g in groups), default=1), 1)
    per = -(-per // pad_multiple) * pad_multiple
    n = per * n_dev
    idx = np.zeros(n, np.int64)
    out_valid = np.zeros(n, bool)
    for d, g in enumerate(groups):
        idx[d * per : d * per + len(g)] = g
        out_valid[d * per : d * per + len(g)] = True
    take = lambda a: jnp.asarray(np.asarray(a)[idx])
    return ba_mod.BAObservations(
        kf=take(obs.kf), cam=take(obs.cam), lm=take(obs.lm),
        uv=take(obs.uv), sigma2=take(obs.sigma2),
        valid=jnp.asarray(out_valid),
    )


def sharded_ba_solve_lm(
    mesh: Mesh,
    poses: jax.Array,  # (K, 4, 4) replicated
    landmarks: jax.Array,  # (L, 3) sharded on axis 0 (L divisible by mesh)
    lm_valid: jax.Array,  # (L,) sharded
    kf_valid: jax.Array,  # (K,) replicated
    obs: ba_mod.BAObservations,  # grouped by landmark shard (shard_by_landmark)
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
    """LANDMARK-sharded window BA: the map (and its observations) are
    partitioned across devices; landmark elimination is embarrassingly
    parallel, so each device inverts only ITS Hll blocks and updates ITS
    landmarks with zero communication. The only collectives are the
    pose-side reductions — Hpp/gp and the (K*6, K*6) Schur contribution
    W Hll^-1 W^T — a few tens of KB per LM iteration regardless of map
    size (the obs-sharded variant psums the full (K*6, L, 3) W each
    iteration). This is the scaling path for very large maps.

    Same solver semantics as ba_mod.ba_solve (deferred accept/reject +
    chi2 gate rounds). Returns (poses [replicated], landmarks [sharded],
    obs_inliers [sharded], cost, num_inliers).
    """
    K = poses.shape[0]
    n_dev = mesh.devices.size

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(), P(AXIS), P(AXIS), P(),  # poses, landmarks, lm_valid, kf_valid
            P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS),  # obs
            P(), P(), P(), P(),
        ),
        out_specs=(P(), P(AXIS), P(AXIS), P(), P()),
        check_vma=False,
    )
    def solve(poses, lms_loc, lmv_loc, kf_valid,
              o_kf, o_cam, o_lm, o_uv, o_sig2, o_valid,
              cam_T_ref, fxycxy, prior_H, prior_b):
        Ls = lms_loc.shape[0]
        d = jax.lax.axis_index(AXIS)
        lm_local = o_lm - d * Ls  # global -> local slot ids
        lm_local = jnp.clip(lm_local, 0, Ls - 1)

        def local_system(poses, lms, obs_valid):
            obs_local = ba_mod.BAObservations(
                kf=o_kf, cam=o_cam, lm=lm_local, uv=o_uv, sigma2=o_sig2,
                valid=obs_valid,
            )
            problem = ba_mod.BAProblem(
                poses=poses, landmarks=lms, lm_valid=lmv_loc,
                obs=obs_local, cam_T_ref=cam_T_ref, fxycxy=fxycxy,
                prior_H=jnp.zeros_like(prior_H),
                prior_b=jnp.zeros_like(prior_b), kf_valid=kf_valid,
            )
            r, Jp, Jl, w = ba_mod._residuals_and_jacobians(problem, huber_px)
            Hpp, gp, Hll, gl, Wc = ba_mod._assemble(problem, r, Jp, Jl, w)
            # pose side is global: reduce it; landmark side stays local
            cost = jax.lax.psum(jnp.sum(w * jnp.sum(r * r, axis=-1)), AXIS)
            Hpp = jax.lax.psum(Hpp, AXIS) + prior_H
            gp = jax.lax.psum(gp, AXIS) + prior_b
            return (Hpp, gp, Hll, gl, Wc), cost, r

        from mcslam_tpu.geometry import linalg3

        def schur_local(sys_, lam):
            Hpp, gp, Hll, gl, Wc = sys_
            K6 = Hpp.shape[0]
            eye3 = jnp.eye(3, dtype=Hpp.dtype)
            Hll_inv = linalg3.inv3(Hll + (lam + 1e-6) * eye3[None])
            Wm = Wc.reshape(K6, -1, 3)
            WHinv = jnp.einsum("plj,ljk->plk", Wm, Hll_inv)
            # the ONLY landmark-size-independent collectives of the solve:
            S_part = jnp.einsum("plk,qlk->pq", WHinv, Wm)
            rhs_part = jnp.einsum("plk,lk->p", WHinv, gl)
            S = Hpp + lam * jnp.eye(K6, dtype=Hpp.dtype) - jax.lax.psum(
                S_part, AXIS
            )
            rhs = gp - jax.lax.psum(rhs_part, AXIS)
            dp = -jnp.linalg.solve(S, rhs)
            dl = -jnp.einsum(
                "ljk,lk->lj", Hll_inv,
                gl + jnp.einsum("plj,p->lj", Wm, dp),
            )
            dl = dl * lmv_loc[:, None]
            return dp, dl

        # single scan with the in-scan chi2 gate (mirrors ba_mod.ba_solve)
        def gate(r, base_valid):
            chi2 = jnp.sum(r * r, axis=-1) / jnp.maximum(o_sig2, 1e-6)
            return base_valid & (chi2 < chi2_thresh)


        total = iters * gate_rounds
        sys0, c0, r0 = local_system(poses, lms_loc, o_valid)

        def step(carry, idx):
            b_poses, b_lms, b_sys, b_cost, b_r, lam, obs_valid = carry
            # the gate step takes no LM step: it re-linearizes the carried
            # state under the tightened mask (adopted unconditionally) and
            # resets lambda (see ba_mod.ba_solve)
            do_gate = (idx % iters == 0) & (idx > 0)
            gated = gate(b_r, o_valid)
            obs_valid = jnp.where(do_gate, gated, obs_valid)
            step_scale = jnp.where(do_gate, 0.0, 1.0)
            dp, dl = schur_local(b_sys, lam)
            t_poses = lie.se3_retract(
                b_poses, step_scale * dp.reshape(K, 6)
            )
            t_lms = b_lms + step_scale * dl
            sys_t, c_t, r_t = local_system(t_poses, t_lms, obs_valid)
            improved = c_t < b_cost
            adopt = improved | do_gate
            pick = lambda a, b: jax.tree.map(
                lambda x, y: jnp.where(adopt, x, y), a, b
            )
            b_poses = jnp.where(adopt, t_poses, b_poses)
            b_lms = jnp.where(adopt, t_lms, b_lms)
            b_sys = pick(sys_t, b_sys)
            b_r = jnp.where(adopt, r_t, b_r)
            b_cost = jnp.where(adopt, c_t, b_cost)
            lam = jnp.clip(
                jnp.where(
                    do_gate,
                    jnp.asarray(init_lambda, jnp.float32),
                    jnp.where(improved, lam * 0.3, lam * 5.0),
                ),
                1e-8, 1e4,
            )
            return (b_poses, b_lms, b_sys, b_cost, b_r, lam, obs_valid), c_t

        (poses, lms_loc, _, cost, r, _, obs_valid), _ = jax.lax.scan(
            step,
            (poses, lms_loc, sys0, c0, r0,
             jnp.asarray(init_lambda, jnp.float32), o_valid),
            jnp.arange(total),
        )
        obs_valid = gate(r, o_valid)

        num_inliers = jax.lax.psum(
            jnp.sum(obs_valid).astype(jnp.int32), AXIS
        )
        return poses, lms_loc, obs_valid, cost, num_inliers

    return solve(
        poses, landmarks, lm_valid, kf_valid,
        obs.kf, obs.cam, obs.lm, obs.uv, obs.sigma2, obs.valid,
        cam_T_ref, fxycxy, prior_H, prior_b,
    )
