"""Analytic-vs-numerical Jacobian checks (mirrors the reference's
unitnewGPSFactor.cpp pattern of validating every hand-written Jacobian
against numericalDerivative)."""

import jax
import jax.numpy as jnp
import numpy as np

from mcslam_tpu.backend import ba
from mcslam_tpu.geometry import lie


def test_ba_observation_jacobians_match_jacfwd():
    rng = np.random.RandomState(0)
    K, L, C, O = 2, 5, 2, 12
    poses = jnp.asarray(
        np.stack([
            np.asarray(lie.se3_exp(jnp.asarray(rng.randn(6) * 0.3, jnp.float32)))
            for _ in range(K)
        ])
    )
    lms = jnp.asarray((rng.uniform(-2, 2, (L, 3)) + [0, 0, 7]).astype(np.float32))
    cam_T_ref = jnp.asarray(
        np.stack([np.eye(4, dtype=np.float32) for _ in range(C)])
    ).at[1, 0, 3].set(-0.2)
    fxycxy = jnp.tile(jnp.asarray([[350.0, 360.0, 320.0, 240.0]]), (C, 1))
    obs = ba.BAObservations(
        kf=jnp.asarray(rng.randint(0, K, O), jnp.int32),
        cam=jnp.asarray(rng.randint(0, C, O), jnp.int32),
        lm=jnp.asarray(rng.randint(0, L, O), jnp.int32),
        uv=jnp.asarray(rng.uniform(100, 500, (O, 2)).astype(np.float32)),
        sigma2=jnp.ones(O, jnp.float32),
        valid=jnp.ones(O, bool),
    )
    problem = ba.BAProblem(
        poses=poses, landmarks=lms, lm_valid=jnp.ones(L, bool), obs=obs,
        cam_T_ref=cam_T_ref, fxycxy=fxycxy,
        prior_H=jnp.zeros((K * 6, K * 6)), prior_b=jnp.zeros(K * 6),
        kf_valid=jnp.ones(K, bool),
    )
    r, Jp, Jl, w = ba._residuals_and_jacobians(problem, huber_px=1e9)

    # reference jacobians via jacfwd on the exact residual definition
    def res_o(o, xi, dX):
        T = lie.se3_retract(poses[obs.kf[o]], xi)
        X = lms[obs.lm[o]] + dX
        p_ref = lie.se3_apply(lie.se3_inverse(T), X)
        p_cam = lie.se3_apply(cam_T_ref[obs.cam[o]], p_ref)
        z = jnp.maximum(p_cam[2], 1e-3)
        pred = p_cam[:2] / z * fxycxy[obs.cam[o], :2] + fxycxy[obs.cam[o], 2:]
        return pred - obs.uv[o]

    for o in range(O):
        r_ref = res_o(o, jnp.zeros(6), jnp.zeros(3))
        Jp_ref = jax.jacfwd(lambda xi: res_o(o, xi, jnp.zeros(3)))(jnp.zeros(6))
        Jl_ref = jax.jacfwd(lambda dX: res_o(o, jnp.zeros(6), dX))(jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(r[o]), np.asarray(r_ref),
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(Jp[o]), np.asarray(Jp_ref),
                                   rtol=1e-3, atol=0.05)
        np.testing.assert_allclose(np.asarray(Jl[o]), np.asarray(Jl_ref),
                                   rtol=1e-3, atol=0.05)


def test_triangulation_refine_analytic_converges():
    from mcslam_tpu.geometry import triangulation

    rng = np.random.RandomState(1)
    R = 4
    X_true = jnp.asarray([0.5, -0.3, 6.0])
    wTc = jnp.stack([jnp.eye(4)] * R).at[1, 0, 3].set(0.4).at[2, 0, 3].set(
        0.8).at[3, 1, 3].set(0.4)
    f = jnp.tile(jnp.asarray([[300.0, 300.0, 320.0, 240.0]]), (R, 1))
    cTw = jnp.stack([jnp.linalg.inv(wTc[i]) for i in range(R)])
    p = jax.vmap(lambda T: T[:3, :3] @ X_true + T[:3, 3])(cTw)
    uv = p[:, :2] / p[:, 2:] * f[:, :2] + f[:, 2:]
    X0 = X_true + jnp.asarray([0.3, -0.2, 0.8])
    X = triangulation.refine_points_gn(
        X0[None], wTc[None], uv[None], f[None], jnp.ones((1, R), bool),
        iters=10,
    )
    np.testing.assert_allclose(np.asarray(X[0]), np.asarray(X_true), atol=1e-3)
