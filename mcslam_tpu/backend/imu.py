"""On-manifold IMU preintegration (Forster et al. / CombinedImuFactor math).

Parity (WHAT): GTSAM PreintegratedCombinedMeasurements usage in the reference
(FrontEnd::imu_preintegration, /root/reference/MCSlam/src/FrontEnd.cpp:8016;
Backend::addIMUFactor, Backend.cpp:2743) — delta rotation/velocity/position
with first-order bias Jacobians and 9x9 covariance propagation, integrated
between keyframes and turned into a 15-dof factor (9 preintegration + 6 bias
random walk).

HOW (TPU): samples are padded fixed-length arrays integrated with one
lax.scan (masked), so a whole window of inter-keyframe preintegrations can be
computed as a batch with vmap. All math float32 with the grad-safe Lie ops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mcslam_tpu.geometry import lie

GRAVITY = 9.81


class ImuParams(NamedTuple):
    accel_noise: float = 0.01  # sigma [m/s^2/sqrt(Hz)] discrete-equivalent
    gyro_noise: float = 0.001  # sigma [rad/s/sqrt(Hz)]
    accel_walk: float = 1e-4
    gyro_walk: float = 1e-5
    g_norm: float = GRAVITY
    integration_sigma: float = 1e-4


class Preintegrated(NamedTuple):
    dR: jax.Array  # (3, 3)
    dv: jax.Array  # (3,)
    dp: jax.Array  # (3,)
    dt: jax.Array  # () total time
    # first-order bias Jacobians
    dR_dbg: jax.Array  # (3, 3)
    dv_dbg: jax.Array  # (3, 3)
    dv_dba: jax.Array  # (3, 3)
    dp_dbg: jax.Array  # (3, 3)
    dp_dba: jax.Array  # (3, 3)
    cov: jax.Array  # (9, 9) [theta, v, p] covariance
    bias_hat: jax.Array  # (6,) [bg, ba] used for integration
    n_samples: jax.Array  # () int32


class ImuState(NamedTuple):
    """Navigation state of one keyframe."""

    world_T_body: jax.Array  # (4, 4)
    vel: jax.Array  # (3,) world-frame velocity
    bias: jax.Array  # (6,) [bg, ba]


def preintegrate(
    dts: jax.Array,  # (S,) sample intervals
    gyro: jax.Array,  # (S, 3)
    accel: jax.Array,  # (S, 3)
    mask: jax.Array,  # (S,) bool valid samples
    bias_hat: jax.Array,  # (6,) [bg, ba]
    params: ImuParams = ImuParams(),
) -> Preintegrated:
    bg, ba = bias_hat[:3], bias_hat[3:]
    sg2 = params.gyro_noise**2
    sa2 = params.accel_noise**2
    si2 = params.integration_sigma**2

    def step(carry, inp):
        dR, dv, dp, t, dRdbg, dvdbg, dvdba, dpdbg, dpdba, cov = carry
        dt, w, a, m = inp
        dt = jnp.where(m, dt, 0.0)
        wd = (w - bg) * dt
        ad = a - ba
        dR_inc = lie.so3_exp(wd)
        Jr = lie.so3_left_jacobian(-wd)  # right Jacobian of wd
        Ra = dR @ ad  # rotated accel (pre-update dR)
        # bias jacobians (Forster eqns)
        ax = lie.so3_hat(ad)
        new_dpdbg = dpdbg + dvdbg * dt - 0.5 * (dR @ ax @ dRdbg) * dt * dt
        new_dpdba = dpdba + dvdba * dt - 0.5 * dR * dt * dt
        new_dvdbg = dvdbg - (dR @ ax @ dRdbg) * dt
        new_dvdba = dvdba - dR * dt
        new_dRdbg = dR_inc.T @ dRdbg - Jr * dt
        # covariance propagation: state [dtheta, dv, dp]
        A = jnp.eye(9)
        A = A.at[0:3, 0:3].set(dR_inc.T)
        A = A.at[3:6, 0:3].set(-dR @ ax * dt)
        A = A.at[6:9, 0:3].set(-0.5 * dR @ ax * dt * dt)
        A = A.at[6:9, 3:6].set(jnp.eye(3) * dt)
        B = jnp.zeros((9, 6))
        B = B.at[0:3, 0:3].set(Jr * dt)
        B = B.at[3:6, 3:6].set(dR * dt)
        B = B.at[6:9, 3:6].set(0.5 * dR * dt * dt)
        Q = jnp.diag(
            jnp.concatenate(
                [jnp.full(3, sg2 / jnp.maximum(dt, 1e-6)),
                 jnp.full(3, sa2 / jnp.maximum(dt, 1e-6))]
            )
        )
        new_cov = A @ cov @ A.T + B @ Q @ B.T + si2 * jnp.eye(9) * dt
        # deltas
        new_dp = dp + dv * dt + 0.5 * Ra * dt * dt
        new_dv = dv + Ra * dt
        new_dR = dR @ dR_inc
        new_t = t + dt
        out = (
            new_dR, new_dv, new_dp, new_t, new_dRdbg, new_dvdbg, new_dvdba,
            new_dpdbg, new_dpdba, new_cov,
        )
        # masked samples: identity update
        keep = lambda new, old: jnp.where(m, new, old)
        out = tuple(keep(n, o) for n, o in zip(out, carry))
        return out, None

    eye = jnp.eye(3, dtype=jnp.float32)
    zero3 = jnp.zeros((3, 3), jnp.float32)
    init = (
        eye, jnp.zeros(3), jnp.zeros(3), jnp.asarray(0.0, jnp.float32),
        eye * 0 + zero3, zero3, zero3, zero3, zero3,
        jnp.zeros((9, 9), jnp.float32),
    )
    (dR, dv, dp, t, dRdbg, dvdbg, dvdba, dpdbg, dpdba, cov), _ = jax.lax.scan(
        step, init, (dts.astype(jnp.float32), gyro.astype(jnp.float32),
                     accel.astype(jnp.float32), mask)
    )
    return Preintegrated(
        dR=dR, dv=dv, dp=dp, dt=t,
        dR_dbg=dRdbg, dv_dbg=dvdbg, dv_dba=dvdba, dp_dbg=dpdbg, dp_dba=dpdba,
        cov=cov, bias_hat=bias_hat,
        n_samples=jnp.sum(mask).astype(jnp.int32),
    )


def gravity_vec(params: ImuParams = ImuParams()) -> jax.Array:
    return jnp.array([0.0, 0.0, -params.g_norm], jnp.float32)


def predict(state: ImuState, pre: Preintegrated,
            params: ImuParams = ImuParams()) -> ImuState:
    """Dead-reckon state_j from state_i using the preintegrated deltas
    (bias-corrected to first order). Parity: imu_integrator->predict used in
    fast tracking (FrontEnd.cpp:1570+)."""
    db = state.bias - pre.bias_hat
    dbg, dba = db[:3], db[3:]
    dR = pre.dR @ lie.so3_exp(pre.dR_dbg @ dbg)
    dv = pre.dv + pre.dv_dbg @ dbg + pre.dv_dba @ dba
    dp = pre.dp + pre.dp_dbg @ dbg + pre.dp_dba @ dba
    R_i = state.world_T_body[:3, :3]
    p_i = state.world_T_body[:3, 3]
    g = gravity_vec(params)
    t = pre.dt
    R_j = R_i @ dR
    v_j = state.vel + g * t + R_i @ dv
    p_j = p_i + state.vel * t + 0.5 * g * t * t + R_i @ dp
    return ImuState(
        world_T_body=lie.se3_matrix(R_j, p_j), vel=v_j, bias=state.bias
    )


def residual(
    state_i: ImuState,
    state_j: ImuState,
    pre: Preintegrated,
    params: ImuParams = ImuParams(),
) -> jax.Array:
    """15-dim residual [r_dR(3), r_dv(3), r_dp(3), r_bias(6)].

    Whitened by the caller using `information` below.
    """
    db = state_i.bias - pre.bias_hat
    dbg, dba = db[:3], db[3:]
    dR_corr = pre.dR @ lie.so3_exp(pre.dR_dbg @ dbg)
    dv_corr = pre.dv + pre.dv_dbg @ dbg + pre.dv_dba @ dba
    dp_corr = pre.dp + pre.dp_dbg @ dbg + pre.dp_dba @ dba
    R_i = state_i.world_T_body[:3, :3]
    p_i = state_i.world_T_body[:3, 3]
    R_j = state_j.world_T_body[:3, :3]
    p_j = state_j.world_T_body[:3, 3]
    g = gravity_vec(params)
    t = pre.dt
    r_dR = lie.so3_log(dR_corr.T @ (R_i.T @ R_j))
    r_dv = R_i.T @ (state_j.vel - state_i.vel - g * t) - dv_corr
    r_dp = R_i.T @ (p_j - p_i - state_i.vel * t - 0.5 * g * t * t) - dp_corr
    r_b = state_j.bias - state_i.bias
    return jnp.concatenate([r_dR, r_dv, r_dp, r_b])


def information(pre: Preintegrated, params: ImuParams = ImuParams()) -> jax.Array:
    """(15, 15) information (inverse covariance) of `residual`."""
    cov9 = pre.cov + 1e-12 * jnp.eye(9)
    info9 = jnp.linalg.inv(cov9)
    t = jnp.maximum(pre.dt, 1e-4)
    walk = jnp.concatenate(
        [jnp.full(3, params.gyro_walk**2 * t), jnp.full(3, params.accel_walk**2 * t)]
    )
    info = jnp.zeros((15, 15), jnp.float32)
    info = info.at[:9, :9].set(info9)
    info = info.at[9:, 9:].set(jnp.diag(1.0 / walk))
    return info


def init_gravity_aligned(
    accel_samples: jax.Array,  # (S, 3) stationary accelerometer readings
    gyro_samples: jax.Array,  # (S, 3)
    mask: jax.Array,
    params: ImuParams = ImuParams(),
) -> tuple[jax.Array, jax.Array]:
    """Bootstrap world_R_body and bias from a stationary window.

    Parity: FrontEnd::imu_initialize (FrontEnd.cpp:7925): Kabsch-align mean
    accel to gravity, mean gyro becomes gyro bias; accel bias estimated as
    the residual after gravity alignment.
    Returns (world_R_body (3,3), bias (6,)).
    """
    m = mask[:, None].astype(jnp.float32)
    n = jnp.maximum(jnp.sum(m), 1.0)
    acc_mean = jnp.sum(accel_samples * m, axis=0) / n
    gyr_mean = jnp.sum(gyro_samples * m, axis=0) / n
    from mcslam_tpu.geometry import alignment

    R_wb = alignment.gravity_align_rotation(
        acc_mean, jnp.array([0.0, 0.0, 1.0], jnp.float32)
    )
    # after alignment, gravity reaction is +g z; leftover is accel bias
    a_world = R_wb @ acc_mean
    ba_world = a_world - jnp.array([0.0, 0.0, params.g_norm])
    ba_body = R_wb.T @ ba_world
    bias = jnp.concatenate([gyr_mean, ba_body])
    return R_wb, bias
