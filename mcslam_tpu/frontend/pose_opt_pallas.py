"""Whole-refine motion-only LM as ONE Pallas TPU kernel.

The XLA LM chain (pose_opt.optimize_pose) is latency-bound: each of the
12-16 unrolled iterations is a residual+jacobian pass over M
observations (one augmented-7 MXU reduction + elementwise work), a 6x6
solve, and an SE(3) retract — a handful of small fused kernels whose
fixed per-kernel overheads dominate the ~0.6 MFLOP of real work
(round-4 chip bisection: ~1.8 ms for the 16-step refine, ~110 us/step).
This kernel keeps every per-observation array VMEM-resident in (1, M)
lane layout, runs the ENTIRE iteration schedule inside one launch
(pose algebra and the 6x6 Cholesky unrolled into scalar ops), and emits
just the refined pose and the final per-observation chi2.

Same trajectory as pose_opt.optimize_pose (deferred accept/reject, the
carried system is always the best state's linearization; per-round chi2
re-gating), same guards (z clamp, huber, small-angle series) — but f32
reduction order differs (tree-reduce over lanes vs dot-general), so
results agree to float tolerance, not bit-exactly; accuracy sits inside
the calibrated equivalence class (docs/PERF.md) and is gated by
tests/test_pose_opt_pallas.py parity plus the suite canaries before the
flag defaults on.

Parity (WHAT): FrontEnd::OptimizePose
(/root/reference/MCSlam/src/FrontEnd.cpp:4272-4408), like
pose_opt.optimize_pose; this file changes only HOW the schedule maps to
the TPU (one launch instead of a kernel chain).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHI2_2DOF = 5.991
_EPS = 1e-8

# data-plane row indices (see _pack_obs)
_ROWS = 24


def _so3_exp_s(w0, w1, w2):
    """Rodrigues on scalars -> 9 rotation entries (row-major), mirroring
    lie.so3_exp including the small-angle series and clamped sqrt."""
    t2 = w0 * w0 + w1 * w1 + w2 * w2
    small = t2 < _EPS
    theta = jnp.sqrt(jnp.where(small, 1.0, t2))
    a = jnp.where(
        small, 1.0 - t2 / 6.0 + t2 * t2 / 120.0, jnp.sin(theta) / theta
    )
    b = jnp.where(
        small, 0.5 - t2 / 24.0 + t2 * t2 / 720.0,
        (1.0 - jnp.cos(theta)) / (theta * theta),
    )
    # R = I + a W + b W^2 with W = hat(w)
    ww0, ww1, ww2 = w0 * w0, w1 * w1, w2 * w2
    r00 = 1.0 + b * (-(ww1 + ww2))
    r11 = 1.0 + b * (-(ww0 + ww2))
    r22 = 1.0 + b * (-(ww0 + ww1))
    r01 = -a * w2 + b * (w0 * w1)
    r10 = a * w2 + b * (w0 * w1)
    r02 = a * w1 + b * (w0 * w2)
    r20 = -a * w1 + b * (w0 * w2)
    r12 = -a * w0 + b * (w1 * w2)
    r21 = a * w0 + b * (w1 * w2)
    return (r00, r01, r02, r10, r11, r12, r20, r21, r22)


def _so3_left_jac_s(w0, w1, w2):
    """lie.so3_left_jacobian on scalars -> 9 entries."""
    t2 = w0 * w0 + w1 * w1 + w2 * w2
    small = t2 < _EPS
    theta = jnp.sqrt(jnp.where(small, 1.0, t2))
    b = jnp.where(
        small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(theta)) / (theta * theta)
    )
    c = jnp.where(
        small, 1.0 / 6.0 - t2 / 120.0,
        (theta - jnp.sin(theta)) / (theta * theta * theta),
    )
    ww0, ww1, ww2 = w0 * w0, w1 * w1, w2 * w2
    j00 = 1.0 + c * (-(ww1 + ww2))
    j11 = 1.0 + c * (-(ww0 + ww2))
    j22 = 1.0 + c * (-(ww0 + ww1))
    j01 = -b * w2 + c * (w0 * w1)
    j10 = b * w2 + c * (w0 * w1)
    j02 = b * w1 + c * (w0 * w2)
    j20 = -b * w1 + c * (w0 * w2)
    j12 = -b * w0 + c * (w1 * w2)
    j21 = b * w0 + c * (w1 * w2)
    return (j00, j01, j02, j10, j11, j12, j20, j21, j22)


def _retract_s(R, t, xi):
    """T @ se3_exp(xi) on scalars: R 9-tuple (row-major), t 3-tuple,
    xi 6-tuple (omega, v) -> (R', t')."""
    w0, w1, w2 = xi[0], xi[1], xi[2]
    v0, v1, v2 = xi[3], xi[4], xi[5]
    E = _so3_exp_s(w0, w1, w2)
    J = _so3_left_jac_s(w0, w1, w2)
    te0 = J[0] * v0 + J[1] * v1 + J[2] * v2
    te1 = J[3] * v0 + J[4] * v1 + J[5] * v2
    te2 = J[6] * v0 + J[7] * v1 + J[8] * v2
    Rn = tuple(
        R[3 * i + 0] * E[3 * 0 + j]
        + R[3 * i + 1] * E[3 * 1 + j]
        + R[3 * i + 2] * E[3 * 2 + j]
        for i in range(3) for j in range(3)
    )
    tn = tuple(
        R[3 * i + 0] * te0 + R[3 * i + 1] * te1 + R[3 * i + 2] * te2 + t[i]
        for i in range(3)
    )
    return Rn, tn


def _chol_solve6_s(H, g):
    """Solve (6x6 SPD) H x = g by unrolled scalar Cholesky. H is a dict
    {(i, j): scalar} for j <= i (lower triangle), g a 6-list."""
    L = {}
    for i in range(6):
        for j in range(i + 1):
            s = H[(i, j)] if i >= j else H[(j, i)]
            for kk in range(j):
                s = s - L[(i, kk)] * L[(j, kk)]
            if i == j:
                L[(i, j)] = jnp.sqrt(jnp.maximum(s, 1e-12))
            else:
                L[(i, j)] = s / L[(j, j)]
    y = []
    for i in range(6):
        s = g[i]
        for kk in range(i):
            s = s - L[(i, kk)] * y[kk]
        y.append(s / L[(i, i)])
    x = [None] * 6
    for i in reversed(range(6)):
        s = y[i]
        for kk in range(i + 1, 6):
            s = s - L[(kk, i)] * x[kk]
        x[i] = s / L[(i, i)]
    return x


def _linearize(R, t, rows, active_w, huber_px):
    """One residual+jacobian pass on (1, M) lanes. R/t: pose scalars;
    rows: dict of (1, M) input planes; active_w: (1, M) f32 weights
    (mask * inv_sig2 gate baked by caller? NO: active 0/1 only).
    Returns (H dict (lower), g list, cost, chi2_unscaled (r.r), r0, r1).
    """
    X0, X1, X2 = rows["X0"], rows["X1"], rows["X2"]
    # q = R^T (X - t)
    d0, d1, d2 = X0 - t[0], X1 - t[1], X2 - t[2]
    q0 = R[0] * d0 + R[3] * d1 + R[6] * d2
    q1 = R[1] * d0 + R[4] * d1 + R[7] * d2
    q2 = R[2] * d0 + R[5] * d1 + R[8] * d2
    # p = Rc q + tc (per-obs camera rows)
    c = rows
    p0 = c["c00"] * q0 + c["c01"] * q1 + c["c02"] * q2 + c["ct0"]
    p1 = c["c10"] * q0 + c["c11"] * q1 + c["c12"] * q2 + c["ct1"]
    p2 = c["c20"] * q0 + c["c21"] * q1 + c["c22"] * q2 + c["ct2"]
    z = jnp.maximum(p2, 1e-3)
    iz = 1.0 / z
    fx, fy, cx, cy = c["fx"], c["fy"], c["cx"], c["cy"]
    r0 = p0 * iz * fx + cx - c["u"]
    r1 = p1 * iz * fy + cy - c["v"]
    # Jproj rows (2x3), A = Jproj @ Rc
    jp00, jp02 = fx * iz, -fx * p0 * iz * iz
    jp11, jp12 = fy * iz, -fy * p1 * iz * iz
    a00 = jp00 * c["c00"] + jp02 * c["c20"]
    a01 = jp00 * c["c01"] + jp02 * c["c21"]
    a02 = jp00 * c["c02"] + jp02 * c["c22"]
    a10 = jp11 * c["c10"] + jp12 * c["c20"]
    a11 = jp11 * c["c11"] + jp12 * c["c21"]
    a12 = jp11 * c["c12"] + jp12 * c["c22"]
    # J = [A hat(q) | -A] per row
    j0 = (
        a01 * q2 - a02 * q1,
        -a00 * q2 + a02 * q0,
        a00 * q1 - a01 * q0,
        -a00, -a01, -a02,
    )
    j1 = (
        a11 * q2 - a12 * q1,
        -a10 * q2 + a12 * q0,
        a10 * q1 - a11 * q0,
        -a10, -a11, -a12,
    )
    rn = jnp.sqrt(r0 * r0 + r1 * r1)
    w_huber = jnp.where(rn <= huber_px, 1.0, huber_px / jnp.maximum(rn, 1e-9))
    w = w_huber * rows["isig2"] * active_w
    # normal equations: 21 H entries + 6 g + cost, all lane reductions
    H = {}
    for i in range(6):
        for j in range(i + 1):
            H[(i, j)] = jnp.sum(w * (j0[i] * j0[j] + j1[i] * j1[j]))
    g = [jnp.sum(w * (j0[i] * r0 + j1[i] * r1)) for i in range(6)]
    cost = jnp.sum(w * (r0 * r0 + r1 * r1))
    return H, g, cost, r0, r1


def _pose_kernel(T_ref, mask_ref, data_ref, T_out, chi2_out, *, sched,
                 huber_px, chi2_thresh, lm_lambda):
    d = data_ref[:]
    rows = {
        "X0": d[0:1], "X1": d[1:2], "X2": d[2:3],
        "u": d[3:4], "v": d[4:5],
        "c00": d[5:6], "c01": d[6:7], "c02": d[7:8],
        "c10": d[8:9], "c11": d[9:10], "c12": d[10:11],
        "c20": d[11:12], "c21": d[12:13], "c22": d[13:14],
        "ct0": d[14:15], "ct1": d[15:16], "ct2": d[16:17],
        "fx": d[17:18], "fy": d[18:19], "cx": d[19:20], "cy": d[20:21],
        "isig2": d[21:22],
    }
    mask = mask_ref[0:1, :]  # (1, M) f32 0/1
    R = tuple(T_ref[0, 4 * i + j] for i in range(3) for j in range(3))
    t = tuple(T_ref[0, 4 * i + 3] for i in range(3))

    active = mask
    for n_iters in sched:
        H, g, cst, r0, r1 = _linearize(R, t, rows, active, huber_px)
        lam = jnp.float32(lm_lambda)
        for _ in range(n_iters):
            Hlm = dict(H)
            for i in range(6):
                Hlm[(i, i)] = H[(i, i)] + lam
            dx = _chol_solve6_s(Hlm, g)
            xi = tuple(-x for x in dx)
            R_t, t_t = _retract_s(R, t, xi)
            H_t, g_t, c_t, r0_t, r1_t = _linearize(
                R_t, t_t, rows, active, huber_px
            )
            improved = c_t < cst
            pick = lambda a, b: jnp.where(improved, a, b)
            R = tuple(pick(a, b) for a, b in zip(R_t, R))
            t = tuple(pick(a, b) for a, b in zip(t_t, t))
            H = {k: pick(H_t[k], H[k]) for k in H}
            g = [pick(a, b) for a, b in zip(g_t, g)]
            r0, r1 = pick(r0_t, r0), pick(r1_t, r1)
            cst = pick(c_t, cst)
            lam = jnp.where(improved, lam * 0.5, lam * 4.0)
        chi2 = (r0 * r0 + r1 * r1) * rows["isig2"]
        active = mask * jnp.where(chi2 < chi2_thresh, 1.0, 0.0)

    # final residual pass at the accepted pose for the output chi2
    _, _, _, r0, r1 = _linearize(R, t, rows, active, huber_px)
    chi2_out[0:1, :] = (r0 * r0 + r1 * r1) * rows["isig2"]
    out = [R[0], R[1], R[2], t[0], R[3], R[4], R[5], t[1],
           R[6], R[7], R[8], t[2],
           jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
           jnp.float32(1.0)]
    for j, val in enumerate(out):
        T_out[0, j] = val


@functools.partial(jax.jit, static_argnames=("sched", "huber_px",
                                             "chi2_thresh", "lm_lambda",
                                             "interpret"))
def optimize_pose_pallas(
    T_init: jax.Array,      # (4, 4)
    X_world: jax.Array,     # (M, 3)
    uv: jax.Array,          # (M, 2)
    cam_T_obs: jax.Array,   # (M, 4, 4) per-obs camera-from-ref
    fxycxy_obs: jax.Array,  # (M, 4)
    mask: jax.Array,        # (M,) bool
    inv_sig2: jax.Array,    # (M,)
    sched: tuple,
    huber_px: float = 2.5,
    chi2_thresh: float = CHI2_2DOF,
    lm_lambda: float = 1e-3,
    interpret: bool = False,
):
    """One-launch LM refine. Returns (T (4, 4), chi2 (M,)); the caller
    derives inliers/cost exactly like pose_opt.optimize_pose's tail."""
    M = X_world.shape[0]
    Mp = -(-M // 128) * 128
    pad = Mp - M

    def row(x):
        return jnp.pad(x.astype(jnp.float32), (0, pad))[None, :]

    data = jnp.concatenate(
        [
            row(X_world[:, 0]), row(X_world[:, 1]), row(X_world[:, 2]),
            row(uv[:, 0]), row(uv[:, 1]),
            row(cam_T_obs[:, 0, 0]), row(cam_T_obs[:, 0, 1]),
            row(cam_T_obs[:, 0, 2]),
            row(cam_T_obs[:, 1, 0]), row(cam_T_obs[:, 1, 1]),
            row(cam_T_obs[:, 1, 2]),
            row(cam_T_obs[:, 2, 0]), row(cam_T_obs[:, 2, 1]),
            row(cam_T_obs[:, 2, 2]),
            row(cam_T_obs[:, 0, 3]), row(cam_T_obs[:, 1, 3]),
            row(cam_T_obs[:, 2, 3]),
            row(fxycxy_obs[:, 0]), row(fxycxy_obs[:, 1]),
            row(fxycxy_obs[:, 2]), row(fxycxy_obs[:, 3]),
            row(inv_sig2),
            jnp.zeros((_ROWS - 22, Mp), jnp.float32),
        ],
        axis=0,
    )  # (_ROWS, Mp)
    mrow = row(mask.astype(jnp.float32))
    T_flat = T_init.reshape(1, 16).astype(jnp.float32)

    T_out, chi2 = pl.pallas_call(
        functools.partial(
            _pose_kernel, sched=sched, huber_px=huber_px,
            chi2_thresh=chi2_thresh, lm_lambda=lm_lambda,
        ),
        in_specs=[
            # pose in/out are scalar-accessed -> SMEM (Mosaic cannot
            # load/store scalars against VMEM refs)
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, 16), jnp.float32),
            jax.ShapeDtypeStruct((1, Mp), jnp.float32),
        ),
        interpret=interpret,
    )(T_flat, mrow, data)
    return T_out.reshape(4, 4), chi2[0, :M]
