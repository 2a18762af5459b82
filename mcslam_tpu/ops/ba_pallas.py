"""Fused BA linearization + payload assembly as one Pallas TPU kernel.

The XLA formulation of the per-observation reprojection linearization
(`ba._residuals_and_jacobians_blocked` + the payload/Hpp/gp assembly in
`ba._assemble`) lowers to dozens of small elementwise kernels over (O, d)
intermediates — measured ~1.8 ms per LM iteration on v5e, the dominant
cost of the window-BA solve. Here the whole chain runs in ONE kernel over
(T,)-lane vector registers per observation tile: residual, analytic pose
and landmark Jacobians, Huber weights, the fused [W | Hll | gl] payload
the landmark-axis one-hot matmul consumes, and the per-keyframe Hpp/gp
block sums (accumulated across tiles in VMEM).

Layout: all per-observation arrays are CHANNEL-MAJOR (K, d, Ok) so each
channel is a full-lane row (Mosaic rejects lane-strided column access:
"Offset change" lowering errors). The payload comes out as (K, 30, Ok) —
exactly the shape the downstream MXU matmul against the landmark one-hot
wants, so no transpose anywhere.

Math parity: identical to ba._residuals_and_jacobians_blocked /
ba._assemble (kf_blocked); the parity test asserts elementwise agreement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _linpay_kernel(rTw_ref, X_ref, uv_ref, Rc_ref, tc_ref, f_ref, sv_ref,
                   payload_ref, rw_ref, stat_ref, *, T, Ok, huber_px):
    k = pl.program_id(0)
    t = pl.program_id(1)

    # lane mask for the padded tail of the last tile
    col = jax.lax.broadcasted_iota(jnp.int32, (T,), 0) + t * T
    col_ok = (col < Ok).astype(jnp.float32)

    # per-keyframe pose (ref_T_world): rTw_ref is (K, 12) =
    # [R row-major 9 | t 3]
    R = [[rTw_ref[k, 3 * a + b] for b in range(3)] for a in range(3)]
    tt = [rTw_ref[k, 9 + a] for a in range(3)]

    X = [X_ref[a, :] * col_ok for a in range(3)]  # (T,) lane vectors
    # q = R X + t   (point in ref frame)
    q = [R[a][0] * X[0] + R[a][1] * X[1] + R[a][2] * X[2] + tt[a]
         for a in range(3)]
    Rc = [[Rc_ref[3 * a + b, :] for b in range(3)] for a in range(3)]
    tc = [tc_ref[a, :] for a in range(3)]
    # p = Rc q + tc (point in camera frame)
    p = [Rc[a][0] * q[0] + Rc[a][1] * q[1] + Rc[a][2] * q[2] + tc[a]
         for a in range(3)]
    z = jnp.maximum(p[2], 1e-3)
    inv_z = 1.0 / z
    fx = f_ref[0, :]
    fy = f_ref[1, :]
    r0 = p[0] * inv_z * fx + f_ref[2, :] - uv_ref[0, :]
    r1 = p[1] * inv_z * fy + f_ref[3, :] - uv_ref[1, :]

    # Jproj (2,3) per obs
    Jp00 = fx * inv_z
    Jp02 = -fx * p[0] * inv_z * inv_z
    Jp11 = fy * inv_z
    Jp12 = -fy * p[1] * inv_z * inv_z
    # A = Jproj @ Rc  (2,3)
    A = [[Jp00 * Rc[0][b] + Jp02 * Rc[2][b] for b in range(3)],
         [Jp11 * Rc[1][b] + Jp12 * Rc[2][b] for b in range(3)]]
    # hat(q)
    zero = jnp.zeros_like(q[0])
    hat = [[zero, -q[2], q[1]],
           [q[2], zero, -q[0]],
           [-q[1], q[0], zero]]
    # Jp = [A @ hat(q) | -A]   (2, 6)
    Jp = [[None] * 6 for _ in range(2)]
    for a in range(2):
        for c in range(3):
            Jp[a][c] = (A[a][0] * hat[0][c] + A[a][1] * hat[1][c]
                        + A[a][2] * hat[2][c])
            Jp[a][3 + c] = -A[a][c]
    # Jl = A @ R   (2, 3)
    Jl = [[A[a][0] * R[0][c] + A[a][1] * R[1][c] + A[a][2] * R[2][c]
           for c in range(3)] for a in range(2)]

    rn = jnp.sqrt(r0 * r0 + r1 * r1)
    w_h = jnp.where(rn <= huber_px, 1.0, huber_px / jnp.maximum(rn, 1e-9))
    # sv_ref rows: [sigma2 | validf]
    w = (w_h / jnp.maximum(sv_ref[0, :], 1e-6)) * sv_ref[1, :] * col_ok

    wr = [w * r0, w * r1]
    # payload rows: [T(6x3)=18 | Hll(3x3)=9 | gl(3)=3]
    prows = []
    for i in range(6):
        wJp = [w * Jp[0][i], w * Jp[1][i]]
        for j in range(3):
            prows.append(wJp[0] * Jl[0][j] + wJp[1] * Jl[1][j])
    for i in range(3):
        wJl = [w * Jl[0][i], w * Jl[1][i]]
        for j in range(3):
            prows.append(wJl[0] * Jl[0][j] + wJl[1] * Jl[1][j])
    for i in range(3):
        prows.append(wr[0] * Jl[0][i] + wr[1] * Jl[1][i])
    payload_ref[...] = jnp.stack(prows)  # (30, T)
    rw_ref[...] = jnp.stack([r0, r1, w])  # (3, T)

    # per-keyframe Hpp / gp block sums, accumulated across tiles
    hvals = [None] * 36
    gvals = [None] * 6
    for i in range(6):
        wJp = [w * Jp[0][i], w * Jp[1][i]]
        for j in range(i, 6):
            v = jnp.sum(wJp[0] * Jp[0][j] + wJp[1] * Jp[1][j])
            hvals[6 * i + j] = v
            if j != i:
                hvals[6 * j + i] = v
        gvals[i] = jnp.sum(wJp[0] * r0 + wJp[1] * r1)
    # packed stats tile: row 0 = [Hpp 36 | gp 6 | pad to 128]; the (8,128)
    # tile is the smallest output block the lane/sublane tiling accepts
    vec = jnp.concatenate([
        jnp.stack(hvals), jnp.stack(gvals),
        jnp.zeros(128 - 42, jnp.float32),
    ])
    stat = jnp.concatenate([vec[None], jnp.zeros((7, 128), jnp.float32)], 0)

    @pl.when(t == 0)
    def _():
        stat_ref[...] = jnp.zeros_like(stat_ref)

    stat_ref[...] += stat


@functools.partial(jax.jit, static_argnames=("tile", "huber_px",
                                             "interpret"))
def linearize_payload_pallas(
    rTw12: jax.Array,  # (K, 12) ref_T_world rows [R row-major | t]
    X: jax.Array,  # (O, 3) landmark positions per observation
    uv: jax.Array,  # (O, 2)
    Rc9: jax.Array,  # (O, 9) camera rotation rows per observation
    tc: jax.Array,  # (O, 3)
    f4: jax.Array,  # (O, 4) fx fy cx cy per observation
    sigma2: jax.Array,  # (O,)
    validf: jax.Array,  # (O,) float validity (obs & lm & kf)
    tile: int = 512,
    huber_px: float = 2.5,
    interpret: bool = False,
):
    """-> (payload (K, 30, Ok), r (O, 2), w (O,), Hpp (K, 36), gp (K, 6)).

    The observation table must be kf-blocked: O = K * Ok with
    obs.kf[o] == o // Ok (the layout ba._assemble(kf_blocked) requires).
    """
    O = X.shape[0]
    K = rTw12.shape[0]
    Ok = O // K
    T = min(tile, -(-Ok // 128) * 128)
    n_tiles = -(-Ok // T)
    Okp = n_tiles * T

    def cm(x, d):
        # (O, d) -> channel-major (K, d, Okp)
        x = x.reshape(K, Ok, d) if d > 1 else x.reshape(K, Ok, 1)
        x = jnp.swapaxes(x, 1, 2)
        return jnp.pad(x, ((0, 0), (0, 0), (0, Okp - Ok)))

    sv = jnp.stack([sigma2, validf], axis=-1)  # (O, 2)

    kernel = functools.partial(_linpay_kernel, T=T, Ok=Ok,
                               huber_px=huber_px)
    out_shapes = (
        jax.ShapeDtypeStruct((K, 30, Okp), jnp.float32),  # payload
        jax.ShapeDtypeStruct((K, 3, Okp), jnp.float32),  # [r0 r1 w]
        jax.ShapeDtypeStruct((K, 8, 128), jnp.float32),  # [Hpp|gp|pad]
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # rTw12 (K,12) whole
        pl.BlockSpec((None, 3, T), lambda k, t: (k, 0, t)),
        pl.BlockSpec((None, 2, T), lambda k, t: (k, 0, t)),
        pl.BlockSpec((None, 9, T), lambda k, t: (k, 0, t)),
        pl.BlockSpec((None, 3, T), lambda k, t: (k, 0, t)),
        pl.BlockSpec((None, 4, T), lambda k, t: (k, 0, t)),
        pl.BlockSpec((None, 2, T), lambda k, t: (k, 0, t)),
    ]
    out_specs = (
        pl.BlockSpec((None, 30, T), lambda k, t: (k, 0, t)),
        pl.BlockSpec((None, 3, T), lambda k, t: (k, 0, t)),
        pl.BlockSpec((None, 8, 128), lambda k, t: (k, 0, 0)),
    )
    payload, rw, stats = pl.pallas_call(
        kernel,
        grid=(K, n_tiles),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(
        rTw12,
        cm(X, 3), cm(uv, 2), cm(Rc9, 9), cm(tc, 3), cm(f4, 4), cm(sv, 2),
    )
    payload = payload[:, :, :Ok]  # (K, 30, Ok)
    r = jnp.swapaxes(rw[:, :2, :Ok], 1, 2).reshape(O, 2)
    w = rw[:, 2, :Ok].reshape(O)
    return payload, r, w, stats[:, 0, :36], stats[:, 0, 36:42]
