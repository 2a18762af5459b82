"""Pose-graph optimization: batched Gauss-Newton over SE(3) keyframe poses
with odometry + loop-closure edges.

Parity (WHAT): the global correction the reference obtains from ISAM2 when
loop measurements are injected into smart factors
(Backend::addLoopClosure + optimizePosesLandmarks,
/root/reference/MCSlam/src/Backend.cpp:1871-1901,3060-3267; BetweenFactor
variant at :1590).

HOW: all edges are a padded table; residuals r_e = log(meas^-1 * Ti^-1 Tj)
with jacfwd on both endpoint tangents; the dense (N*6)^2 normal system is
assembled by scatter-add and solved by Cholesky. For a few hundred
keyframes this dense solve is tiny on the MXU; no sparse bookkeeping.
"""

from __future__ import annotations

from typing import NamedTuple

import functools

import jax
import jax.numpy as jnp

from mcslam_tpu.geometry import lie


class PoseGraph(NamedTuple):
    poses: jax.Array  # (N, 4, 4) initial world_T_kf
    edge_i: jax.Array  # (E,) int32
    edge_j: jax.Array  # (E,) int32
    edge_meas: jax.Array  # (E, 4, 4) measured i_T_j
    edge_weight: jax.Array  # (E,) scalar information scale
    edge_valid: jax.Array  # (E,) bool
    anchor: jax.Array  # () int32 pose held fixed


def _edge_residual(xi_i, xi_j, Ti, Tj, meas):
    Ti = lie.se3_retract(Ti, xi_i)
    Tj = lie.se3_retract(Tj, xi_j)
    return lie.se3_log(lie.se3_inverse(meas) @ lie.se3_inverse(Ti) @ Tj)


@functools.partial(jax.jit, static_argnames=("iters",))
def pgo_solve(graph: PoseGraph, iters: int = 10, damping: float = 1e-6) -> jax.Array:
    """Returns optimized poses (N, 4, 4)."""
    N = graph.poses.shape[0]

    def gn_step(poses, _):
        def one(i, j, meas):
            z = jnp.zeros(6)
            r = _edge_residual(z, z, poses[i], poses[j], meas)
            Ji = jax.jacfwd(_edge_residual, argnums=0)(z, z, poses[i], poses[j], meas)
            Jj = jax.jacfwd(_edge_residual, argnums=1)(z, z, poses[i], poses[j], meas)
            return r, Ji, Jj

        r, Ji, Jj = jax.vmap(one)(graph.edge_i, graph.edge_j, graph.edge_meas)
        w = graph.edge_weight * graph.edge_valid.astype(jnp.float32)
        H = jnp.zeros((N, 6, N, 6), jnp.float32)
        g = jnp.zeros((N, 6), jnp.float32)
        wJi = Ji * w[:, None, None]
        wJj = Jj * w[:, None, None]
        H = H.at[graph.edge_i, :, graph.edge_i, :].add(
            jnp.einsum("eri,erj->eij", wJi, Ji))
        H = H.at[graph.edge_j, :, graph.edge_j, :].add(
            jnp.einsum("eri,erj->eij", wJj, Jj))
        H = H.at[graph.edge_i, :, graph.edge_j, :].add(
            jnp.einsum("eri,erj->eij", wJi, Jj))
        H = H.at[graph.edge_j, :, graph.edge_i, :].add(
            jnp.einsum("eri,erj->eij", wJj, Ji))
        g = g.at[graph.edge_i].add(jnp.einsum("eri,er->ei", wJi, r))
        g = g.at[graph.edge_j].add(jnp.einsum("eri,er->ei", wJj, r))
        Hd = H.reshape(N * 6, N * 6)
        # anchor: huge prior on the anchored pose
        aidx = graph.anchor * 6
        anchor_rows = (jnp.arange(N * 6) >= aidx) & (jnp.arange(N * 6) < aidx + 6)
        Hd = Hd + jnp.diag(anchor_rows.astype(jnp.float32) * 1e6)
        Hd = Hd + damping * jnp.eye(N * 6)
        dx = -jnp.linalg.solve(Hd, g.reshape(N * 6))
        return lie.se3_retract(poses, dx.reshape(N, 6)), None

    poses, _ = jax.lax.scan(gn_step, graph.poses, None, length=iters)
    return poses


def _sim3_edge_residual(xi_i, xi_j, Ti, si, Tj, sj, meas, s_meas):
    """7-dim Sim(3) edge residual [r_R(3), r_t(3), r_s(1)].

    xi = (omega(3), dt(3), dlogs(1)). Translation residual is measured in
    frame i and de-scaled by s_i, so accumulated monocular scale drift is
    absorbed along the chain (ORB-SLAM essential-graph style).
    """
    Ri = Ti[:3, :3] @ lie.so3_exp(xi_i[:3])
    ti = Ti[:3, 3] + Ti[:3, :3] @ xi_i[3:6]
    si = si * jnp.exp(xi_i[6])
    Rj = Tj[:3, :3] @ lie.so3_exp(xi_j[:3])
    tj = Tj[:3, 3] + Tj[:3, :3] @ xi_j[3:6]
    sj = sj * jnp.exp(xi_j[6])
    R_ij = meas[:3, :3]
    t_ij = meas[:3, 3]
    r_R = lie.so3_log(R_ij.T @ (Ri.T @ Rj))
    r_t = (Ri.T @ (tj - ti)) / si - t_ij / s_meas
    r_s = jnp.log(sj / si) - jnp.log(s_meas)
    return jnp.concatenate([r_R, r_t, r_s[None]])


@functools.partial(jax.jit, static_argnames=("iters",))
def pgo_solve_sim3(graph: PoseGraph, scales: jax.Array | None = None,
                   edge_scales: jax.Array | None = None, iters: int = 10,
                   damping: float = 1e-6):
    """Sim(3) pose-graph GN: corrects monocular scale drift at loop closure
    (the reference's mono comparison pipeline accumulates scale drift that
    SE(3) relaxation cannot remove). Returns (poses (N,4,4), scales (N,)).
    """
    N = graph.poses.shape[0]
    if scales is None:
        scales = jnp.ones(N, jnp.float32)
    if edge_scales is None:
        edge_scales = jnp.ones(graph.edge_i.shape[0], jnp.float32)

    def gn_step(state, _):
        poses, scales = state

        def one(i, j, meas, s_meas):
            z = jnp.zeros(7)
            args = (poses[i], scales[i], poses[j], scales[j], meas, s_meas)
            r = _sim3_edge_residual(z, z, *args)
            Ji = jax.jacfwd(lambda x: _sim3_edge_residual(x, z, *args))(z)
            Jj = jax.jacfwd(lambda x: _sim3_edge_residual(z, x, *args))(z)
            return r, Ji, Jj

        r, Ji, Jj = jax.vmap(one)(
            graph.edge_i, graph.edge_j, graph.edge_meas, edge_scales
        )
        w = graph.edge_weight * graph.edge_valid.astype(jnp.float32)
        D = 7
        H = jnp.zeros((N, D, N, D), jnp.float32)
        g = jnp.zeros((N, D), jnp.float32)
        wJi = Ji * w[:, None, None]
        wJj = Jj * w[:, None, None]
        H = H.at[graph.edge_i, :, graph.edge_i, :].add(
            jnp.einsum("eri,erj->eij", wJi, Ji))
        H = H.at[graph.edge_j, :, graph.edge_j, :].add(
            jnp.einsum("eri,erj->eij", wJj, Jj))
        H = H.at[graph.edge_i, :, graph.edge_j, :].add(
            jnp.einsum("eri,erj->eij", wJi, Jj))
        H = H.at[graph.edge_j, :, graph.edge_i, :].add(
            jnp.einsum("eri,erj->eij", wJj, Ji))
        g = g.at[graph.edge_i].add(jnp.einsum("eri,er->ei", wJi, r))
        g = g.at[graph.edge_j].add(jnp.einsum("eri,er->ei", wJj, r))
        Hd = H.reshape(N * D, N * D)
        aidx = graph.anchor * D
        anchor_rows = (jnp.arange(N * D) >= aidx) & (jnp.arange(N * D) < aidx + D)
        Hd = Hd + jnp.diag(anchor_rows.astype(jnp.float32) * 1e6)
        Hd = Hd + damping * jnp.eye(N * D)
        dx = -jnp.linalg.solve(Hd, g.reshape(N * D)).reshape(N, D)
        R = poses[:, :3, :3] @ lie.so3_exp(dx[:, :3])
        t = poses[:, :3, 3] + jnp.einsum(
            "nij,nj->ni", poses[:, :3, :3], dx[:, 3:6]
        )
        poses = lie.se3_matrix(R, t)
        scales = scales * jnp.exp(dx[:, 6])
        return (poses, scales), None

    (poses, scales), _ = jax.lax.scan(gn_step, (graph.poses, scales), None,
                                      length=iters)
    return poses, scales


def build_odometry_edges(poses, weights=None):
    """Sequential odometry edges from current estimates: meas = Ti^-1 Tj."""
    N = poses.shape[0]
    i = jnp.arange(N - 1, dtype=jnp.int32)
    j = i + 1
    meas = lie.se3_inverse(poses[:-1]) @ poses[1:]
    w = jnp.ones(N - 1, jnp.float32) if weights is None else weights
    return i, j, meas, w
