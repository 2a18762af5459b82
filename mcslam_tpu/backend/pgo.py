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


def build_odometry_edges(poses, weights=None):
    """Sequential odometry edges from current estimates: meas = Ti^-1 Tj."""
    N = poses.shape[0]
    i = jnp.arange(N - 1, dtype=jnp.int32)
    j = i + 1
    meas = lie.se3_inverse(poses[:-1]) @ poses[1:]
    w = jnp.ones(N - 1, jnp.float32) if weights is None else weights
    return i, j, meas, w
