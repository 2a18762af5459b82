"""Sim(3) pose-graph: monocular scale-drift correction at loop closure."""

import numpy as np
import jax.numpy as jnp

from mcslam_tpu.backend import pgo
from mcslam_tpu.data import synthetic
from mcslam_tpu.geometry import lie


def test_sim3_pgo_fixes_scale_drift():
    N = 10
    true = synthetic.smooth_trajectory(N, step_angle=0.12)
    # mono-style odometry: each step's translation shrinks by 3% (scale drift)
    est = [true[0]]
    drift = 0.97
    for k in range(1, N):
        odo = np.linalg.inv(true[k - 1]) @ true[k]
        odo_drifted = odo.copy()
        odo_drifted[:3, 3] *= drift ** k
        est.append(est[-1] @ odo_drifted)
    est = np.stack(est).astype(np.float32)
    end_err0 = np.linalg.norm(est[-1][:3, 3] - true[-1][:3, 3])
    assert end_err0 > 0.1

    ei, ej, meas, w = pgo.build_odometry_edges(jnp.asarray(est))
    loop_meas = jnp.asarray(np.linalg.inv(true[0]) @ true[-1], jnp.float32)
    graph = pgo.PoseGraph(
        poses=jnp.asarray(est),
        edge_i=jnp.concatenate([ei, jnp.asarray([0], jnp.int32)]),
        edge_j=jnp.concatenate([ej, jnp.asarray([N - 1], jnp.int32)]),
        edge_meas=jnp.concatenate([meas, loop_meas[None]]),
        edge_weight=jnp.concatenate([w, jnp.asarray([50.0])]),
        edge_valid=jnp.ones(N, bool),
        anchor=jnp.asarray(0, jnp.int32),
    )
    # SE(3) relaxation cannot express the per-edge scale correction well;
    # Sim(3) absorbs it in the scale states
    poses7, scales = pgo.pgo_solve_sim3(graph, iters=12)
    poses7 = np.asarray(poses7)
    end_err7 = np.linalg.norm(poses7[-1][:3, 3] - true[-1][:3, 3])
    assert end_err7 < end_err0 * 0.05, (end_err0, end_err7)
    # scale states absorb the drift: bowed away from 1 mid-chain, pinned
    # at the anchored/loop-closed ends
    s = np.asarray(scales)
    assert s.max() > 1.02
    assert abs(s[0] - 1.0) < 1e-3 and abs(s[-1] - 1.0) < 0.01
