#!/usr/bin/env python
"""Device-cost measurement of the three production programs via
repeat-loops: fused build+track (fast path and full portfolio), window
BA, VIO solve. Same floor-amortizing design as bisect_frame_rep.py —
each program runs REPS times inside one lax.scan with a carry-fed input
perturbation, so per-rep cost excludes the tunnel's per-dispatch
overhead. These are the numbers a direct-attached TPU would see; the
bench headline (pipelined through the relay) stays the conservative
deployment number.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np  # noqa: E402

REPS = 16


def timeit(fn, reps=3):
    _ = np.asarray(fn(0))
    best = float("inf")
    for _r in range(reps):
        t0 = time.perf_counter()
        out = fn(_r)
        _ = np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from mcslam_tpu.utils import compile_cache

    compile_cache.enable()

    from mcslam_tpu.backend import ba
    from mcslam_tpu.data import synthetic
    from mcslam_tpu.frontend import frame as frame_mod
    from mcslam_tpu.slam import SlamConfig
    from mcslam_tpu import tracking_kernels as tk

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    # ---- identical setup to bench.py ----
    C, H, W = 4, 480, 640
    NPTS, NLVL, MAXI, BINS = 768, 4, 2048, 16
    rig = synthetic.make_synthetic_rig(
        synthetic.SyntheticRigSpec(num_cams=C, image_size=(W, H))
    )
    poses = synthetic.smooth_trajectory(2, step_angle=0.02)
    lms = synthetic.make_landmarks(3000, depth_range=(4.0, 15.0))
    imgs_np = synthetic.render_blob_images(rig, poses, lms)
    img = jnp.asarray(imgs_np[1])
    ff0 = frame_mod.build_frame(
        jnp.asarray(imgs_np[0]), rig, num_points=NPTS, num_levels=NLVL,
        max_intra=MAXI, angle_bins=BINS,
    )
    scfg = SlamConfig()
    key = jax.random.PRNGKey(0)
    M = int(ff0.im_valid.shape[0])
    valid0 = np.asarray(ff0.im_valid) & np.asarray(ff0.im_has_depth)
    prev_lm_id = np.where(valid0, np.arange(M, dtype=np.int32), -1)
    pos0 = np.asarray(ff0.im_point3d)
    MAP_CAP = 65536
    map_pos = np.zeros((MAP_CAP, 3), np.float32)
    map_pos[:M] = pos0
    map_valid = np.zeros(MAP_CAP, bool)
    map_valid[:M] = valid0
    map_desc = np.zeros((MAP_CAP, 8), np.uint32)
    map_desc[:M] = np.asarray(ff0.im_desc)
    nrm = -pos0 / np.maximum(np.linalg.norm(pos0, axis=1, keepdims=True),
                             1e-6)
    map_normal = np.zeros((MAP_CAP, 3), np.float32)
    map_normal[:M] = nrm
    LML = scfg.local_map_landmarks
    cand = np.flatnonzero(map_valid)[:LML]
    cand_pad = np.zeros(LML, np.int32)
    cand_pad[:len(cand)] = cand
    cand_valid = np.arange(LML) < len(cand)
    dargs = dict(
        prev_desc=ff0.im_desc, prev_valid=ff0.im_valid,
        prev_lm=jnp.asarray(prev_lm_id),
        map_pos=jnp.asarray(map_pos), map_valid=jnp.asarray(map_valid),
        map_desc=jnp.asarray(map_desc), map_normal=jnp.asarray(map_normal),
        cand=jnp.asarray(cand_pad), cand_valid=jnp.asarray(cand_valid),
    )
    pred_T = jnp.eye(4, dtype=jnp.float32)

    def make_ab(fp_frac):
        def body(c, _):
            *_, pk = tk._build_and_track_step(
                key, img * (1.0 + 1e-7 * c), rig, dargs["prev_desc"],
                dargs["prev_valid"], dargs["prev_lm"], dargs["map_pos"],
                dargs["map_valid"], dargs["map_desc"], dargs["map_normal"],
                dargs["cand"], dargs["cand_valid"], pred_T,
                num_points=NPTS, num_levels=NLVL,
                fast_threshold=20.0 / 255.0, min_threshold=7.0 / 255.0,
                max_intra=MAXI, min_z=0.5, max_z=40.0, angle_bins=BINS,
                approx_topk=True, num_hyp=scfg.ransac_hyps,
                px=scfg.ransac_px, max_dist=scfg.inter_max_dist,
                ratio=scfg.inter_ratio, image_wh=rig.image_size,
                lm_radius=scfg.local_map_radius_px,
                lm_max_dist=scfg.local_map_max_dist,
                gate_px=scfg.track_match_radius_px,
                fastpath_frac=fp_frac,
                fastpath_min=scfg.track_fastpath_min_inliers,
            )
            return jnp.sum(pk[:20]).astype(jnp.float32) * 1e-20, None
        return jax.jit(lambda seed: jax.lax.scan(body, seed, None,
                                                 length=REPS)[0])

    # ---- BA problem, identical to bench.py ----
    K, L = 6, 2048
    Ok = 8192 // K
    O = Ok * K
    rng = np.random.RandomState(0)
    ba_poses = jnp.tile(jnp.eye(4, dtype=jnp.float32), (K, 1, 1))
    ba_lms = jnp.asarray(
        (rng.uniform(-6, 6, (L, 3)) + [0, 0, 8]).astype(np.float32)
    )
    obs = ba.BAObservations(
        kf=jnp.asarray(np.repeat(np.arange(K, dtype=np.int32), Ok)),
        cam=jnp.asarray(rng.randint(0, C, O), jnp.int32),
        lm=jnp.asarray(rng.randint(0, L, O), jnp.int32),
        uv=jnp.asarray(rng.uniform(0, W, (O, 2)).astype(np.float32)),
        sigma2=jnp.ones(O, jnp.float32),
        valid=jnp.ones(O, bool),
    )
    prior_H = jnp.zeros((K * 6, K * 6), jnp.float32).at[:6, :6].set(
        jnp.eye(6) * 1e6
    )
    problem = ba.BAProblem(
        poses=ba_poses, landmarks=ba_lms, lm_valid=jnp.ones(L, bool),
        obs=obs, cam_T_ref=rig.cam_T_ref, fxycxy=rig.fxycxy,
        prior_H=prior_H, prior_b=jnp.zeros(K * 6, jnp.float32),
        kf_valid=jnp.ones(K, bool),
    )

    def ba_body(c, _):
        p = problem._replace(
            landmarks=problem.landmarks * (1.0 + 1e-7 * c)
        )
        res = ba.ba_solve(p, iters=scfg.ba_iters, gate_rounds=2,
                          kf_blocked=True)
        return jnp.sum(res.poses).astype(jnp.float32) * 1e-20, None

    ba_rep = jax.jit(lambda seed: jax.lax.scan(ba_body, seed, None,
                                               length=REPS)[0])

    floor_fn = jax.jit(
        lambda x: jax.lax.scan(lambda c, _: (c + 1e-9, None), x, None,
                               length=REPS)[0]
    )
    t_floor = timeit(lambda i: floor_fn(jnp.float32(i)))
    print(f"{'floor (empty scan total)':28s} {t_floor*1e3:7.2f} ms")

    ab_fast = make_ab(scfg.track_fastpath_frac)
    ab_full = make_ab(2.0)
    for name, f in (("AB fused (fast path)", ab_fast),
                    ("AB fused (full portfolio)", ab_full),
                    ("window BA (warm 1x2)", ba_rep)):
        t = timeit(lambda i, f=f: f(jnp.float32(i)))
        per = (t - t_floor) / REPS * 1e3
        print(f"{name:28s} {per:7.3f} ms/rep   ({t*1e3:7.1f} total)",
              flush=True)


if __name__ == "__main__":
    main()
