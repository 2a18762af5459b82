"""Benchmark: 4-camera front-end + window BA throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference C++ system claims real-time >= 10 Hz on "modern
hardware" (/root/reference/README.md:244); vs_baseline = our fps / 10.

Workload parity with the reference:
- feature budget 768/camera x 4 cameras = 3072 ~= the reference's 3000
  features per multi-camera frame (/root/reference/MCSlam/src/FrontEnd.cpp:395)
- window BA: 6 keyframes, 8192-observation tier with the driver's warm
  LM budget (3 iters x 2 gate rounds) — the capacity tier the driver's
  dynamic selection actually compiles for this feature budget
- BA amortized over kf_interval=4 frames (BA runs per keyframe)

The headline fps is measured on a software-pipelined loop shaped like the
driver/CLI steady state (mc_slam_app builds frame N+1 before processing
frame N; JAX dispatch is asynchronous): stage A of frame i+1 and the BA
are enqueued before frame i's tracking result is fetched, so host work
and the tunnel round trip overlap device compute. Per-stage numbers are
reported on stderr for the breakdown.
"""

import json
import pathlib
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mcslam_tpu.utils import compile_cache

    # Persistent compile cache: measured 2026-08-19, cache-hit compiles on
    # the axon tunnel return in 0.00 s vs minutes of remote tracing — a
    # repeat bench session reaches its first number almost immediately.
    compile_cache.enable()

    from mcslam_tpu.backend import ba
    from mcslam_tpu.data import synthetic
    from mcslam_tpu.frontend import frame as frame_mod

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    C, H, W = 4, 480, 640
    NPTS, NLVL, MAXI = 768, 4, 2048
    BINS = 16  # steered-BRIEF angle bins (22.5 deg steering granularity)
    rig = synthetic.make_synthetic_rig(
        synthetic.SyntheticRigSpec(num_cams=C, image_size=(W, H))
    )

    # synthetic frames (two distinct, alternate to avoid value caching)
    poses = synthetic.smooth_trajectory(2, step_angle=0.02)
    lms = synthetic.make_landmarks(3000, depth_range=(4.0, 15.0))
    imgs_np = synthetic.render_blob_images(rig, poses, lms)
    imgs = [jnp.asarray(imgs_np[i]) for i in range(2)]

    # ---- stage A: frame build (ORB + intra + rig triangulation) ----
    def stage_a(im):
        ff = frame_mod.build_frame(
            im, rig, num_points=NPTS, num_levels=NLVL, max_intra=MAXI,
            angle_bins=BINS,
        )
        return ff

    ff0 = stage_a(imgs[0])
    ff1 = stage_a(imgs[1])
    jax.block_until_ready(ff1.im_desc)

    # ---- stage B: the PRODUCTION fused tracking program ----
    # _track_and_map_step is exactly what the driver dispatches per frame
    # in steady state (slam._track_frame_fused): projection-gated mutual
    # match -> pose-candidate portfolio (predicted/Kabsch/PnP + vmapped
    # robust LM) -> speculative local-map tracking, one packed fetch.
    key = jax.random.PRNGKey(0)
    from mcslam_tpu.slam import SlamConfig
    from mcslam_tpu import tracking_kernels as tk

    scfg = SlamConfig()
    M = int(ff0.im_valid.shape[0])
    valid0 = np.asarray(ff0.im_valid) & np.asarray(ff0.im_has_depth)
    prev_lm_id = np.where(valid0, np.arange(M, dtype=np.int32), -1)
    pos0 = np.asarray(ff0.im_point3d)  # world == first frame
    MAP_CAP = 65536  # DeviceMap default capacity (the driver's mirror)
    map_pos = np.zeros((MAP_CAP, 3), np.float32)
    map_pos[:M] = pos0
    map_valid = np.zeros(MAP_CAP, bool)
    map_valid[:M] = valid0
    map_desc = np.zeros((MAP_CAP, 8), np.uint32)
    map_desc[:M] = np.asarray(ff0.im_desc)
    nrm = -pos0 / np.maximum(
        np.linalg.norm(pos0, axis=1, keepdims=True), 1e-6
    )
    map_normal = np.zeros((MAP_CAP, 3), np.float32)
    map_normal[:M] = nrm
    LML = scfg.local_map_landmarks
    cand = np.flatnonzero(map_valid)[:LML]
    cand_pad = np.zeros(LML, np.int32)
    cand_pad[:len(cand)] = cand
    cand_valid = np.arange(LML) < len(cand)
    d_prev_desc, d_prev_valid = ff0.im_desc, ff0.im_valid
    d_prev_lm = jnp.asarray(prev_lm_id)
    d_map_pos, d_map_valid = jnp.asarray(map_pos), jnp.asarray(map_valid)
    d_map_desc, d_map_normal = jnp.asarray(map_desc), jnp.asarray(map_normal)
    d_cand, d_cand_valid = jnp.asarray(cand_pad), jnp.asarray(cand_valid)
    pred_T = jnp.eye(4, dtype=jnp.float32)

    def _stage_b(key, cur, prev_desc, prev_valid, fastpath_frac):
        return tk._track_and_map_step(
            key, cur.im_desc, cur.im_valid, cur.im_uv_ref,
            cur.im_anchor_cam, cur.im_sigma2, cur.im_point3d,
            cur.im_has_depth, prev_desc, prev_valid, d_prev_lm,
            d_map_pos, d_map_valid, d_map_desc, d_map_normal,
            d_cand, d_cand_valid, rig.cam_T_ref, rig.fxycxy, pred_T,
            scfg.ransac_hyps, scfg.ransac_px, scfg.inter_max_dist,
            scfg.inter_ratio, rig.image_size, scfg.local_map_radius_px,
            scfg.local_map_max_dist, scfg.track_match_radius_px,
            fastpath_frac, scfg.track_fastpath_min_inliers,
        )

    def stage_b(key, cur, prev_desc, prev_valid):
        # production config: the motion fast path decides per frame
        return _stage_b(key, cur, prev_desc, prev_valid,
                        scfg.track_fastpath_frac)

    def stage_b_slow(key, cur, prev_desc, prev_valid):
        # forced full portfolio (frac > 1 disables the fast path): the
        # weak-frame cost, reported alongside so the headline can't hide
        # behind an unrealistically clean bench scene
        return _stage_b(key, cur, prev_desc, prev_valid, 2.0)

    packed = stage_b(key, ff1, d_prev_desc, d_prev_valid)
    jax.block_until_ready(packed)
    fast_taken = float(np.asarray(packed)[20])  # header slot 5: fastpath
    _ = stage_b_slow(key, ff1, d_prev_desc, d_prev_valid)

    # ---- stage A+B FUSED: the production steady-state program ----
    # slam.process_image dispatches frame build + tracking as ONE device
    # program (_build_and_track_step): one dispatch floor + no HBM round
    # trip of the frame arrays at the A/B boundary. This is what the CLI
    # app runs per frame in INITIALIZED steady state (fused_frontend,
    # default on), so the headline is built from it.
    def _stage_ab(i, fastpath_frac):
        cur = imgs[i % 2]
        prev = (ff0.im_desc, ff0.im_valid) if i % 2 \
            else (ff1.im_desc, ff1.im_valid)
        *_, pk = tk._build_and_track_step(
            key, cur, rig, *prev, d_prev_lm, d_map_pos, d_map_valid,
            d_map_desc, d_map_normal, d_cand, d_cand_valid, pred_T,
            num_points=NPTS, num_levels=NLVL,
            fast_threshold=20.0 / 255.0, min_threshold=7.0 / 255.0,
            max_intra=MAXI, min_z=0.5, max_z=40.0, angle_bins=BINS,
            approx_topk=True,
            num_hyp=scfg.ransac_hyps, px=scfg.ransac_px,
            max_dist=scfg.inter_max_dist, ratio=scfg.inter_ratio,
            image_wh=rig.image_size, lm_radius=scfg.local_map_radius_px,
            lm_max_dist=scfg.local_map_max_dist,
            gate_px=scfg.track_match_radius_px,
            fastpath_frac=fastpath_frac,
            fastpath_min=scfg.track_fastpath_min_inliers,
        )
        return pk

    _ = np.asarray(_stage_ab(0, scfg.track_fastpath_frac)[:21])  # compile
    _ = np.asarray(_stage_ab(0, 2.0)[:21])

    # ---- stage C: window BA (6 KFs, 2048 lms, 8192-obs tier) ----
    # kf-blocked observation layout + warm-window iteration budget: exactly
    # what the SLAM driver (_run_window_ba) compiles in steady state for
    # this feature budget (dynamic capacity tiers pick 8192 here).
    K, L = 6, 2048
    Ok = 8192 // K
    O = Ok * K  # blocked layout: O divisible by K
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
    # the driver's WARM window budget (SlamConfig.ba_iters x 2 gate
    # rounds) — what steady state actually compiles
    solve = jax.jit(
        lambda p: ba.ba_solve(p, iters=scfg.ba_iters, gate_rounds=2,
                              kf_blocked=True)
    )
    res = solve(problem)
    jax.block_until_ready(res.poses)

    # ---- stage D (diagnostic): VIO window solve (15-dof states + IMU
    # factors + GPS) at the same tier — the stage most likely to regress
    # silently because the happy-path fps formula never includes it ----
    from mcslam_tpu.backend import ba_vio, imu as imu_mod

    imu_params = imu_mod.ImuParams()
    dt_kf = 0.2
    S = 40  # imu samples per keyframe gap
    preints, pairs = [], []
    for k in range(K - 1):
        dts = jnp.full((S,), dt_kf / S, jnp.float32)
        gyro = jnp.asarray(rng.normal(0, 0.02, (S, 3)).astype(np.float32))
        accel = jnp.asarray(
            (rng.normal(0, 0.05, (S, 3)) + [0, 0, 9.81]).astype(np.float32)
        )
        preints.append(
            imu_mod.preintegrate(
                dts, gyro, accel, jnp.ones(S, bool),
                jnp.zeros(6, jnp.float32), imu_params
            )
        )
        pairs.append((k, k + 1))
    imu_factors = ba_vio.make_imu_factors(preints, pairs, capacity=K - 1,
                                          params=imu_params)
    D = 15
    vio_prior = jnp.zeros((K * D + 6, K * D + 6), jnp.float32).at[
        :D, :D
    ].set(jnp.eye(D) * 1e6)
    vio_problem = ba_vio.VioProblem(
        poses=ba_poses, vels=jnp.zeros((K, 3), jnp.float32),
        biases=jnp.zeros((K, 6), jnp.float32), landmarks=ba_lms,
        lm_valid=jnp.ones(L, bool), obs=obs,
        cam_T_body=rig.cam_T_ref, fxycxy=rig.fxycxy, imu=imu_factors,
        gps=None, E_T_V=jnp.eye(4, dtype=jnp.float32),
        prior_H=vio_prior, prior_b=jnp.zeros(K * D + 6, jnp.float32),
        kf_valid=jnp.ones(K, bool),
    )
    vio_jit = jax.jit(
        lambda p: ba_vio.vio_solve(p, iters=scfg.ba_iters, gate_rounds=2,
                                   kf_blocked=True)
    )
    vres = vio_jit(vio_problem)
    jax.block_until_ready(vres.poses)

    # ---- timing ----
    # NOTE: jax.block_until_ready is unreliable on tunneled TPU backends
    # (resolves before device completion); materializing to host is the
    # only trustworthy sync. Alternate two inputs to defeat any caching.
    def timeit(fn, n=20, reps=3):
        """Min of `reps` timed windows: the tunneled relay is a shared
        resource and a single window can be inflated 2-3x by unrelated
        load; the minimum tracks the device's actual cost."""
        _ = np.asarray(fn(0))  # warm + drain queue
        best = float("inf")
        for _rep in range(reps):
            t0 = time.perf_counter()
            for i in range(n):
                out = fn(i)
            _ = np.asarray(out)  # drain: measures pipelined throughput
            best = min(best, (time.perf_counter() - t0) / n)
        return best

    kf_interval = 4  # BA runs on keyframes only (~every 4th frame)

    # ---- DEVICE throughput: repeat-loop programs (scan of REPS bodies
    # with a carry-fed input perturbation, so iterations can't be hoisted
    # or value-cached). One dispatch per timed call amortizes the
    # tunnel's per-dispatch overhead (~1.5 ms here, ~0.1 ms on
    # direct-attached TPUs), leaving pure device compute — the number a
    # production deployment sees. The pipelined tunnel headline below
    # stays the conservative shared-relay figure. ----
    DREPS = 16

    def _scan_rep(body):
        return jax.jit(
            lambda seed: jax.lax.scan(body, seed, None, length=DREPS)[0]
        )

    def _ab_body(fp_frac):
        def body(c, _):
            cur = imgs[0] * (1.0 + 1e-7 * c)
            *_, pk = tk._build_and_track_step(
                key, cur, rig, ff0.im_desc, ff0.im_valid, d_prev_lm,
                d_map_pos, d_map_valid, d_map_desc, d_map_normal, d_cand,
                d_cand_valid, pred_T, num_points=NPTS, num_levels=NLVL,
                fast_threshold=20.0 / 255.0, min_threshold=7.0 / 255.0,
                max_intra=MAXI, min_z=0.5, max_z=40.0, angle_bins=BINS,
                approx_topk=True, num_hyp=scfg.ransac_hyps,
                px=scfg.ransac_px, max_dist=scfg.inter_max_dist,
                ratio=scfg.inter_ratio, image_wh=rig.image_size,
                lm_radius=scfg.local_map_radius_px,
                lm_max_dist=scfg.local_map_max_dist,
                gate_px=scfg.track_match_radius_px, fastpath_frac=fp_frac,
                fastpath_min=scfg.track_fastpath_min_inliers,
            )
            return jnp.sum(pk[:20]).astype(jnp.float32) * 1e-20, None
        return body

    def _ba_body(c, _):
        p = problem._replace(landmarks=problem.landmarks * (1.0 + 1e-7 * c))
        r = ba.ba_solve(p, iters=scfg.ba_iters, gate_rounds=2,
                        kf_blocked=True)
        return jnp.sum(r.poses).astype(jnp.float32) * 1e-20, None

    def _vio_body(c, _):
        p = vio_problem._replace(
            landmarks=vio_problem.landmarks * (1.0 + 1e-7 * c)
        )
        r = ba_vio.vio_solve(p, iters=scfg.ba_iters, gate_rounds=2,
                             kf_blocked=True)
        return jnp.sum(r.poses).astype(jnp.float32) * 1e-20, None

    _floor_fn = jax.jit(
        lambda x: jax.lax.scan(lambda c, _: (c + 1e-9, None), x, None,
                               length=DREPS)[0]
    )

    def _dev_time(f):
        def run(i):
            return f(jnp.float32(i))
        _ = np.asarray(run(0))
        best = float("inf")
        for r in range(3):
            t0 = time.perf_counter()
            out = run(r + 1)
            _ = np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        return best

    t_floor_dev = _dev_time(_floor_fn)
    dev_ab_fast = (_dev_time(_scan_rep(_ab_body(scfg.track_fastpath_frac)))
                   - t_floor_dev) / DREPS
    dev_ab_full = (_dev_time(_scan_rep(_ab_body(2.0)))
                   - t_floor_dev) / DREPS
    dev_ba = (_dev_time(_scan_rep(_ba_body)) - t_floor_dev) / DREPS
    dev_vio = (_dev_time(_scan_rep(_vio_body)) - t_floor_dev) / DREPS

    def pipeline_window(n_frames=32):
        """One steady-state window of the driver-shaped pipeline; returns
        seconds/frame. Frame i+1's build and the (async) BA are enqueued
        before frame i's tracking output is materialized."""
        prev, fetch = (d_prev_desc, d_prev_valid), None
        t0 = time.perf_counter()
        for i in range(n_frames):
            ff = stage_a(imgs[i % 2])
            pk = stage_b(key, ff, *prev)
            if i % kf_interval == 0:
                ba_out = solve(problem)
            if fetch is not None:
                _ = np.asarray(fetch)  # frame i-1 tracking result
            fetch, prev = pk, (ff.im_desc, ff.im_valid)
        _ = np.asarray(fetch)
        _ = np.asarray(ba_out.poses)
        return (time.perf_counter() - t0) / n_frames

    _ = pipeline_window(8)  # warm
    t_pipe = min(pipeline_window() for _ in range(3))

    t_a = timeit(lambda i: stage_a(imgs[i % 2]).im_desc.sum())
    t_b_prod = timeit(
        lambda i: stage_b(
            key, ff1 if i % 2 else ff0,
            *((ff0.im_desc, ff0.im_valid) if i % 2
              else (ff1.im_desc, ff1.im_valid)),
        )[:20].sum()
    )
    t_b_slow = timeit(
        lambda i: stage_b_slow(
            key, ff1 if i % 2 else ff0,
            *((ff0.im_desc, ff0.im_valid) if i % 2
              else (ff1.im_desc, ff1.im_valid)),
        )[:20].sum()
    )
    t_ab_prod = timeit(
        lambda i: _stage_ab(i, scfg.track_fastpath_frac)[:20].sum()
    )
    t_ab_slow = timeit(lambda i: _stage_ab(i, 2.0)[:20].sum())
    t_c = timeit(lambda i: solve(problem).poses.sum(), n=10, reps=5)
    t_d = timeit(lambda i: vio_jit(vio_problem).poses.sum(), n=10, reps=5)

    # Stage-B accounting: this bench scene is clean, so its production
    # dispatch would take the motion fast path ~always — flattering vs a
    # real noisy drive. The headline therefore mixes the two compiled
    # paths at the take-rate measured on the hard-mode synthetic drive
    # (textured world + photometric corruption — the most adversarial
    # scene in the suite, so the mix UNDER-states clean-footage runs).
    # scripts/measure_fastpath.py runs that drive through the production
    # driver ON THIS BACKEND and records stats[track_fastpath]/
    # [track_dispatch] to docs/fastpath_rate.json; when the file exists
    # the headline inherits the measured rate. Fallback: 22/34 frames
    # (0.65) measured on the CPU canary at production thresholds
    # (frac=0.6/min=30; the VIO blob scene measured 11/16, this bench
    # scene ~1.0).
    fast_share, fast_src = 0.65, "cpu-canary default"
    try:
        rate_file = pathlib.Path(__file__).parent / "docs" / \
            "fastpath_rate.json"
        with open(rate_file) as f:
            fp_rec = json.load(f)
        if fp_rec.get("dispatches", 0) >= 16:
            fast_share = float(fp_rec["rate"])
            fast_src = (f"measured on {fp_rec.get('backend', '?')} "
                        f"({fp_rec['taken']}/{fp_rec['dispatches']})")
    except (OSError, ValueError, KeyError):
        pass
    t_b = (fast_share * t_b_prod + (1.0 - fast_share) * t_b_slow) \
        if fast_taken > 0.5 else t_b_prod
    t_ab = (fast_share * t_ab_prod + (1.0 - fast_share) * t_ab_slow) \
        if fast_taken > 0.5 else t_ab_prod

    # Headline: pipelined per-stage throughput (the production-TPU number).
    # Since round 5 the steady-state driver dispatches frame build +
    # tracking as ONE fused program (slam.process_image / fused_frontend),
    # so the headline is t_AB + t_C/kf_interval; the split stage A / B
    # numbers stay on stderr for the breakdown and round-over-round
    # comparability. The per-frame-fetch loop below pays the tunneled
    # relay's ~20 ms host round-trip latency PER FRAME — a tunnel artifact
    # (~0.1 ms on directly attached TPUs), reported as a diagnostic, not
    # the device's throughput.
    per_frame = t_ab + t_c / kf_interval
    fps = 1.0 / per_frame
    # VIO configuration (the reference's flagship mode): same fused
    # front-end, VIO window solve instead of vision-only BA
    fps_vio = 1.0 / (t_ab + t_d / kf_interval)
    # device throughput (repeat-loop measurement above): what a
    # direct-attached TPU sees, the tunnel's per-dispatch overhead
    # amortized out
    dev_ab = (fast_share * dev_ab_fast + (1.0 - fast_share) * dev_ab_full) \
        if fast_taken > 0.5 else dev_ab_fast
    dev_per_frame = dev_ab + dev_ba / kf_interval
    fps_dev = 1.0 / dev_per_frame
    fps_dev_vio = 1.0 / (dev_ab + dev_vio / kf_interval)
    print(
        f"# stage_a(frame build)={t_a*1e3:.2f}ms stage_b(track)={t_b*1e3:.2f}ms"
        f" [fast-path dispatch {t_b_prod*1e3:.2f}, full portfolio "
        f"{t_b_slow*1e3:.2f}, mixed at {fast_share:.0%} fast ({fast_src})]"
        f" stage_ab(FUSED build+track)={t_ab*1e3:.2f}ms"
        f" [fast {t_ab_prod*1e3:.2f}, full {t_ab_slow*1e3:.2f}]"
        f" stage_c(BA solve)={t_c*1e3:.2f}ms"
        f" stage_d(VIO solve)={t_d*1e3:.2f}ms",
        file=sys.stderr,
    )
    print(
        f"# fps assumes BA amortized over kf_interval={kf_interval} frames "
        f"(BA runs per keyframe, not per frame): per-frame = "
        f"{t_ab*1e3:.2f} + {t_c*1e3:.2f}/{kf_interval} ms "
        f"-> {fps:.1f} fps (VIO: + {t_d*1e3:.2f}/{kf_interval} "
        f"-> {fps_vio:.1f} fps)",
        file=sys.stderr,
    )
    print(
        f"# tunnel diagnostic: per-frame-fetch loop {t_pipe*1e3:.2f} ms/frame"
        f" ({1.0/t_pipe:.1f} fps) — bounded by the relay's ~20 ms host"
        f" round-trip, not by device compute",
        file=sys.stderr,
    )
    print(
        f"# DEVICE throughput (repeat-loop, dispatch floor amortized):"
        f" AB fast {dev_ab_fast*1e3:.2f} ms, full {dev_ab_full*1e3:.2f},"
        f" BA {dev_ba*1e3:.2f}, VIO {dev_vio*1e3:.2f} -> per-frame"
        f" {dev_per_frame*1e3:.2f} ms = {fps_dev:.1f} fps (VIO"
        f" {fps_dev_vio:.1f}; floor {t_floor_dev*1e3/DREPS:.2f} ms/dispatch"
        f" through this tunnel; ~0.1 on direct-attached TPUs)",
        file=sys.stderr,
    )
    # Aux-stage numbers (loop spike global-BA/PGO, reloc query, BoW
    # transform) ride along in the same single JSON line when
    # scripts/bench_aux.py has written docs/bench_aux.json on this
    # backend — so non-VO stages are recorded round-over-round and
    # can't regress silently (their own "backend" key says where they
    # were measured).
    rec = {
        "metric": "frontend_ba_fps_4cam_vga",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 10.0, 2),
        # the visual-inertial configuration (reference flagship mode,
        # SURVEY §3.4) rides along so the fused-sensor path can't regress
        # silently (VERDICT r4 item 6)
        "frontend_vio_fps": round(fps_vio, 2),
        # pure device compute (repeat-loop, per-dispatch tunnel overhead
        # amortized): the production-TPU number. The headline `value`
        # stays the conservative tunneled figure.
        "device_fps": round(fps_dev, 2),
        "device_vio_fps": round(fps_dev_vio, 2),
    }
    try:
        aux_file = pathlib.Path(__file__).parent / "docs" / "bench_aux.json"
        with open(aux_file) as f:
            rec["aux"] = json.load(f)
    except (OSError, ValueError):
        pass
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
