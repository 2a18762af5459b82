"""Paired-interleaved A/B harness for trace-time env flags.

The round-4 relay data showed 2-3x wall-clock swings between *processes*
on identical programs (docs/PERF.md methodology), so separate-process
A/Bs cannot adjudicate sub-ms effects. This harness hosts BOTH variants
in one process and interleaves timed windows ABAB...: every adjacent
(A, B) window pair sees the same relay load, and the reported statistic
is the MEDIAN of the paired per-window deltas with its spread.

Correctness subtlety this design exists for: the flags are read at
TRACE time inside functions reached through module-level `jax.jit`
wrappers, whose tracing caches are process-wide — flipping os.environ
alone does NOT retrace, and `jax.clear_caches()` alone would silently
re-point variant A's wrapper at variant B's trace on its next call.
Each variant is therefore AOT-compiled (`jit(...).lower(...).compile()`)
into a standalone executable after a cache clear under its env; the two
executables coexist and are immune to later cache state.

Usage:
    python scripts/ab_paired.py FLAG [FLAG ...] [--pairs 8] [--n 12]

FLAG -> (workload, env var) mapping below. Output: one JSON line per
flag on stdout; progress on stderr.

Flags (see the read sites for semantics; no* flags are default-ON
features measured by switching them OFF, so a POSITIVE delta confirms
the default):
    subcell      frame  MCSLAM_SEL_SUBCELL       ops/orb.py
    latecompact  frame  MCSLAM_LATE_COMPACT      ops/orb.py
    nohskip      frame  MCSLAM_FAST_NO_HSKIP     ops/orb.py
    unroll       track  MCSLAM_UNROLL            frontend/pose_opt.py
    nounroll     track  MCSLAM_NO_UNROLL         frontend/pose_opt.py
    chol6        track  MCSLAM_CHOL6             frontend/pose_opt.py
    invcdf       track  MCSLAM_INVCDF_SAMPLING   frontend/ransac.py
    noaug7       track  MCSLAM_NO_AUG7           frontend/pose_opt.py
    nofusedmatch track  MCSLAM_NO_FUSED_MATCH    tracking_kernels.py
Suffix a flag with "@ab" (e.g. subcell@ab) to time it on the fused
build+track production program instead of its default workload.
"""

import argparse
import hashlib
import json
import os
import statistics
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

FLAGS = {
    "subcell": ("frame", "MCSLAM_SEL_SUBCELL"),
    "latecompact": ("frame", "MCSLAM_LATE_COMPACT"),
    "nohskip": ("frame", "MCSLAM_FAST_NO_HSKIP"),
    "unroll": ("track", "MCSLAM_UNROLL"),
    "nounroll": ("track", "MCSLAM_NO_UNROLL"),
    "chol6": ("track", "MCSLAM_CHOL6"),
    "invcdf": ("track", "MCSLAM_INVCDF_SAMPLING"),
    "noaug7": ("track", "MCSLAM_NO_AUG7"),
    "nofusedmatch": ("track", "MCSLAM_NO_FUSED_MATCH"),
    "nofusedblur": ("frame", "MCSLAM_NO_FUSED_BLUR"),
    "noselinkernel": ("frame", "MCSLAM_NO_SEL_INKERNEL"),
    "nopallasrefine": ("track", "MCSLAM_NO_PALLAS_REFINE"),
    "fusedorient": ("frame", "MCSLAM_FUSED_ORIENT"),
    "tileh32": ("frame", "MCSLAM_FAST_TILE_H=32"),
    "tileh96": ("frame", "MCSLAM_FAST_TILE_H=96"),
    "tileh128": ("frame", "MCSLAM_FAST_TILE_H=128"),
    "tileh160": ("frame", "MCSLAM_FAST_TILE_H=160"),
}


def _build_workloads(which):
    """Return {name: make_fn}. Each make_fn() AOT-compiles the workload
    under the CURRENT env (call it after setting the flag and clearing
    jax caches) and returns a per-iteration callable f(i) whose result's
    np.asarray(...) materialization fences the device."""
    import jax
    import jax.numpy as jnp

    from mcslam_tpu.utils import compile_cache

    compile_cache.enable()

    from mcslam_tpu import tracking_kernels as tk
    from mcslam_tpu.data import synthetic
    from mcslam_tpu.frontend import frame as frame_mod
    from mcslam_tpu.slam import SlamConfig

    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    C, H, W = 4, 480, 640
    NPTS, NLVL, MAXI, BINS = 768, 4, 2048, 16
    rig = synthetic.make_synthetic_rig(
        synthetic.SyntheticRigSpec(num_cams=C, image_size=(W, H))
    )
    poses = synthetic.smooth_trajectory(2, step_angle=0.02)
    lms = synthetic.make_landmarks(3000, depth_range=(4.0, 15.0))
    imgs_np = synthetic.render_blob_images(rig, poses, lms)
    imgs = [jnp.asarray(imgs_np[i]) for i in range(2)]
    key = jax.random.PRNGKey(0)
    scfg = SlamConfig()

    def make_frame():
        body = jax.jit(
            lambda im: frame_mod.build_frame(
                im, rig, num_points=NPTS, num_levels=NLVL,
                max_intra=MAXI, angle_bins=BINS,
            ).im_desc.sum()
        )
        compiled = body.lower(imgs[0]).compile()
        fn = lambda i: compiled(imgs[i % 2])  # noqa: E731
        fn.hlo_hash = _hlo_hash(compiled)
        return fn

    state = {}

    def _track_inputs():
        """Shared tracking-state fixture (built once, under whichever
        variant env is active first — it only produces input DATA, the
        timed programs are compiled separately per variant)."""
        if state:
            return state
        ff0 = frame_mod.build_frame(
            imgs[0], rig, num_points=NPTS, num_levels=NLVL,
            max_intra=MAXI, angle_bins=BINS)
        ff1 = frame_mod.build_frame(
            imgs[1], rig, num_points=NPTS, num_levels=NLVL,
            max_intra=MAXI, angle_bins=BINS)
        M = int(ff0.im_valid.shape[0])
        valid0 = np.asarray(ff0.im_valid) & np.asarray(ff0.im_has_depth)
        pos0 = np.asarray(ff0.im_point3d)
        CAP = 65536
        map_pos = np.zeros((CAP, 3), np.float32)
        map_pos[:M] = pos0
        map_valid = np.zeros(CAP, bool)
        map_valid[:M] = valid0
        map_desc = np.zeros((CAP, 8), np.uint32)
        map_desc[:M] = np.asarray(ff0.im_desc)
        nrm = -pos0 / np.maximum(
            np.linalg.norm(pos0, axis=1, keepdims=True), 1e-6)
        map_normal = np.zeros((CAP, 3), np.float32)
        map_normal[:M] = nrm
        LML = scfg.local_map_landmarks
        cand = np.flatnonzero(map_valid)[:LML]
        cand_pad = np.zeros(LML, np.int32)
        cand_pad[: len(cand)] = cand
        state.update(
            ff0=ff0, ff1=ff1,
            prev_lm=jnp.asarray(
                np.where(valid0, np.arange(M, dtype=np.int32), -1)),
            map_pos=jnp.asarray(map_pos), map_valid=jnp.asarray(map_valid),
            map_desc=jnp.asarray(map_desc),
            map_normal=jnp.asarray(map_normal),
            cand=jnp.asarray(cand_pad),
            cand_valid=jnp.asarray(np.arange(LML) < len(cand)),
            pred_T=jnp.eye(4, dtype=jnp.float32),
        )
        return state

    def _make_track(fastpath_frac):
        s = _track_inputs()

        def body(cur, prev):
            return tk._track_and_map_step(
                key, cur.im_desc, cur.im_valid, cur.im_uv_ref,
                cur.im_anchor_cam, cur.im_sigma2, cur.im_point3d,
                cur.im_has_depth, prev.im_desc, prev.im_valid, s["prev_lm"],
                s["map_pos"], s["map_valid"], s["map_desc"],
                s["map_normal"], s["cand"], s["cand_valid"],
                rig.cam_T_ref, rig.fxycxy, s["pred_T"],
                scfg.ransac_hyps, scfg.ransac_px, scfg.inter_max_dist,
                scfg.inter_ratio, rig.image_size, scfg.local_map_radius_px,
                scfg.local_map_max_dist, scfg.track_match_radius_px,
                fastpath_frac, scfg.track_fastpath_min_inliers,
            )[:20].sum()

        compiled = jax.jit(body).lower(s["ff0"], s["ff1"]).compile()
        fn = lambda i: (compiled(s["ff1"], s["ff0"]) if i % 2  # noqa: E731
                        else compiled(s["ff0"], s["ff1"]))
        fn.hlo_hash = _hlo_hash(compiled)
        return fn

    def make_track():
        return _make_track(scfg.track_fastpath_frac)

    def make_trackslow():
        # fastpath_frac > 1 forces the full portfolio branch every call:
        # the workload for flags that only touch the RANSAC stages (the
        # default-scene motion prediction is strong, so plain `track`
        # times the fast path and never executes the portfolio)
        return _make_track(2.0)

    def make_ab():
        s = _track_inputs()

        def body(cur, prev):
            *_, pk = tk._build_and_track_step(
                key, cur, rig, prev.im_desc, prev.im_valid, s["prev_lm"],
                s["map_pos"], s["map_valid"], s["map_desc"],
                s["map_normal"], s["cand"], s["cand_valid"], s["pred_T"],
                num_points=NPTS, num_levels=NLVL,
                fast_threshold=20.0 / 255.0, min_threshold=7.0 / 255.0,
                max_intra=MAXI, min_z=0.5, max_z=40.0, angle_bins=BINS,
                approx_topk=True,
                num_hyp=scfg.ransac_hyps, px=scfg.ransac_px,
                max_dist=scfg.inter_max_dist, ratio=scfg.inter_ratio,
                image_wh=rig.image_size,
                lm_radius=scfg.local_map_radius_px,
                lm_max_dist=scfg.local_map_max_dist,
                gate_px=scfg.track_match_radius_px,
                fastpath_frac=scfg.track_fastpath_frac,
                fastpath_min=scfg.track_fastpath_min_inliers,
            )
            return pk[:20].sum()

        compiled = jax.jit(body).lower(imgs[0], s["ff1"]).compile()
        fn = lambda i: compiled(imgs[i % 2], s["ff0"] if i % 2  # noqa: E731
                                else s["ff1"])
        fn.hlo_hash = _hlo_hash(compiled)
        return fn

    makers = {"frame": make_frame, "track": make_track,
              "trackslow": make_trackslow, "ab": make_ab}
    return {k: makers[k] for k in which}


def _hlo_hash(compiled):
    try:
        return hashlib.sha1(compiled.as_text().encode()).hexdigest()[:12]
    except Exception:  # noqa: BLE001 - fingerprinting is best-effort
        return "unavailable"


def _window_ms(fn, n):
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(i)
    _ = np.asarray(out)  # the only trustworthy fence on the tunnel
    return (time.perf_counter() - t0) / n * 1e3


def run_flag(flag, workload_maker, env_var, pairs, n):
    import jax

    base_env = dict(os.environ)

    env_var, _, env_val = env_var.partition("=")

    def make_variant(on):
        os.environ.pop(env_var, None)
        if on:
            os.environ[env_var] = env_val or "1"
        # the flag is read at trace time behind process-wide tracing
        # caches; clear them so this variant's AOT lower re-traces under
        # the env now in effect (backend compiles stay disk-cached)
        jax.clear_caches()
        try:
            t0 = time.perf_counter()
            fn = workload_maker()
            _ = np.asarray(fn(0))  # warm executable + drain queue
            print(f"#   {flag} variant on={on} build+compile "
                  f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
            return fn
        finally:
            os.environ.clear()
            os.environ.update(base_env)

    fa, fb = make_variant(False), make_variant(True)
    same_prog = (fa.hlo_hash == fb.hlo_hash != "unavailable")
    print(f"#   {flag} HLO base={fa.hlo_hash} flag={fb.hlo_hash}"
          + ("  ** IDENTICAL PROGRAMS — the flag did not change this "
             "workload; delta is pure noise **" if same_prog else ""),
          file=sys.stderr)
    _ = _window_ms(fa, n)
    _ = _window_ms(fb, n)  # one throwaway window each: settle the relay
    deltas, a_ms, b_ms = [], [], []
    for p in range(pairs):
        ta = _window_ms(fa, n)
        tb = _window_ms(fb, n)
        a_ms.append(ta)
        b_ms.append(tb)
        deltas.append(tb - ta)
        print(f"#   pair {p}: base {ta:.2f} ms, flag {tb:.2f} ms, "
              f"delta {tb - ta:+.2f}", file=sys.stderr)
    med = statistics.median(deltas)
    q = statistics.quantiles(deltas, n=4) if len(deltas) >= 4 else \
        [min(deltas), med, max(deltas)]
    return {
        "flag": flag, "env": env_var, "pairs": pairs, "iters_per_window": n,
        "hlo_base": fa.hlo_hash, "hlo_flag": fb.hlo_hash,
        "identical_programs": same_prog,
        "base_ms": round(statistics.median(a_ms), 3),
        "flag_ms": round(statistics.median(b_ms), 3),
        "delta_ms_median": round(med, 3),
        "delta_ms_iqr": [round(q[0], 3), round(q[-1], 3)],
        "deltas_ms": [round(d, 3) for d in deltas],
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("flags", nargs="+",
                    help=f"one of {sorted(FLAGS)} (suffix @ab to run on "
                         "the fused build+track program)")
    ap.add_argument("--pairs", type=int, default=8)
    ap.add_argument("--n", type=int, default=12)
    args = ap.parse_args(argv)

    specs = []
    for f in args.flags:
        name, _, wl_override = f.partition("@")
        if name in FLAGS:
            wl, env = FLAGS[name]
        elif "=" in name:
            # raw VAR=value flag, e.g. MCSLAM_REF_SCHED=8,4@track —
            # times `value` against the var being unset
            env = name
            wl = "track"
        else:
            ap.error(f"unknown flag {name!r}")
        specs.append((f, wl_override or wl, env))

    makers = _build_workloads({wl for _, wl, _ in specs})
    for f, wl, env in specs:
        rec = run_flag(f, makers[wl], env, args.pairs, args.n)
        rec["workload"] = wl
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
