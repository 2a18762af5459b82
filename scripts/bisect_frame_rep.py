#!/usr/bin/env python
"""Repeat-loop frame-build bisection: true per-stage device cost.

Standalone single-dispatch timings on the tunneled relay are floor-
dominated (~1-2 ms/dispatch under load), so sub-ms stages all measure
the same (docs/onchip_r05/bisect_frame2.out: eight stages, all ~2.1 ms).
Here each stage runs REPS times inside ONE jitted lax.scan whose carry
feeds back into the input (a 1e-7-scale perturbation — defeats
loop-invariant hoisting and CSE without changing the workload), so
per-rep cost = (t_program - t_empty_scan) / REPS with the dispatch
floor paid once. The floor itself is reported from an empty scan.

Stages mirror the PRODUCTION round-5 frame build: the select-fused FAST
kernel (blur + selection in-kernel), candidate top-N glue, patch DMA,
orientation, descriptor, intra match, triangulation.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np  # noqa: E402

REPS = 32


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

    from mcslam_tpu.data import synthetic
    from mcslam_tpu.frontend import frame as frame_mod
    from mcslam_tpu.ops import image as image_ops
    from mcslam_tpu.ops import orb

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    C, H, W = 4, 480, 640
    NPTS, NLVL, MAXI = 768, 4, 2048
    rig = synthetic.make_synthetic_rig(
        synthetic.SyntheticRigSpec(num_cams=C, image_size=(W, H))
    )
    poses = synthetic.smooth_trajectory(2, step_angle=0.02)
    lms = synthetic.make_landmarks(3000, depth_range=(4.0, 15.0))
    imgs = jnp.asarray(synthetic.render_blob_images(rig, poses, lms)[0])

    def rep(stage, x0):
        """One jitted program running `stage` REPS times; the carry
        perturbs the input (1e-7 scale) so XLA can't hoist the loop
        body, and the seed argument varies per timed call so nothing
        value-caches."""
        def body(c, _):
            out = stage(x0 * (1.0 + 1e-7 * c))
            return jnp.sum(out).astype(jnp.float32) * 1e-20, None
        return jax.jit(
            lambda seed: jax.lax.scan(body, seed, None, length=REPS)[0]
        )

    # floor: an empty-ish scan (one add per step)
    floor_fn = jax.jit(
        lambda x: jax.lax.scan(lambda c, _: (c + 1e-9, None),
                               x, None, length=REPS)[0]
    )
    t_floor = timeit(lambda i: floor_fn(jnp.float32(i)))

    results = {}

    # --- stage mocks shaped like production (see orb.extract_orb_rig) ---
    budgets = orb._level_budget(NPTS, NLVL, 1.2)
    maxb = max(budgets)
    levels = image_ops.build_pyramid(imgs, NLVL, 1.2)
    hw = [(lv.shape[-2], lv.shape[-1]) for lv in levels]
    H0, W0 = levels[0].shape[-2:]
    stacked = jnp.concatenate(
        [
            jnp.pad(lv, ((0, 0), (0, H0 - lv.shape[-2]),
                         (0, W0 - lv.shape[-1])), mode="edge")
            for lv in levels
        ],
        axis=0,
    )
    h_l = jnp.repeat(jnp.asarray([h for h, _ in hw], jnp.int32), C)
    w_l = jnp.repeat(jnp.asarray([w for _, w in hw], jnp.int32), C)

    def s_pyramid(im):
        lv = image_ops.build_pyramid(im, NLVL, 1.2)
        st = jnp.concatenate(
            [
                jnp.pad(l_, ((0, 0), (0, H0 - l_.shape[-2]),
                             (0, W0 - l_.shape[-1])), mode="edge")
                for l_ in lv
            ],
            axis=0,
        )
        return st
    f_pyr = rep(s_pyramid, imgs)
    results["pyramid+pad"] = timeit(lambda i: f_pyr(jnp.float32(i)))

    from mcslam_tpu.ops.fast_pallas import fast_select_pallas
    taps = image_ops._np_gaussian_taps(7, 2.0)

    def s_fastsel(st):
        blur, cv, cr = fast_select_pallas(
            st, 7.0 / 255.0, 20.0 / 255.0, h_l, w_l, taps=taps
        )
        return jnp.sum(cv) + jnp.sum(blur[:, ::64, ::64])
    f_fs = rep(s_fastsel, stacked)
    results["FAST+blur+select kernel"] = timeit(
        lambda i: f_fs(jnp.float32(i))
    )

    # the full extraction and frame build, repeat-looped
    def s_extract(im):
        kp = orb.extract_orb_rig(im, num_points=NPTS, num_levels=NLVL,
                                 angle_bins=16)
        return kp.desc.sum() + kp.xy.sum()
    f_ex = rep(s_extract, imgs)
    results["FULL extract_orb_rig"] = timeit(lambda i: f_ex(jnp.float32(i)))

    def s_frame(im):
        ff = frame_mod.build_frame(im, rig, num_points=NPTS,
                                   num_levels=NLVL, max_intra=MAXI,
                                   angle_bins=16)
        return ff.im_desc.sum() + ff.im_point3d.sum()
    f_fr = rep(s_frame, imgs)
    results["FULL frame build"] = timeit(lambda i: f_fr(jnp.float32(i)))

    # intra + triangulate = frame minus extract (they share the program)
    floor_ms = t_floor * 1e3
    print(f"{'dispatch floor (empty scan)':32s} {floor_ms:7.2f} ms total")
    for name, t in results.items():
        per = (t - t_floor) / REPS * 1e3
        print(f"{name:32s} {per:7.3f} ms/rep   ({t*1e3:7.1f} total)",
              flush=True)
    ex = (results["FULL frame build"] - results["FULL extract_orb_rig"]) \
        / REPS * 1e3
    print(f"{'intra+tri (frame - extract)':32s} {ex:7.3f} ms/rep")
    pe = (results["FULL extract_orb_rig"]
          - results["FAST+blur+select kernel"]
          - results["pyramid+pad"]) / REPS * 1e3
    print(f"{'per-kp tail (extract - fast - pyr)':32s} {pe:7.3f} ms/rep")


if __name__ == "__main__":
    main()
