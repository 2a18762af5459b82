"""Auxiliary benchmarks: the stages OUTSIDE the happy-path fps formula
that are most likely to regress silently (VERDICT round-2 weakness #9) —
the loop-closure spike (PGO + global BA), relocalization-mode queries,
and the BoW vocabulary transform.

Prints one line per stage; run on the TPU (ambient env). These are
diagnostics, intentionally separate from bench.py so the driver's bench
budget stays bounded (every extra program is minutes of remote compile
through the tunnel). Results are also written machine-readable to
docs/bench_aux.json (override with --out); bench.py embeds that file
as an "aux" key in its single JSON line so these stages are recorded
round-over-round next to the headline (VERDICT r3 item #8).
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def timeit(fn, n=10, reps=3):
    _ = np.asarray(fn(0))
    best = float("inf")
    for _rep in range(reps):
        t0 = time.perf_counter()
        for i in range(n):
            out = fn(i)
        _ = np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(Path(__file__).parent.parent
                                         / "docs" / "bench_aux.json"))
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from mcslam_tpu.utils import compile_cache

    compile_cache.enable()  # cache hits make repeat chip sessions ~free

    from mcslam_tpu.backend import ba, pgo
    from mcslam_tpu.data import synthetic
    from mcslam_tpu.frontend import ransac
    from mcslam_tpu.loop import vocab as vocab_mod
    from mcslam_tpu.slam import SlamConfig

    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    results = {"backend": str(jax.devices()[0])}
    scfg = SlamConfig()
    rng = np.random.RandomState(0)
    C = 4
    rig = synthetic.make_synthetic_rig(
        synthetic.SyntheticRigSpec(num_cams=C, image_size=(640, 480))
    )

    # ---- loop-closure spike 1: global BA at flagship size ----
    # (cfg.global_ba_max_kfs keyframes x global_ba_lm_capacity landmarks,
    # global_ba_obs_per_kf observations per KF, cold iteration budget)
    K = scfg.global_ba_max_kfs  # 64
    L = scfg.global_ba_lm_capacity  # 8192
    Ok = scfg.global_ba_obs_per_kf  # 512
    O = K * Ok
    poses = jnp.tile(jnp.eye(4, dtype=jnp.float32), (K, 1, 1))
    lms = jnp.asarray(
        (rng.uniform(-20, 20, (L, 3)) + [0, 0, 12]).astype(np.float32)
    )
    obs = ba.BAObservations(
        kf=jnp.asarray(np.repeat(np.arange(K, dtype=np.int32), Ok)),
        cam=jnp.asarray(rng.randint(0, C, O), jnp.int32),
        lm=jnp.asarray(rng.randint(0, L, O), jnp.int32),
        uv=jnp.asarray(rng.uniform(0, 640, (O, 2)).astype(np.float32)),
        sigma2=jnp.ones(O, jnp.float32),
        valid=jnp.ones(O, bool),
    )
    prior_H = jnp.zeros((K * 6, K * 6), jnp.float32).at[:6, :6].set(
        jnp.eye(6) * 1e6
    )
    problem = ba.BAProblem(
        poses=poses, landmarks=lms, lm_valid=jnp.ones(L, bool), obs=obs,
        cam_T_ref=rig.cam_T_ref, fxycxy=rig.fxycxy, prior_H=prior_H,
        prior_b=jnp.zeros(K * 6, jnp.float32), kf_valid=jnp.ones(K, bool),
    )
    gba = jax.jit(lambda p: ba.ba_solve(
        p, iters=scfg.global_ba_iters, gate_rounds=1, kf_blocked=True
    ))
    t = timeit(lambda i: gba(problem).poses.sum(), n=3, reps=3)
    print(f"global BA (K={K}, L={L}, O={O}, {scfg.global_ba_iters} it)"
          f" {t*1e3:9.2f} ms")
    results["global_ba_ms"] = round(t * 1e3, 2)

    # With async_gba (default, driver_loop._finish_pending_gba) the frame
    # loop only pays the DISPATCH of this solve at closure time — the
    # fetch lands frames later. Measure dispatch cost: call the jitted
    # solve and stop the clock before materializing anything (JAX
    # dispatch is async); drain afterwards so queue backpressure can't
    # leak into the next rep. Closure-frame synchronous overhead =
    # pgo_se3_ms + gba_dispatch_ms (+ landmark merge, host-side, ~0).
    best = float("inf")
    for _ in range(5):
        _ = np.asarray(gba(problem).poses)  # drain
        t0 = time.perf_counter()
        out = gba(problem)
        best = min(best, time.perf_counter() - t0)
        _ = np.asarray(out.poses)
    print(f"global BA dispatch only (async_gba closure cost)"
          f" {best*1e3:9.2f} ms")
    results["gba_dispatch_ms"] = round(best * 1e3, 2)

    # ---- loop-closure spike 2: SE(3) and Sim(3) PGO over the trajectory ----
    N = 64
    g_poses = jnp.tile(jnp.eye(4, dtype=jnp.float32), (N, 1, 1))
    ii, jj, meas, w = pgo.build_odometry_edges(g_poses)
    # one loop edge first -> last
    ii = jnp.concatenate([ii, jnp.asarray([0], jnp.int32)])
    jj = jnp.concatenate([jj, jnp.asarray([N - 1], jnp.int32)])
    meas = jnp.concatenate([meas, jnp.eye(4, dtype=jnp.float32)[None]])
    w = jnp.concatenate([w, jnp.ones(1, jnp.float32)])
    graph = pgo.PoseGraph(
        poses=g_poses, edge_i=ii, edge_j=jj, edge_meas=meas,
        edge_weight=w, edge_valid=jnp.ones(ii.shape[0], bool),
        anchor=jnp.asarray(0, jnp.int32),
    )
    pg = jax.jit(lambda g: pgo.pgo_solve(g, iters=10))
    t = timeit(lambda i: pg(graph).sum(), n=5, reps=3)
    print(f"PGO SE(3)  (N={N}, 10 it)            {t*1e3:9.2f} ms")
    results["pgo_se3_ms"] = round(t * 1e3, 2)
    pgs = jax.jit(lambda g: pgo.pgo_solve_sim3(g, iters=10)[0])
    t = timeit(lambda i: pgs(graph).sum(), n=5, reps=3)
    print(f"PGO Sim(3) (N={N}, 10 it)            {t*1e3:9.2f} ms")
    results["pgo_sim3_ms"] = round(t * 1e3, 2)

    # ---- reloc mode: BoW transform + database matvec + GP3P verify ----
    descs = synthetic.make_descriptors(4000, seed=1)
    vocab = vocab_mod.Vocabulary.train(descs, k=6, depth=3, iters=3)
    q_desc = jnp.asarray(descs[:768])
    q_valid = jnp.ones(768, bool)
    tr = jax.jit(vocab.transform)
    t = timeit(lambda i: tr(q_desc, q_valid).sum())
    print(f"BoW transform (768 desc)             {t*1e3:9.2f} ms")
    results["bow_transform_ms"] = round(t * 1e3, 2)

    W = vocab.num_words
    db = jnp.asarray(rng.rand(512, W).astype(np.float32))
    bow = tr(q_desc, q_valid)

    @jax.jit
    def k_retrieve(bow):
        return (db @ bow).argmax()

    t = timeit(lambda i: k_retrieve(bow))
    print(f"DB retrieve matvec (512 entries)     {t*1e3:9.2f} ms")
    results["db_retrieve_ms"] = round(t * 1e3, 2)

    M = 768
    Xw = jnp.asarray((rng.uniform(-5, 5, (M, 3)) + [0, 0, 8]).astype(np.float32))
    uv = jnp.asarray(rng.uniform(0, 640, (M, 2)).astype(np.float32))
    cTr = jnp.tile(jnp.eye(4, dtype=jnp.float32), (M, 1, 1))
    fx = jnp.tile(jnp.asarray([[400.0, 400.0, 320.0, 240.0]], jnp.float32),
                  (M, 1))

    def k_verify(i):
        rr = ransac.ransac_pnp(
            jax.random.PRNGKey(i), Xw, uv, cTr, fx, jnp.ones(M, bool),
            num_hyp=256, px_thresh=5.0,
        )
        return rr.world_T_ref.sum()

    t = timeit(k_verify)
    print(f"reloc GP3P verify (256 hyp, 768 pts) {t*1e3:9.2f} ms")
    results["reloc_gp3p_ms"] = round(t * 1e3, 2)

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f)
        f.write("\n")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
