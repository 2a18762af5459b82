"""Bisect the window-BA solve (bench stage C) into linearize / assemble /
Schur-solve and time each standalone, plus A/B variants:
  - jnp.linalg.solve vs linalg3.chol_solve_nn on the (6K, 6K) Schur system
  - warm iteration budget sweep

Run on the TPU (ambient env); CPU works for smoke only.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def timeit(fn, n=10, reps=5):
    _ = np.asarray(fn(0))
    best = float("inf")
    for _rep in range(reps):
        t0 = time.perf_counter()
        for i in range(n):
            out = fn(i)
        _ = np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from mcslam_tpu.utils import compile_cache

    compile_cache.enable()  # cache hits make repeat chip sessions ~free

    from mcslam_tpu.backend import ba
    from mcslam_tpu.data import synthetic
    from mcslam_tpu.geometry import linalg3
    from mcslam_tpu.slam import SlamConfig

    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    scfg = SlamConfig()
    C, W = 4, 640
    rig = synthetic.make_synthetic_rig(
        synthetic.SyntheticRigSpec(num_cams=C, image_size=(W, 480))
    )
    K, L = 6, 2048
    Ok = 8192 // K
    O = Ok * K
    rng = np.random.RandomState(0)
    poses = jnp.tile(jnp.eye(4, dtype=jnp.float32), (K, 1, 1))
    lms = jnp.asarray(
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
        poses=poses, landmarks=lms, lm_valid=jnp.ones(L, bool), obs=obs,
        cam_T_ref=rig.cam_T_ref, fxycxy=rig.fxycxy, prior_H=prior_H,
        prior_b=jnp.zeros(K * 6, jnp.float32), kf_valid=jnp.ones(K, bool),
    )

    # --- sub-stage: linearize (residuals + jacobians) ---
    # (problem passed as an ARGUMENT — closed-over constants get
    # constant-folded by XLA and time as 0)
    @jax.jit
    def k_linearize(p):
        r, Jp, Jl, w = ba._residuals_and_jacobians(p, 2.5)
        return r.sum() + Jp.sum() + Jl.sum() + w.sum()

    # --- sub-stage: full assembly ---
    oh = ba._make_onehots(problem, True)

    @jax.jit
    def k_assemble(p):
        r, Jp, Jl, w = ba._residuals_and_jacobians(p, 2.5)
        Hpp, gp, Hll, gl, Wc = ba._assemble(
            p, r, Jp, Jl, w, onehots=oh, kf_blocked=True
        )
        return Hpp.sum() + gp.sum() + Hll.sum() + gl.sum() + Wc.sum()

    # --- sub-stage: Schur solve (LU vs unrolled Cholesky) ---
    r, Jp, Jl, w = ba._residuals_and_jacobians(problem, 2.5)
    Hpp, gp, Hll, gl, Wc = ba._assemble(
        problem, r, Jp, Jl, w, onehots=oh, kf_blocked=True
    )
    Hpp, gp, Hll, gl, Wc = jax.tree.map(
        jax.block_until_ready, (Hpp, gp, Hll, gl, Wc)
    )

    @jax.jit
    def k_schur_lu(Hpp, gp, Hll, gl, Wc, lam):
        dp, dl = ba._schur_solve(
            Hpp, gp, Hll, gl, Wc, lam, jnp.ones(L, bool)
        )
        return dp.sum() + dl.sum()

    @jax.jit
    def k_schur_chol(Hpp, gp, Hll, gl, Wc, lam):
        K6 = Hpp.shape[0]
        eye3 = jnp.eye(3, dtype=Hpp.dtype)
        Hll_d = Hll + (lam + 1e-6) * eye3[None]
        Hll_inv = linalg3.inv3(Hll_d)
        Wm = Wc.reshape(K6, L, 3)
        WHinv = jnp.einsum("plj,ljk->plk", Wm, Hll_inv)
        S = (Hpp + lam * jnp.eye(K6, dtype=Hpp.dtype)
             - jnp.einsum("plk,qlk->pq", WHinv, Wm))
        rhs = gp - jnp.einsum("plk,lk->p", WHinv, gl)
        dp = -linalg3.chol_solve_nn(S, rhs, K6)
        dl = -jnp.einsum(
            "ljk,lk->lj", Hll_inv, gl + jnp.einsum("plj,p->lj", Wm, dp)
        )
        return dp.sum() + dl.sum()

    # --- full solves at different budgets ---
    def mk_solve(iters, rounds):
        return jax.jit(lambda p: ba.ba_solve(
            p, iters=iters, gate_rounds=rounds, kf_blocked=True
        ))

    solves = {
        f"solve {i}x{r}": mk_solve(i, r)
        for i, r in ((2, 2), (1, 2), (2, 1), (8, 2))
    }

    stages = [
        ("linearize", lambda i: k_linearize(problem)),
        ("assemble (lin+reduce)", lambda i: k_assemble(problem)),
        ("schur LU (1 iter)",
         lambda i: k_schur_lu(Hpp, gp, Hll, gl, Wc, 1e-4 * (i + 1))),
        ("schur unrolled-chol",
         lambda i: k_schur_chol(Hpp, gp, Hll, gl, Wc, 1e-4 * (i + 1))),
    ]
    for name, fn in stages:
        print(f"{name:24s} {timeit(fn)*1e3:7.2f} ms")
    for name, s in solves.items():
        print(f"{name:24s} {timeit(lambda i: s(problem).poses.sum())*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
