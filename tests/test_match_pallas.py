"""Parity of the fused gated-match kernel (ops/match_pallas.py) against
the XLA reference formulation (ops/match.py + _anchored_sq_px_dist).

The kernel runs in Pallas interpret mode here (CPU suite); on TPU the
compiled kernel computes the identical integer distances and identical
first-index tie-breaking, so selection parity proven here carries over —
only the f32 gate-matmul rounding can differ at the exact gate boundary
(equivalence-class caveat, docs/PERF.md).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcslam_tpu.ops import hamming, match as match_ops, match_pallas
from mcslam_tpu import tracking_kernels as tk


def _random_problem(seed, M, N, C=3, with_pass=True):
    rng = np.random.RandomState(seed)
    a_desc = rng.randint(0, 2**32, (M, 8), dtype=np.uint64).astype(np.uint32)
    b_desc = rng.randint(0, 2**32, (N, 8), dtype=np.uint64).astype(np.uint32)
    # make some exact duplicates to exercise tie-breaking
    b_desc[N // 2] = a_desc[0]
    b_desc[N // 2 + 1] = a_desc[0]
    uv = rng.rand(M, 2).astype(np.float32) * 400.0
    anchor = rng.randint(0, C, M).astype(np.int32)
    proj = rng.rand(C, N, 2).astype(np.float32) * 400.0
    # half the columns project near some rows
    proj[:, : N // 2] = uv[rng.randint(0, M, N // 2)][None, :, :] + rng.randn(
        C, N // 2, 2
    ).astype(np.float32) * 10.0
    pen = rng.rand(C, N) < 0.1
    row_valid = rng.rand(M) > 0.1
    col_valid = rng.rand(N) > 0.1
    col_pass = (rng.rand(N) < 0.3) if with_pass else None
    return a_desc, b_desc, uv, anchor, proj, pen, row_valid, col_valid, col_pass


@pytest.mark.parametrize("seed,M,N", [(0, 128, 256), (1, 200, 300)])
def test_fused_mutual_parity(seed, M, N):
    (a_desc, b_desc, uv, anchor, proj, pen, row_valid, col_valid,
     col_pass) = _random_problem(seed, M, N)
    gate_px, max_dist, ratio = 40.0, 80, 0.85

    # XLA reference: gated mutual match
    d2 = tk._anchored_sq_px_dist(
        jnp.asarray(uv), jnp.asarray(anchor), jnp.asarray(proj),
        jnp.asarray(pen),
    )
    pair_mask = jnp.where(
        ~jnp.asarray(col_pass)[None, :], d2 < gate_px**2, True
    )
    d = hamming.hamming_matrix(jnp.asarray(a_desc), jnp.asarray(b_desc))
    ref = match_ops.match_mutual(
        d, row_mask=jnp.asarray(row_valid), col_mask=jnp.asarray(col_valid),
        max_dist=max_dist, ratio=ratio, pair_mask=pair_mask,
    )

    # fused kernel (interpret mode)
    ahat, bhat = tk._gate_factors(
        jnp.asarray(uv), jnp.asarray(anchor), jnp.asarray(proj),
        jnp.asarray(pen), ~jnp.asarray(row_valid), ~jnp.asarray(col_valid),
        col_pass=jnp.asarray(col_pass),
    )
    best, second, idx, col_idx = match_pallas.hamming_argmin2(
        hamming.to_planes(jnp.asarray(a_desc)),
        hamming.to_planes(jnp.asarray(b_desc)).T,
        ahat, bhat, gate_px**2, want_cols=True, interpret=True,
    )
    rows = jnp.arange(M, dtype=jnp.int32)
    ok = (
        (col_idx[idx] == rows) & (best <= max_dist)
        & (best <= ratio * second) & jnp.asarray(row_valid)
    )

    ok_ref = np.asarray(ref.ok)
    assert np.array_equal(np.asarray(ok), ok_ref)
    assert np.array_equal(np.asarray(idx)[ok_ref], np.asarray(ref.idx)[ok_ref])
    assert np.array_equal(
        np.asarray(best)[ok_ref].astype(np.int32),
        np.asarray(ref.dist)[ok_ref],
    )


@pytest.mark.parametrize("seed,M,N", [(2, 128, 512), (3, 160, 130)])
def test_fused_oneway_parity(seed, M, N):
    (a_desc, b_desc, uv, anchor, proj, pen, row_valid, col_valid,
     _) = _random_problem(seed, M, N, with_pass=False)
    radius, max_dist = 30.0, 64

    d2 = tk._anchored_sq_px_dist(
        jnp.asarray(uv), jnp.asarray(anchor), jnp.asarray(proj),
        jnp.asarray(pen),
    )
    close = d2 < radius * radius
    d = hamming.hamming_matrix(jnp.asarray(a_desc), jnp.asarray(b_desc))
    ref = match_ops.match_one_way(
        d, row_mask=jnp.asarray(row_valid), col_mask=jnp.asarray(col_valid),
        max_dist=max_dist, pair_mask=close,
    )

    ahat, bhat = tk._gate_factors(
        jnp.asarray(uv), jnp.asarray(anchor), jnp.asarray(proj),
        jnp.asarray(pen), ~jnp.asarray(row_valid), ~jnp.asarray(col_valid),
    )
    best, second, idx, col_idx = match_pallas.hamming_argmin2(
        hamming.to_planes(jnp.asarray(a_desc)),
        hamming.to_planes(jnp.asarray(b_desc)).T,
        ahat, bhat, radius * radius, want_cols=False, interpret=True,
    )
    assert col_idx is None
    ok = (best <= max_dist) & (best <= second) & jnp.asarray(row_valid)

    ok_ref = np.asarray(ref.ok)
    assert np.array_equal(np.asarray(ok), ok_ref)
    assert np.array_equal(np.asarray(idx)[ok_ref], np.asarray(ref.idx)[ok_ref])


def test_fused_match_flag_off_is_xla(monkeypatch):
    """With MCSLAM_NO_FUSED_MATCH=1 (or on CPU) the tracking sites keep
    the XLA matcher — _fused_match gates on backend and env."""
    monkeypatch.setenv("MCSLAM_NO_FUSED_MATCH", "1")
    assert tk._fused_match() is False
    monkeypatch.delenv("MCSLAM_NO_FUSED_MATCH")
    # CPU suite: backend is cpu -> still False
    assert tk._fused_match() is (jax.default_backend() == "tpu")
