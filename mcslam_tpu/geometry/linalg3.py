"""Closed-form small-matrix linear algebra for TPU.

Batched jnp.linalg.solve/inv/det lower to LU decompositions that are
scalar-sequential and slow on TPU vector units; 3x3 systems (triangulation,
landmark Schur blocks) use the adjugate closed form instead — pure
elementwise VPU arithmetic that fuses with the surrounding ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def det3(A: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (...,) determinant, closed form."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


def adjugate3(A: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 3, 3) adjugate (inverse * det)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    return jnp.stack(
        [
            jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e], axis=-1),
            jnp.stack([f * g - d * i, a * i - c * g, c * d - a * f], axis=-1),
            jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d], axis=-1),
        ],
        axis=-2,
    )


def inv3(A: jax.Array, eps: float = 1e-20) -> jax.Array:
    """(..., 3, 3) -> (..., 3, 3) inverse via adjugate / det."""
    det = det3(A)
    safe = jnp.where(jnp.abs(det) < eps, jnp.sign(det) * eps + (det == 0) * eps, det)
    return adjugate3(A) / safe[..., None, None]


def solve3(A: jax.Array, b: jax.Array, eps: float = 1e-20) -> jax.Array:
    """Solve A x = b for (..., 3, 3) x (..., 3) -> (..., 3), closed form."""
    det = det3(A)
    safe = jnp.where(jnp.abs(det) < eps, jnp.sign(det) * eps + (det == 0) * eps, det)
    adj = adjugate3(A)
    return jnp.einsum("...ij,...j->...i", adj, b) / safe[..., None]


def chol_solve_nn(H: jax.Array, g: jax.Array, n: int) -> jax.Array:
    """Solve H x = g for a small SPD system by FULLY UNROLLED Cholesky.

    H: (..., n, n) symmetric positive definite (e.g. damped Gauss-Newton
    normal equations); g: (..., n). Returns (..., n).

    jnp.linalg.solve on tiny systems lowers to an LU loop with dynamic
    slices — scalar-sequential and latency-heavy when it sits inside an
    unrolled LM chain. This form is genuine Cholesky (numerically stable
    for SPD, no pivoting needed) written as ~n^2/2 scalar component ops:
    zero control flow, vectorizes over arbitrary batch dims, and fuses
    with the surrounding linearization kernels. Intended for n <= 8.
    """
    Hc = [[H[..., i, j] for j in range(n)] for i in range(n)]
    L = [[None] * n for _ in range(n)]
    eps = 1e-30
    for j in range(n):
        d = Hc[j][j]
        for k in range(j):
            d = d - L[j][k] * L[j][k]
        Ljj = jnp.sqrt(jnp.maximum(d, eps))
        L[j][j] = Ljj
        inv = 1.0 / Ljj
        for i in range(j + 1, n):
            s = Hc[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv
    # forward substitution L y = g
    y = [None] * n
    for i in range(n):
        s = g[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # back substitution L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


def chol_solve6(H: jax.Array, g: jax.Array) -> jax.Array:
    """Unrolled-Cholesky solve of (..., 6, 6) SPD systems (see chol_solve_nn)."""
    return chol_solve_nn(H, g, 6)
